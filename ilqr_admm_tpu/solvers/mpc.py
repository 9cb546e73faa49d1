"""Receding-horizon MPC driver over the iLQR solvers.

The reference sketches replanning only for the linear case
(`initialize_replanning_procedure`/`replan_feedforward`, `sls.py:244-248`).
Here the full nonlinear receding-horizon loop is a first-class, jittable
step function: at every control tick,

1. shift the warm-started nominal trajectory one step (repeat the tail),
2. run a fixed small number of iLQR iterations from the *measured* state,
3. return the first control and the new warm start.

Because the step is one pure function, a fleet of MPC controllers
(scenario evaluation, policy benchmarking) batches with `vmap` and
shards over the mesh like every other solver here.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ilqr_admm_tpu.problem import ILQRConfig, line_search_alphas
from ilqr_admm_tpu.solvers.ilqr import ILQRState, ilqr_iterate_dp
from ilqr_admm_tpu.ops.rollout import rollout_nonlinear


class MPCState(NamedTuple):
    x_nom: jax.Array  # (N, d) warm-started nominal
    u_nom: jax.Array  # (N, m)


def mpc_init(f: Callable, x0, u_guess) -> MPCState:
    xs = rollout_nonlinear(f, x0, u_guess)
    return MPCState(x_nom=xs, u_nom=u_guess)


def make_mpc_step(
    f: Callable,
    get_AB: Callable,
    get_Cs: Callable,
    cost_fn: Callable,
    n_ilqr_iters: int = 2,
    cfg: ILQRConfig = ILQRConfig(max_line_search_iter=10),
):
    """Build a jitted MPC step: (state, x_measured) -> (u_apply, state').

    Runs `n_ilqr_iters` DP-iLQR iterations (unrolled — small and static)
    around the shifted warm start from the measured state.
    """
    alphas = line_search_alphas(cfg)

    def step(state: MPCState, x_measured):
        # shift warm start by one step; repeat the terminal control
        u_shift = jnp.concatenate([state.u_nom[1:], state.u_nom[-1:]], axis=0)
        xs = rollout_nonlinear(f, x_measured, u_shift)

        s = ILQRState(
            x_nom=xs, u_nom=u_shift, cost=cost_fn(xs, u_shift),
            prev_cost=jnp.asarray(jnp.inf, xs.dtype),
            iteration=jnp.int32(0), status=jnp.int32(0),
        )
        for _ in range(n_ilqr_iters):
            s, _, _ = ilqr_iterate_dp(f, get_AB, get_Cs, cost_fn, s, alphas.astype(xs.dtype))

        u_apply = s.u_nom[0]
        return u_apply, MPCState(x_nom=s.x_nom, u_nom=s.u_nom)

    return jax.jit(step)


def run_mpc(
    f_plant: Callable,
    mpc_step: Callable,
    state: MPCState,
    x0,
    n_steps: int,
    ws=None,
):
    """Closed-loop MPC rollout on a (possibly different) plant.

    f_plant may differ from the model used by mpc_step (model mismatch /
    disturbance studies); ws is optional (n_steps, d) additive noise.
    Returns (xs (n_steps, d), us (n_steps, m), final MPCState).
    """

    def scan_step(carry, inp):
        x, st = carry
        w = inp if ws is not None else 0.0
        u, st = mpc_step(st, x)
        x_next = f_plant(x, u) + w
        return (x_next, st), (x, u)

    (xf, state), (xs, us) = jax.lax.scan(
        scan_step, (x0, state), ws if ws is not None else None, length=n_steps
    )
    return xs, us, state
