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


class MPCConstrainedState(NamedTuple):
    """Warm-start state for constrained MPC: nominal trajectory plus the
    ADMM consensus/dual variables carried across control ticks."""

    x_nom: jax.Array  # (N, d)
    u_nom: jax.Array  # (N, m)
    z_x: jax.Array  # (N*d,)
    z_u: jax.Array  # (N*m,)
    lmb_x: jax.Array  # (N*d,)
    lmb_u: jax.Array  # (N*m,)


def mpc_constrained_init(f: Callable, x0, u_guess) -> MPCConstrainedState:
    xs = rollout_nonlinear(f, x0, u_guess)
    N, d = xs.shape
    m = u_guess.shape[-1]
    z = jnp.zeros((N * d,), xs.dtype)
    zu = jnp.zeros((N * m,), xs.dtype)
    return MPCConstrainedState(
        x_nom=xs, u_nom=u_guess, z_x=xs.reshape(-1), z_u=u_guess.reshape(-1),
        lmb_x=z, lmb_u=zu,
    )


def _shift_flat(v, N, dim):
    """Shift a flattened (N*dim,) trajectory-shaped vector one step
    earlier in time, repeating the terminal block."""
    vt = v.reshape(N, dim)
    return jnp.concatenate([vt[1:], vt[-1:]], axis=0).reshape(-1)


def make_mpc_step_constrained(
    f: Callable,
    get_AB: Callable,
    cost_fn: Callable,
    get_Cs: Callable = None,
    quad_cost=None,
    project_x: Callable = None,
    project_u: Callable = None,
    rho_x=None,
    rho_u=None,
    n_outer_iters: int = 2,
    n_admm_iters: int = 5,
    n_line_search: int = 10,
    method: str = "dp",
    line_search: str = "inner",
):
    """Build a jitted *constrained* MPC step using bounded-iteration
    iLQR-ADMM with duals warm-started across ticks.

    Not in the reference (its replanning is linear/unconstrained-only,
    `sls.py:244-248`). Each tick:

    1. shift nominal trajectory AND ADMM consensus/dual variables one
       step (repeat the terminal block) — the shifted duals are near the
       new tick's optimal duals, so a handful of ADMM iterations
       suffices;
    2. run `n_outer_iters` outer iLQR-ADMM iterations (each with
       `n_admm_iters` inner ADMM iterations) from the measured state;
    3. return the first control and the new warm-start state.

    Returns step: (MPCConstrainedState, x_measured) -> (u_apply, state').

    line_search='outer' (method='batch' only) runs the inner ADMM on the
    linearized trajectory with NO rollouts and one nonlinear line search
    per outer iteration — the SQP serving mode (see
    `solvers/ilqr_admm.py`); cuts the per-tick rollout count from
    n_outer*n_admm line-search batches to n_outer.
    """
    from ilqr_admm_tpu.solvers.ilqr_admm import ilqr_admm

    if n_outer_iters < 1 or n_admm_iters < 1:
        raise ValueError(
            "n_outer_iters and n_admm_iters must be >= 1, got "
            f"{n_outer_iters}, {n_admm_iters}"
        )
    alphas = 10.0 ** jnp.linspace(0.0, -3.0, n_line_search)

    def step(state: MPCConstrainedState, x_measured):
        N, d = state.x_nom.shape
        m = state.u_nom.shape[-1]
        u_shift = jnp.concatenate([state.u_nom[1:], state.u_nom[-1:]], axis=0)
        xs = rollout_nonlinear(f, x_measured, u_shift)
        warm = (
            _shift_flat(state.z_x, N, d),
            _shift_flat(state.z_u, N, m),
            _shift_flat(state.lmb_x, N, d),
            _shift_flat(state.lmb_u, N, m),
        )
        res = ilqr_admm(
            f, get_AB, cost_fn, xs, u_shift,
            get_Cs=get_Cs, quad_cost=quad_cost,
            project_x=project_x, project_u=project_u,
            rho_x=rho_x, rho_u=rho_u,
            max_iter=n_outer_iters, max_admm_iter=n_admm_iters,
            alphas=alphas.astype(xs.dtype),
            # run the full bounded budget every tick: convergence
            # tolerances effectively disabled
            tol=0.0, outer_tol=0.0, osc_tol=0.0,
            method=method, line_search=line_search, warm=warm,
        )
        new_state = MPCConstrainedState(
            x_nom=res.x_nom, u_nom=res.u_nom,
            z_x=res.z_x, z_u=res.z_u, lmb_x=res.lmb_x, lmb_u=res.lmb_u,
        )
        # With a control projection, apply the projected first control:
        # truncated ADMM leaves the x-update iterate slightly infeasible,
        # while one extra projection guarantees the input constraint
        # exactly (standard real-time ADMM-MPC practice).
        u_apply = res.u_nom[0]
        if project_u is not None:
            u_flat = res.u_nom.reshape(-1)
            u_apply = project_u(u_flat).reshape(N, m)[0]
        return u_apply, new_state

    return jax.jit(step)


def make_mpc_step_boxddp(
    f: Callable,
    get_AB: Callable,
    cost_fn: Callable,
    get_Cs: Callable,
    u_lower,
    u_upper,
    n_iters: int = 3,
    n_line_search: int = 10,
    qp_iters: int = 8,
    riccati: str = "seq",
    mask_iters: int = 3,
):
    """Build a jitted control-limited MPC step using bounded-iteration
    boxDDP (first-class DP alternative to `make_mpc_step_constrained`
    for the common box-on-u case): no penalty parameters, no duals to
    carry, and the applied control satisfies the box EXACTLY by
    construction (clipped rollouts). Each tick: shift the nominal one
    step, run `n_iters` boxDDP iterations from the measured state,
    apply the first control.

    riccati='parallel' uses the exactness-certified time-parallel
    backward (O(log N) per pass) — the long-horizon tick option. The
    active set is seeded fresh each tick (MPCState carries no clamp
    state), so `mask_iters` (default 3) exchange passes per backward
    settle it; the MPC nominal shifts by one step per tick, keeping the
    seed close.

    Returns step: (MPCState, x_measured) -> (u_apply, state').
    """
    from ilqr_admm_tpu.ops.constrained_riccati import (
        rollout_closed_loop_clipped,
    )
    from ilqr_admm_tpu.solvers.boxddp import boxddp_iterate

    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    alphas = 10.0 ** jnp.linspace(0.0, -3.0, n_line_search)

    def step(state: MPCState, x_measured):
        from ilqr_admm_tpu.problem import SolveStatus
        from ilqr_admm_tpu.solvers.ilqr import ILQRState

        u_shift = jnp.clip(
            jnp.concatenate([state.u_nom[1:], state.u_nom[-1:]], axis=0),
            u_lower, u_upper,
        )
        xs = rollout_nonlinear(f, x_measured, u_shift)
        st = ILQRState(
            x_nom=xs, u_nom=u_shift, cost=cost_fn(xs, u_shift),
            prev_cost=jnp.asarray(jnp.inf, xs.dtype),
            iteration=jnp.int32(0), status=jnp.int32(SolveStatus.RUNNING),
        )

        def body(_, s):
            s2, _accept, _ = boxddp_iterate(
                f, get_AB, get_Cs, cost_fn, s,
                alphas.astype(xs.dtype), u_lower, u_upper, qp_iters=qp_iters,
                riccati=riccati, mask_iters=mask_iters,
            )
            return s2

        out = jax.lax.fori_loop(0, n_iters, body, st)
        return out.u_nom[0], MPCState(x_nom=out.x_nom, u_nom=out.u_nom)

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
