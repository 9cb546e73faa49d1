"""Interior-point (log-barrier) iLQR: first-class DP handling of
stagewise conic constraints.

The reference reaches conic constraints only through ADMM splitting with
SOC projections (`isls.py:503-712`, `projections.py:118-162`). This
module is the direct DP alternative (ROADMAP "conic-constrained DP";
PAPERS.md "Parallel Dynamic Programming for Conic Linear Quadratic
Control" treats cones inside the recursion): each stagewise cone
contributes its generalized logarithm as a barrier on the stage cost,

    elementwise  g(x,u) >= 0        ->  -sum log g_i
    SOC          t(x,u) >= ||v(x,u)||  ->  -log(t^2 - ||v||^2)

and the barrier-augmented smooth problem is solved by the existing
Riccati iLQR (`solvers/ilqr.py`) along a geometric mu schedule. Iterates
stay strictly feasible throughout: an infeasible line-search candidate
produces log(<=0) = NaN, which the NaN->+inf cost guard rejects.

All derivatives of the barrier come from `jax.grad`/`jax.hessian` per
stage (vmapped) — no hand-coded cone calculus. The whole schedule is a
`lax.scan`, so the solve jits once and vmaps over problem instances.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_admm_tpu.ops.rollout import rollout_nonlinear
from ilqr_admm_tpu.problem import ILQRConfig, SolveStatus
from ilqr_admm_tpu.solvers.ilqr import ILQRState, ilqr_solve
from ilqr_admm_tpu.utils.precision import highest_precision


def make_barrier(
    ineq: Optional[Callable] = None,
    soc: Optional[Callable] = None,
    eps: float = 0.0,
) -> Callable:
    """Build a per-stage barrier b(x, u) from cone specs.

    ineq(x, u) -> (k,) residuals, feasible iff all > 0.
    soc(x, u) -> sequence of (t, v) pairs, feasible iff t > ||v||
    (t scalar, v vector; static sequence length).
    `eps` shifts the boundary inward (g >= eps): useful to keep the
    central path away from exact saturation in f32.
    """
    if ineq is None and soc is None:
        raise ValueError("make_barrier needs at least one of ineq=/soc=")

    def barrier(x, u):
        b = 0.0
        if ineq is not None:
            g = ineq(x, u) - eps
            b = b - jnp.sum(jnp.log(g))
        if soc is not None:
            for t, v in soc(x, u):
                b = b - jnp.log((t - eps) ** 2 - jnp.sum(v**2))
        return b

    return barrier


def _augment_Cs(get_Cs: Callable, barrier: Callable, mu) -> Callable:
    """Add mu * (grad, hessian) of the stagewise barrier to the Taylor
    blocks (internal model: c^T delta + (1/2) delta^T C delta)."""

    def aug(xs, us):
        cts, Cts = get_Cs(xs, us)
        d = xs.shape[-1]

        def per_stage(z):
            return barrier(z[:d], z[d:])

        zs = jnp.concatenate([xs, us], axis=-1)
        grads = jax.vmap(jax.grad(per_stage))(zs)
        hesss = jax.vmap(jax.hessian(per_stage))(zs)
        return cts + mu * grads, Cts + mu * hesss

    return aug


@highest_precision
def barrier_ilqr_solve(
    f: Callable,
    get_AB: Callable,
    get_Cs: Callable,
    cost_fn: Callable,
    x0: jax.Array,
    u0: jax.Array,
    barrier: Callable,
    cfg: ILQRConfig = ILQRConfig(max_iter=30),
    mu0: float = 1.0,
    mu_factor: float = 5.0,
    n_barrier: int = 6,
    method: str = "dp",
    riccati: str = "chol",
):
    """Solve min cost s.t. stagewise cones, via a log-barrier homotopy.

    u0 must roll out strictly feasibly (barrier finite); otherwise the
    first stage fails with LINE_SEARCH_FAILED. Returns the final
    ILQRState; `state.cost` is the TRUE (barrier-free) cost of the final
    strictly feasible iterate.
    """
    mus = mu0 * (mu_factor ** -jnp.arange(n_barrier, dtype=x0.dtype))

    def stage_cost(mu):
        def aug_cost(xs, us):
            b = jax.vmap(barrier)(xs, us).sum()
            return cost_fn(xs, us) + mu * b

        return aug_cost

    xs_init = rollout_nonlinear(f, x0, u0)

    def run_stage(carry, mu):
        xs, us = carry
        aug_cost = stage_cost(mu)
        c = aug_cost(xs, us)
        st = ILQRState(
            x_nom=xs, u_nom=us, cost=c,
            prev_cost=jnp.asarray(jnp.inf, c.dtype),
            iteration=jnp.int32(0), status=jnp.int32(SolveStatus.RUNNING),
        )
        out = ilqr_solve(
            f, get_AB, _augment_Cs(get_Cs, barrier, mu), aug_cost, st,
            cfg=cfg, method=method, riccati=riccati,
        )
        return (out.x_nom, out.u_nom), out.status

    (xs, us), statuses = lax.scan(run_stage, (xs_init, u0), mus)
    return ILQRState(
        x_nom=xs, u_nom=us, cost=cost_fn(xs, us),
        prev_cost=jnp.asarray(jnp.inf, xs.dtype),
        iteration=jnp.int32(n_barrier), status=statuses[-1],
    )
