"""Augmented-Lagrangian iLQR: first-class DP handling of general
stagewise constraints — state AND control, inequality AND equality.

Completes the constrained-DP family next to `solvers/boxddp.py` (boxes
on u only) and `solvers/barrier_ilqr.py` (needs a strictly feasible
start): the AL method (ALTRO-style; Toussaint/Howell lineage) handles
state constraints and infeasible initialization, which the reference
reaches only through ADMM splitting (`isls.py:379-501`).

Formulation (PHR augmented Lagrangian):

    inequality g(x,u) <= 0:  (1/(2 mu)) * (max(0, lam + mu g)^2 - lam^2)
    equality   h(x,u)  = 0:  lam h + (mu/2) h^2

Outer loop: solve the smooth AL subproblem with the existing Riccati
iLQR (`solvers/ilqr.py`), then first-order multiplier updates
lam <- max(0, lam + mu g) / lam <- lam + mu h and geometric penalty
growth. All constraint derivatives come from `jax.grad`/`jax.hessian`
per stage (vmapped); the whole schedule is a `lax.scan`, so the solve
jits once and vmaps over problem instances.
"""

from __future__ import annotations

import inspect
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_admm_tpu.ops.rollout import rollout_nonlinear
from ilqr_admm_tpu.problem import ILQRConfig, SolveStatus
from ilqr_admm_tpu.solvers.ilqr import ILQRState, ilqr_solve
from ilqr_admm_tpu.utils.precision import highest_precision


class ALResult(NamedTuple):
    x_nom: jax.Array  # (N, d)
    u_nom: jax.Array  # (N, m)
    cost: jax.Array  # true (unpenalized) cost of the final iterate
    max_violation: jax.Array  # max over stages of max(g, |h|)
    lam_ineq: Optional[jax.Array]  # (N, k_g) final multipliers
    lam_eq: Optional[jax.Array]  # (N, k_h)
    status: jax.Array  # SolveStatus of the last inner solve


def _al_penalty(g_ineq, lam_g, h_eq, lam_h, mu):
    pen = 0.0
    if g_ineq is not None:
        a = jnp.maximum(0.0, lam_g + mu * g_ineq)
        pen = pen + jnp.sum(a**2 - lam_g**2) / (2.0 * mu)
    if h_eq is not None:
        pen = pen + jnp.sum(lam_h * h_eq) + 0.5 * mu * jnp.sum(h_eq**2)
    return pen


@highest_precision
def al_ilqr_solve(
    f: Callable,
    get_AB: Callable,
    get_Cs: Callable,
    cost_fn: Callable,
    x0: jax.Array,
    u0: jax.Array,
    ineq: Optional[Callable] = None,
    eq: Optional[Callable] = None,
    cfg: ILQRConfig = ILQRConfig(max_iter=30),
    n_al: int = 10,
    mu0: float = 1.0,
    mu_factor: float = 5.0,
    mu_max: float = 1e8,
    tol_con: float = 1e-6,
    method: str = "dp",
    riccati: str = "chol",
    gauss_newton: bool = True,
) -> ALResult:
    """Solve min cost s.t. stagewise ineq(x,u[,t]) <= 0, eq(x,u[,t]) = 0.

    ineq/eq are single-stage functions returning fixed-size residual
    vectors (at least one must be given); a 3-argument signature also
    receives the stage index t, enabling time-varying constraints
    (terminal pins via `where(t == N-1, ...)`, moving obstacles). The
    penalty parameter grows geometrically each outer stage unless the
    max violation already dropped below tol_con (then multipliers alone
    polish the solution). gauss_newton=True (default) uses the PSD
    Gauss-Newton penalty curvature mu J' D J — required for nonconvex
    constraints (keep-out sets); False uses the exact Hessian.
    """
    if ineq is None and eq is None:
        raise ValueError("al_ilqr_solve needs at least one of ineq=/eq=")
    dtype = x0.dtype
    N = u0.shape[0]

    # constraints may be c(x, u) or c(x, u, t) — the stage index enables
    # time-varying constraints (terminal pins, moving obstacles)
    def _with_t(c):
        if c is None:
            return None
        if len(inspect.signature(c).parameters) >= 3:
            return c
        return lambda x, u, t: c(x, u)

    ineq = _with_t(ineq)
    eq = _with_t(eq)
    ts = jnp.arange(N)

    # u_{N-1} influences no state inside the horizon and DP leaves its
    # gains zero (framework convention, reference `isls.py:261`), so the
    # inner solves can never move it off an infeasible initial value.
    # With R positive definite its stage-optimal value is 0 — reset it.
    u0 = u0.at[-1].set(0.0)
    xs_init = rollout_nonlinear(f, x0, u0)
    kg = None if ineq is None else jax.eval_shape(ineq, xs_init[0], u0[0], ts[0]).shape[0]
    kh = None if eq is None else jax.eval_shape(eq, xs_init[0], u0[0], ts[0]).shape[0]
    lam_g0 = None if kg is None else jnp.zeros((N, kg), dtype)
    lam_h0 = None if kh is None else jnp.zeros((N, kh), dtype)

    def stage_res(xs, us):
        g = None if ineq is None else jax.vmap(ineq)(xs, us, ts)
        h = None if eq is None else jax.vmap(eq)(xs, us, ts)
        return g, h

    def violation(g, h):
        v = jnp.asarray(0.0, dtype)
        if g is not None:
            v = jnp.maximum(v, jnp.max(jnp.maximum(g, 0.0)))
        if h is not None:
            v = jnp.maximum(v, jnp.max(jnp.abs(h)))
        return v

    def aug_cost(lam_g, lam_h, mu):
        def ac(xs, us):
            g, h = stage_res(xs, us)
            return cost_fn(xs, us) + _al_penalty(g, lam_g, h, lam_h, mu)

        return ac

    def aug_Cs(lam_g, lam_h, mu):
        def aug(xs, us):
            cts, Cts = get_Cs(xs, us)
            d = xs.shape[-1]

            zs = jnp.concatenate([xs, us], axis=-1)
            lg = jnp.zeros((N, 0), dtype) if lam_g is None else lam_g
            lh = jnp.zeros((N, 0), dtype) if lam_h is None else lam_h

            if not gauss_newton:
                def ps(z, a, b, t):
                    x, u = z[:d], z[d:]
                    g = None if ineq is None else ineq(x, u, t)
                    h = None if eq is None else eq(x, u, t)
                    return _al_penalty(
                        g, None if ineq is None else a,
                        h, None if eq is None else b, mu,
                    )

                grads = jax.vmap(jax.grad(ps))(zs, lg, lh, ts)
                hesss = jax.vmap(jax.hessian(ps))(zs, lg, lh, ts)
                return cts + grads, Cts + hesss

            # Gauss-Newton penalty curvature (ALTRO practice): keep the
            # exact gradient J' a but drop the a_i * grad^2 c_i constraint-
            # curvature term — the result mu J' D J is PSD, which keeps the
            # Riccati pass well-posed on nonconvex constraints (keep-out
            # regions) where the exact Hessian is indefinite and stalls the
            # line search.
            def gn_one(z, a_lam, b_lam, t):
                grad = jnp.zeros_like(z)
                hess = jnp.zeros((z.shape[0], z.shape[0]), dtype)
                if ineq is not None:
                    cg = lambda zz: ineq(zz[:d], zz[d:], t)
                    g = cg(z)
                    Jg = jax.jacfwd(cg)(z)
                    a = jnp.maximum(0.0, a_lam + mu * g)
                    grad = grad + Jg.T @ a
                    hess = hess + mu * (Jg.T * (a > 0.0)) @ Jg
                if eq is not None:
                    ch = lambda zz: eq(zz[:d], zz[d:], t)
                    h = ch(z)
                    Jh = jax.jacfwd(ch)(z)
                    grad = grad + Jh.T @ (b_lam + mu * h)
                    hess = hess + mu * Jh.T @ Jh
                return grad, hess

            grads, hesss = jax.vmap(gn_one)(zs, lg, lh, ts)
            return cts + grads, Cts + hesss

        return aug

    def run_stage(carry, _):
        xs, us, lam_g, lam_h, mu = carry
        ac = aug_cost(lam_g, lam_h, mu)
        c = ac(xs, us)
        st = ILQRState(
            x_nom=xs, u_nom=us, cost=c,
            prev_cost=jnp.asarray(jnp.inf, dtype),
            iteration=jnp.int32(0), status=jnp.int32(SolveStatus.RUNNING),
        )
        out = ilqr_solve(
            f, get_AB, aug_Cs(lam_g, lam_h, mu), ac, st,
            cfg=cfg, method=method, riccati=riccati,
        )
        g, h = stage_res(out.x_nom, out.u_nom)
        new_lam_g = None if lam_g is None else jnp.maximum(0.0, lam_g + mu * g)
        new_lam_h = None if lam_h is None else lam_h + mu * h
        viol = violation(g, h)
        # grow the penalty only while constraints are materially violated
        new_mu = jnp.where(viol > tol_con, jnp.minimum(mu * mu_factor, mu_max), mu)
        return (out.x_nom, out.u_nom, new_lam_g, new_lam_h, new_mu), (viol, out.status)

    carry0 = (xs_init, u0, lam_g0, lam_h0, jnp.asarray(mu0, dtype))
    (xs, us, lam_g, lam_h, _), (viols, statuses) = lax.scan(
        run_stage, carry0, None, length=n_al
    )
    g, h = stage_res(xs, us)
    return ALResult(
        x_nom=xs, u_nom=us, cost=cost_fn(xs, us),
        max_violation=violation(g, h),
        lam_ineq=lam_g, lam_eq=lam_h, status=statuses[-1],
    )
