"""Differentiable ADMM: implicit-function-theorem gradients through the
fixed point.

Not in the reference (pure NumPy, no autodiff). The natural JAX payoff
of this framework: the constrained solution u*(theta) of an ADMM solve
is a fixed point w* = T(w*, theta) of the ADMM iteration map T (x-update
+ projections + dual update). Instead of backpropagating through every
unrolled iteration (memory O(iters), gradients polluted by early
iterates), `fixed_point` applies the IFT:

    dw*/dtheta = (I - dT/dw)^{-1} dT/dtheta  at  w = w*

and evaluates the VJP by a Neumann series v <- w_bar + (dT/dw)^T v
(convergent because T is a contraction near the fixed point for
convex problems). Projections contribute their generalized Jacobians
(0/1 masks for boxes, etc.) automatically through JAX's autodiff.

This enables gradient-based tuning of cost weights, targets, initial
states and constraint parameters through the *constrained* solution —
e.g. inverse optimal control, differentiable safety layers.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_factor, cho_solve

from ilqr_admm_tpu.ops.lifted import build_Su, sw_x0
from ilqr_admm_tpu.solvers.lqt import block_diag_stacked, broadcast_rho
from ilqr_admm_tpu.solvers.admm import validate_constraint_blocks


def _tree_delta(a, b):
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x, y: jnp.sum((x - y) ** 2), a, b)
    )
    return jnp.sqrt(sum(leaves))


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def fixed_point(step: Callable, theta, w0, max_iter: int = 100,
                bwd_iters: int = 50, tol: float = 0.0):
    """Differentiable fixed point w* of w = step(w, theta).

    step must be a pure contraction-near-solution map (one ADMM
    iteration); theta is the differentiable parameter pytree; w0 the
    (non-differentiated) warm start. The forward pass iterates until
    the iterate change drops below tol (or max_iter); the backward pass
    runs the transposed Neumann sensitivity iteration with the same
    stopping rule (bwd_iters cap). Bounded while_loops, so the whole
    thing jits, vmaps and shards like any other solver here.

    Gradient accuracy tracks fixed-point accuracy: the IFT VJP is the
    derivative of the *exact* fixed point, so an unconverged forward
    solve yields gradients that disagree with finite differences of the
    truncated computation. Prefer tol-based stopping with a generous
    max_iter over a small fixed iteration count.
    """
    return _forward(step, theta, w0, max_iter, tol)


def _forward(step, theta, w0, max_iter, tol):
    big = jnp.asarray(jnp.inf, jnp.float32)

    def cond(c):
        i, _, delta = c
        return jnp.logical_and(i < max_iter, delta >= tol)

    def body(c):
        i, w, _ = c
        w_new = step(w, theta)
        return i + 1, w_new, _tree_delta(w_new, w).astype(jnp.float32)

    _, w_star, _ = lax.while_loop(cond, body, (jnp.int32(0), w0, big))
    return w_star


def _fixed_point_fwd(step, theta, w0, max_iter, bwd_iters, tol):
    w_star = _forward(step, theta, w0, max_iter, tol)
    return w_star, (theta, w_star)


def _fixed_point_bwd(step, max_iter, bwd_iters, tol, res, w_bar):
    theta, w_star = res
    _, vjp_w = jax.vjp(lambda w: step(w, theta), w_star)
    big = jnp.asarray(jnp.inf, jnp.float32)

    def cond(c):
        i, _, delta = c
        return jnp.logical_and(i < bwd_iters, delta >= tol)

    def body(c):
        i, v, _ = c
        (tv,) = vjp_w(v)
        v_new = jax.tree_util.tree_map(jnp.add, w_bar, tv)
        return i + 1, v_new, _tree_delta(v_new, v).astype(jnp.float32)

    _, v, _ = lax.while_loop(cond, body, (jnp.int32(0), w_bar, big))
    _, vjp_theta = jax.vjp(lambda t: step(w_star, t), theta)
    (theta_bar,) = vjp_theta(v)
    w0_bar = jax.tree_util.tree_map(jnp.zeros_like, w_star)
    return theta_bar, w0_bar


fixed_point.defvjp(_fixed_point_fwd, _fixed_point_bwd)


def lqt_admm_implicit(
    A,
    B,
    theta: dict,
    project_x: Optional[Callable] = None,
    project_u: Optional[Callable] = None,
    rho_x=None,
    rho_u=None,
    n_iters: int = 1000,
    bwd_iters: int = 300,
    tol: float = 1e-8,
    alpha: float = 1.0,
):
    """Differentiable constrained LQT-ADMM (batch x-update).

    theta is a dict of differentiable parameters:
      Q (N,d,d), R (N,m,m), xd (N,d), x0 (d,), and optionally
      px / pu — parameter pytrees forwarded to the projections.
    project_x(v, px) / project_u(v, pu) must accept the parameter slot
    (pass-through closures if unused). A, B and the rho penalties are
    treated as non-differentiable (static problem structure).

    Returns (xs (N,d), us (N,m)) differentiable w.r.t. every leaf of
    theta via the IFT fixed-point VJP — e.g.
    `jax.grad(lambda th: loss(lqt_admm_implicit(A, B, th, ...)))`.
    """
    validate_constraint_blocks(project_x, rho_x, project_u, rho_u)
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    dtype = A.dtype

    Su = build_Su(A, B)
    Qr = broadcast_rho(rho_x, d, N, dtype)
    Rr = broadcast_rho(rho_u, m, N, dtype)
    has_x = project_x is not None
    has_u = project_u is not None
    if not (has_x or has_u):
        raise ValueError("at least one of project_x / project_u is required")
    Qr_l = block_diag_stacked(Qr) if (Qr is not None and has_x) else None
    Rr_l = block_diag_stacked(Rr) if (Rr is not None and has_u) else None

    def x_update(th, reg_x, reg_u):
        Qlift = block_diag_stacked(th["Q"])
        Rlift = block_diag_stacked(th["R"])
        free = sw_x0(A, th["x0"]).reshape(-1)
        SuTQ = Su.T @ Qlift
        l_side = SuTQ @ Su + Rlift
        r_side = SuTQ @ (th["xd"].reshape(-1) - free)
        if Qr_l is not None:
            l_side = l_side + Su.T @ (Qr_l @ Su)
            r_side = r_side + Su.T @ (Qr_l @ (reg_x - free))
        if Rr_l is not None:
            l_side = l_side + Rr_l
            r_side = r_side + Rr_l @ reg_u
        u_hat = cho_solve(cho_factor(l_side), r_side)
        return free + Su @ u_hat, u_hat

    def step(w, th):
        z_x, z_u, l_x, l_u = w
        x_x, x_u = x_update(th, z_x - l_x, z_u - l_u)
        if has_x:
            zr = alpha * x_x + (1.0 - alpha) * z_x
            z_x = project_x(zr + l_x, th.get("px"))
            l_x = l_x + x_x - z_x
        if has_u:
            zr = alpha * x_u + (1.0 - alpha) * z_u
            z_u = project_u(zr + l_u, th.get("pu"))
            l_u = l_u + x_u - z_u
        return (z_x, z_u, l_x, l_u)

    w0 = (
        jnp.zeros((N * d,), dtype), jnp.zeros((N * m,), dtype),
        jnp.zeros((N * d,), dtype), jnp.zeros((N * m,), dtype),
    )
    with jax.default_matmul_precision("highest"):
        z_x, z_u, l_x, l_u = fixed_point(step, theta, w0, n_iters, bwd_iters, tol)
        # final x-update at the fixed point (differentiable path to the
        # solution; the consensus variables are the constrained iterates)
        x_x, x_u = x_update(theta, z_x - l_x, z_u - l_u)
    return x_x.reshape(N, d), x_u.reshape(N, m)
