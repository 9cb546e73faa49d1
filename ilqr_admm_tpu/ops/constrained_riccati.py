"""Constrained Riccati backward passes: first-class DP treatment of
stagewise control constraints (no ADMM splitting).

`ilqr_backward_box` is the boxDDP backward pass (Tassa/Mansard/Todorov,
ICRA 2014): each stage solves a box-QP over the control increment
(`ops/boxqp.py`), and the feedback gain is restricted to the free
subspace (rows clamped at a bound carry zero feedback). The reference
only reaches control limits through ADMM splitting (`isls.py:379-501`,
replicating Tassa's car example via projections); this is the direct DP
path SURVEY §7 / ROADMAP list as the remaining conic-DP capability —
see also PAPERS.md "Parallel Dynamic Programming for Conic Linear
Quadratic Control" (stagewise cones inside the DP recursion rather than
as an outer splitting).

Same conventions as `ops/riccati.py::ilqr_backward`: Cts (N, x+u, x+u)
Taylor Hessians, cts (N, x+u) gradients (the internal model is
c^T delta + (1/2) delta^T C delta), zero final-step gains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_admm_tpu.ops.boxqp import boxqp, boxqp_enum, _masked_solve
from ilqr_admm_tpu.utils.precision import highest_precision


def _sym(M):
    return 0.5 * (M + M.T)


@highest_precision
def ilqr_backward_box(
    A: jax.Array,
    B: jax.Array,
    Cts: jax.Array,
    cts: jax.Array,
    u_nom: jax.Array,
    u_lower,
    u_upper,
    reg: float | jax.Array = 0.0,
    qp_iters: int = 12,
    qp_method: str = "auto",
):
    """boxDDP backward pass: per-stage box-QP feedforward + free-subspace
    feedback.

    u_lower/u_upper: scalars or (m,) absolute control bounds; the QP is
    over the increment delta_u with bounds [u_lower - u_nom_t,
    u_upper - u_nom_t]. Returns (K (N,u,x), k (N,u)) with zero final-step
    gains; forward rollouts must clip u into [u_lower, u_upper]
    (`rollout_closed_loop_clipped`).

    qp_method: 'enum' solves each stage QP exactly by 3^m active-set
    enumeration in one batched step (`ops/boxqp.py::boxqp_enum`);
    'newton' runs `qp_iters` projected-Newton iterations; 'auto'
    (default) picks 'enum' for m <= 3 — on TPU the sequential Newton
    chain is the stage latency, and enumeration replaces it with one
    vectorized solve batch.
    """
    if qp_method not in ("auto", "enum", "newton"):
        raise ValueError(f"qp_method must be auto|enum|newton, got {qp_method!r}")
    d = A.shape[-1]
    m = B.shape[-1]
    dtype = A.dtype
    lo = jnp.broadcast_to(jnp.asarray(u_lower, dtype), (m,))
    hi = jnp.broadcast_to(jnp.asarray(u_upper, dtype), (m,))

    use_enum = qp_method == "enum" or (qp_method == "auto" and m <= 3)

    V_term = Cts[-1][:d, :d]
    v_term = cts[-1][:d]

    def step(carry, inp):
        V, v = carry
        At, Bt, Ct, ct, ut = inp
        Cxx = Ct[:d, :d]
        Cuu = Ct[d:, d:]
        Cux = Ct[d:, :d]
        cx = ct[:d]
        cu = ct[d:]

        qx = cx + At.T @ v
        qu = cu + Bt.T @ v
        Qxx = Cxx + At.T @ V @ At
        Qux = Cux + Bt.T @ V @ At
        Quu = _sym(Cuu + Bt.T @ V @ Bt + reg * jnp.eye(m, dtype=dtype))

        if use_enum:
            kt, free = boxqp_enum(Quu, qu, lo - ut, hi - ut)
        else:
            kt, free = boxqp(Quu, qu, lo - ut, hi - ut, n_iters=qp_iters)
        Kt = _masked_solve(Quu, free, -Qux)

        V_new = Qxx + Qux.T @ Kt + Kt.T @ Qux + Kt.T @ Quu @ Kt
        v_new = qx + Qux.T @ kt + Kt.T @ qu + Kt.T @ Quu @ kt
        return (V_new, v_new), (Kt, kt)

    xs = (A[:-1], B[:-1], Cts[:-1], cts[:-1], u_nom[:-1])
    _, (K, k) = lax.scan(step, (V_term, v_term), xs, reverse=True)
    K = jnp.concatenate([K, jnp.zeros((1, m, d), dtype)], axis=0)
    k = jnp.concatenate([k, jnp.zeros((1, m), dtype)], axis=0)
    return K, k


@highest_precision
def rollout_closed_loop_clipped(
    f,
    x0: jax.Array,
    K: jax.Array,
    k: jax.Array,
    x_nom: jax.Array,
    u_nom: jax.Array,
    u_lower,
    u_upper,
):
    """Clipped feedback rollout: u_t = clip(u_nom + k + K (x - x_nom), bounds).

    The clip is part of the boxDDP policy (not a post-hoc projection):
    feedback pushing past a bound saturates, matching the backward
    pass's clamped-subspace model. Returns (xs (N,x), us (N,u)).
    """
    dtype = K.dtype
    m = K.shape[-2]
    lo = jnp.broadcast_to(jnp.asarray(u_lower, dtype), (m,))
    hi = jnp.broadcast_to(jnp.asarray(u_upper, dtype), (m,))

    def step(x, inp):
        Kt, kt, xnt, unt = inp
        u = jnp.clip(unt + kt + Kt @ (x - xnt), lo, hi)
        return f(x, u), (x, u)

    _, (xs, us) = lax.scan(step, x0, (K, k, x_nom, u_nom))
    return xs, us
