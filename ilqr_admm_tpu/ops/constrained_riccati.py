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
def ilqr_backward_box_parallel(
    A: jax.Array,
    B: jax.Array,
    Cts: jax.Array,
    cts: jax.Array,
    u_nom: jax.Array,
    u_lower,
    u_upper,
    reg: float | jax.Array = 0.0,
    eps: float = 1e-6,
    mask_iters: int = 2,
):
    """Time-parallel boxDDP backward pass via active-set freezing.

    The exact box-QP recursion (`ilqr_backward_box`) is inherently
    sequential — each stage's clamped set depends on the cost-to-go.
    This variant replaces it with TWO associative-scan passes
    (`ops/parallel_riccati.py::ilqr_backward_parallel`, O(log N) depth):

    1. an unconstrained pass whose feedforward k_unc estimates, per
       stage, which bound-riding controls the Newton step pushes
       *outward* (the same test boxQP's KKT check applies at its
       solution);
    2. a masked pass on the frozen free subspace: clamped control dims
       are removed from the model (B columns zeroed, Cuu rows/cols
       replaced by identity filler, Cux/cu rows zeroed), so their
       du = 0 — EXACT because the nominal is feasible (clipped
       rollouts) and a dim is only frozen when it sits ON its bound,
       making the clamped increment offset zero.

    The mask is one iteration stale in the same sense projected-Newton's
    first active-set estimate is; the boxDDP line search + LM
    regularization schedule (solvers/boxddp.py) globalizes exactly as
    with the sequential pass. Returns (K (N,m,d), k (N,m)) with zero
    feedback on clamped rows; forward rollouts clip as usual.

    STATUS — experimental approximation. On lightly saturated problems
    it tracks the exact pass; on the heavily saturated car-parking task
    (~45 % of controls at bounds) the stale masks slow the outer loop
    and it plateaus ~1.1-1.4x above the exact sequential pass's final
    cost (measured: 1.995 vs 1.905 at N=500/250 iters with
    mask_iters=4; 0.50 vs 0.37 at N=100). Use the sequential
    `ilqr_backward_box` when solution quality is the bar and this
    variant when backward-pass latency at very long horizons dominates.
    """
    from ilqr_admm_tpu.ops.parallel_riccati import ilqr_backward_parallel

    d = A.shape[-1]
    m = B.shape[-1]
    dtype = A.dtype
    lo = jnp.broadcast_to(jnp.asarray(u_lower, dtype), (m,))
    hi = jnp.broadcast_to(jnp.asarray(u_upper, dtype), (m,))
    tol = eps * (1.0 + jnp.maximum(jnp.abs(lo), jnp.abs(hi)))

    # reg may be a traced scalar (the boxDDP LM schedule) — apply
    # unconditionally (zero adds nothing)
    Cts = Cts.at[:, d:, d:].add(
        jnp.asarray(reg, dtype) * jnp.eye(m, dtype=dtype)[None]
    )

    at_lo = u_nom <= lo[None] + tol[None]
    at_hi = u_nom >= hi[None] - tol[None]

    def masked_pass(free):
        F = free.astype(dtype)
        B_eff = B * F[:, None, :]
        Cuu = Cts[:, d:, d:]
        Cuu_eff = (
            Cuu * F[:, :, None] * F[:, None, :]
            + jnp.eye(m, dtype=dtype)[None] * (1.0 - F)[:, :, None]
        )
        Cts_eff = Cts.at[:, d:, d:].set(Cuu_eff)
        Cts_eff = Cts_eff.at[:, d:, :d].set(Cts[:, d:, :d] * F[:, :, None])
        Cts_eff = Cts_eff.at[:, :d, d:].set(Cts[:, :d, d:] * F[:, None, :])
        cts_eff = cts.at[:, d:].set(cts[:, d:] * F)
        K, k = ilqr_backward_parallel(A, B_eff, Cts_eff, cts_eff)
        return K * F[:, :, None], k * F

    # active-set fixed point: pass i's feedforward refines the frozen
    # set for pass i+1 (each pass is O(log N); the set usually settles
    # in 2-3). Pass 0 estimates from the unconstrained direction.
    _, k_est = ilqr_backward_parallel(A, B, Cts, cts)
    K = k = None
    for _ in range(max(1, mask_iters)):
        free = ~((at_lo & (k_est < 0)) | (at_hi & (k_est > 0)))  # (N, m)
        K, k = masked_pass(free)
        # refreeze test uses the *constrained* step next round; frozen
        # dims keep their previous (outward) direction so they can only
        # be released by an inward unconstrained pull — re-estimate that
        # from the free-pass result where free, k_est's sign where not
        k_est = jnp.where(free, k, k_est)
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
