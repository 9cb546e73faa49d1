"""Lifted causal response operators Sw, Su — scan-built and matrix-free.

The reference materializes dense `Sw = (I - Z A)^{-1}` and `Su = Sw Z B`
with an O(N) backward column construction (`base.py:98-119`). Here:

- `sw_x0`, `su_apply`, `su_t_apply` are *matrix-free* applications of the
  lifted operators as `lax.scan` rollouts / adjoint recursions — O(N d^2)
  and O(N) memory, the preferred TPU path.
- `build_Sw` / `build_Su` materialize the dense operators (needed where
  the matrix itself is the object, e.g. SLS response-map synthesis); they
  are forward row recursions expressed as a single scan of small batched
  matmuls.

Conventions: A (N, x, x), B (N, x, u); trajectory x_0..x_{N-1} with
x_{t+1} = A_t x_t + B_t u_t; lifted vectors stack timesteps first.
Block (i, j) of Sw is A_{i-1}···A_j (I on the diagonal); block (i, j) of
Su is A_{i-1}···A_{j+1} B_j for i > j.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


from ilqr_admm_tpu.utils.precision import highest_precision

@highest_precision
def sw_x0(A: jax.Array, x0: jax.Array) -> jax.Array:
    """Free response Sw[:, :x_dim] @ x0 as a trajectory (N, x_dim).

    Equivalent to rolling x_{t+1} = A_t x_t from x0 (reference computes
    this as a dense matvec, `sls.py:80`).
    """
    N = A.shape[0]

    def step(x, At):
        return At @ x, x

    _, xs = lax.scan(step, x0, A)
    return xs


@highest_precision
def su_apply(A: jax.Array, B: jax.Array, us: jax.Array) -> jax.Array:
    """Su @ u as a trajectory: forced response from zero state.

    us: (N, u_dim) → (N, x_dim). x_0 = 0; x_{t+1} = A_t x_t + B_t u_t.
    """
    d = A.shape[-1]

    def step(x, inp):
        At, Bt, ut = inp
        return At @ x + Bt @ ut, x

    _, xs = lax.scan(step, jnp.zeros((d,), A.dtype), (A, B, us))
    return xs


@highest_precision
def su_t_apply(A: jax.Array, B: jax.Array, vs: jax.Array) -> jax.Array:
    """Adjoint Su^T @ v: (N, x_dim) → (N, u_dim).

    (Su^T v)_j = B_j^T p_{j+1} with the costate recursion
    p_t = v_t + A_t^T p_{t+1}, p_N = 0 — the backward-accumulation
    formulation of the dense transpose matvec.
    """
    d = A.shape[-1]

    def step(p, inp):
        At, Bt, vt = inp
        out = Bt.T @ p  # p here is p_{t+1}
        p_new = vt + At.T @ p
        return p_new, out

    _, outs = lax.scan(step, jnp.zeros((d,), A.dtype), (A, B, vs), reverse=True)
    return outs


@highest_precision
def build_Sx(A: jax.Array, p: int | None = None) -> jax.Array:
    """First p columns of Sw as stacked blocks: (N, x_dim, p).

    Sx[t] = A_{t-1} ··· A_0 restricted to the first p input columns
    (reference uses `Sw[:, :x_dim//2]` for robustness w.r.t. the initial
    position block, `sls.py:330`).
    """
    d = A.shape[-1]
    p = d if p is None else p
    M0 = jnp.eye(d, dtype=A.dtype)[:, :p]

    def step(M, At):
        return At @ M, M

    _, Ms = lax.scan(step, M0, A)
    return Ms


@highest_precision
def build_Sw(A: jax.Array) -> jax.Array:
    """Dense lifted Sw: (N*x, N*x). Row-block recursion as one scan."""
    N, d, _ = A.shape
    row0 = jnp.zeros((d, N * d), A.dtype).at[:, :d].set(jnp.eye(d, dtype=A.dtype))
    eye = jnp.eye(d, dtype=A.dtype)

    def step(carry, inp):
        row, t = carry
        At = inp
        new_row = At @ row
        blk = lax.dynamic_slice(new_row, (jnp.int32(0), t * d), (d, d)) + eye
        new_row = lax.dynamic_update_slice(new_row, blk, (jnp.int32(0), t * d))
        return (new_row, t + 1), new_row

    (_, _), rows = lax.scan(step, (row0, jnp.int32(1)), A[:-1])
    rows = jnp.concatenate([row0[None], rows], axis=0)  # (N, d, N*d)
    return rows.reshape(N * d, N * d)


@highest_precision
def build_Su(A: jax.Array, B: jax.Array) -> jax.Array:
    """Dense lifted Su: (N*x, N*u). Row-block recursion as one scan."""
    N, d, _ = A.shape
    m = B.shape[-1]
    row0 = jnp.zeros((d, N * m), A.dtype)

    def step(carry, inp):
        row, t = carry
        At, Bt = inp  # dynamics at step t-1
        new_row = At @ row
        blk = lax.dynamic_slice(new_row, (jnp.int32(0), (t - 1) * m), (d, m)) + Bt
        new_row = lax.dynamic_update_slice(new_row, blk, (jnp.int32(0), (t - 1) * m))
        return (new_row, t + 1), new_row

    (_, _), rows = lax.scan(step, (row0, jnp.int32(1)), (A[:-1], B[:-1]))
    rows = jnp.concatenate([row0[None], rows], axis=0)
    return rows.reshape(N * d, N * m)
