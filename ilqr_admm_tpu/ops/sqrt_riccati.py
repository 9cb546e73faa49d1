"""Square-root (array-form) Riccati backward pass — f32-stable at stiff weights.

The standard Riccati recursion propagates the value Hessian V directly;
at the reference benchmarks' weight ratios (x_std/u_std up to 1e10, 3DoF
arm) V's condition exceeds f32 and the `Quu` Cholesky NaNs. The classical
*array algorithm* propagates a factor S with V = S S^T instead: each step
is one QR of the pre-array

        [ Cuu^{1/2}   0        ]            [ X11  X12 ]
    T = [ S^T B       S^T A    ]  ,  qr(T) =[ 0    X22 ]  (R factor)
        [ 0           Cxx^{1/2}]            [ 0    0   ]

whose R-factor blocks satisfy X11^T X11 = Quu, X11^T X12 = Qux and
X22^T X22 = V_new — so K = -X11^{-1} X12 by triangular solve and the new
factor is X22 directly. Condition numbers live on the *factors* (square
root of the Hessian's), which keeps the 1e10-ratio arm benchmark inside
f32 (factor cond ~1e5).

Restriction: Cux = 0 (true for every benchmark cost here — the reference
LQT DP solver assumes it too, `sls.py:88-92`). The linear (v, k) terms
are propagated unfactored via the closed-loop form
v_new = cx + K^T cu + (A + B K)^T v, which is benign (no factorization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from ilqr_admm_tpu.utils.precision import highest_precision


def _sqrt_psd(M):
    """Symmetric PSD square root (eigh-based; handles zero blocks)."""
    w, V = jnp.linalg.eigh(M)
    return V @ jnp.diag(jnp.sqrt(jnp.maximum(w, 0.0))) @ V.T


@highest_precision
def ilqr_backward_sqrt(
    A: jax.Array,
    B: jax.Array,
    Cts: jax.Array,
    cts: jax.Array,
):
    """Array-form iLQR backward pass (Cux must be zero).

    Same (K, k) contract as `riccati.ilqr_backward`; per step one QR of a
    ((m + 2d) x (m + d)) pre-array instead of forming/factoring Quu.
    """
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    dtype = jnp.result_type(A.dtype, Cts.dtype)
    A = A.astype(dtype)
    B = B.astype(dtype)
    Cts = Cts.astype(dtype)
    cts = cts.astype(dtype)

    Cxx_sqrt = jax.vmap(_sqrt_psd)(Cts[:, :d, :d])
    Cuu_sqrt = jax.vmap(_sqrt_psd)(Cts[:, d:, d:])

    S_term = _sqrt_psd(Cts[-1][:d, :d])  # V = S S^T
    v_term = cts[-1][:d]

    def step(carry, inp):
        S, v = carry  # V = S S^T
        At, Bt, Cuu_h, Cxx_h, ct = inp
        cx = ct[:d]
        cu = ct[d:]

        pre = jnp.concatenate(
            [
                jnp.concatenate([Cuu_h, jnp.zeros((m, d), dtype)], axis=1),
                jnp.concatenate([S.T @ Bt, S.T @ At], axis=1),
                jnp.concatenate([jnp.zeros((d, m), dtype), Cxx_h], axis=1),
            ],
            axis=0,
        )
        R = jnp.linalg.qr(pre, mode="r")  # (m + d, m + d) upper triangular
        X11 = R[:m, :m]
        X12 = R[:m, m:]
        X22 = R[m:, m:]

        Kt = -solve_triangular(X11, X12, lower=False)
        qu = cu + Bt.T @ v
        # k = -Quu^{-1} qu = -(X11^T X11)^{-1} qu
        kt = -solve_triangular(
            X11, solve_triangular(X11.T, qu, lower=True), lower=False
        )
        v_new = cx + Kt.T @ cu + (At + Bt @ Kt).T @ v
        # re-triangularize the factor (X22 is already a valid factor:
        # V_new = X22^T X22, stored transposed so V = S S^T next step)
        S_new = X22.T
        return (S_new, v_new), (Kt, kt)

    xs = (A[:-1], B[:-1], Cuu_sqrt[:-1], Cxx_sqrt[:-1], cts[:-1])
    _, (K, k) = lax.scan(step, (S_term, v_term), xs, reverse=True)
    K = jnp.concatenate([K, jnp.zeros((1, m, d), dtype)], axis=0)
    k = jnp.concatenate([k, jnp.zeros((1, m), dtype)], axis=0)
    return K, k
