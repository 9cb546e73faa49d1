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

Cross terms Cux != 0 are handled by per-step completion of squares:
with M = Cuu^{-1} Cux, substituting u = u~ - M x gives an equivalent
problem with zero cross term — dynamics A_bar = A - B M, state cost
Cxx_bar = Cxx - Cux^T M (a Schur complement, PSD), cx_bar = cx - M^T cu
— and gains map back as K = K~ - M, k = k~. Requires Cuu > 0 (true
whenever the control penalty R is positive, as in every cost here;
the plain `riccati.ilqr_backward` needs only Quu > 0).

The linear (v, k) terms are propagated unfactored via the closed-loop
form v_new = cx + K^T cu + (A + B K)^T v, which is benign (no
factorization).
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
    """Array-form iLQR backward pass.

    Same (K, k) contract as `riccati.ilqr_backward`; per step one QR of a
    ((m + 2d) x (m + d)) pre-array instead of forming/factoring Quu.
    Nonzero Cux handled by completion of squares (requires Cuu > 0).
    """
    from jax.scipy.linalg import cho_factor, cho_solve

    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    dtype = jnp.result_type(A.dtype, Cts.dtype)
    A = A.astype(dtype)
    B = B.astype(dtype)
    Cts = Cts.astype(dtype)
    cts = cts.astype(dtype)

    # per-step cross-term elimination: M = Cuu^{-1} Cux
    def eliminate(Ct):
        Cxx, Cuu, Cux = Ct[:d, :d], Ct[d:, d:], Ct[d:, :d]
        M = cho_solve(cho_factor(0.5 * (Cuu + Cuu.T)), Cux)
        Cxx_bar = Cxx - Cux.T @ M
        return M, 0.5 * (Cxx_bar + Cxx_bar.T)

    Ms, Cxx_bar = jax.vmap(eliminate)(Cts)
    A_bar = A - jnp.einsum("tij,tjk->tik", B, Ms)
    cx_bar = cts[:, :d] - jnp.einsum("tji,tj->ti", Ms, cts[:, d:])

    Cxx_sqrt = jax.vmap(_sqrt_psd)(Cxx_bar)
    Cuu_sqrt = jax.vmap(_sqrt_psd)(Cts[:, d:, d:])

    # terminal value uses the raw state blocks: final-step gains are zero
    # by convention (u_{N-1} unused), so no elimination at step N-1
    S_term = _sqrt_psd(Cts[-1][:d, :d])  # V = S S^T
    v_term = cts[-1][:d]

    def step(carry, inp):
        S, v = carry  # V = S S^T
        At, Bt, Cuu_h, Cxx_h, cx, cu, Mt = inp

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
        # map gains back to original controls: u = u~ - M x
        return (S_new, v_new), (Kt - Mt, kt)

    xs = (
        A_bar[:-1], B[:-1], Cuu_sqrt[:-1], Cxx_sqrt[:-1],
        cx_bar[:-1], cts[:-1, d:], Ms[:-1],
    )
    _, (K, k) = lax.scan(step, (S_term, v_term), xs, reverse=True)
    K = jnp.concatenate([K, jnp.zeros((1, m, d), dtype)], axis=0)
    k = jnp.concatenate([k, jnp.zeros((1, m), dtype)], axis=0)
    return K, k
