"""Convergence study: single-pass bf16 delta-GEMM ADMM on a wide problem.

Settles the ROADMAP "equilibrated single-pass bf16 ADMM" question.

Two findings this script substantiates:

1. **Jacobi equilibration cannot help a bf16 MXU product.** bf16 keeps
   f32's 8-bit exponent, so quantization error is *relative per element*
   (~2^-9). A diagonal scaling on the contraction axis (a_i -> a_i s_i,
   b_i -> b_i / s_i) leaves every product a_i b_i — and hence the error
   bound sum_i |a_i b_i| 2^-9 — unchanged; scalings on the output axes
   rescale rows/columns uniformly, leaving relative error unchanged.
   Equilibration pays off for fixed-point (int8) formats with absolute
   quantization steps, not for bf16. (Verified numerically below.)

2. **The single-pass path is the delta-GEMM** (`refresh_every` in
   `ops/pallas_admm.py`): update the running correction with one bf16
   pass on Δs = s_k - s_{k-1} — per-pass error O(2^-9 |Δs|) vanishes as
   ADMM converges — plus an exact bf16x3 refresh every R iterations.
   This script measures its accuracy and throughput against the
   6-pass-f32 XLA path on a WIDE problem (N=256, Nm=512) where the MXU
   GEMM, not the pipeline, dominates (at Nm=100 the kernel is
   pipeline-bound and refresh_every=1 is best — RESULTS.md).
"""

import os

# persistent compile cache (first tunnel compile is minutes; reruns are free)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
from ilqr_admm_tpu.ops.pallas_admm import make_pallas_lqt_admm, _split_bf16
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def equilibration_check():
    """Numerical check of finding 1: row/col equilibration leaves the
    bf16 matmul's relative error unchanged (wide exponent => relative
    per-element quantization)."""
    rng = np.random.default_rng(1)
    # badly scaled operand: rows span 1e-4 .. 1e4
    W = rng.normal(size=(256, 256)) * np.logspace(-4, 4, 256)[:, None]
    v = rng.normal(size=(64, 256))
    d_row = 1.0 / np.sqrt(np.abs(W).max(axis=1))
    d_col = 1.0 / np.sqrt(np.abs(W).max(axis=0))
    We = d_row[:, None] * W * d_col[None, :]  # equilibrated

    def bf16_err(v, W, unscale=1.0):
        # error measured on the ORIGINAL (unscaled) product v @ W
        truth = (v @ W) * unscale
        vb = jnp.asarray(v, jnp.bfloat16).astype(jnp.float32)
        Wb = jnp.asarray(W, jnp.bfloat16).astype(jnp.float32)
        approx = np.asarray(vb @ Wb) * unscale
        return np.max(np.abs(approx - truth)) / np.max(np.abs(truth))

    e_raw = bf16_err(v, W)
    # (v D_r^-1) @ (D_r W D_c) @ D_c^-1 == v @ W
    e_eq = bf16_err(v / d_row[None, :], We, unscale=1.0 / d_col)
    print(f"equilibration check: bf16 rel err raw {e_raw:.2e} vs equilibrated {e_eq:.2e} (same order)")
    return e_raw, e_eq


def main():
    # wide problem: Nm = 512 -> the in-loop (tile, Nm) x (Nm, Nm) GEMM
    # dominates the kernel
    N, BATCH, ITERS = 256, 4096, 96
    plant = DoubleIntegrator(2, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim  # 4, 2
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, -1.0, 0.0, 0.0])]).astype(jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(jnp.float32)
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    A, B = A.astype(jnp.float32), B.astype(jnp.float32)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(BATCH, d)), jnp.float32)
    UB = 3.0

    solve_x = make_batched_lqt_admm(
        A, B, cost, project_u=lambda u: project_bound(u, -UB, UB),
        rho_u=1e-2, n_iters=ITERS,
    )
    x_ref, u_ref = solve_x(x0s)
    jax.block_until_ready(u_ref)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve_x(x0s)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    uscale = float(jnp.max(jnp.abs(u_ref)))
    print(
        f"XLA 6-pass f32     : {dt * 1e3:7.2f} ms  "
        f"{BATCH * ITERS / dt / 1e6:6.1f}M iters/s   (reference)"
    )

    for refresh in (1, 8, 32, ITERS):
        solve_p = make_pallas_lqt_admm(
            A, B, cost, u_lower=-UB, u_upper=UB, rho_u=1e-2,
            n_iters=ITERS, batch_tile=256, refresh_every=refresh,
        )
        x_p, u_p, _, _ = solve_p(x0s)
        jax.block_until_ready(u_p)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = solve_p(x0s)
        jax.block_until_ready(out)
        dtp = (time.perf_counter() - t0) / reps
        err = float(jnp.max(jnp.abs(u_p - u_ref))) / uscale
        viol = float(jnp.maximum(jnp.max(jnp.abs(u_p)) - UB, 0.0))
        label = f"refresh_every={refresh:<3d}"
        print(
            f"Pallas {label}: {dtp * 1e3:7.2f} ms  "
            f"{BATCH * ITERS / dtp / 1e6:6.1f}M iters/s   "
            f"rel err vs XLA {err:.2e}  bound viol {viol:.1e}  "
            f"({dt / dtp:.2f}x XLA)"
        )

    equilibration_check()


if __name__ == "__main__":
    main()
