"""MFU vs problem width for the fused Pallas ADMM kernel (1 chip).

RESULTS.md's speed-of-light analysis claims the kernel is VPU-bound at
Nm = N*u_dim = 100 and that MXU utilization rises naturally with the
GEMM width (MXU work grows ~Nm^2, VPU work ~Nm, and Nm >= 128 fills the
lane tiling). This study measures that curve: the same control-bounded
LQT ADMM at widths Nm in {100, 128, 256, 512} (double integrator, u_dim
chosen to scale width at fixed N=128 where possible), steady-state
pipelined timing, useful-FLOP MFU per point.

Run: python benchmarks/bench_mfu_width.py
"""

import os

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

from mfu import lane_pad, report


def one_width(N, nb_pos, iters=100, batch=8192, tile=None):
    """Double integrator with nb_pos position coordinates: u_dim=nb_pos,
    x_dim=2*nb_pos, width Nm = N*nb_pos."""
    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.ops.pallas_admm import make_pallas_lqt_admm
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    plant = DoubleIntegrator(nb_pos, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    if tile is None:
        # VMEM: the batch tile holds ~5 (tile, Nm) f32 iterates next to
        # the bf16 operator splits; tile*Nm beyond ~256k overflows the
        # 16M scoped budget (measured OOM at 1024x512)
        tile = 1024 if N * m <= 256 else 256
    zs = jnp.stack([jnp.zeros(d), jnp.ones(d).at[m:].set(0.0)]).astype(jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(jnp.float32)
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    solve = make_pallas_lqt_admm(
        A.astype(jnp.float32), B.astype(jnp.float32), cost,
        u_lower=-5.0, u_upper=5.0, rho_u=1e-1, n_iters=iters,
        batch_tile=tile,
    )
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0, 0.1, (batch, d)), jnp.float32)
    u = solve(x0s)[1]
    _ = float(u[0, 0])
    K, best = 30, np.inf
    for _r in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            u = solve(x0s)[1]
        _ = float(u[0, 0])
        best = min(best, (time.perf_counter() - t0) / K)
    rate = batch * iters / best
    Nm = N * m
    line = report(rate, 2.0 * Nm * Nm, issued_factor=3.0,
                  pad_factor=lane_pad(Nm) ** 2)
    print(f"Nm={Nm:4d} (N={N}, m={m}): {rate/1e6:7.1f}M it/s | {line}",
          flush=True)


def main():
    one_width(100, 1)   # the headline shape, Nm=100
    one_width(128, 1)   # exact lane fill, Nm=128
    one_width(128, 2)   # Nm=256
    one_width(128, 4)   # Nm=512


if __name__ == "__main__":
    main()
