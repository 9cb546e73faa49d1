"""Sequential scan vs associative-scan (parallel) Riccati at long horizons.

Both passes trace under HIGHEST matmul precision (true-f32 accuracy:
~5e-6 relative gain error; the TPU's default bf16-pass matmuls produce
~2e-1 error in the dual-element composition).

Time-axis parallelism showcase (SURVEY §2.3): the sequential backward
pass has O(N) dependent steps; the associative scan runs O(log N) rounds
of batched d×d solves. Crossover appears at long horizons / small
batches where the scan's latency dominates.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_admm_tpu.ops.parallel_riccati import lqt_backward_parallel
from ilqr_admm_tpu.ops.riccati import lqt_backward
from ilqr_admm_tpu.utils.cost_assembly import get_double_integrator_AB


def main():
    d, m = 4, 2
    A2, B2 = get_double_integrator_AB(2, 2, dt=0.01)
    for N in [100, 1000, 10000]:
        A = jnp.broadcast_to(A2, (N, d, d)).astype(jnp.float32)
        B = jnp.broadcast_to(B2, (N, d, m)).astype(jnp.float32)
        Q = jnp.broadcast_to(jnp.eye(d) * 1e2, (N, d, d)).astype(jnp.float32)
        xd = jnp.zeros((N, d), jnp.float32).at[-1, 0].set(1.0)
        R = jnp.broadcast_to(jnp.eye(m) * 1e-2, (N, m, m)).astype(jnp.float32)

        def _seq():
            with jax.default_matmul_precision("highest"):
                return lqt_backward(A, B, Q, xd, R)

        def _par():
            with jax.default_matmul_precision("highest"):
                return lqt_backward_parallel(A, B, Q, xd, R)

        def _blk():
            with jax.default_matmul_precision("highest"):
                return lqt_backward_parallel(A, B, Q, xd, R, block_size=128)

        seq = jax.jit(_seq)
        par = jax.jit(_par)
        blk = jax.jit(_blk)
        g_s = seq()
        g_p = par()
        g_b = blk()
        jax.block_until_ready((g_s.K, g_p.K, g_b.K))
        kscale = float(jnp.max(jnp.abs(g_s.K)))
        err = float(jnp.max(jnp.abs(g_s.K - g_p.K))) / max(kscale, 1e-30)
        err_b = float(jnp.max(jnp.abs(g_s.K - g_b.K))) / max(kscale, 1e-30)

        def timeit(fn, reps=10):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out.K)
            return (time.perf_counter() - t0) / reps

        t_s = timeit(seq)
        t_p = timeit(par)
        t_b = timeit(blk)
        print(
            f"N={N:>6}: sequential {t_s * 1e3:8.2f} ms | flat-parallel {t_p * 1e3:8.2f} ms "
            f"({t_s / t_p:5.2f}x, err {err:.1e}) | blocked-128 {t_b * 1e3:8.2f} ms "
            f"({t_s / t_b:5.2f}x, err {err_b:.1e})"
        )


if __name__ == "__main__":
    main()
