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

from ilqr_admm_tpu.ops.pallas_riccati import lqt_backward_parallel_pallas
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

        def _par_f():
            with jax.default_matmul_precision("highest"):
                return lqt_backward_parallel(A, B, Q, xd, R, fast_inverse=True)

        def _blk_f():
            with jax.default_matmul_precision("highest"):
                return lqt_backward_parallel(
                    A, B, Q, xd, R, block_size=128, fast_inverse=True
                )

        seq = jax.jit(_seq)
        g_s = seq()
        jax.block_until_ready(g_s.K)
        kscale = float(jnp.max(jnp.abs(g_s.K)))

        def timeit(fn, reps=10):
            out = fn()
            jax.block_until_ready(out.K)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out.K)
            return (time.perf_counter() - t0) / reps

        t_s = timeit(seq)
        line = f"N={N:>6}: sequential {t_s * 1e3:8.2f} ms"
        def _pallas():
            return lqt_backward_parallel_pallas(A, B, Q, xd, R)

        variants = [
            ("flat", _par), ("flat-fastinv", _par_f),
            ("blk128", _blk), ("blk128-fastinv", _blk_f),
            ("pallas-blk", _pallas),
        ]
        if N >= 10000:
            # the flat scan's log-depth program takes minutes to compile
            # at N=10k and loses badly anyway (968 ms vs 84 ms sequential
            # — RESULTS.md); bench only the blocked variants there
            variants = variants[2:]
        best_t = None
        for name, f in variants:
            fn = jax.jit(f)
            g = fn()
            err = float(jnp.max(jnp.abs(g_s.K - g.K))) / max(kscale, 1e-30)
            t = timeit(fn)
            best_t = t if best_t is None else min(best_t, t)
            line += f" | {name} {t * 1e3:7.2f} ms ({t_s / t:5.2f}x, err {err:.1e})"
        print(line)
        # MFU of the best variant. Useful FLOPs of one parallel backward
        # ~ N combine elements (6 dxd matmuls each: ~12 d^3) + the
        # O(N log(N/L)/L + L) combine tree (~20 d^3 each incl. the d x d
        # solve) + N gain solves (~4 m d^2) — dominated by the N d^3
        # terms; count 32 N d^3 as the useful estimate (exact op mix
        # documented in ops/parallel_riccati.py).
        from mfu import report
        print("        best-variant " +
              report(1.0 / best_t, 32.0 * N * d**3))


if __name__ == "__main__":
    main()
