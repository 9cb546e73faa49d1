"""Benchmark: batched constrained-LQT ADMM iterations/s/chip at N=100.

Primary metric per BASELINE.json: ADMM+Riccati iterations/s/chip at
horizon N=100 — each ADMM iteration solves the regularized LQT subproblem
(the Riccati/lifted x-update), applies the projection z-update and the
dual update. The TPU path uses the fused Pallas
kernel (`ops/pallas_admm.py`): the whole iteration loop runs in one
kernel with iterates resident in VMEM and one bf16x3 MXU GEMM per
iteration, batched over 16k instances on one chip (XLA GEMM fallback:
`solvers/batched.py`).

Baseline: the reference `ADMM_LQT_DP` runs 500 ADMM iterations in 172 ms
single-instance (BASELINE.md, control-bounds c13) → ~2,907 iterations/s.

Prints exactly one JSON line.
"""

import json
import os
import time

# persistent compilation cache: the driver's bench run reuses the
# binaries compiled during development instead of recompiling (~minutes)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_ITERS_PER_S = 500 / 0.172  # reference ADMM_LQT_DP (BASELINE.md)


def main():
    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.projections import project_bound
    from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    N = 100
    BATCH = 16384
    ADMM_ITERS = 100

    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])]).astype(jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(jnp.float32)
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)

    try:
        from ilqr_admm_tpu.ops.pallas_admm import make_pallas_lqt_admm

        solve_p = make_pallas_lqt_admm(
            A, B, cost, u_lower=-5.0, u_upper=5.0,
            rho_u=1e-2, n_iters=ADMM_ITERS, batch_tile=2048,
        )
        solve = lambda x0s: solve_p(x0s)[:2]
    except Exception:
        solve = make_batched_lqt_admm(
            A, B, cost,
            project_u=lambda u: project_bound(u, -5.0, 5.0),
            rho_u=1e-2, n_iters=ADMM_ITERS,
        )

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0.0, 0.1, size=(BATCH, d)), jnp.float32)

    # warmup / compile
    x, u = solve(x0s)
    jax.block_until_ready(u)

    # correctness guard: x-update iterate near the bound after 100 fixed
    # iterations (z-iterate is feasible by construction; full convergence
    # is covered by the test suite)
    assert float(jnp.max(jnp.abs(u))) <= 5.5
    assert bool(jnp.all(jnp.isfinite(u)))

    # steady-state throughput: pipeline K solves per timing window so the
    # host->device dispatch round trip (~26 ms through the axon tunnel —
    # larger than the kernel itself) amortizes away; best-of windows
    # guards against tunnel/device contention spikes.
    K = 20
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [solve(x0s)[1] for _ in range(K)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / K)
    dt = min(times)

    iters_per_s = BATCH * ADMM_ITERS / dt
    print(
        json.dumps(
            {
                "metric": "admm_riccati_iterations_per_s_per_chip_N100",
                "value": round(iters_per_s, 1),
                "unit": "ADMM+Riccati iterations/s",
                "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
