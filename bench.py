"""Benchmark: ADMM+Riccati iterations/s/chip at horizon N=100.

Primary metric per BASELINE.json: batched constrained LQT-ADMM with the
Riccati-DP x-update (feedforward re-sweep + closed-loop rollout +
projection + dual update per ADMM iteration) on the double integrator at
N=100, batched over instances on one chip.

Baseline: the reference `ADMM_LQT_DP` runs 500 ADMM iterations in 172 ms
single-instance on the author's laptop (BASELINE.md, control-bounds c13)
→ ~2,907 ADMM+Riccati iterations/s. vs_baseline = ours / 2907.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_ITERS_PER_S = 500 / 0.172  # reference ADMM_LQT_DP (BASELINE.md)


def main():
    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.problem import ADMMConfig
    from ilqr_admm_tpu.projections import project_bound
    from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_dp
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    N = 100
    BATCH = 4096
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

    proj_u = lambda u: project_bound(u, -5.0, 5.0)
    # tol=0 → the while_loop always runs the full ADMM_ITERS: a
    # deterministic iteration count for the throughput metric.
    cfg = ADMMConfig(max_iter=ADMM_ITERS, tol=0.0, stall_tol=0.0)

    def solve_one(x0):
        x, u, _aux, info = lqt_admm_dp(
            A, B, cost, x0, project_u=proj_u, rho_u=1e-2, cfg=cfg
        )
        return u, info.iters

    solve_batch = jax.jit(jax.vmap(solve_one))

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0.0, 0.1, size=(BATCH, d)), jnp.float32)

    # warmup / compile
    u, iters = solve_batch(x0s)
    jax.block_until_ready(u)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        u, iters = solve_batch(x0s)
    jax.block_until_ready(u)
    dt = (time.perf_counter() - t0) / reps

    total_iters = BATCH * ADMM_ITERS
    iters_per_s = total_iters / dt

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
