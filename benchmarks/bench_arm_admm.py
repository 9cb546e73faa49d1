"""Secondary metric: batched iLQR-ADMM solves/s on the 3DoF arm (1 chip).

BASELINE.json: "batched solves/s on 3DoF arm". Reference single-instance
`ilqr_admm` on the 3DoF arm: 639 ms / solve (BASELINE.md) → 1.56
solves/s. Here the FULL constrained solver (outer relinearization loop,
inner ADMM with line search) is vmapped over ≥1024 sampled initial
configurations on one chip.
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

from ilqr_admm_tpu.models.arm import PlanarArm
from ilqr_admm_tpu.ops.rollout import rollout_nonlinear
from ilqr_admm_tpu.solvers.ilqr_admm import ilqr_admm
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

BASELINE_SOLVES_PER_S = 1.0 / 0.639  # reference ilqr_admm, 3DoF arm


def main(batch=1024, method="batch"):
    N = 100
    arm = PlanarArm((1.0, 1.0, 1.0), dt=1.0 / N)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    x_std, u_std = 1e4, 1e-4
    target = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 1.0, 0.0], jnp.float32)
    w = jnp.asarray([0.0] * n + [x_std] * n + [0.0, x_std, 0.0], jnp.float32)
    zs = jnp.stack([jnp.zeros(d, jnp.float32), target])
    Qs = jnp.stack([jnp.zeros((d, d), jnp.float32), jnp.diag(w)])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, u_std, m)

    alphas = (10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=jnp.float32))[:5]

    def proj_u(u):
        return jnp.clip(u, -6.0, 6.0)

    def solve_one(q0):
        x0 = jnp.concatenate([q0, jnp.zeros(n, jnp.float32), arm.fk(q0)])
        u0 = jnp.ones((N, m), jnp.float32)
        x_nom0 = rollout_nonlinear(arm.step, x0, u0)
        res = ilqr_admm(
            arm.step, arm.get_AB, quad, x_nom0, u0,
            quad_cost=quad, project_u=proj_u, rho_u=1e-3,
            max_iter=5, max_admm_iter=10, alphas=alphas, tol=1e-4,
            method=method,
        )
        return res.cost, res.u_nom

    solve = jax.jit(jax.vmap(solve_one))

    rng = np.random.default_rng(0)
    q0s = jnp.asarray(
        np.array([np.pi / 3, -np.pi / 2, -np.pi / 4]) + rng.normal(0, 0.1, (batch, n)),
        jnp.float32,
    )

    costs, us = solve(q0s)
    jax.block_until_ready(costs)
    print(f"warmup done; mean cost {float(jnp.mean(costs)):.4f}, "
          f"max|u| {float(jnp.max(jnp.abs(us))):.3f}")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        costs, us = solve(q0s)
    jax.block_until_ready(costs)
    dt = (time.perf_counter() - t0) / reps
    rate = batch / dt
    print(f"{batch} iLQR-ADMM arm solves in {dt * 1e3:.1f} ms → {rate:.0f} solves/s "
          f"({rate / BASELINE_SOLVES_PER_S:.0f}x reference)")


if __name__ == "__main__":
    import sys
    method = sys.argv[1] if len(sys.argv) > 1 else "batch"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    main(batch=batch, method=method)
