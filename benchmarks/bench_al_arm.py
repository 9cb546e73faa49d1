"""Batched AL-iLQR solves/s on the 3DoF arm with state+control bounds.

Same task as the reference's `ilqr_admm` 3DoF row (639 ms single solve,
BASELINE.md c24: |q_dot| <= 1.5, |u| <= 6, final ee-x in [0.5, 1.0]) —
but solved by the first-class augmented-Lagrangian DP path
(`solvers/al_ilqr.py`), vmapped over a fleet of sampled initial
configurations on one chip. Constraint satisfaction is certified per
instance by `ALResult.max_violation`.

Run: python benchmarks/bench_al_arm.py [batch]
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

from ilqr_admm_tpu.models.arm import PlanarArm
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.parallel.batch import batched_al_solve
from ilqr_admm_tpu.problem import ILQRConfig
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

BASELINE_SOLVES_PER_S = 1.0 / 0.639  # reference ilqr_admm, 3DoF arm


def main(batch=512):
    N = 100
    arm = PlanarArm((1.0, 1.0, 1.0), dt=1.0 / N)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    # moderate weights: the AL penalty supplies the constraint pressure
    x_std, u_std = 1e3, 1e-4
    target = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 1.0, 0.0], jnp.float32)
    w = jnp.asarray([0.0] * n + [x_std] * n + [0.0, x_std, 0.0], jnp.float32)
    zs = jnp.stack([jnp.zeros(d, jnp.float32), target])
    Qs = jnp.stack([jnp.zeros((d, d), jnp.float32), jnp.diag(w)])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, u_std, m)
    get_Cs = lambda xs, us: quad_cost_model(quad.Q, quad.xd, quad.R, xs, us)

    # stagewise bounds: |q_dot| <= 1.5, |u| <= 6; final ee-x in [0.5, 1]
    def ineq(x, u, t):
        dq = x[n : 2 * n]
        ee_x = x[2 * n]
        g = jnp.concatenate([
            dq - 1.5, -dq - 1.5, u - 6.0, -u - 6.0,
            jnp.where(t == N - 1, jnp.asarray([ee_x - 1.0, 0.5 - ee_x]),
                      jnp.asarray([-1.0, -1.0])),
        ])
        return g

    rng = np.random.default_rng(0)
    q0s = jnp.asarray(
        np.array([np.pi / 3, -np.pi / 2, -np.pi / 4]) + rng.normal(0, 0.05, (batch, n)),
        jnp.float32,
    )
    x0s = jax.vmap(arm.initial_state)(q0s)
    u0s = jnp.ones((batch, N, m), jnp.float32)

    def solve(x0s_, u0s_):
        res = batched_al_solve(
            arm.step, arm.get_AB, get_Cs, quad, x0s_, u0s_, ineq=ineq,
            cfg=ILQRConfig(max_iter=8, max_line_search_iter=15),
            n_al=7, mu0=1e2, mu_factor=8.0, tol_con=1e-5,
        )
        return res.cost, res.max_violation, res.u_nom

    solve_j = jax.jit(solve)
    costs, viols, us = solve_j(x0s, u0s)
    jax.block_until_ready(costs)
    print(f"warmup done; mean cost {float(jnp.mean(costs)):.4f}, "
          f"median violation {float(jnp.median(viols)):.2e}, "
          f"max |u| {float(jnp.max(jnp.abs(us))):.3f}")

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        costs, viols, us = solve_j(x0s, u0s)
        jax.block_until_ready(costs)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rate = batch / dt
    print(f"{batch} AL-iLQR arm solves (N=100, state+control bounds) in "
          f"{dt * 1e3:.1f} ms → {rate:.0f} solves/s "
          f"({rate / BASELINE_SOLVES_PER_S:.0f}x reference ilqr_admm)")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    main(batch=batch)
