"""Batched boxDDP solves/s on the control-limited car-parking task (1 chip).

Reference headline for this problem: `ilqr_admm` on the car with control
bounds runs 17.4 s for ONE solve (BASELINE.md, DDP-replicate c21; the
reference has no first-class boxDDP at all — Tassa's original MATLAB
reports ~seconds too). Here the full boxDDP solve (box-QP backward pass
inside the Riccati scan + clipped parallel line search) is vmapped over
a fleet of perturbed initial states on one chip.

Run: python benchmarks/bench_boxddp.py [batch] [max_iter]
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

from ilqr_admm_tpu.models.car import CarFrontWheel, CarParkingCost
from ilqr_admm_tpu.problem import ILQRConfig
from ilqr_admm_tpu.solvers.boxddp import boxddp_init, boxddp_solve

BASELINE_SOLVES_PER_S = 1.0 / 17.4  # reference ilqr_admm, car control bounds


def main(batch=256, max_iter=60, qp_iters=8):
    N = 500
    car = CarFrontWheel(dt=15.0 / N)
    cost = CarParkingCost()
    lo = jnp.asarray([-0.5, -2.0], jnp.float32)
    hi = jnp.asarray([0.5, 2.0], jnp.float32)
    cfg = ILQRConfig(max_iter=max_iter, tol_fun=1e-6)

    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.normal(size=(N, 2)) * 0.1, jnp.float32)

    def solve_one(x0):
        st0 = boxddp_init(car.step, cost, x0, u0, lo, hi)
        out = boxddp_solve(
            car.step, car.get_AB, cost.get_Cs, cost, st0,
            u_lower=lo, u_upper=hi, cfg=cfg, qp_iters=qp_iters,
        )
        return out.cost, out.u_nom

    solve = jax.jit(jax.vmap(solve_one))
    x0s = jnp.asarray(
        np.array([1.0, 1.0, 3.0 * np.pi / 2, 0.0])
        + rng.normal(0, 0.05, (batch, 4)),
        jnp.float32,
    )

    costs, us = solve(x0s)
    jax.block_until_ready(costs)
    viol = float(jnp.max(jnp.abs(us / jnp.asarray([0.5, 2.0]))))
    print(f"warmup done; mean cost {float(jnp.mean(costs)):.4f} "
          f"(single-instance golden 1.905), max|u|/bound {viol:.6f}")
    assert viol <= 1.0 + 1e-5

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        costs, us = solve(x0s)
        jax.block_until_ready(costs)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rate = batch / dt
    print(f"{batch} boxDDP car solves (N=500, {max_iter} iters) in "
          f"{dt * 1e3:.1f} ms → {rate:.1f} solves/s "
          f"({rate / BASELINE_SOLVES_PER_S:.0f}x reference ilqr_admm)")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    main(batch=batch, max_iter=max_iter)
