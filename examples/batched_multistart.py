"""Batched multi-start / scenario solves sharded over a device mesh.

The scale-out demo (no reference counterpart — the reference is single
process): thousands of independent constrained LQT-ADMM instances solved
in parallel, sharded over the mesh's 'data' axis, with a psum-reduced
success-rate metric. On CPU, set
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to emulate an 8-chip mesh.

Run: python examples/batched_multistart.py [--batch 4096]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.parallel import (
    batched_lqt_admm_dp,
    make_mesh,
    mc_success_rate,
    sharded_instance_solve,
)
from ilqr_admm_tpu.problem import ADMMConfig
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def main(batch=4096):
    N = 100
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch = (batch // n_dev) * n_dev
    print(f"mesh: {n_dev} devices, axis 'data'; batch {batch} instances")

    proj_u = lambda u: project_bound(u, -5.0, 5.0)
    cfg = ADMMConfig(max_iter=100, tol=1e-4)

    def solve_batch(x0s):
        return batched_lqt_admm_dp(A, B, cost, x0s, project_u=proj_u,
                                   rho_u=1e-2, cfg=cfg)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0, 0.2, size=(batch, d)), A.dtype)

    # warmup/compile, then timed run
    xs, us, iters = sharded_instance_solve(solve_batch, mesh, x0s)
    jax.block_until_ready(us)
    t0 = time.perf_counter()
    xs, us, iters = sharded_instance_solve(solve_batch, mesh, x0s)
    jax.block_until_ready(us)
    dt = time.perf_counter() - t0
    print(f"{batch} instances solved in {dt * 1e3:.1f} ms "
          f"→ {batch / dt:.0f} solves/s, "
          f"{float(jnp.sum(iters)) / dt:.0f} ADMM iterations/s")

    def success(us_):
        return (jnp.abs(us_).max(axis=(1,)) <= 5.0 + 1e-2).astype(jnp.float32)

    rate = mc_success_rate(lambda u: success(u), mesh, us)
    print(f"global constraint-satisfaction rate (psum-reduced): {100 * float(rate):.2f} %")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    main(**vars(p.parse_args()))
