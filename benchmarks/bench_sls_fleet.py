"""Batched robust SLS-ADMM fleet throughput (BASELINE config #4)."""

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
from scipy.stats import norm

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.projections import project_set_convex, project_soc_unit
from ilqr_admm_tpu.solvers.batched_sls import make_batched_sls_admm
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

BASELINE_S = 0.207  # reference ADMM_SLS robust control bounds (BASELINE.md)


def main(batch=1024, n_iters=50):
    N = 100
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    f32 = jnp.float32
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])]).astype(f32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(f32)
    seq = np.zeros(N, dtype=np.int32); seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    A, B = A.astype(f32), B.astype(f32)

    psi_inv = float(norm.ppf(0.95))
    mu = np.array([1.0, 0.0])
    Au = np.diag(np.sqrt([0.0, 0.01]))
    A_hi = jnp.asarray(np.concatenate([Au, (-mu / psi_inv)[None]], 0), f32)
    A_lo = jnp.asarray(np.concatenate([Au, (mu / psi_inv)[None]], 0), f32)

    def soc_proj(y, bound):
        b = jnp.concatenate([jnp.zeros(2, f32), (bound / psi_inv)[None]])
        return project_set_convex(y, [A_hi, A_lo], [b, b],
                                  [project_soc_unit] * 2, rho=1e1,
                                  max_iter=20, threshold=1e-2)

    def proj_u(y, params):
        return jax.vmap(soc_proj)(y, params)

    solve = make_batched_sls_admm(
        A, B, cost, project_u=proj_u, rho_u=1e2, robust_dim=1, n_iters=n_iters
    )
    rng = np.random.default_rng(0)
    # binding scenario bounds: the unconstrained |du| peaks near 4-5, so
    # bounds in [2, 4] keep the chance constraints ACTIVE for every
    # instance (at the old [4, 8] range the projection was a no-op and
    # the benchmark measured an unconstrained solve)
    bounds = jnp.asarray(rng.uniform(2.0, 4.0, batch), f32)  # scenario axis

    du, phi, U = solve(bounds)
    jax.block_until_ready(du)
    # steady-state: pipeline K fleet solves per window (the ~26 ms tunnel
    # dispatch round trip otherwise dominates), best-of windows
    K, reps = 5, 3
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [solve(bounds)[0] for _ in range(K)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / K)
    dt = best
    rate = batch / dt
    print(f"{batch} robust SLS-ADMM syntheses in {dt*1e3:.1f} ms → {rate:.0f} solves/s "
          f"({rate * BASELINE_S:.0f}x reference single-instance rate)")
    # feasibility oracle: worst chance margin across the whole fleet
    margin = jnp.abs(du) + psi_inv * jnp.sqrt(0.01) * jnp.abs(phi[:, :, 0])
    worst = float(jnp.max(margin - bounds[:, None]))
    print(f"worst chance margin {worst:+.4f} (<=0 is feasible; "
          f"bounds active for {float(jnp.mean(jnp.max(margin, 1) > bounds * 0.98)) * 100:.0f}% of fleet)")


if __name__ == "__main__":
    main()
