"""Batched robust SLS-ADMM (shared operators) vs per-instance sls_admm."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.problem import ADMMConfig
from ilqr_admm_tpu.projections import project_set_convex, project_soc_unit
from ilqr_admm_tpu.solvers.batched_sls import make_batched_sls_admm
from ilqr_admm_tpu.solvers.sls_admm import sls_admm
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


@pytest.mark.slow
def test_batched_sls_matches_per_instance():
    N = 40
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-3, m)
    A, B = plant.AB(N)

    psi_inv = float(norm.ppf(0.9))
    mu = np.array([1.0, 0.0])
    Au = np.diag(np.sqrt([0.0, 0.01]))
    A_hi = jnp.asarray(np.concatenate([Au, (-mu / psi_inv)[None]], 0))
    A_lo = jnp.asarray(np.concatenate([Au, (mu / psi_inv)[None]], 0))

    def soc_proj(y, bound):
        b_hi = jnp.concatenate([jnp.zeros(2), (bound / psi_inv)[None]])
        return project_set_convex(
            y, [A_hi, A_lo], [b_hi, b_hi], [project_soc_unit] * 2,
            rho=1e1, max_iter=20, threshold=1e-2,
        )

    bounds = jnp.asarray([3.0, 5.0, 8.0])
    n_iters = 40

    # batched solver: per-instance bound passed as params
    import jax

    def proj_u_batched(y, params):
        return jax.vmap(soc_proj)(y, params)

    solve = make_batched_sls_admm(
        A, B, cost, project_u=proj_u_batched, rho_u=1e1, robust_dim=1,
        n_iters=n_iters,
    )
    du_b, phi_b, U_b = solve(bounds)

    # per-instance reference (fixed iteration count to match)
    for i, bound in enumerate([3.0, 5.0, 8.0]):
        du_i, phi_i, _ = sls_admm(
            A, B, cost,
            project_u=lambda y, b=bound: soc_proj(y, jnp.asarray(b)),
            rho_u=1e1, robust_dim=1,
            cfg=ADMMConfig(max_iter=n_iters, tol=0.0, stall_tol=0.0),
        )
        np.testing.assert_allclose(np.asarray(du_b[i]), np.asarray(du_i), atol=1e-8)
        np.testing.assert_allclose(np.asarray(phi_b[i]), np.asarray(phi_i), atol=1e-8)


def test_batched_sls_early_stop_matches_fixed_count():
    """tol > 0 (per-instance early stopping) lands on the same fixed
    point as the fixed-count schedule, and the frozen iterates satisfy
    the declared residual tolerance."""
    import numpy as np
    from scipy.stats import norm

    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.projections import project_weighted_l1
    from ilqr_admm_tpu.solvers.batched_sls import make_batched_sls_admm
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    N = 30
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    psi = float(norm.ppf(0.95))
    c = psi * 0.1

    def proj_u(y, bounds):
        return project_weighted_l1(y, jnp.asarray([1.0, c]), bounds[:, None])

    kw = dict(project_u=proj_u, rho_u=1.0, robust_dim=1)
    solve_fixed = make_batched_sls_admm(A, B, cost, n_iters=800, **kw)
    solve_stop = make_batched_sls_admm(A, B, cost, n_iters=800, tol=1e-8, **kw)

    rng = np.random.default_rng(0)
    bounds = jnp.asarray(rng.uniform(1.5, 3.0, 8))
    du_f, phi_f, U_f = solve_fixed(bounds)
    du_s, phi_s, U_s = solve_stop(bounds)
    np.testing.assert_allclose(np.asarray(du_s), np.asarray(du_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(U_s), np.asarray(U_f), atol=1e-6)
