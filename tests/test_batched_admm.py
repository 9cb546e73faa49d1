"""GEMM-formulated batched ADMM vs the reference-shaped per-instance path."""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.problem import ADMMConfig
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_batch
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def test_batched_matches_per_instance():
    N = 60
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e4])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)

    n_iters = 60
    proj_u_flat = lambda u: project_bound(u, -5.0, 5.0)

    solve = make_batched_lqt_admm(
        A, B, cost, project_u=proj_u_flat, rho_u=1e-2, n_iters=n_iters
    )
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0, 0.15, size=(8, d)))
    xb, ub = solve(x0s)

    cfg = ADMMConfig(max_iter=n_iters, tol=0.0, stall_tol=0.0)  # fixed count
    for i in range(8):
        x_ref, u_ref, _ = lqt_admm_batch(
            A, B, cost, x0s[i], project_u=proj_u_flat, rho_u=1e-2, cfg=cfg
        )
        np.testing.assert_allclose(np.asarray(ub[i]), np.asarray(u_ref), atol=1e-8)
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(x_ref), atol=1e-8)


def test_batched_with_state_projection():
    N = 50
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 1.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.zeros((d, d))])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-4, m)
    A, B = plant.AB(N)

    def proj_x(x):  # (batch, N*d)
        x_ = x.reshape(-1, N, d)
        x_ = x_.at[:, -1, 0].set(0.5)
        x_ = x_.at[:, -1, 1].set(0.0)
        return x_.reshape(-1, N * d)

    def proj_u(u):
        return project_bound(u, -3.0, 3.0)

    rho_x = np.zeros((N, d, d))
    rho_x[-1] = np.eye(d) * 1e1
    solve = make_batched_lqt_admm(
        A, B, cost, project_x=proj_x, project_u=proj_u,
        rho_x=jnp.asarray(rho_x), rho_u=1e-3, n_iters=300,
    )
    x0s = jnp.zeros((4, d))
    xs, us = solve(x0s)
    xs_ = np.asarray(xs).reshape(4, N, d)
    assert np.abs(xs_[:, -1, 0] - 0.5).max() < 2e-2
    assert np.abs(xs_[:, -1, 1]).max() < 2e-2
    assert np.abs(np.asarray(us)).max() <= 3.0 + 1e-2


def test_early_stopping_matches_fixed_count():
    """tol>0 freezes converged instances; hard instances match fixed-count."""
    N = 60
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e4])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)

    proj = lambda u: project_bound(u, -5.0, 5.0)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.normal(0, 0.2, size=(16, d)))

    solve_fixed = make_batched_lqt_admm(A, B, cost, project_u=proj, rho_u=1e-2,
                                        n_iters=200)
    solve_early = make_batched_lqt_admm(A, B, cost, project_u=proj, rho_u=1e-2,
                                        n_iters=200, tol=1e-8)
    xf, uf = solve_fixed(x0s)
    xe, ue = solve_early(x0s)
    # both reach the same optimum (early stop at very tight tol)
    np.testing.assert_allclose(np.asarray(ue), np.asarray(uf), atol=1e-6)

    # loose tol: iterates are feasible-ish and close to the tight solution
    solve_loose = make_batched_lqt_admm(A, B, cost, project_u=proj, rho_u=1e-2,
                                        n_iters=200, tol=1e-3)
    xl, ul = solve_loose(x0s)
    assert float(jnp.max(jnp.abs(ul - uf))) < 0.05
