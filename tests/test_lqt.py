"""LQT solver equivalence and golden-number tests.

Oracles (SURVEY §4):
- batch-vs-dp-vs-sls cross-solver agreement on the same problem;
- golden values recorded in the reference notebooks (deterministic
  setups): final position ≈ 1 for the control-bounds double integrator.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.problem import QuadCost
from ilqr_admm_tpu.solvers.lqt import (
    lqt_solve_batch,
    lqt_solve_dp,
    lqt_solve_sls,
    sls_controller,
)
from ilqr_admm_tpu.ops.rollout import rollout_closed_loop
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def make_di_problem(x_dim=1, N=100, u_std=1e-2, x_std=1e6, target=(1.0, 0.0), **_kw):
    """The double-integrator control-bounds notebook setup (cells 3-6)."""
    plant = DoubleIntegrator(x_dim, 2, dt=1.0 / N)
    d = plant.x_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray(target, jnp.float64)])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * x_std])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, u_std, plant.u_dim)
    A, B = plant.AB(N)
    return plant, A, B, cost


def test_batch_reaches_target():
    plant, A, B, cost = make_di_problem()
    x0 = jnp.zeros(plant.x_dim)
    xs, us = lqt_solve_batch(A, B, cost, x0)
    assert abs(float(xs[-1, 0]) - 1.0) < 1e-3  # last position ~ target
    assert abs(float(xs[-1, 1])) < 1e-2  # last velocity ~ 0


def test_batch_dp_sls_agree():
    plant, A, B, cost = make_di_problem(x_std=1e3, u_std=1e-3)
    d = plant.x_dim
    x0 = jnp.asarray([0.3, -0.2])

    xs_b, us_b = lqt_solve_batch(A, B, cost, x0)

    gains = lqt_solve_dp(A, B, cost)

    def lin_f(x, u):
        return plant.A @ x + plant.B @ u

    xs_d, us_d = rollout_closed_loop(lin_f, x0, gains.K, gains.k)

    np.testing.assert_allclose(np.asarray(xs_b), np.asarray(xs_d), atol=1e-8)
    np.testing.assert_allclose(np.asarray(us_b), np.asarray(us_d), atol=1e-8)

    # SLS: u = PHI_U[:, :d] x0 + du must reproduce the same open-loop optimum
    PHI_U, du = lqt_solve_sls(A, B, cost)
    u_sls = (PHI_U[:, :d] @ x0 + du).reshape(-1, plant.u_dim)
    np.testing.assert_allclose(np.asarray(u_sls), np.asarray(us_b), atol=1e-8)


def test_sls_controller_consistency():
    """controller() gains rolled out = the SLS response prediction."""
    plant, A, B, cost = make_di_problem(x_std=1e3, u_std=1e-3)
    d = plant.x_dim
    PHI_U, du = lqt_solve_sls(A, B, cost)
    K, k = sls_controller(A, B, PHI_U, du)

    from ilqr_admm_tpu.ops.rollout import rollout_sls

    x0 = jnp.asarray([0.15, 0.1])

    def lin_f(x, u):
        return plant.A @ x + plant.B @ u

    xs, us = rollout_sls(lin_f, x0, K, k, d, plant.u_dim)
    u_pred = (PHI_U[:, :d] @ x0 + du).reshape(-1, plant.u_dim)
    np.testing.assert_allclose(np.asarray(us), np.asarray(u_pred), atol=1e-6)


def test_dp_with_regularizer_matches_augmented_cost():
    """solve_dp with (Qr, xr) equals solve_dp on the explicitly augmented cost."""
    plant, A, B, cost = make_di_problem(x_std=1e2, u_std=1e-2)
    N, d, m = cost.N, plant.x_dim, plant.u_dim
    rng = np.random.default_rng(1)
    Qr = jnp.asarray(np.tile(np.eye(d) * 0.7, (N, 1, 1)))
    xr = jnp.asarray(rng.normal(size=(N, d)))
    Rr = jnp.asarray(np.tile(np.eye(m) * 0.3, (N, 1, 1)))
    ur = jnp.asarray(rng.normal(size=(N, m)))

    gains_reg = lqt_solve_dp(A, B, cost, Qr=Qr, xr=xr, Rr=Rr, ur=ur)

    # Augmented quadratic: (Q + Qr) with target solving (Q+Qr) xd' = Q xd + Qr xr
    # plus R' = R + Rr with target ur — compare via the batch solution of the
    # augmented objective including the linear terms.
    def lin_f(x, u):
        return plant.A @ x + plant.B @ u

    x0 = jnp.zeros(d)
    xs, us = rollout_closed_loop(lin_f, x0, gains_reg.K, gains_reg.k)

    # Finite-difference optimality check of the augmented objective:
    def aug_cost(us_flat):
        us_ = us_flat.reshape(N, m)
        from ilqr_admm_tpu.ops.rollout import rollout_linear

        xs_ = rollout_linear(A, B, x0, us_)
        c = cost(xs_, us_)
        c = c + jnp.einsum("ti,tij,tj->", xs_ - xr, Qr, xs_ - xr)
        c = c + jnp.einsum("ti,tij,tj->", us_ - ur, Rr, us_ - ur)
        return c

    g = jax.grad(aug_cost)(us.reshape(-1))
    # gradient w.r.t. u_{N-1} is not zero-forced by DP (final gains are 0),
    # so check all but the final step
    assert float(jnp.max(jnp.abs(g[: (N - 1) * m]))) < 1e-6


def test_causal_trailing_solve_oracle(rng):
    """Reversed-Cholesky trailing solves vs direct per-submatrix NumPy solves."""
    from ilqr_admm_tpu.ops.sls_synthesis import (
        causal_cholesky_factors,
        causal_trailing_solve,
    )

    M = 24
    H = rng.normal(size=(M, M))
    S = jnp.asarray(H @ H.T + M * np.eye(M))
    rhs = jnp.asarray(rng.normal(size=(5, M, 2)))
    starts = jnp.asarray([0, 3, 7, 12, 23], dtype=jnp.int32)

    Lr = causal_cholesky_factors(S)
    out = np.asarray(causal_trailing_solve(Lr, rhs, starts))

    S_np = np.asarray(S)
    for i, s in enumerate([0, 3, 7, 12, 23]):
        expected = np.zeros((M, 2))
        expected[s:] = np.linalg.solve(S_np[s:, s:], np.asarray(rhs)[i, s:])
        np.testing.assert_allclose(out[i], expected, atol=1e-10)
        np.testing.assert_allclose(out[i, :s], 0.0)


@pytest.mark.slow
def test_vmapped_sls_admm():
    """Robust synthesis vmaps over problem instances (scenario fleets)."""
    from ilqr_admm_tpu.problem import ADMMConfig
    from ilqr_admm_tpu.projections import project_soc_unit, project_set_convex
    from ilqr_admm_tpu.solvers.sls_admm import sls_admm
    from scipy.stats import norm

    plant, A, B, cost = make_di_problem(x_std=1e3, u_std=1e-3, N=40)
    N = 40
    psi_inv = float(norm.ppf(0.9))
    mu = np.array([1.0, 0.0])
    Au = np.diag(np.sqrt([0.0, 0.01]))
    A_hi = jnp.asarray(np.concatenate([Au, (-mu / psi_inv)[None]], 0))
    A_lo = jnp.asarray(np.concatenate([Au, (mu / psi_inv)[None]], 0))

    def solve_one(bound):
        b_hi = jnp.concatenate([jnp.zeros(2), (bound / psi_inv)[None]])
        b_lo = jnp.concatenate([jnp.zeros(2), (bound / psi_inv)[None]])

        def proj_u(y):
            return project_set_convex(
                y, [A_hi, A_lo], [b_hi, b_lo], [project_soc_unit] * 2,
                rho=1e1, max_iter=20, threshold=1e-2,
            )

        du, phi, info = sls_admm(
            A, B, cost, project_u=proj_u, rho_u=1e1, robust_dim=1,
            cfg=ADMMConfig(max_iter=30, tol=1e-3, stall_tol=1e-2),
        )
        return du, phi

    bounds = jnp.asarray([3.0, 5.0, 8.0])
    dus, phis = jax.vmap(solve_one)(bounds)
    assert dus.shape == (3, N)
    # tighter bound -> smaller feedforward peak
    assert float(jnp.max(jnp.abs(dus[0]))) <= float(jnp.max(jnp.abs(dus[2]))) + 1e-6


@pytest.mark.slow
def test_dense_cross_time_cost():
    """Batch/SLS with a cost correlating different timesteps (smoothness).

    Oracle: gradient of the full objective vanishes at the returned u.
    """
    from ilqr_admm_tpu.ops.rollout import rollout_linear
    from ilqr_admm_tpu.solvers.lqt import lqt_solve_batch_full, lqt_solve_sls_full

    N = 30
    plant, A, B, cost = make_di_problem(N=N, x_std=1e2, u_std=1e-2)
    d, m = plant.x_dim, plant.u_dim

    # add a first-difference smoothness penalty coupling consecutive steps
    D = np.zeros((N * d, N * d))
    for t in range(N - 1):
        D[t * d : (t + 1) * d, t * d : (t + 1) * d] = np.eye(d)
        D[t * d : (t + 1) * d, (t + 1) * d : (t + 2) * d] = -np.eye(d)
    Q_full = np.asarray(cost.lifted_Q()) + 5.0 * D.T @ D
    xd_full = np.asarray(cost.lifted_xd())
    R_full = np.asarray(cost.lifted_R())
    # consistent target shift: keep the same linear term Q_lift @ xd by
    # solving Q_full xd' = Q_lift xd (Q_full is PD here)
    xd_full = np.linalg.solve(Q_full, np.asarray(cost.lifted_Q()) @ xd_full)

    x0 = jnp.asarray([0.2, -0.1])
    xs, us = lqt_solve_batch_full(
        A, B, jnp.asarray(Q_full), jnp.asarray(xd_full), jnp.asarray(R_full), x0
    )

    def objective(u_flat):
        us_ = u_flat.reshape(N, m)
        xs_ = rollout_linear(A, B, x0, us_).reshape(-1)
        dx = xs_ - jnp.asarray(xd_full)
        return dx @ jnp.asarray(Q_full) @ dx + u_flat @ jnp.asarray(R_full) @ u_flat

    g = jax.grad(objective)(jnp.asarray(us).reshape(-1))
    assert float(jnp.max(jnp.abs(g))) < 1e-7

    # SLS with the same dense cost: x0-response reproduces the batch optimum
    PHI_U, du = lqt_solve_sls_full(
        A, B, jnp.asarray(Q_full), jnp.asarray(xd_full), jnp.asarray(R_full)
    )
    u_sls = (PHI_U[:, :d] @ x0 + du).reshape(N, m)
    np.testing.assert_allclose(np.asarray(u_sls), np.asarray(us), atol=1e-8)


def test_batch_qr_matches_cholesky():
    """use_qr=True solves the identical problem (x64, moderate weights)."""
    plant, A, B, cost = make_di_problem(x_std=1e3, u_std=1e-2)
    x0 = jnp.asarray([0.3, -0.2])
    xs_c, us_c = lqt_solve_batch(A, B, cost, x0)
    xs_q, us_q = lqt_solve_batch(A, B, cost, x0, use_qr=True)
    np.testing.assert_allclose(np.asarray(us_q), np.asarray(us_c), atol=1e-8)
    np.testing.assert_allclose(np.asarray(xs_q), np.asarray(xs_c), atol=1e-8)


def test_batch_qr_stiff_f32():
    """Square-root lifted solve keeps stiff via-point weights accurate in
    f32, where the normal-equation Cholesky (cond^2) loses most digits —
    the 'sqrt form of the lifted solves' ROADMAP item."""
    plant, A, B, cost = make_di_problem(x_std=1e6, u_std=1e-3)
    x0 = jnp.asarray([0.3, -0.2])
    # f64 truth (conftest enables x64)
    us_true = np.asarray(lqt_solve_batch(A, B, cost, x0)[1])

    f32 = jnp.float32
    A32, B32 = A.astype(f32), B.astype(f32)
    cost32 = cost.__class__(
        Q=cost.Q.astype(f32), xd=cost.xd.astype(f32), R=cost.R.astype(f32)
    )
    x032 = x0.astype(f32)
    us_chol = np.asarray(lqt_solve_batch(A32, B32, cost32, x032)[1])
    us_qr = np.asarray(lqt_solve_batch(A32, B32, cost32, x032, use_qr=True)[1])

    scale = np.max(np.abs(us_true))
    err_chol = np.max(np.abs(us_chol - us_true)) / scale
    err_qr = np.max(np.abs(us_qr - us_true)) / scale
    assert err_qr < 1e-3, err_qr
    assert err_qr < err_chol, (err_qr, err_chol)


def test_time_parallel_validation():
    """Degenerate time_parallel values are rejected loudly (True would
    silently mean block_size=1 — N sequential combines, strictly worse
    than the sequential scan)."""
    plant, A, B, cost = make_di_problem(N=20, x_std=1e2)
    for bad in (True, 0, -4, 1, 2.5):
        with pytest.raises((ValueError, TypeError)):
            lqt_solve_dp(A, B, cost, time_parallel=bad)
    # valid values still work
    g = lqt_solve_dp(A, B, cost, time_parallel=8)
    g_f = lqt_solve_dp(A, B, cost, time_parallel="flat")
    g_s = lqt_solve_dp(A, B, cost)
    np.testing.assert_allclose(np.asarray(g.K), np.asarray(g_s.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_f.K), np.asarray(g_s.K), atol=1e-8)


def test_facade_auto_use_qr_selection():
    """_auto_use_qr: stiffness cached at set_quadratic_cost; selection =
    stiff cost AND f32 (the f32 branch is otherwise dead under the x64
    test suite)."""
    from ilqr_admm_tpu import SLS

    N = 20
    plant, A, B, cost = make_di_problem(N=N, x_std=1e6, u_std=1e-3)
    s = SLS(plant.x_dim, plant.u_dim, N)
    s.AB = plant.AB(N)
    zs = np.stack([np.zeros(plant.x_dim), np.array([1.0, 0.0])])
    Qs = np.stack([np.zeros((2, 2)), np.eye(2) * 1e6])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    s.set_quadratic_cost(zs, Qs, seq, 1e-3)
    assert s._stiffness is not None and s._stiffness > 1e5
    # under x64 (test suite) the QR switch stays off...
    assert jax.config.jax_enable_x64
    assert s._auto_use_qr() is False
    # ...and turns on for the same stiffness under f32
    try:
        jax.config.update("jax_enable_x64", False)
        assert s._auto_use_qr() is True
    finally:
        jax.config.update("jax_enable_x64", True)
    # mild cost -> off regardless
    s2 = SLS(plant.x_dim, plant.u_dim, N)
    s2.AB = plant.AB(N)
    s2.set_quadratic_cost(zs, np.stack([np.zeros((2, 2)), np.eye(2)]), seq, 1e-1)
    try:
        jax.config.update("jax_enable_x64", False)
        assert s2._auto_use_qr() is False
    finally:
        jax.config.update("jax_enable_x64", True)
