"""Parallel (associative-scan) Riccati vs sequential scan equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.ops.parallel_riccati import lqt_backward_parallel
from ilqr_admm_tpu.ops.riccati import lqt_backward
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def _random_lqt(rng, N=33, d=3, m=2):
    A = jnp.asarray(rng.normal(size=(N, d, d)) * 0.3 + np.eye(d))
    B = jnp.asarray(rng.normal(size=(N, d, m)) * 0.4)
    Qh = rng.normal(size=(N, d, d)) * 0.3
    Q = jnp.asarray(Qh @ Qh.transpose(0, 2, 1) + 0.1 * np.eye(d))
    xd = jnp.asarray(rng.normal(size=(N, d)))
    Rh = rng.normal(size=(N, m, m)) * 0.3
    R = jnp.asarray(Rh @ Rh.transpose(0, 2, 1) + 0.5 * np.eye(m))
    return A, B, Q, xd, R


def test_parallel_matches_sequential(rng):
    A, B, Q, xd, R = _random_lqt(rng)
    g_seq = lqt_backward(A, B, Q, xd, R)
    g_par = lqt_backward_parallel(A, B, Q, xd, R)
    np.testing.assert_allclose(np.asarray(g_par.K), np.asarray(g_seq.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_par.k), np.asarray(g_seq.k), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_par.Quu), np.asarray(g_seq.Quu), atol=1e-8)


def test_parallel_matches_sequential_with_regularizers(rng):
    A, B, Q, xd, R = _random_lqt(rng, N=21)
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    Qr = jnp.asarray(np.tile(np.eye(d) * 0.4, (N, 1, 1)))
    xr = jnp.asarray(rng.normal(size=(N, d)))
    Rr = jnp.asarray(np.tile(np.eye(m) * 0.2, (N, 1, 1)))
    ur = jnp.asarray(rng.normal(size=(N, m)))
    g_seq = lqt_backward(A, B, Q, xd, R, Qr, xr, Rr, ur)
    g_par = lqt_backward_parallel(A, B, Q, xd, R, Qr, xr, Rr, ur)
    np.testing.assert_allclose(np.asarray(g_par.K), np.asarray(g_seq.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_par.k), np.asarray(g_seq.k), atol=1e-8)


def test_parallel_on_benchmark_problem():
    N = 100
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d = plant.x_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e6])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, plant.u_dim)
    A, B = plant.AB(N)
    g_seq = lqt_backward(A, B, cost.Q, cost.xd, cost.R)
    g_par = lqt_backward_parallel(A, B, cost.Q, cost.xd, cost.R)
    np.testing.assert_allclose(
        np.asarray(g_par.K), np.asarray(g_seq.K), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_par.k), np.asarray(g_seq.k), rtol=1e-6, atol=1e-6
    )


def test_parallel_rollout_matches_sequential(rng):
    from ilqr_admm_tpu.ops.parallel_riccati import rollout_closed_loop_parallel
    from ilqr_admm_tpu.ops.rollout import rollout_closed_loop

    A, B, Q, xd, R = _random_lqt(rng, N=17)
    g = lqt_backward(A, B, Q, xd, R)
    x0 = jnp.asarray(rng.normal(size=A.shape[-1]))

    A_np, B_np = np.asarray(A), np.asarray(B)

    def lin_f(x, u):
        # time-varying handled by closing over index is not possible in the
        # scan helper; emulate with per-step (A, B) through a scan instead
        raise NotImplementedError

    # sequential oracle computed directly
    xs_ref = [np.asarray(x0)]
    us_ref = []
    Kn, kn = np.asarray(g.K), np.asarray(g.k)
    for t in range(A.shape[0] - 1):
        u = Kn[t] @ xs_ref[-1] + kn[t]
        us_ref.append(u)
        xs_ref.append(A_np[t] @ xs_ref[-1] + B_np[t] @ u)
    us_ref.append(Kn[-1] @ xs_ref[-1] + kn[-1])
    xs_ref = np.stack(xs_ref)
    us_ref = np.stack(us_ref)

    xs, us = rollout_closed_loop_parallel(A, B, g.K, g.k, x0)
    np.testing.assert_allclose(np.asarray(xs), xs_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(us), us_ref, atol=1e-9)


@pytest.mark.parametrize("block_size", [4, 8, 16, 33])
def test_blocked_matches_sequential(rng, block_size):
    """Two-level blocked suffix scan == sequential oracle, including
    non-divisible N (identity-element padding) and block >= N."""
    A, B, Q, xd, R = _random_lqt(rng)  # N=33
    g_seq = lqt_backward(A, B, Q, xd, R)
    g_blk = lqt_backward_parallel(A, B, Q, xd, R, block_size=block_size)
    np.testing.assert_allclose(np.asarray(g_blk.K), np.asarray(g_seq.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_blk.k), np.asarray(g_seq.k), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_blk.Quu), np.asarray(g_seq.Quu), atol=1e-8)


def test_blocked_with_regularizers(rng):
    A, B, Q, xd, R = _random_lqt(rng, N=21)
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    Qr = jnp.asarray(np.tile(np.eye(d) * 0.4, (N, 1, 1)))
    xr = jnp.asarray(rng.normal(size=(N, d)))
    Rr = jnp.asarray(np.tile(np.eye(m) * 0.2, (N, 1, 1)))
    ur = jnp.asarray(rng.normal(size=(N, m)))
    g_seq = lqt_backward(A, B, Q, xd, R, Qr, xr, Rr, ur)
    g_blk = lqt_backward_parallel(A, B, Q, xd, R, Qr, xr, Rr, ur, block_size=5)
    np.testing.assert_allclose(np.asarray(g_blk.K), np.asarray(g_seq.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_blk.k), np.asarray(g_seq.k), atol=1e-8)


def test_inv_small_matches_linalg(rng):
    """Closed-form adjugate inverse == LU for trailing dims 1..4."""
    from ilqr_admm_tpu.ops.parallel_riccati import inv_small

    for d in (1, 2, 3, 4):
        M = jnp.asarray(rng.normal(size=(17, d, d)))
        M = M @ jnp.swapaxes(M, -1, -2) + jnp.eye(d) * 0.5  # well-posed
        X = inv_small(M)
        np.testing.assert_allclose(
            np.asarray(X), np.linalg.inv(np.asarray(M)), atol=1e-10, rtol=1e-8
        )
    with pytest.raises(ValueError):
        inv_small(jnp.eye(5))


@pytest.mark.parametrize("block_size", [None, 8])
def test_fast_inverse_matches_lu(rng, block_size):
    """fast_inverse=True (adjugate combine) matches the LU scan on a
    moderately-weighted problem, flat and blocked."""
    A, B, Q, xd, R = _random_lqt(rng)
    g_lu = lqt_backward_parallel(A, B, Q, xd, R, block_size=block_size)
    g_fast = lqt_backward_parallel(
        A, B, Q, xd, R, block_size=block_size, fast_inverse=True
    )
    np.testing.assert_allclose(np.asarray(g_fast.K), np.asarray(g_lu.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_fast.k), np.asarray(g_lu.k), atol=1e-8)


def test_fast_inverse_rejects_large_state(rng):
    """fast_inverse names itself in the d>4 error instead of failing
    three layers down inside inv_small."""
    N, d, m = 12, 6, 2
    A = jnp.asarray(np.tile(np.eye(d), (N, 1, 1)))
    B = jnp.asarray(rng.normal(size=(N, d, m)) * 0.1)
    Q = jnp.asarray(np.tile(np.eye(d), (N, 1, 1)))
    xd = jnp.zeros((N, d))
    R = jnp.asarray(np.tile(np.eye(m), (N, 1, 1)))
    with pytest.raises(ValueError, match="fast_inverse"):
        lqt_backward_parallel(A, B, Q, xd, R, fast_inverse=True)
    # LU path still fine at d=6
    g = lqt_backward_parallel(A, B, Q, xd, R)
    assert np.all(np.isfinite(np.asarray(g.K)))


class TestILQRBackwardParallel:
    """`ilqr_backward_parallel`: general quadratic model + cross terms."""

    def _rand_problem(self, rng, N=37, d=3, m=2, cross=True):
        A = jnp.asarray(np.eye(d) + 0.05 * rng.normal(size=(N, d, d)))
        B = jnp.asarray(0.1 * rng.normal(size=(N, d, m)))
        Cts = np.zeros((N, d + m, d + m))
        for t in range(N):
            Mx = rng.normal(size=(d, d))
            Cts[t, :d, :d] = Mx @ Mx.T * 0.1
            Mu = rng.normal(size=(m, m))
            Cts[t, d:, d:] = Mu @ Mu.T + 2 * np.eye(m)
            if cross:
                Cts[t, d:, :d] = 0.3 * rng.normal(size=(m, d))
                Cts[t, :d, d:] = Cts[t, d:, :d].T
        cts = jnp.asarray(rng.normal(size=(N, d + m)))
        return A, B, jnp.asarray(Cts), cts

    def test_matches_sequential_with_cross_terms(self, rng):
        from ilqr_admm_tpu.ops.parallel_riccati import ilqr_backward_parallel
        from ilqr_admm_tpu.ops.riccati import ilqr_backward

        A, B, Cts, cts = self._rand_problem(rng)
        K1, k1 = ilqr_backward(A, B, Cts, cts)
        for bs in (None, 8):
            K2, k2 = ilqr_backward_parallel(A, B, Cts, cts, block_size=bs)
            np.testing.assert_allclose(np.asarray(K2), np.asarray(K1), atol=1e-10)
            np.testing.assert_allclose(np.asarray(k2), np.asarray(k1), atol=1e-10)
        K3, k3 = ilqr_backward_parallel(A, B, Cts, cts, fast_inverse=True)
        np.testing.assert_allclose(np.asarray(K3), np.asarray(K1), atol=1e-8)
        np.testing.assert_allclose(np.asarray(k3), np.asarray(k1), atol=1e-8)

    @pytest.mark.slow
    def test_ilqr_solve_riccati_parallel(self):
        # whole-solver agreement on the car parking problem
        from ilqr_admm_tpu.models.car import CarFrontWheel, CarParkingCost
        from ilqr_admm_tpu.problem import ILQRConfig
        from ilqr_admm_tpu.solvers.ilqr import ilqr_init, ilqr_solve

        N = 100
        car = CarFrontWheel(dt=15.0 / N)
        cost = CarParkingCost()
        rng = np.random.default_rng(1)
        u0 = jnp.asarray(rng.normal(size=(N, 2)) * 0.1)
        x0 = jnp.asarray([1.0, 1.0, 3.0 * np.pi / 2, 0.0])
        st0 = ilqr_init(car.step, cost, x0, u0)
        cfg = ILQRConfig(max_iter=30, tol_fun=1e-9)
        out_seq = ilqr_solve(car.step, car.get_AB, cost.get_Cs, cost, st0, cfg=cfg)
        out_par = ilqr_solve(
            car.step, car.get_AB, cost.get_Cs, cost, st0, cfg=cfg,
            riccati="parallel",
        )
        assert abs(float(out_par.cost) - float(out_seq.cost)) < 1e-6 * max(
            1.0, abs(float(out_seq.cost))
        )
