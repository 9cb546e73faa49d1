"""Fused Pallas blocked Riccati scan (interpret mode on CPU).

Oracle: the sequential scan. On the chip the kernel runs the N=10,000
backward pass in 2.5 ms (33x sequential — benchmarks/RESULTS.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.ops.pallas_riccati import lqt_backward_parallel_pallas
from ilqr_admm_tpu.ops.riccati import lqt_backward


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _problem(rng, N, d=4, m=2):
    A = jnp.asarray(
        np.tile(np.eye(d), (N, 1, 1)) + 0.01 * rng.normal(size=(N, d, d)),
        jnp.float32,
    )
    B = jnp.asarray(0.1 * rng.normal(size=(N, d, m)), jnp.float32)
    Qd = rng.uniform(0.1, 10.0, size=(N, d))
    Q = jnp.asarray(np.stack([np.diag(q) for q in Qd]), jnp.float32)
    xd = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    R = jnp.asarray(np.tile(np.eye(m) * 0.1, (N, 1, 1)), jnp.float32)
    return A, B, Q, xd, R


@pytest.mark.parametrize(
    "N,nb",
    [
        pytest.param(64, 8, marks=pytest.mark.slow),
        pytest.param(50, 8, marks=pytest.mark.slow),
        pytest.param(40, 16, marks=pytest.mark.slow),
    ],
)
def test_pallas_blocked_matches_sequential(rng, N, nb):
    """Including non-divisible N (identity padding) and nb > L."""
    A, B, Q, xd, R = _problem(rng, N)
    g_ref = lqt_backward(A, B, Q, xd, R)
    g_p = lqt_backward_parallel_pallas(A, B, Q, xd, R, nb=nb, interpret=True)
    scale = float(jnp.max(jnp.abs(g_ref.K)))
    assert float(jnp.max(jnp.abs(g_p.K - g_ref.K))) / scale < 5e-5  # f32
    np.testing.assert_allclose(
        np.asarray(g_p.k), np.asarray(g_ref.k), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_p.Quu), np.asarray(g_ref.Quu), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_pallas_blocked_with_regularizers(rng):
    A, B, Q, xd, R = _problem(rng, N=48, d=3, m=2)
    N, d = 48, 3
    m = 2
    Qr = jnp.asarray(np.tile(np.eye(d) * 0.4, (N, 1, 1)), jnp.float32)
    xr = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    Rr = jnp.asarray(np.tile(np.eye(m) * 0.2, (N, 1, 1)), jnp.float32)
    ur = jnp.asarray(rng.normal(size=(N, m)), jnp.float32)
    g_ref = lqt_backward(A, B, Q, xd, R, Qr, xr, Rr, ur)
    g_p = lqt_backward_parallel_pallas(
        A, B, Q, xd, R, Qr, xr, Rr, ur, nb=8, interpret=True
    )
    scale = float(jnp.max(jnp.abs(g_ref.K)))
    assert float(jnp.max(jnp.abs(g_p.K - g_ref.K))) / scale < 1e-5
    np.testing.assert_allclose(
        np.asarray(g_p.k), np.asarray(g_ref.k), atol=1e-4, rtol=1e-4
    )


def test_pallas_blocked_rejects_large_state(rng):
    N, d, m = 16, 6, 2
    A = jnp.asarray(np.tile(np.eye(d), (N, 1, 1)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(N, d, m)) * 0.1, jnp.float32)
    Q = jnp.asarray(np.tile(np.eye(d), (N, 1, 1)), jnp.float32)
    xd = jnp.zeros((N, d), jnp.float32)
    R = jnp.asarray(np.tile(np.eye(m), (N, 1, 1)), jnp.float32)
    with pytest.raises(ValueError, match="d <= 4"):
        lqt_backward_parallel_pallas(A, B, Q, xd, R, interpret=True)
