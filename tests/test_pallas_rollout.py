"""Fused Pallas line-search rollout vs the vmapped-scan oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.car import CarFrontWheel
from ilqr_admm_tpu.ops.pallas_rollout import (
    linesearch_rollout_xla,
    make_pallas_linesearch_rollout,
)


@pytest.fixture
def rng():
    return np.random.default_rng(2)


def test_matches_vmapped_scan(rng):
    N, A = 60, 20
    car = CarFrontWheel(dt=15.0 / N)
    x0 = jnp.asarray([1.0, 1.0, 3.0 * np.pi / 2, 0.0], jnp.float32)
    delta = jnp.asarray(rng.normal(size=(N, 2)) * 0.2, jnp.float32)
    alphas = (10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=jnp.float32))[:A]
    u_cands = alphas[:, None, None] * delta[None]

    roll = make_pallas_linesearch_rollout(
        car.step_cols, N, 4, 2, A, interpret=True
    )
    xs_k = roll(x0, u_cands)
    xs_o = linesearch_rollout_xla(car.step, x0, u_cands.astype(jnp.float32))
    assert xs_k.shape == (A, N, 4)
    np.testing.assert_allclose(
        np.asarray(xs_k), np.asarray(xs_o), rtol=0, atol=1e-6
    )
    # first state is x0 for every candidate
    np.testing.assert_allclose(
        np.asarray(xs_k[:, 0]), np.tile(np.asarray(x0), (A, 1)), atol=0
    )


def test_rejects_oversized_problems():
    car = CarFrontWheel()
    with pytest.raises(ValueError, match="lane block"):
        make_pallas_linesearch_rollout(car.step_cols, 10, 4, 2, 129)
    with pytest.raises(ValueError, match="sublane"):
        make_pallas_linesearch_rollout(car.step_cols, 10, 9, 2, 8)
    with pytest.raises(ValueError, match="VMEM"):
        make_pallas_linesearch_rollout(car.step_cols, 3000, 4, 2, 8)


def test_asin_newton_accuracy(rng):
    from ilqr_admm_tpu.ops.pallas_rollout import asin_newton

    z = jnp.asarray(rng.uniform(-0.9, 0.9, size=512), jnp.float32)
    err = np.abs(np.asarray(asin_newton(z)) - np.arcsin(np.asarray(z)))
    assert err.max() < 5e-7, err.max()


def test_matches_with_asin_newton(rng):
    """The Mosaic-safe asin substitution stays within f32 noise of the
    jnp.arcsin rollout over the whole horizon."""
    import functools

    N, A = 60, 20
    car = CarFrontWheel(dt=15.0 / N)
    from ilqr_admm_tpu.ops.pallas_rollout import asin_newton

    x0 = jnp.asarray([1.0, 1.0, 3.0 * np.pi / 2, 0.0], jnp.float32)
    delta = jnp.asarray(rng.normal(size=(N, 2)) * 0.2, jnp.float32)
    alphas = (10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=jnp.float32))[:A]
    u_cands = alphas[:, None, None] * delta[None]

    roll = make_pallas_linesearch_rollout(
        functools.partial(car.step_cols, _asin=asin_newton), N, 4, 2, A,
        interpret=True,
    )
    xs_k = roll(x0, u_cands)
    xs_o = linesearch_rollout_xla(car.step, x0, u_cands)
    np.testing.assert_allclose(
        np.asarray(xs_k), np.asarray(xs_o), rtol=0, atol=1e-5
    )
