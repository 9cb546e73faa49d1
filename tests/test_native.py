"""Native C++ runtime vs JAX implementations (cross-language oracles)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.arm import PlanarArm
from ilqr_admm_tpu import native
from ilqr_admm_tpu.ops.riccati import lqt_backward


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


def test_native_fk_matches_jax(lib, rng):
    arm = PlanarArm((1.0, 0.7, 1.3))
    qs = rng.normal(size=(32, 3))
    out_c = native.planar_fk([1.0, 0.7, 1.3], qs)
    out_j = np.stack([np.asarray(arm.fk(jnp.asarray(q))) for q in qs])
    np.testing.assert_allclose(out_c, out_j, atol=1e-12)


def test_native_jacobian_matches_jax(lib, rng):
    arm = PlanarArm((1.0, 0.7, 1.3))
    qs = rng.normal(size=(16, 3))
    out_c = native.planar_jacobian([1.0, 0.7, 1.3], qs)
    out_j = np.stack([np.asarray(arm.jacobian(jnp.asarray(q))) for q in qs])
    np.testing.assert_allclose(out_c, out_j, atol=1e-12)


def test_native_riccati_matches_jax(lib, rng):
    N, d, m = 25, 3, 2
    A = rng.normal(size=(N, d, d)) * 0.3 + np.eye(d)
    B = rng.normal(size=(N, d, m)) * 0.4
    Qh = rng.normal(size=(N, d, d)) * 0.3
    Q = Qh @ Qh.transpose(0, 2, 1) + 0.1 * np.eye(d)
    xd = rng.normal(size=(N, d))
    Rh = rng.normal(size=(N, m, m)) * 0.3
    R = Rh @ Rh.transpose(0, 2, 1) + 0.5 * np.eye(m)

    K_c, k_c = native.lqt_backward_ref(A, B, Q, xd, R)
    g = lqt_backward(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(Q), jnp.asarray(xd), jnp.asarray(R)
    )
    np.testing.assert_allclose(K_c, np.asarray(g.K), atol=1e-9)
    np.testing.assert_allclose(k_c, np.asarray(g.k), atol=1e-9)
