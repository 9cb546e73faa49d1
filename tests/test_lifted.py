"""Lifted-operator construction and matrix-free applies.

Oracle: independent NumPy construction of Sw/Su from the definition
(block (i, j) of Sw is the state-transition product A_{i-1}···A_j).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.ops.lifted import (
    build_Su,
    build_Sw,
    build_Sx,
    su_apply,
    su_t_apply,
    sw_x0,
)


def _numpy_lifted(A, B):
    """Direct O(N^2) construction from the definition."""
    N, d, _ = A.shape
    m = B.shape[-1]
    Sw = np.zeros((N * d, N * d))
    Su = np.zeros((N * d, N * m))
    for i in range(N):
        for j in range(i + 1):
            P = np.eye(d)
            for t in range(j, i):
                P = A[t] @ P
            Sw[i * d : (i + 1) * d, j * d : (j + 1) * d] = P
        for j in range(i):
            P = np.eye(d)
            for t in range(j + 1, i):
                P = A[t] @ P
            Su[i * d : (i + 1) * d, j * m : (j + 1) * m] = P @ B[j]
    return Sw, Su


@pytest.fixture
def sys(rng):
    N, d, m = 7, 3, 2
    A = rng.normal(size=(N, d, d)) * 0.4 + np.eye(d)
    B = rng.normal(size=(N, d, m)) * 0.3
    return jnp.asarray(A), jnp.asarray(B)


def test_dense_builders_match_definition(sys):
    A, B = sys
    Sw_ref, Su_ref = _numpy_lifted(np.asarray(A), np.asarray(B))
    np.testing.assert_allclose(build_Sw(A), Sw_ref, atol=1e-12)
    np.testing.assert_allclose(build_Su(A, B), Su_ref, atol=1e-12)


def test_matrix_free_applies(sys, rng):
    A, B = sys
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    Sw = np.asarray(build_Sw(A))
    Su = np.asarray(build_Su(A, B))

    x0 = rng.normal(size=d)
    np.testing.assert_allclose(
        np.asarray(sw_x0(A, jnp.asarray(x0))).reshape(-1), Sw[:, :d] @ x0, atol=1e-12
    )

    us = rng.normal(size=(N, m))
    np.testing.assert_allclose(
        np.asarray(su_apply(A, B, jnp.asarray(us))).reshape(-1),
        Su @ us.reshape(-1),
        atol=1e-12,
    )

    vs = rng.normal(size=(N, d))
    np.testing.assert_allclose(
        np.asarray(su_t_apply(A, B, jnp.asarray(vs))).reshape(-1),
        Su.T @ vs.reshape(-1),
        atol=1e-12,
    )


def test_build_Sx_is_Sw_prefix(sys):
    A, _ = sys
    d = A.shape[-1]
    Sw = np.asarray(build_Sw(A))
    Sx = np.asarray(build_Sx(A, 2)).reshape(-1, 2)
    np.testing.assert_allclose(Sx, Sw[:, :2], atol=1e-12)


def test_build_su_blocked_matches_sequential(rng):
    """Two-level blocked build_Su == the sequential row recursion, over
    divisible/indivisible horizons and explicit block sizes (exact up to
    fp reassociation)."""
    from ilqr_admm_tpu.ops.lifted import _build_Su_seq, build_Su

    for (N, d, m) in ((96, 2, 1), (100, 4, 2), (37, 3, 2), (8, 2, 1)):
        A = jnp.asarray(np.eye(d) + rng.normal(size=(N, d, d)) * 0.05)
        B = jnp.asarray(rng.normal(size=(N, d, m)) * 0.3)
        ref = np.asarray(_build_Su_seq(A, B))
        np.testing.assert_allclose(np.asarray(build_Su(A, B)), ref,
                                   atol=1e-10)
        if N % 8 == 0:
            np.testing.assert_allclose(
                np.asarray(build_Su(A, B, block_size=8)), ref, atol=1e-10
            )
    # block_size=0 forces the sequential path
    A = jnp.asarray(np.eye(2) + rng.normal(size=(96, 2, 2)) * 0.05)
    B = jnp.asarray(rng.normal(size=(96, 2, 1)) * 0.3)
    np.testing.assert_allclose(
        np.asarray(build_Su(A, B, block_size=0)),
        np.asarray(_build_Su_seq(A, B)), atol=0,
    )
