"""Differentiable ADMM (IFT fixed-point VJP) — gradients through the
constrained solution match finite differences, and enable gradient
descent on problem parameters (inverse-LQT demo). Capability beyond the
reference (pure NumPy, no autodiff)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.implicit import lqt_admm_implicit
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def _problem(N=40):
    di = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = di.x_dim, di.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = di.AB(N)
    return di, A, B, quad, N, d, m


@pytest.mark.slow
def test_implicit_grad_matches_finite_difference():
    di, A, B, quad, N, d, m = _problem()
    proj_u = lambda v, p: project_bound(v, -p, p)

    def loss(xd_target, bound):
        theta = dict(
            Q=quad.Q, R=quad.R,
            xd=quad.xd.at[-1, 0].set(xd_target),
            x0=jnp.zeros(d), pu=bound,
        )
        xs, us = lqt_admm_implicit(
            A, B, theta, project_u=proj_u, rho_u=1e-1,
            n_iters=300, bwd_iters=150,
        )
        # track a reference trajectory + control effort
        return jnp.sum((xs[-1, 0] - 0.8) ** 2) + 1e-3 * jnp.sum(us**2)

    g_xd, g_b = jax.grad(loss, argnums=(0, 1))(1.0, 4.0)

    eps = 1e-6
    fd_xd = (loss(1.0 + eps, 4.0) - loss(1.0 - eps, 4.0)) / (2 * eps)
    fd_b = (loss(1.0, 4.0 + eps) - loss(1.0, 4.0 - eps)) / (2 * eps)

    np.testing.assert_allclose(float(g_xd), float(fd_xd), rtol=1e-3)
    np.testing.assert_allclose(float(g_b), float(fd_b), rtol=1e-3)


@pytest.mark.slow
def test_implicit_grad_wrt_bound_active_constraint():
    """With the bound active, d(loss)/d(bound) must be nonzero (the
    constrained solution moves with the constraint), and zero when the
    bound is slack."""
    di, A, B, quad, N, d, m = _problem()
    proj_u = lambda v, p: project_bound(v, -p, p)

    def loss(bound):
        theta = dict(Q=quad.Q, R=quad.R, xd=quad.xd, x0=jnp.zeros(d), pu=bound)
        xs, us = lqt_admm_implicit(
            A, B, theta, project_u=proj_u, rho_u=1e-1, n_iters=150, bwd_iters=80)
        return jnp.sum((xs - quad.xd) ** 2)

    g_active = float(jax.grad(loss)(2.0))    # unconstrained max|u| ~ 5.9
    g_slack = float(jax.grad(loss)(50.0))    # far from active
    assert abs(g_active) > 1e-6, g_active
    assert abs(g_slack) < 1e-8, g_slack


def test_inverse_lqt_gradient_descent_recovers_target():
    """Inverse problem: recover the via-point target from an observed
    constrained trajectory by gradient descent through the solver."""
    di, A, B, quad, N, d, m = _problem()
    proj_u = lambda v, p: project_bound(v, -p, p)
    true_target = 0.7

    def solve(target):
        theta = dict(
            Q=quad.Q, R=quad.R, xd=quad.xd.at[-1, 0].set(target),
            x0=jnp.zeros(d), pu=3.0,
        )
        return lqt_admm_implicit(
            A, B, theta, project_u=proj_u, rho_u=1e-1, n_iters=120, bwd_iters=60)

    xs_obs, _ = solve(true_target)

    def loss(target):
        xs, _ = solve(target)
        return jnp.sum((xs - xs_obs) ** 2)

    g = jax.jit(jax.grad(loss))
    target = 0.2
    for _ in range(60):
        target = target - 0.005 * float(g(target))
    assert abs(target - true_target) < 1e-3, target
