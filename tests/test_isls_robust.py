"""Robust iLQR (iSLS-ADMM) on the 3DoF arm with chance-constrained controls.

Reference golden numbers (3DoF robust notebook c23-26, var_q0=0.1,
psi_inv = Psi^{-1}(0.82), |u| <= 6): non-robust 77.3 % vs robust 95.8 %
success over 1,000 rollouts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from ilqr_admm_tpu.models.arm import PlanarArm
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.ops.rollout import rollout_nonlinear, rollout_sls_delta
from ilqr_admm_tpu.projections import project_set_convex, project_soc_unit
from ilqr_admm_tpu.solvers.isls_admm import isls_admm
from ilqr_admm_tpu.solvers.lqt import sls_controller
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

N = 100
VAR_Q0 = 0.1
UPPER_U = 6.0
ALPHA = 0.82


def _setup():
    arm = PlanarArm((1.0, 1.0, 1.0), dt=1.0 / N)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    x_std, u_std = 1e3, 1e-4
    target = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 2.0, 0.0])
    w = jnp.asarray([0.0] * n + [x_std] * n + [x_std, x_std, 0.0])
    zs = jnp.stack([jnp.zeros(d), target])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.diag(w)])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, u_std, m)
    q0 = jnp.asarray([np.pi / 3, -np.pi / 2, -np.pi / 4])
    x0 = arm.initial_state(q0)
    u0 = jnp.zeros((N, m))
    x_nom0 = rollout_nonlinear(arm.step, x0, u0)
    return arm, quad, x_nom0, u0


def _mc_success(arm, du, phi_u, x_nom, u_nom, A, B, n_mc=1000):
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    PHI_U = jnp.zeros((m * N, d * N))
    PHI_U = PHI_U.at[:, :n].set(phi_u)
    K, k = sls_controller(A, B, PHI_U, du)

    rng = np.random.default_rng(11)
    q0_nom = np.asarray(x_nom[0, :n])
    q0s = rng.normal(q0_nom, np.sqrt(VAR_Q0), size=(n_mc, n))
    x0s = jnp.asarray(
        np.concatenate(
            [q0s, np.zeros((n_mc, n)), np.stack([np.asarray(arm.fk(jnp.asarray(q))) for q in q0s])],
            axis=-1,
        )
    )
    xs, us = jax.vmap(
        lambda a: rollout_sls_delta(arm.step, a, K, k, x_nom, u_nom)
    )(x0s)
    us = np.asarray(us)
    ok = (np.abs(us) <= UPPER_U + 1e-3).all(axis=(1, 2))
    return float(ok.mean())


@pytest.mark.slow
def test_robust_isls_admm_beats_nonrobust():
    arm, quad, x_nom0, u0 = _setup()
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    psi_inv = float(norm.ppf(ALPHA))

    # --- non-robust: unconstrained iSLS synthesis
    res0 = isls_admm(
        arm.step, arm.get_AB, quad, x_nom0, u0, robust_dim=n,
        quad_cost=quad, k_max=60, max_admm_iter=10,
        alphas=10.0 ** jnp.linspace(0.0, -5.0, 50)[:10], outer_tol=1e-4,
    )
    A0, B0 = arm.get_AB(res0.x_nom, res0.u_nom)
    rate_plain = _mc_success(arm, res0.du, res0.phi_u, res0.x_nom, res0.u_nom, A0, B0)

    # --- robust: SOC chance projections on each control row [du_i, phi_i]
    mu = np.zeros(n + 1)
    mu[0] = 1.0
    sigma = np.zeros(n + 1)
    sigma[1:] = VAR_Q0
    Adiag = np.diag(np.sqrt(sigma))
    A_hi = jnp.asarray(np.concatenate([Adiag, (-mu / psi_inv)[None]], 0))
    b_hi = jnp.asarray(np.append(np.zeros(n + 1), UPPER_U / psi_inv))
    A_lo = jnp.asarray(np.concatenate([Adiag, (mu / psi_inv)[None]], 0))
    b_lo = jnp.asarray(np.append(np.zeros(n + 1), UPPER_U / psi_inv))

    def proj_u(y, u_nom):
        y_abs = y.at[:, 0].add(u_nom.reshape(-1))
        y_proj = project_set_convex(
            y_abs, [A_hi, A_lo], [b_hi, b_lo], [project_soc_unit] * 2,
            rho=1e1, max_iter=100, threshold=1e-4,
        )
        return y_proj.at[:, 0].add(-u_nom.reshape(-1))

    res1 = isls_admm(
        arm.step, arm.get_AB, quad, x_nom0, u0, robust_dim=n,
        quad_cost=quad, project_u=proj_u, rho_u=1e0,
        k_max=50, max_admm_iter=10,
        alphas=10.0 ** jnp.linspace(0.0, -5.0, 50)[:30], outer_tol=1e-4,
    )
    A1, B1 = arm.get_AB(res1.x_nom, res1.u_nom)
    rate_robust = _mc_success(arm, res1.du, res1.phi_u, res1.x_nom, res1.u_nom, A1, B1)

    # reference: 77.3 % non-robust vs 95.8 % robust
    assert rate_robust > rate_plain, (rate_robust, rate_plain)
    assert rate_robust >= 0.85, rate_robust
    # the nominal solution still solves the task
    assert abs(float(res1.x_nom[-1, 2 * n + 1]) - 2.0) < 0.2
