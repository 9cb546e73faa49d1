"""LQT and robust SLS with control bounds on the double integrator.

Mirrors `Double integrator/LQR and SLS with control bounds.ipynb`:
unconstrained batch solve → LQT-ADMM (batch & DP) with |u| <= 5 →
robust SLS-ADMM with chance constraints → 10k-rollout Monte-Carlo check.

Run: python examples/double_integrator_control_bounds.py [--plot]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax.numpy as jnp
from scipy.stats import norm

from ilqr_admm_tpu import SLS, get_double_integrator_AB
from ilqr_admm_tpu.projections import (
    project_bound,
    project_set_convex,
    project_soc_unit,
)


def main(plot=False):
    x_dim, u_dim, N = 1, 1, 100
    nb_deriv, T = 2, 1.0
    d = x_dim * nb_deriv
    A, B = get_double_integrator_AB(x_dim, nb_deriv, dt=T / N)

    sls = SLS(d, u_dim, N)
    sls.AB = [A, B]

    zs = np.stack([np.zeros(d), np.array([1.0, 0.0])])
    Qs = np.stack([np.zeros((d, d)), np.eye(d) * 1e6])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    sls.set_quadratic_cost(zs, Qs, seq, u_std=1e-2)

    x0 = np.zeros(d)
    x_opt, u_opt = sls.solve(x0, method="batch")
    print(f"unconstrained: cost {float(sls.compute_cost(x_opt, u_opt)):.4e}, "
          f"max|u| {float(jnp.max(jnp.abs(u_opt))):.3f}")

    lower_u, upper_u = -5.0, 5.0
    x_c, u_c = sls.ADMM_LQT_Batch(
        x0, project_u=lambda u: project_bound(u, lower_u, upper_u),
        max_iter=100, rho_u=1e-2, tol=1e-4, verbose=True,
    )
    print(f"ADMM batch:    cost {float(sls.compute_cost(x_c, u_c)):.4e}, "
          f"max|u| {float(jnp.max(jnp.abs(u_c))):.6f}")

    x_d, u_d, K_dp, k_dp = sls.ADMM_LQT_DP(
        x0, project_u=lambda u: project_bound(u, lower_u, upper_u),
        max_iter=500, rho_u=1e-1, tol=1e-4,
    )
    print(f"ADMM DP:       cost {float(sls.compute_cost(x_d, u_d)):.4e}")

    # --- robust chance-constrained SLS (cells 15-16)
    var_x0 = 0.01
    psi_inv = float(norm.ppf(0.95))
    mu = np.array([1.0, 0.0])
    sigma = np.array([0.0, var_x0])
    Au = np.diag(np.sqrt(sigma))
    A_hi = jnp.asarray(np.concatenate([Au, (-mu / psi_inv)[None]], 0))
    b_hi = jnp.asarray(np.append(np.zeros(2), upper_u / psi_inv))
    A_lo = jnp.asarray(np.concatenate([Au, (mu / psi_inv)[None]], 0))
    b_lo = jnp.asarray(np.append(np.zeros(2), -lower_u / psi_inv))

    def project_u_rob(y):
        return project_set_convex(
            y, [A_hi, A_lo], [b_hi, b_lo], [project_soc_unit] * 2,
            rho=1e1, max_iter=100, threshold=1e-3,
        )

    du, PHI_U = sls.ADMM_SLS(
        project_u=project_u_rob, max_iter=50, rho_u=1e2, tol=1e-3,
        robust_dim=1, verbose=True,
    )
    print(f"robust SLS:    cost {float(sls.compute_cost(sls.Sw[:, :d] @ jnp.zeros(d) + sls.Su @ du)):.4e}")

    # --- Monte-Carlo validation (cells 19-20)
    n_mc = 10_000
    rng = np.random.default_rng(0)
    x0s = np.zeros((n_mc, d))
    x0s[:, 0] = rng.normal(0, np.sqrt(var_x0), n_mc)

    _, us_dp = sls.get_trajectory_dp(x0s, K_dp, k_dp)
    K_sls, k_sls = sls.controller(PHI_U, du)
    _, us_sls = sls.get_trajectory_sls(x0s, K_sls, k_sls)

    thr = 1e-3
    for name, us in [("DP", us_dp), ("SLS", us_sls)]:
        ok = np.all(
            (np.asarray(us) >= lower_u - thr) & (np.asarray(us) <= upper_u + thr),
            axis=(1, 2),
        )
        print(f"MC success {name}: {100 * ok.mean():.2f} %")

    if plot:
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(ncols=2, figsize=(8, 4))
        ax[0].plot(np.asarray(x_c).reshape(N, -1)[:, 0], label="ADMM")
        ax[0].plot(np.asarray(x_opt)[:, 0], "r", label="unconstrained")
        ax[1].plot(np.asarray(u_c).reshape(N, -1)[:-1], label="ADMM")
        ax[1].plot(np.asarray(u_opt)[:-1], "r", label="unconstrained")
        ax[1].axhline(lower_u, color="k"); ax[1].axhline(upper_u, color="k")
        plt.legend(); plt.savefig("di_control_bounds.png", dpi=120)
        print("saved di_control_bounds.png")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--plot", action="store_true")
    main(**vars(p.parse_args()))
