"""LQT-ADMM with spherical obstacle avoidance (2D double integrator).

Mirrors `Double integrator/LQR and SLS with spherical obstacle
avoidance.ipynb`: two circular obstacles handled by the intersection of
quadratic-shell (sphere-complement) projections via consensus ADMM +
Dykstra refinement.

Run: python examples/double_integrator_obstacles.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from ilqr_admm_tpu import SLS, get_double_integrator_AB
from ilqr_admm_tpu.projections import (
    project_quadratic,
    project_set_convex,
    project_set_convex_dykstra,
)


def main():
    x_dim, u_dim, N = 2, 2, 100
    d = x_dim * 2
    A, B = get_double_integrator_AB(x_dim, 2, dt=1.0 / N)
    sls = SLS(d, u_dim, N)
    sls.AB = [A, B]

    x_std, u_std = 1e3, 1e-4
    zs = np.stack([np.zeros(d), np.array([1.0, 1.0, 0.0, 0.0])])
    Qs = np.stack([np.zeros((d, d)), np.eye(d) * x_std])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    sls.set_quadratic_cost(zs, Qs, seq, u_std)

    x0 = np.zeros(d)
    x_opt, u_opt = sls.solve(x0, method="batch")
    print(f"unconstrained cost {float(sls.compute_cost(x_opt, u_opt)):.4e} "
          f"(reference 2.473e-1)")

    # two circular obstacles (scenario 0 of the notebook)
    radii = np.array([0.1, 0.15]) * 1.1
    centers = [jnp.asarray([0.5, 0.5]), jnp.asarray([0.5, 0.2])]
    lowers = 0.5 * radii**2
    upper = 1e2

    projs = [
        (lambda c, l: (lambda y: project_quadratic(y - c, l, upper) + c))(c, l)
        for c, l in zip(centers, lowers)
    ]
    As = [jnp.eye(x_dim)] * 2
    bs = [jnp.zeros(x_dim)] * 2

    def project_state(x):
        x_ = x.reshape(N, d)
        pos = x_[:, :x_dim]
        pos = project_set_convex(pos, As, bs, projs, rho=1.0, max_iter=5,
                                 threshold=1e-2)
        pos = project_set_convex_dykstra(pos, projs, max_iter=50, tol=1e-5)
        return x_.at[:, :x_dim].set(pos).reshape(-1)

    rho_x = np.zeros((N, d, d))
    rho_x[:, :x_dim, :x_dim] = np.eye(x_dim)
    x_c, u_c = sls.ADMM_LQT_Batch(
        x0, project_x=project_state, max_iter=500, rho_x=rho_x, tol=1e-3,
        verbose=True,
    )
    print(f"constrained cost  {float(sls.compute_cost(x_c, u_c)):.4e} "
          f"(reference 2.680e-1)")

    # obstacle-clearance oracle. The x-iterate can hug/penetrate slightly
    # before full convergence; the projected (z) iterate is feasible by
    # construction and is the answer to deploy.
    x_feas = project_state(jnp.asarray(x_c))
    for name, xv in [("x-iterate", x_c), ("projected", x_feas)]:
        pos = np.asarray(xv).reshape(N, d)[:, :x_dim]
        dists = [np.linalg.norm(pos - np.asarray(c), axis=-1).min() for c in centers]
        print(f"{name}: min obstacle clearances {dists[0]:.3f}/{dists[1]:.3f} "
              f"(radii {radii[0] / 1.1:.3f}/{radii[1] / 1.1:.3f})")


if __name__ == "__main__":
    main()
