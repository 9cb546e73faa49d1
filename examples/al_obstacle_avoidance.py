"""Obstacle avoidance via augmented-Lagrangian iLQR (first-class DP).

The reference's spherical-obstacle task (`Double integrator/LQR and SLS
with spherical obstacle avoidance.ipynb`) keeps trajectories OUT of two
circles via ADMM with quadratic-shell projections. Here the same
geometry is handled directly inside the DP loop: the nonconvex
keep-out constraint r - ||p - c|| <= 0 per obstacle goes through
`solvers/al_ilqr.py` — no penalty tuning, no projection operators, and
a certified max-violation on exit.

Run: python examples/al_obstacle_avoidance.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.problem import ILQRConfig
from ilqr_admm_tpu.solvers.al_ilqr import al_ilqr_solve
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def main():
    N = 100
    plant = DoubleIntegrator(2, 2, dt=1.0 / N)  # 2D position + velocity
    get_AB = lambda xs, us: plant.AB(xs.shape[0])
    d = plant.x_dim

    # track (1, 1) at the final step (reference obstacle notebook setup)
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 1.0, 0.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, plant.u_dim)
    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)

    # centers sit slightly off the start-goal diagonal: an obstacle
    # exactly on it makes the straight-line rollout a symmetric saddle
    centers = jnp.asarray([[0.32, 0.28], [0.68, 0.77]])
    radii = jnp.asarray([0.18, 0.15])

    def keep_out(x, u):
        del u
        p = x[:2]
        dist = jnp.linalg.norm(p[None, :] - centers, axis=-1)
        return radii - dist  # <= 0 means outside every circle

    x0 = jnp.zeros(d)
    res = al_ilqr_solve(
        plant.step, get_AB, get_Cs, cost, x0, jnp.zeros((N, plant.u_dim)),
        ineq=keep_out,
        cfg=ILQRConfig(max_iter=40, tol_fun=1e-10),
        n_al=12, mu0=10.0, mu_factor=5.0, tol_con=1e-7,
    )

    ps = np.asarray(res.x_nom[:, :2])
    dists = np.linalg.norm(ps[:, None, :] - np.asarray(centers)[None], axis=-1)
    margin = (dists - np.asarray(radii)[None]).min()
    print(f"AL obstacle avoidance: cost {float(res.cost):.4e}, "
          f"max violation {float(res.max_violation):.2e}, "
          f"min clearance {margin:.4f} (>= 0 means outside), "
          f"final position ({ps[-1, 0]:.3f}, {ps[-1, 1]:.3f})")
    # unconstrained straight line would cut through obstacle 1: show the
    # straight-line incursion for contrast
    line = np.linspace([0, 0], [1, 1], N)
    d_line = np.linalg.norm(line[:, None, :] - np.asarray(centers)[None], axis=-1)
    print(f"(straight line would violate by "
          f"{-(d_line - np.asarray(radii)[None]).min():.4f})")


if __name__ == "__main__":
    main()
