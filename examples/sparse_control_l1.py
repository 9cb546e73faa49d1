"""Sparse (l1-regularized) control via prox-ADMM.

Beyond the reference (whose z-updates are all set projections): the
generic ADMM driver accepts any proximal map as the z-update, so adding
a sparsity cost γ‖u‖₁ to the LQT objective is just `prox_l1` (soft
thresholding) in place of a projection — the pattern of "An ADMM
Algorithm for Solving l1 Regularized MPC" (PAPERS.md). The optimizer
turns the actuation *off exactly* for most of the horizon and fires
briefly where it matters (bang-off behavior), instead of the l2
solution's always-on whisper.

Run: python examples/sparse_control_l1.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.problem import ADMMConfig
from ilqr_admm_tpu.projections import prox_l1
from ilqr_admm_tpu.solvers.lqt import lqt_solve_batch
from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_batch
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def main():
    N = 100
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e4])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    x0 = jnp.zeros(d)

    # dense l2 optimum for comparison
    xs2, us2 = lqt_solve_batch(A, B, cost, x0)

    gamma, rho = 2.0, 1e-1
    # z-update: min γ||z||_1 + ρ||x̂ - z + λ||²  →  soft(x̂+λ, γ/(2ρ))
    x, u, info = lqt_admm_batch(
        A, B, cost, x0,
        project_u=lambda v: prox_l1(v, gamma / (2.0 * rho)),
        rho_u=rho,
        cfg=ADMMConfig(max_iter=2000, tol=1e-8),
    )
    u = np.asarray(u).reshape(N, m)
    us2 = np.asarray(us2)
    x = np.asarray(x).reshape(N, d)

    # the x-iterate carries tiny residual values on the zeroed support
    # (the z-iterate is exactly sparse); count activity relatively
    thr = 1e-3 * np.max(np.abs(u))
    on = np.sum(np.abs(u) > thr)
    on2 = np.sum(np.abs(us2) > 1e-3 * np.max(np.abs(us2)))
    print(f"l2 solution : {on2}/{N} timesteps active, "
          f"final pos {np.asarray(xs2)[-1, 0]:.4f}")
    print(f"l1 solution : {on}/{N} timesteps active (γ={gamma}), "
          f"final pos {x[-1, 0]:.4f}")
    idx = np.nonzero(np.abs(u[:, 0]) > thr)[0]
    print(f"l1 firing windows: steps {idx[:8]} ... {idx[-8:]}")
    assert on < N // 2, "expected sparse actuation"
    assert abs(x[-1, 0] - 1.0) < 0.05, "target still reached"


if __name__ == "__main__":
    main()
