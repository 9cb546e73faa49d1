"""ADMM acceleration showdown: plain vs Nesterov vs Anderson.

Beyond the reference (plain ADMM throughout, `admm.py:6-106`): the
driver offers two accelerators — Nesterov momentum with adaptive
restart (`ADMMConfig.accel`, Goldstein et al. 2014 Alg. 8) and
safeguarded type-II Anderson extrapolation (`ADMMConfig.anderson_m`,
Walker & Ni 2011 with SCS-style restart-on-increase). Both reach the
same constrained optimum as plain ADMM; they differ in how much of the
slow linear consensus tail they remove. On the control-bounds LQT with
a deliberately 1000x-too-small penalty (the worst case for plain ADMM's
linear rate) the gap is dramatic: plain and Nesterov do not converge
within a 2000-iteration cap on TPU f32 while Anderson finishes in ~350
(under f64 the tail floor drops away: Anderson 21, Nesterov ~650,
plain 20k+), and on the well-scaled problem Anderson still halves the
count (6 vs 14).

Run: python examples/admm_acceleration.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.problem import ADMMConfig, SolveStatus
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_batch
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def main():
    N = 100
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    proj_u = lambda u: project_bound(u, -5.0, 5.0)
    x0 = jnp.zeros(d)

    variants = {
        "plain": dict(),
        "nesterov": dict(accel=True),
        "anderson(m=5)": dict(anderson_m=5),
    }

    # tol 5e-4: just above the f32 dual-residual floor of this problem
    # (~3e-4 — the x-update's factored solve noise; under x64 the floor
    # drops away and tol can be driven to 1e-6+)
    for rho, label in ((1e-2, "well-scaled rho=1e-2"),
                       (1e-5, "mis-scaled rho=1e-5 (1000x too small)")):
        print(f"\n-- {label} --")
        sols = {}
        for name, kw in variants.items():
            xs, us, info = lqt_admm_batch(
                A, B, cost, x0, project_u=proj_u, rho_u=rho,
                cfg=ADMMConfig(max_iter=2000, tol=5e-4, stall_tol=1e-15, **kw),
            )
            c = float(cost(xs.reshape(N, d), us.reshape(N, m)))
            status = SolveStatus(int(info.status)).name
            sols[name] = (np.asarray(us), status)
            print(f"  {name:14s}: {int(info.iters):5d} iters  "
                  f"status={status:10s} cost={c:.4f} "
                  f"max|u|={float(jnp.max(jnp.abs(us))):.5f}")
        # all variants that converged agree on the solution
        conv = [u for u, st in sols.values() if st == "CONVERGED"]
        for u in conv[1:]:
            assert np.max(np.abs(u - conv[0])) < 1e-2


if __name__ == "__main__":
    main()
