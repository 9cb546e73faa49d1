"""Primal-dual (multiple-shooting) iLQR from an infeasible start.

Beyond the reference: its iLQR is single-shooting — every iterate is a
rollout of the controls, so the only way to initialize is a control
guess. The primal-dual solver (`solvers/pd_ilqr.py`, PAPERS.md arXiv
2403.00748) treats the STATE PATH as a decision variable too: here the
car is initialized with a straight line drawn from start to goal (no
controls at all, dynamics violated everywhere) and the solver closes the
defects while optimizing, landing on the same optimum as single-shooting
iLQR.

Run: python examples/pd_ilqr_infeasible_start.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_admm_tpu.models.car import CarSimple
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.problem import ILQRConfig
from ilqr_admm_tpu.solvers import (
    ilqr_init, ilqr_solve, pd_ilqr_init, pd_ilqr_solve,
)
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def main():
    N = 60
    car = CarSimple(dt=0.1)
    target = jnp.asarray([1.5, 1.0, 0.0, 0.0])
    zs = jnp.stack([target, target])
    Qs = jnp.stack([
        jnp.diag(jnp.asarray([1.0, 1.0, 0.0, 0.1])) * 1e-2,
        jnp.diag(jnp.asarray([20.0, 20.0, 0.0, 1.0])),
    ])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, 1e-2, 2)
    get_Cs = lambda xs, us: quad_cost_model(quad.Q, quad.xd, quad.R, xs, us)

    def cost_fn(xs, us):
        dx = xs - quad.xd
        return (jnp.einsum("ti,tij,tj->", dx, quad.Q, dx)
                + jnp.einsum("ti,tij,tj->", us, quad.R, us))

    x0 = jnp.asarray([0.0, 0.0, 0.3, 0.0])

    # straight-line state guess, zero controls — infeasible everywhere
    line = jnp.linspace(0.0, 1.0, N)[:, None] * (target - x0)[None] + x0[None]
    st0 = pd_ilqr_init(cost_fn, car.step, line.at[0].set(x0), jnp.zeros((N, 2)))
    print(f"init: max defect {float(st0.defect):.4f} (dynamics violated), "
          f"cost {float(st0.cost):.4f}")

    st = pd_ilqr_solve(
        car.step, car.get_AB, get_Cs, cost_fn, st0,
        ILQRConfig(max_iter=80, tol_fun=1e-9),
    )
    ref = ilqr_solve(
        car.step, car.get_AB, get_Cs, quad,
        ilqr_init(car.step, cost_fn, x0, jnp.zeros((N, 2))),
        ILQRConfig(max_iter=60),
    )
    print(f"pd-ilqr  : cost {float(st.cost):.5f}, max defect "
          f"{float(st.defect):.1e}, {int(st.iteration)} iterations")
    print(f"reference: cost {float(ref.cost):.5f} (single-shooting iLQR)")
    print(f"final pos {np.asarray(st.x_nom[-1][:2]).round(3)} "
          f"(target {np.asarray(target[:2])})")
    assert float(st.defect) < 1e-5
    assert abs(float(st.cost) - float(ref.cost)) < 2e-2


if __name__ == "__main__":
    main()
