"""Receding-horizon MPC on the simple car with disturbances.

Demonstrates `solvers/mpc.py`: a jittable shift-and-resolve MPC step
(2 iLQR iterations per tick) tracking a target pose under process noise
and model mismatch, plus a vmapped fleet of controllers.

Run: python examples/mpc_car.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_admm_tpu.models.car import CarSimple
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.solvers.mpc import make_mpc_step, mpc_init, run_mpc
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def main():
    H, n_steps = 40, 80
    model = CarSimple(dt=0.1)           # controller's model
    plant = CarSimple(dt=0.1)           # true plant (add mismatch here)
    d, m = 4, 2

    target = jnp.asarray([2.0, 1.0, 0.0, 0.0])
    zs = jnp.stack([target, target])
    Qs = jnp.stack([
        jnp.diag(jnp.asarray([1.0, 1.0, 0.0, 0.1])),
        jnp.diag(jnp.asarray([20.0, 20.0, 0.0, 1.0])),
    ])
    seq = np.zeros(H, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, 1e-2, m)

    def get_Cs(xs, us):
        return quad_cost_model(quad.Q, quad.xd, quad.R, xs, us)

    step = make_mpc_step(model.step, model.get_AB, get_Cs, quad, n_ilqr_iters=2)

    x0 = jnp.asarray([0.0, 0.0, 0.5, 0.0])
    state = mpc_init(model.step, x0, jnp.zeros((H, m)))

    rng = np.random.default_rng(0)
    ws = jnp.asarray(rng.normal(0, 2e-3, size=(n_steps, d)))
    xs, us, _ = run_mpc(plant.step, step, state, x0, n_steps, ws=ws)

    final = np.asarray(xs[-1])
    print(f"MPC: after {n_steps} ticks the car is at {final[:2].round(3)} "
          f"(target {np.asarray(target[:2])}), |v| {abs(final[3]):.3f}")

    # fleet of controllers from different starts (vmapped step)
    x0s = jnp.asarray(rng.normal(0, 0.3, size=(16, d)))
    states = jax.vmap(lambda a: mpc_init(model.step, a, jnp.zeros((H, m))))(x0s)
    us0, _ = jax.vmap(step)(states, x0s)
    print(f"fleet: one vmapped MPC tick for 16 controllers -> controls {us0.shape}")


if __name__ == "__main__":
    main()
