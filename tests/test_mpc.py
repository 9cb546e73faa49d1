"""Receding-horizon MPC driver on the simple car."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.car import CarSimple
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.solvers.mpc import make_mpc_step, mpc_init, run_mpc
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def test_mpc_tracks_target_under_disturbance():
    H = 40  # MPC horizon
    car = CarSimple(dt=0.1)
    d, m = 4, 2
    target = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    zs = jnp.stack([target, target])
    Qs = jnp.stack([jnp.diag(jnp.asarray([1.0, 1.0, 0.0, 0.1])),
                    jnp.diag(jnp.asarray([20.0, 20.0, 0.0, 1.0]))])
    seq = np.zeros(H, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, 1e-2, m)

    def get_Cs(xs, us):
        return quad_cost_model(quad.Q, quad.xd, quad.R, xs, us)

    def get_AB(xs, us):
        return CarSimple(dt=0.1).get_AB(xs, us)

    step = make_mpc_step(car.step, get_AB, get_Cs, quad, n_ilqr_iters=2)

    x0 = jnp.asarray([0.0, 0.0, 0.5, 0.0])
    state = mpc_init(car.step, x0, jnp.zeros((H, m)))

    rng = np.random.default_rng(0)
    n_steps = 60
    ws = jnp.asarray(rng.normal(0, 1e-3, size=(n_steps, d)))
    xs, us, _ = run_mpc(car.step, step, state, x0, n_steps, ws=ws)

    # the car reaches the target position despite process noise
    final = np.asarray(xs[-1])
    assert np.linalg.norm(final[:2] - np.array([1.0, 1.0])) < 0.2, final

    # batched MPC: vmap the step over a fleet of controllers
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(4, d)))
    states = jax.vmap(lambda a: mpc_init(car.step, a, jnp.zeros((H, m))))(x0s)
    us_b, states_b = jax.vmap(step)(states, x0s)
    assert us_b.shape == (4, m)
