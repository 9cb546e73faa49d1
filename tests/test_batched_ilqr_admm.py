"""Batched iLQR-ADMM: vmap the full constrained solver over instances.

North-star config (BASELINE.json): many iLQR-ADMM instances solved in
parallel (multi-start / scenario sampling) with per-instance solutions
matching the single-instance solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.arm import PlanarArm
from ilqr_admm_tpu.ops.rollout import rollout_nonlinear
from ilqr_admm_tpu.solvers.ilqr_admm import ilqr_admm
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def _arm_problem(N=60):
    arm = PlanarArm((1.0, 1.0, 1.0), dt=1.0 / N)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    x_std, u_std = 1e4, 1e-4
    target = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 1.0, 0.0])
    w = jnp.asarray([0.0] * n + [x_std] * n + [0.0, x_std, 0.0])
    zs = jnp.stack([jnp.zeros(d), target])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.diag(w)])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, u_std, m)
    return arm, quad


@pytest.mark.slow
def test_vmapped_ilqr_admm_matches_single():
    N = 60
    arm, quad = _arm_problem(N)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim

    def proj_u(u):
        return jnp.clip(u, -6.0, 6.0)

    alphas = 10.0 ** jnp.linspace(0.0, -5.0, 50)[:8]

    def solve_one(q0):
        x0 = jnp.concatenate([q0, jnp.zeros(n), arm.fk(q0)])
        u0 = jnp.ones((N, m))
        x_nom0 = rollout_nonlinear(arm.step, x0, u0)
        res = ilqr_admm(
            arm.step, arm.get_AB, quad, x_nom0, u0,
            quad_cost=quad, project_u=proj_u, rho_u=1e-3,
            max_iter=8, max_admm_iter=5, alphas=alphas, tol=1e-4,
        )
        return res.cost, res.u_nom

    rng = np.random.default_rng(0)
    q0s = jnp.asarray(
        np.array([np.pi / 3, -np.pi / 2, -np.pi / 4]) + rng.normal(0, 0.2, (6, n))
    )
    costs_b, us_b = jax.vmap(solve_one)(q0s)

    for i in range(3):
        c, u = solve_one(q0s[i])
        np.testing.assert_allclose(float(costs_b[i]), float(c), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(us_b[i]), np.asarray(u), atol=1e-8)

    # all instances respect the control bound
    assert float(jnp.max(jnp.abs(us_b))) <= 6.0 + 0.1
