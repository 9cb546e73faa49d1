"""Primal-dual (multiple-shooting) iLQR — PAPERS.md arXiv 2403.00748.

Oracles:
- LQ exactness: on a linear-quadratic problem one iteration (alpha=1)
  closes every defect and lands on the exact optimum from ANY
  (infeasible) initialization;
- single-shooting agreement: same optimum as `ilqr_solve` on the
  nonlinear car problem, from a feasible init AND from a straight-line
  infeasible state path with zero controls;
- costates: lambda_0 equals the gradient of the optimal cost w.r.t. the
  initial state (finite-difference check).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.car import CarSimple
from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.problem import ILQRConfig, SolveStatus
from ilqr_admm_tpu.solvers.ilqr import ilqr_init, ilqr_solve
from ilqr_admm_tpu.solvers.lqt import lqt_solve_batch
from ilqr_admm_tpu.solvers.pd_ilqr import (
    pd_ilqr_init,
    pd_ilqr_iterate,
    pd_ilqr_solve,
)
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost
from ilqr_admm_tpu.problem import line_search_alphas


def _lqt_setup(N=30):
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.eye(d) * 1e-2, jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    Aj, Bj = jnp.asarray(A[0]), jnp.asarray(B[0])
    f = lambda x, u: Aj @ x + Bj @ u
    get_AB = lambda xs, us: (jnp.broadcast_to(Aj, (N, d, d)),
                             jnp.broadcast_to(Bj, (N, d, m)))
    get_Cs = lambda xs, us: quad_cost_model(quad.Q, quad.xd, quad.R, xs, us)

    def cost_fn(xs, us):
        dx = xs - quad.xd
        return (jnp.einsum("ti,tij,tj->", dx, quad.Q, dx)
                + jnp.einsum("ti,tij,tj->", us, quad.R, us))

    return plant, A, B, quad, f, get_AB, get_Cs, cost_fn, d, m, N


def test_lq_exactness_from_infeasible_init():
    """One iteration with alpha=1 solves the LQ problem exactly from a
    wildly infeasible state path."""
    plant, A, B, quad, f, get_AB, get_Cs, cost_fn, d, m, N = _lqt_setup()
    x0 = jnp.asarray([0.3, -0.2])
    rng = np.random.default_rng(0)
    # infeasible garbage path pinned at x0; final control zeroed (the
    # u_{N-1}-unused convention keeps it fixed, and the lifted oracle
    # sets it to its optimum 0)
    x_init = jnp.asarray(rng.normal(size=(N, d))).at[0].set(x0)
    u_init = jnp.asarray(rng.normal(size=(N, m)) * 0.5).at[-1].set(0.0)

    state = pd_ilqr_init(cost_fn, f, x_init, u_init)
    assert float(state.defect) > 0.1  # really infeasible
    alphas = jnp.asarray([1.0])
    state, accept, _ = pd_ilqr_iterate(f, get_AB, get_Cs, cost_fn, state, alphas)
    assert bool(accept)
    assert float(state.defect) < 1e-9  # all defects closed in ONE step

    # exact optimum: lifted least-squares oracle
    xs_star, us_star = lqt_solve_batch(A, B, quad, x0)
    c_star = float(cost_fn(xs_star, us_star))
    assert abs(float(state.cost) - c_star) < 1e-7 * max(1.0, abs(c_star))
    np.testing.assert_allclose(np.asarray(state.x_nom), np.asarray(xs_star),
                               atol=1e-7)


@pytest.mark.slow
def test_costates_match_x0_gradient():
    """lambda_0 == d(optimal cost)/d(x0) (finite differences)."""
    plant, A, B, quad, f, get_AB, get_Cs, cost_fn, d, m, N = _lqt_setup(N=20)

    def solve_cost(x0):
        x_init = jnp.broadcast_to(x0, (N, d)).at[0].set(x0)
        state = pd_ilqr_init(cost_fn, f, x_init, jnp.zeros((N, m)))
        state = pd_ilqr_solve(f, get_AB, get_Cs, cost_fn, state,
                              ILQRConfig(max_iter=10, tol_fun=1e-12))
        return state

    x0 = jnp.asarray([0.25, -0.1])
    state = solve_cost(x0)
    lam0 = np.asarray(state.lam[0])
    eps = 1e-5
    g_fd = np.zeros(d)
    for i in range(d):
        cp = float(solve_cost(x0.at[i].add(eps)).cost)
        cm = float(solve_cost(x0.at[i].add(-eps)).cost)
        g_fd[i] = (cp - cm) / (2 * eps)
    np.testing.assert_allclose(lam0, g_fd, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_matches_single_shooting_on_car():
    """Nonlinear: same optimum as ilqr_solve, feasible AND infeasible init."""
    N = 60
    car = CarSimple(dt=0.1)
    d, m = 4, 2
    target = jnp.asarray([1.5, 1.0, 0.0, 0.0])
    zs = jnp.stack([target, target])
    Qs = jnp.stack([jnp.diag(jnp.asarray([1.0, 1.0, 0.0, 0.1])) * 1e-2,
                    jnp.diag(jnp.asarray([20.0, 20.0, 0.0, 1.0]))])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, 1e-2, m)
    get_Cs = lambda xs, us: quad_cost_model(quad.Q, quad.xd, quad.R, xs, us)

    def cost_fn(xs, us):
        dx = xs - quad.xd
        return (jnp.einsum("ti,tij,tj->", dx, quad.Q, dx)
                + jnp.einsum("ti,tij,tj->", us, quad.R, us))

    x0 = jnp.asarray([0.0, 0.0, 0.3, 0.0])
    u0 = jnp.zeros((N, m))

    # single-shooting reference
    s_ref = ilqr_solve(car.step, car.get_AB, get_Cs, quad,
                       ilqr_init(car.step, cost_fn, x0, u0),
                       ILQRConfig(max_iter=60))
    c_ref = float(s_ref.cost)

    cfg = ILQRConfig(max_iter=80, tol_fun=1e-9)
    # (a) feasible init (rollout)
    from ilqr_admm_tpu.ops.rollout import rollout_nonlinear
    xs_roll = rollout_nonlinear(car.step, x0, u0)
    st_a = pd_ilqr_solve(car.step, car.get_AB, get_Cs, cost_fn,
                         pd_ilqr_init(cost_fn, car.step, xs_roll, u0), cfg)
    # (b) infeasible straight-line state path, zero controls
    line = jnp.linspace(0.0, 1.0, N)[:, None] * (target - x0)[None] + x0[None]
    st_b = pd_ilqr_solve(car.step, car.get_AB, get_Cs, cost_fn,
                         pd_ilqr_init(cost_fn, car.step, line.at[0].set(x0),
                                      u0), cfg)
    for name, st in (("feasible", st_a), ("infeasible", st_b)):
        assert float(st.defect) < 1e-5, (name, float(st.defect))
        assert abs(float(st.cost) - c_ref) < 2e-2 * max(1.0, abs(c_ref)), (
            name, float(st.cost), c_ref)
