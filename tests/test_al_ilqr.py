"""Augmented-Lagrangian iLQR tests.

Oracles:
- LQ + state(velocity) bounds: AL matches the converged lifted-ADMM
  solution (two independent constrained solvers);
- equality constraint (pinned terminal state): residual driven to ~0 and
  cost matches the stiff-penalty limit;
- infeasible initialization: AL recovers (the barrier method cannot).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.ops.riccati import quad_cost_model
from ilqr_admm_tpu.problem import ADMMConfig, ILQRConfig
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.al_ilqr import al_ilqr_solve
from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_batch
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def _lq_setup(nb_deriv=2, m=1, N=60, u_std=1e-2):
    plant = DoubleIntegrator(m, nb_deriv, dt=1.0 / N)
    plant.get_AB = lambda xs, us: plant.AB(xs.shape[0])
    d = plant.x_dim
    zs = jnp.stack([jnp.zeros(d), jnp.ones(d).at[d // 2 :].set(0.0)])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(jnp.asarray(zs), jnp.asarray(Qs), seq, u_std, plant.u_dim)
    return plant, cost


def test_state_bounds_match_admm():
    # velocity bound |v| <= 1.2 forces a plateau on the way to the target
    plant, cost = _lq_setup(nb_deriv=2, m=1, N=60)
    N = 60
    d = plant.x_dim
    A, B = plant.AB(N)
    x0 = jnp.zeros(d)
    vmax = 1.2

    def proj_x(x):
        xs = x.reshape(N, d)
        v = jnp.clip(xs[:, 1:], -vmax, vmax)
        return jnp.concatenate([xs[:, :1], v], axis=1).reshape(-1)

    xf, uf, _ = lqt_admm_batch(
        A, B, cost, x0, project_x=proj_x, rho_x=1e1,
        cfg=ADMMConfig(max_iter=4000, tol=1e-10),
    )
    c_admm = float(cost(xf.reshape(N, d), uf.reshape(N, -1)))
    assert float(jnp.abs(xf.reshape(N, d)[:, 1]).max()) <= vmax + 1e-6

    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)
    res = al_ilqr_solve(
        plant.step, plant.get_AB, get_Cs, cost,
        x0, jnp.zeros((N, 1)),
        ineq=lambda x, u: jnp.asarray([x[1] - vmax, -x[1] - vmax]),
        cfg=ILQRConfig(max_iter=40, tol_fun=1e-12),
        n_al=12, mu0=1.0, mu_factor=5.0, tol_con=1e-8,
    )
    assert float(res.max_violation) < 1e-6
    assert abs(float(res.cost) - c_admm) < 5e-3 * max(1.0, abs(c_admm)), (
        float(res.cost), c_admm,
    )
    # the bound binds (otherwise the test proves nothing)
    assert float(jnp.abs(res.x_nom[:, 1]).max()) > 0.99 * vmax


def test_midhorizon_equality_pin():
    # pin the mid-horizon state exactly: x_{N/2} = [0.3, 0] (a via-point
    # as a HARD constraint, not a weight) — uses the t-aware signature
    plant, cost = _lq_setup(nb_deriv=2, m=1, N=50)
    N = 50
    d = plant.x_dim
    x0 = jnp.zeros(d)
    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)
    t_pin = N // 2
    target = jnp.asarray([0.3, 0.0])

    def eq(x, u, t):
        del u
        return jnp.where(t == t_pin, x - target, jnp.zeros(d))

    res = al_ilqr_solve(
        plant.step, plant.get_AB, get_Cs, cost,
        x0, jnp.zeros((N, 1)), eq=eq,
        cfg=ILQRConfig(max_iter=40, tol_fun=1e-12),
        n_al=12, mu0=1.0, mu_factor=5.0, tol_con=1e-9,
    )
    resid = np.abs(np.asarray(res.x_nom[t_pin]) - np.asarray(target))
    assert resid.max() < 1e-6, resid
    # the final via-point target is still reached well
    assert abs(float(res.x_nom[-1, 0]) - 1.0) < 0.05


def test_moving_belt_equality():
    # require velocity == 0.6 at every stage after the first (x_0 fixed)
    plant, cost = _lq_setup(nb_deriv=2, m=1, N=50)
    N = 50
    x0 = jnp.zeros(plant.x_dim)
    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)

    def eq(x, u, t):
        del u
        return jnp.where(t > 0, jnp.asarray([x[1] - 0.6]), jnp.zeros(1))

    res = al_ilqr_solve(
        plant.step, plant.get_AB, get_Cs, cost,
        x0, jnp.zeros((N, 1)), eq=eq,
        cfg=ILQRConfig(max_iter=40, tol_fun=1e-12),
        n_al=12, mu0=1.0, mu_factor=5.0, tol_con=1e-9,
    )
    resid = np.abs(np.asarray(res.x_nom[1:, 1]) - 0.6)
    assert resid.max() < 1e-6, resid.max()


def test_infeasible_init_recovers():
    plant, cost = _lq_setup(nb_deriv=2, m=1, N=40)
    N = 40
    x0 = jnp.zeros(plant.x_dim)
    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)
    # initial controls massively violate |u| <= 2
    u0 = 10.0 * jnp.ones((N, 1))
    res = al_ilqr_solve(
        plant.step, plant.get_AB, get_Cs, cost,
        x0, u0,
        ineq=lambda x, u: jnp.asarray([u[0] - 2.0, -u[0] - 2.0]),
        cfg=ILQRConfig(max_iter=40, tol_fun=1e-12),
        n_al=12, mu0=1.0, mu_factor=5.0, tol_con=1e-8,
    )
    assert float(res.max_violation) < 1e-6
    assert float(jnp.max(jnp.abs(res.u_nom))) <= 2.0 + 1e-6


def test_jits_and_vmaps():
    plant, cost = _lq_setup(nb_deriv=2, m=1, N=40)
    N = 40
    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)

    def solve_one(x0):
        return al_ilqr_solve(
            plant.step, plant.get_AB, get_Cs, cost, x0, jnp.zeros((N, 1)),
            ineq=lambda x, u: jnp.asarray([u[0] - 2.0, -u[0] - 2.0]),
            cfg=ILQRConfig(max_iter=10), n_al=4,
        ).cost

    x0s = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, size=(3, plant.x_dim)))
    costs = jax.jit(jax.vmap(solve_one))(x0s)
    assert costs.shape == (3,) and bool(jnp.all(jnp.isfinite(costs)))


def test_facade_solve_al():
    from ilqr_admm_tpu import iSLS

    plant, cost = _lq_setup(nb_deriv=2, m=1, N=40)
    N = 40
    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)
    s = iSLS(x_dim=plant.x_dim, u_dim=plant.u_dim, N=N)
    s.forward_model = plant.step
    s.cost_function = cost
    s.nominal_values = s.get_trajectory_batch(jnp.zeros(plant.x_dim), jnp.zeros((N, 1)))
    out = s.solve_al(
        plant.get_AB,
        ineq=lambda x, u: jnp.asarray([u[0] - 2.0, -u[0] - 2.0]),
        get_Cs=get_Cs, n_al=10, tol_con=1e-8,
    )
    assert float(out.max_violation) < 1e-6
    assert s.cost_log and s.cost_log[-1] == float(out.cost)


def test_nonconvex_keepout_gauss_newton():
    # circular keep-out region: needs the PSD Gauss-Newton penalty
    # curvature (exact Hessian is indefinite there and stalls)
    plant = DoubleIntegrator(2, 2, dt=1.0 / 60)
    plant.get_AB = lambda xs, us: plant.AB(xs.shape[0])
    N, d = 60, plant.x_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 1.0, 0.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, plant.u_dim)
    get_Cs = lambda xs, us: quad_cost_model(cost.Q, cost.xd, cost.R, xs, us)
    center = jnp.asarray([0.45, 0.52])
    r = 0.2

    def keep_out(x, u):
        del u
        return jnp.asarray([r - jnp.linalg.norm(x[:2] - center)])

    res = al_ilqr_solve(
        plant.step, plant.get_AB, get_Cs, cost,
        jnp.zeros(d), jnp.zeros((N, plant.u_dim)), ineq=keep_out,
        cfg=ILQRConfig(max_iter=40, tol_fun=1e-12),
        n_al=12, mu0=10.0, mu_factor=5.0, tol_con=1e-8,
    )
    assert float(res.max_violation) < 1e-7
    # goal still reached, and the keep-out binds (path grazes the circle)
    assert abs(float(res.x_nom[-1, 0]) - 1.0) < 0.05
    dmin = float(jnp.min(jnp.linalg.norm(res.x_nom[:, :2] - center, axis=-1)))
    assert dmin < r + 0.02  # grazing, not a wide detour


def test_arm_constrained_optimum_beats_admm_plateau():
    """3DoF arm state+control bounds (reference 3DoF bounds c24): the AL
    route converges to the FEASIBLE constrained optimum 0.19982 (f64;
    max|vel| <= 1.5 + 1e-6, |u| <= 6, terminal x_ee in [0.5, 1]) —
    below the iLQR-ADMM fixed-point plateau (~0.2001 at consensus
    tolerance 1e-4) and above the reference's reported 0.1996, which is
    infeasible-optimistic: any cost below 0.19982 must violate a
    constraint (r4 finding, benchmarks/RESULTS.md)."""
    from ilqr_admm_tpu.models.arm import PlanarArm
    from ilqr_admm_tpu.ops.riccati import quad_cost_model
    from ilqr_admm_tpu.problem import ILQRConfig
    from ilqr_admm_tpu.solvers.al_ilqr import al_ilqr_solve
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    Na = 100
    arm = PlanarArm((1.0, 1.0, 1.0), dt=1.0 / Na)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    target = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 1.0, 0.0])
    w = jnp.asarray([0.0] * n + [1e6] * n + [0.0, 1e6, 0.0])
    zs = jnp.stack([jnp.zeros(d), target])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.diag(w)])
    seq = np.zeros(Na, dtype=np.int32)
    seq[-1] = 1
    aquad = viapoint_cost(zs, Qs, seq, 1e-4, m)
    x0a = arm.initial_state(jnp.asarray([np.pi / 3, -np.pi / 2, -np.pi / 4]))
    u0a = jnp.ones((Na, m))
    get_Cs = lambda xs, us: quad_cost_model(aquad.Q, aquad.xd, aquad.R, xs, us)

    def ineq(x, u, t):
        vel = x[n : 2 * n]
        xe = x[2 * n]
        is_T = t == Na - 1
        return jnp.concatenate([
            u - 6.0, -u - 6.0, vel - 1.5, -vel - 1.5,
            jnp.atleast_1d(jnp.where(is_T, xe - 1.0, -1.0)),
            jnp.atleast_1d(jnp.where(is_T, 0.5 - xe, -1.0)),
        ])

    res = al_ilqr_solve(
        arm.step, arm.get_AB, get_Cs, aquad, x0a, u0a, ineq=ineq,
        cfg=ILQRConfig(max_iter=40, tol_fun=1e-10), n_al=12, tol_con=1e-7,
        riccati="sqrt",
    )
    xs, us = np.asarray(res.x_nom), np.asarray(res.u_nom)
    assert abs(float(res.cost) - 0.199817) < 5e-4, float(res.cost)
    assert np.abs(us).max() <= 6.0 + 1e-5
    assert np.abs(xs[:, n : 2 * n]).max() <= 1.5 + 1e-5
    assert 0.5 - 1e-5 <= xs[-1, 2 * n] <= 1.0 + 1e-5
