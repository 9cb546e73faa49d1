"""One-call JOINT chance-constraint calibration (beyond the reference).

The reference workflow (3DoF robust notebook c24-26) asks you to pick a
*per-row* confidence and hand-build SOC projection matrices; the joint
(whole-trajectory) success probability is whatever it turns out to be —
its reported 95.8 % at psi^-1(0.82)/row is an artifact of an
under-converged iterate. Here the joint level IS the API:

    res = isls_admm(..., joint_alpha=0.958, u_bounds=(-6, 6), x0_var=0.1)

The library derives the SOC tightening with the chi-ball certificate
psi = chi_p^{-1}(joint_alpha) (`ilqr_admm_tpu.chance`): every constraint
row shares the same initial-state deviation delta, so ALL rows hold
simultaneously whenever ||diag(var)^{-1/2} delta|| <= psi — a joint
guarantee that does not degrade with horizon length (a Sidak correction
over the 600 one-sided rows would demand psi = 3.80 and can push tight
problems infeasible; chi_3 needs 2.86).

Run: python examples/robust_joint_calibration.py   (CPU, ~1 min)
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from ilqr_admm_tpu.chance import calibrate
from ilqr_admm_tpu.models.arm import PlanarArm
from ilqr_admm_tpu.ops.rollout import rollout_nonlinear, rollout_sls_delta
from ilqr_admm_tpu.solvers.isls_admm import isls_admm
from ilqr_admm_tpu.solvers.lqt import sls_controller
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def main():
    N, var_q0, u_max, joint_alpha = 100, 0.1, 6.0, 0.958
    arm = PlanarArm((1.0, 1.0, 1.0), dt=1.0 / N)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim

    target = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 2.0, 0.0])
    w = jnp.asarray([0.0] * n + [1e3] * n + [1e3, 1e3, 0.0])
    zs = jnp.stack([jnp.zeros(d), target])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.diag(w)])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    quad = viapoint_cost(zs, Qs, seq, 1e-4, m)

    x0 = arm.initial_state(jnp.asarray([np.pi / 3, -np.pi / 2, -np.pi / 4]))
    u0 = jnp.zeros((N, m))
    x_nom0 = rollout_nonlinear(arm.step, x0, u0)

    cal = calibrate(joint_alpha=joint_alpha, robust_dim=n)
    print(f"requested joint alpha {joint_alpha} -> chi_{n} ball psi = "
          f"{cal.psi_inv:.3f} (implied per-row level {cal.alpha_row:.5f})")

    res = isls_admm(
        arm.step, arm.get_AB, quad, x_nom0, u0, robust_dim=n,
        quad_cost=quad, rho_u=1e0,
        joint_alpha=joint_alpha, u_bounds=(-u_max, u_max), x0_var=var_q0,
        k_max=50, max_admm_iter=10,
        alphas=10.0 ** jnp.linspace(0.0, -5.0, 50)[:30], outer_tol=1e-4,
    )
    print(f"solved in {int(res.outer_iters)} outer iterations, "
          f"cost {float(res.cost):.3f}, terminal y "
          f"{float(res.x_nom[-1, 2 * n + 1]):.3f} (target 2.0)")

    # certificate: every row's z-score >= psi (the returned controller is
    # the projected, SOC-feasible iterate)
    u_abs = np.asarray(res.u_nom).reshape(-1) + np.asarray(res.du)
    spread = np.sqrt(var_q0) * np.linalg.norm(np.asarray(res.phi_u), axis=-1)
    z = np.minimum(u_max - u_abs, u_abs + u_max) / np.maximum(spread, 1e-12)
    print(f"min per-row z-score {z.min():.3f} (certificate needs "
          f">= {cal.psi_inv:.3f})")

    # Monte-Carlo validation (the reference's signature test, c26)
    PHI_U = jnp.zeros((m * N, d * N)).at[:, :n].set(res.phi_u)
    A, B = arm.get_AB(res.x_nom, res.u_nom)
    K, k = sls_controller(A, B, PHI_U, res.du)
    rng = np.random.default_rng(11)
    q0s = rng.normal(np.asarray(res.x_nom[0, :n]), np.sqrt(var_q0), (1000, n))
    x0s = jnp.asarray(np.concatenate(
        [q0s, np.zeros((1000, n)),
         np.stack([np.asarray(arm.fk(jnp.asarray(q))) for q in q0s])], -1))
    _, us = jax.vmap(
        lambda a: rollout_sls_delta(arm.step, a, K, k, res.x_nom, res.u_nom)
    )(x0s)
    ok = (np.abs(np.asarray(us)) <= u_max + 1e-3).all(axis=(1, 2))
    print(f"joint MC success over 1000 rollouts: {ok.mean():.3f} "
          f"(requested {joint_alpha}; reference workflow reports 0.958)")


if __name__ == "__main__":
    main()
