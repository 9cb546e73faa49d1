"""Analytic differentiable planar-arm kinematics (Pinocchio replacement).

The reference drives a 3-DoF planar arm through Pinocchio FK / frame
Jacobians called per-timestep from Python (`3DoF robot/State and control
bound constraints.ipynb` cells 5, 9, 10; URDF: 3 revolute z-joints, 1 m
links along x). Here the kinematic chain is closed-form JAX — fully
differentiable, `vmap`-batched, no host callback in the hot loop
(SURVEY §2.2).

State convention matches the reference plant: x = [q, q_dot, p_ee] with
p_ee the 3-D end-effector position (z ≡ 0 for the planar chain), control
u = q_ddot, discrete double-integrator joint update:
    q⁺ = q + q_dot·dt + u·dt²/2;  q_dot⁺ = q_dot + u·dt;  p⁺ = fk(q⁺).
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp

from ilqr_admm_tpu.utils.cost_assembly import get_double_integrator_AB


class PlanarArm:
    """n-link planar arm, revolute z-joints, links along local x."""

    def __init__(self, link_lengths: Sequence[float] = (1.0, 1.0, 1.0), dt: float = 0.01, dtype=None):
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.lengths = jnp.asarray(link_lengths, dtype=dtype)
        self.q_dim = len(link_lengths)
        self.p_dim = 3  # [x, y, z] with z == 0, matching the reference state
        self.x_dim = 2 * self.q_dim + self.p_dim
        self.u_dim = self.q_dim
        self.dt = dt

    # ----------------------------------------------------------------- FK
    def fk(self, q: jax.Array) -> jax.Array:
        """End-effector position (3,) for joint angles q (q_dim,)."""
        c = jnp.cumsum(q)
        x = jnp.sum(self.lengths * jnp.cos(c))
        y = jnp.sum(self.lengths * jnp.sin(c))
        return jnp.stack([x, y, jnp.zeros_like(x)])

    def fk_links(self, q: jax.Array) -> jax.Array:
        """All frame positions (q_dim + 1, 2): base, joints..., ee (planar)."""
        c = jnp.cumsum(q)
        xs = jnp.cumsum(self.lengths * jnp.cos(c))
        ys = jnp.cumsum(self.lengths * jnp.sin(c))
        pts = jnp.stack([xs, ys], axis=-1)
        return jnp.concatenate([jnp.zeros((1, 2), pts.dtype), pts], axis=0)

    def jacobian(self, q: jax.Array) -> jax.Array:
        """Translational frame Jacobian (3, q_dim), world-aligned.

        Closed form of Pinocchio's LOCAL_WORLD_ALIGNED translation rows:
        J[0, j] = -sum_{k>=j} l_k sin(c_k); J[1, j] = sum_{k>=j} l_k cos(c_k).
        """
        c = jnp.cumsum(q)
        sk = self.lengths * jnp.sin(c)
        ck = self.lengths * jnp.cos(c)
        # suffix sums over k >= j
        jx = -(jnp.cumsum(sk[::-1])[::-1])
        jy = jnp.cumsum(ck[::-1])[::-1]
        return jnp.stack([jx, jy, jnp.zeros_like(jx)])

    # ------------------------------------------------------------ dynamics
    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        n, dt = self.q_dim, self.dt
        q = x[:n]
        qd = x[n : 2 * n]
        q_new = q + qd * dt + 0.5 * u * dt**2
        qd_new = qd + u * dt
        return jnp.concatenate([q_new, qd_new, self.fk(q_new)])

    def __call__(self, x, u):
        return self.step(x, u)

    def initial_state(self, q0: jax.Array) -> jax.Array:
        q0 = jnp.asarray(q0)
        return jnp.concatenate([q0, jnp.zeros_like(q0), self.fk(q0)])

    def get_AB(self, xs: jax.Array, us: jax.Array):
        """Linearization along a trajectory: A (N, d, d), B (N, d, u).

        Matches the reference's hand-assembled linearization
        (`3DoF robot/...` cell 10): double-integrator block on (q, q_dot),
        ee rows from the frame Jacobian at the *next* q.
        """
        n, dt = self.q_dim, self.dt
        N = xs.shape[0]
        d = self.x_dim
        A2, B2 = get_double_integrator_AB(n, 2, dt)
        A2 = A2.astype(xs.dtype)  # builder follows jax_enable_x64, not xs
        B2 = B2.astype(xs.dtype)

        q_next = xs[:, :n] + xs[:, n : 2 * n] * dt + 0.5 * us * dt**2
        J = jax.vmap(self.jacobian)(q_next)  # (N, 3, n)

        A = jnp.zeros((N, d, d), xs.dtype)
        A = A.at[:, : 2 * n, : 2 * n].set(A2)
        A = A.at[:, 2 * n :, :n].set(J)
        A = A.at[:, 2 * n :, n : 2 * n].set(J * dt)
        B = jnp.zeros((N, d, self.u_dim), xs.dtype)
        B = B.at[:, : 2 * n, :].set(B2)
        B = B.at[:, 2 * n :, :].set(0.5 * J * dt**2)
        return A, B

    def get_AB_autodiff(self, xs, us):
        """Exact autodiff Jacobians of `step` (independent derivative path)."""
        jac = jax.vmap(jax.jacfwd(self.step, argnums=(0, 1)))
        return jac(xs, us)


_FLOAT_RE = re.compile(r'origin\s+xyz="([\d\.\+\-eE ]+)"')
# full <joint ...>...</joint> elements only — splitting on '<joint' would
# leak the next link's <visual>/<inertial> origins into the joint block
_JOINT_RE = re.compile(r"<joint\b.*?</joint>", re.DOTALL)


def load_planar_arm_urdf(path: str, dt: float = 0.01) -> PlanarArm:
    """Build a PlanarArm from a planar z-revolute URDF chain.

    Minimal parser: reads the x offsets of consecutive revolute/fixed joint
    origins as link lengths (sufficient for the 3-DoF benchmark asset).
    """
    with open(path) as fh:
        text = fh.read()
    lengths = []
    for joint_block in _JOINT_RE.findall(text):
        m = _FLOAT_RE.search(joint_block)
        if m:
            x = float(m.group(1).split()[0])
            if x > 0:
                lengths.append(x)
    if not lengths:
        raise ValueError(f"no link lengths found in {path}")
    return PlanarArm(lengths, dt=dt)
