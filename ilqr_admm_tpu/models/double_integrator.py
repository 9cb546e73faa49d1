"""n-th order point-mass integrator plant (the analytic LQT fixture).

Reference seed: `get_double_integrator_AB` (`utils.py:266-276`) and the
Double-integrator notebooks. Linear and time-invariant; used for the
LQT / LQT-ADMM / SLS-ADMM benchmark family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ilqr_admm_tpu.utils.cost_assembly import get_double_integrator_AB


class DoubleIntegrator:
    """x = [pos (nb_dim), vel (nb_dim), ...] up to nb_deriv derivatives."""

    def __init__(self, nb_dim: int = 1, nb_deriv: int = 2, dt: float = 0.01):
        self.nb_dim = nb_dim
        self.nb_deriv = nb_deriv
        self.dt = dt
        A, B = get_double_integrator_AB(nb_dim, nb_deriv, dt)
        self.A = A
        self.B = B
        self.x_dim = nb_dim * nb_deriv
        self.u_dim = nb_dim

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        return self.A @ x + self.B @ u

    def __call__(self, x, u):
        return self.step(x, u)

    def AB(self, N: int):
        """Stacked (N, x, x), (N, x, u) dynamics for the solver core."""
        return (
            jnp.broadcast_to(self.A, (N,) + self.A.shape),
            jnp.broadcast_to(self.B, (N,) + self.B.shape),
        )
