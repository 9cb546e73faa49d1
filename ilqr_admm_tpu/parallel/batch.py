"""Batched + mesh-sharded instance solves and Monte-Carlo reductions.

The scale-out path (SURVEY §2.3, BASELINE north star): `vmap` the
functional solvers over an instance axis, then `shard_map` the batch over
the mesh's 'data' axis so each chip solves its shard; the only
collectives are `psum` metric reductions (success rates, costs).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ilqr_admm_tpu.problem import ADMMConfig, ILQRConfig
from ilqr_admm_tpu.solvers.ilqr import ilqr_init, ilqr_solve
from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_dp


def batched_lqt_admm_dp(
    A, B, cost, x0s,
    project_x=None, project_u=None, rho_x=None, rho_u=None,
    cfg: ADMMConfig = ADMMConfig(max_iter=200),
):
    """Solve the same constrained LQT from a batch of initial states.

    x0s: (batch, x_dim). Returns (x (batch, N*d), u (batch, N*m), iters).
    """

    def one(x0):
        x, u, _aux, info = lqt_admm_dp(
            A, B, cost, x0, project_x, project_u, rho_x, rho_u, cfg
        )
        return x, u, info.iters

    return jax.vmap(one)(x0s)


def batched_ilqr_solve(
    f: Callable, get_AB: Callable, get_Cs: Callable, cost_fn: Callable,
    x0s, u0s, cfg: ILQRConfig = ILQRConfig(), method: str = "dp",
):
    """Solve a batch of iLQR instances (multi-start / scenario sampling).

    x0s: (batch, d); u0s: (batch, N, m). Returns a batched ILQRState.
    """

    def one(x0, u0):
        state0 = ilqr_init(f, cost_fn, x0, u0)
        return ilqr_solve(f, get_AB, get_Cs, cost_fn, state0, cfg, method)

    return jax.vmap(one)(x0s, u0s)


def batched_boxddp_solve(
    f: Callable, get_AB: Callable, get_Cs: Callable, cost_fn: Callable,
    x0s, u0s, u_lower, u_upper, cfg: ILQRConfig = ILQRConfig(),
    riccati: str = "seq", mask_iters: int = 1,
):
    """Batch of control-limited boxDDP solves (multi-start fleets).

    x0s: (batch, d); u0s: (batch, N, m). Returns a batched ILQRState;
    every instance's controls satisfy the box exactly.

    riccati='seq' (default) is usually right for fleets — the
    sequential per-stage box-QP batches ACROSS instances, keeping the
    device busy; 'parallel' (the r4 time-parallel active-set backward)
    is for long horizons at small batch where per-instance latency
    dominates.
    """
    from ilqr_admm_tpu.solvers.boxddp import boxddp_init, boxddp_solve

    def one(x0, u0):
        st0 = boxddp_init(f, cost_fn, x0, u0, u_lower, u_upper)
        return boxddp_solve(
            f, get_AB, get_Cs, cost_fn, st0, u_lower, u_upper, cfg=cfg,
            riccati=riccati, mask_iters=mask_iters,
        )

    return jax.vmap(one)(x0s, u0s)


def batched_al_solve(
    f: Callable, get_AB: Callable, get_Cs: Callable, cost_fn: Callable,
    x0s, u0s, ineq=None, eq=None, cfg: ILQRConfig = ILQRConfig(max_iter=30),
    **al_kwargs,
):
    """Batch of AL-iLQR solves over general stagewise constraints.

    Returns a batched ALResult (check `.max_violation` per instance).
    """
    from ilqr_admm_tpu.solvers.al_ilqr import al_ilqr_solve

    def one(x0, u0):
        return al_ilqr_solve(
            f, get_AB, get_Cs, cost_fn, x0, u0, ineq=ineq, eq=eq,
            cfg=cfg, **al_kwargs,
        )

    return jax.vmap(one)(x0s, u0s)


def sharded_instance_solve(
    solve_batch_fn: Callable, mesh: Mesh, *batched_args, axis: str = "data"
):
    """Shard a vmapped solve over the mesh's instance axis.

    solve_batch_fn(*batched_args) must map leading-axis batches to
    leading-axis results; each device runs it on its shard (SPMD, no
    cross-instance communication).
    """
    n_in = len(batched_args)
    shard_fn = jax.shard_map(
        solve_batch_fn,
        mesh=mesh,
        in_specs=tuple(P(axis) for _ in range(n_in)),
        out_specs=P(axis),
        check_vma=False,  # while_loop carries start unvarying, become varying
    )
    # jit the sharded program: eager shard_map dispatches the body
    # primitive-by-primitive across all mesh devices (measured ~10x
    # slower than the compiled program on the 8-device CPU test mesh)
    return jax.jit(shard_fn)(*batched_args)


def mc_success_rate(
    success_fn: Callable, mesh: Optional[Mesh], *batched_args, axis: str = "data"
):
    """Mesh-reduced Monte-Carlo success rate.

    success_fn(*args) -> (shard_batch,) bool/float per-instance successes.
    Returns the global mean, reduced with `psum` over the 'data' axis —
    the on-device equivalent of the reference's host-side MC statistics
    (state-bounds notebook cells 19-20).
    """
    if mesh is None:
        return jnp.mean(success_fn(*batched_args))

    def shard(*args):
        s = success_fn(*args).astype(jnp.float32)
        total = jax.lax.psum(jnp.sum(s), axis)
        count = jax.lax.psum(jnp.asarray(s.shape[0], jnp.float32), axis)
        return total / count

    fn = jax.shard_map(
        shard,
        mesh=mesh,
        in_specs=tuple(P(axis) for _ in batched_args),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(*batched_args)
