"""Mesh-parallel consensus-ADMM intersection projection.

SURVEY §2.3 "Consensus-ADMM block parallelism": the reference's
`project_set_convex` (`projections.py:289-374`) runs its consensus loop
over constraint sets sequentially in Python. Here the constraint blocks
(A_i, b_i, P_i) are *stacked* along a leading block axis and partitioned
over a `('consensus',)` mesh axis with `shard_map`:

- the x-update's consensus aggregation  sum_i A_i^T (z_i - b_i - lmb_i)
  is a device-local partial sum followed by one `psum` over the axis —
  the only inter-device traffic per iteration (O(dim) per batch element,
  riding ICI);
- z-updates (projections) and scaled-dual updates are block-local, so
  they run fully in parallel across devices;
- the stopping test reduces the block-wise residual maxima with `pmax`.

`project_set_convex_stacked` is the single-device equivalent over the
same stacked operands (exactness oracle for the sharded path, and faster
than the list form when blocks share shapes: one batched einsum instead
of a Python loop over blocks).
"""

from __future__ import annotations

import inspect
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ilqr_admm_tpu.utils.precision import highest_precision

_EPS = 1e-30


def _blockwise(projection: Callable) -> Callable:
    """Normalize a projection to signature (y, block_idx) -> z.

    `projection(y)` — one operator applied to every block (the common
    case: the reference's chance constraints project every row onto the
    same SOC geometry with per-block (A, b)); or `projection(y, idx)` —
    heterogeneous sets dispatching on the global block index (e.g. via
    `lax.switch`), so the sharded path supports mixed constraint types
    without per-device Python branching.
    """
    try:
        n_params = len(inspect.signature(projection).parameters)
    except (TypeError, ValueError):  # builtins / partials without sig
        n_params = 1
    if n_params >= 2:
        return projection
    return lambda y, idx: projection(y)


def _consensus_admm(
    x0b, As, bs, mask, idxs, proj, rho, max_iter, threshold, stall_tol,
    reduce_sum, reduce_max,
):
    """Shared consensus-ADMM body over stacked blocks.

    x0b: (batch..., dim) replicated; As: (nb, m, dim); bs: (nb, m);
    mask: (nb,) 1.0 valid / 0.0 padding; idxs: (nb,) global block ids.
    reduce_sum / reduce_max: identity on one device, psum/pmax over the
    'consensus' axis under shard_map. Math identical to
    `projections.sets.project_set_convex` (reference
    `projections.py:289-374`).
    """
    dtype = x0b.dtype
    dim = x0b.shape[-1]
    m_ = mask[:, None, None]

    # I + rho * sum_i A_i^T A_i  (pad blocks are zero matrices)
    l_local = rho * jnp.einsum("smi,smj->ij", As * m_, As)
    l_side = jnp.eye(dim, dtype=dtype) + reduce_sum(l_local)
    l_inv = jnp.linalg.inv(l_side)

    bs_b = bs.reshape(bs.shape[:1] + (1,) * (x0b.ndim - 1) + bs.shape[1:])

    def frames(x):
        # (nb, batch..., m): y_i = A_i x + b_i
        return jnp.einsum("smj,...j->s...m", As, x) + bs_b

    bmask = mask.reshape((-1,) + (1,) * x0b.ndim)  # broadcast over batch+m

    z0 = frames(x0b) * bmask
    lmb0 = jnp.zeros_like(z0)

    def cond(state):
        j, x, zs, lmbs, prim, dual, prev_prim, prev_dual = state
        converged = jnp.logical_and(prim < threshold, dual < threshold)
        stalled = jnp.logical_and(
            jnp.abs(prev_prim - prim) / (prev_prim + _EPS) < stall_tol,
            jnp.abs(prev_dual - dual) / (prev_dual + _EPS) < stall_tol,
        )
        return jnp.logical_and(
            j < max_iter, jnp.logical_not(jnp.logical_or(converged, stalled))
        )

    def body(state):
        j, x, zs, lmbs, prim, dual, _, _ = state
        resid = (zs - bs_b - lmbs) * bmask
        r_local = jnp.einsum("s...m,smj->...j", resid, As)
        r_side = reduce_sum(r_local)
        x_new = (x0b + rho * r_side) @ l_inv.T

        y = frames(x_new)
        z_new = proj(y + lmbs, idxs) * bmask
        r = (y - z_new) * bmask
        lmb_new = lmbs + r

        # per-block residual maxima (pad blocks contribute 0), reduced
        # over the mesh: identical to the list form's max over blocks
        prim_new = reduce_max(jnp.max(jnp.linalg.norm(r, axis=-1)))
        dz = jnp.einsum("s...m,smj->s...j", (z_new - zs) * bmask, As)
        dual_new = reduce_max(jnp.max(rho * jnp.linalg.norm(dz, axis=-1)))

        return j + 1, x_new, z_new, lmb_new, prim_new, dual_new, prim, dual

    big = jnp.asarray(1e5, dtype)
    prev = jnp.asarray(1e10, dtype)  # != big: stall can't fire pre-iteration
    state = (jnp.int32(0), x0b, z0, lmb0, big, big, prev, prev)
    _, x, *_ = lax.while_loop(cond, body, state)
    return x


@highest_precision
def project_set_convex_stacked(
    x0,
    As,
    bs,
    projection: Callable,
    rho: float = 1.0,
    max_iter: int = 200,
    threshold: float = 1e-4,
    stall_tol: float = 1e-5,
):
    """Single-device consensus-ADMM projection over *stacked* blocks.

    Same math as `projections.sets.project_set_convex` with the block
    list replaced by stacked arrays As (nb, m, dim) / bs (nb, m) and one
    projection applied blockwise (optionally `projection(y, idx)` for
    heterogeneous sets). x0: (..., dim).
    """
    x0 = jnp.asarray(x0)
    single = x0.ndim == 1
    x0b = x0[None] if single else x0
    As = jnp.asarray(As, x0b.dtype)
    bs = jnp.asarray(bs, x0b.dtype)
    nb = As.shape[0]
    if nb == 0:
        raise ValueError(
            "project_set_convex_stacked needs at least one (A, b) block"
        )
    mask = jnp.ones((nb,), x0b.dtype)
    idxs = jnp.arange(nb)
    x = _consensus_admm(
        x0b, As, bs, mask, idxs, _blockwise(projection), rho, max_iter,
        threshold, stall_tol, lambda v: v, lambda v: v,
    )
    return x[0] if single else x


@highest_precision
def project_set_convex_sharded(
    x0,
    As,
    bs,
    projection: Callable,
    rho: float = 1.0,
    max_iter: int = 200,
    threshold: float = 1e-4,
    stall_tol: float = 1e-5,
    mesh: Optional[Mesh] = None,
    axis: str = "consensus",
):
    """Consensus-ADMM projection with blocks sharded over a mesh axis.

    Partitions the (A_i, b_i) constraint blocks across `mesh`'s `axis`
    devices; each iteration exchanges only the psum'd consensus
    aggregate (O(batch * dim)) and two pmax'd residual scalars. Blocks
    are zero-padded to a multiple of the axis size (padding is masked
    out of every update and residual). Results match
    `project_set_convex_stacked` exactly up to reduction order.

    x0: (..., dim) replicated; As: (nb, m, dim); bs: (nb, m).
    """
    if mesh is None:
        return project_set_convex_stacked(
            x0, As, bs, projection, rho, max_iter, threshold, stall_tol
        )
    x0 = jnp.asarray(x0)
    single = x0.ndim == 1
    x0b = x0[None] if single else x0
    As = jnp.asarray(As, x0b.dtype)
    bs = jnp.asarray(bs, x0b.dtype)
    nb = As.shape[0]
    if nb == 0:
        raise ValueError(
            "project_set_convex_sharded needs at least one (A, b) block"
        )
    n_dev = mesh.shape[axis]
    pad = (-nb) % n_dev
    if pad:
        As = jnp.concatenate([As, jnp.zeros((pad,) + As.shape[1:], As.dtype)])
        bs = jnp.concatenate([bs, jnp.zeros((pad,) + bs.shape[1:], bs.dtype)])
    mask = (jnp.arange(nb + pad) < nb).astype(x0b.dtype)
    idxs = jnp.arange(nb + pad)
    proj = _blockwise(projection)

    def shard(x0b, As, bs, mask, idxs):
        return _consensus_admm(
            x0b, As, bs, mask, idxs, proj, rho, max_iter, threshold,
            stall_tol,
            lambda v: lax.psum(v, axis),
            lambda v: lax.pmax(v, axis),
        )

    fn = jax.shard_map(
        shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,  # while_loop carry starts unvarying, becomes varying
    )
    x = fn(x0b, As, bs, mask, idxs)
    return x[0] if single else x
