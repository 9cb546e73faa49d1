"""Time-axis (horizon) sharding of the Riccati recursion over a device mesh.

The distributed form of this domain's "sequence parallelism" (SURVEY
§2.3 / §5): the horizon N is split into P contiguous chunks, one per
device along a `('time',)` mesh axis. Each device runs a *local*
suffix scan over its chunk of conditional-value-function elements
(`ops/parallel_riccati.py`), then the P chunk totals are exchanged with
ONE `all_gather` (tiny: P × element, each O(d²)) and every device joins
its local suffixes with the exclusive suffix of the later chunks —
exactly the two-level blocked scan with the block level mapped onto the
mesh. Communication: one all_gather of O(P·d²) floats, nothing else.

Gain extraction stays local per time chunk (embarrassingly parallel),
with the one-step value-function shift handled by GSPMD on the sharded
arrays.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ilqr_admm_tpu.ops.parallel_riccati import (
    DPGains,
    _combine,
    _identity_elems,
    gains_from_scanned,
    ilqr_value_elements,
    value_elements,
)
from ilqr_admm_tpu.utils.precision import highest_precision


def time_sharded_suffix_scan(combine, identity, elems, mesh: Mesh, axis: str):
    """Inclusive suffix scan of `elems` (pytree of (N, ...) arrays) with
    the time axis sharded over mesh axis `axis`.

    combine(earlier, later) must broadcast over a leading batch dim;
    identity(prefix) builds identity elements. N must divide evenly by
    the mesh axis size. Call under `jax.jit` — eager shard_map dispatch
    of the P-step combine chain is orders of magnitude slower.
    """
    P_ = mesh.shape[axis]
    N = jax.tree_util.tree_leaves(elems)[0].shape[0]
    if N % P_ != 0:
        raise ValueError(f"horizon {N} must be divisible by mesh axis size {P_}")
    comb_v = jax.vmap(combine)

    def local(chunk):
        # chunk leaves: (N/P, ...) — local inclusive suffix scan
        scanned = lax.associative_scan(
            lambda a, b: comb_v(b, a), chunk, reverse=True
        )
        total = jax.tree_util.tree_map(lambda x: x[:1], scanned)  # (1, ...)
        totals = jax.tree_util.tree_map(
            lambda x: lax.all_gather(x, axis), total
        )  # (P, 1, ...) on every device

        # exclusive suffix of the later chunks for my position i:
        # S_i = totals[i+1] ∘ … ∘ totals[P-1]  (identity for i = P-1)
        idx = lax.axis_index(axis)
        S = identity((1,))
        for j in reversed(range(P_)):
            tj = jax.tree_util.tree_map(lambda x: x[j], totals)
            Sj = combine(tj, S)  # chunk j is earlier than chunks > j
            S = jax.tree_util.tree_map(
                lambda a, b: jnp.where(j > idx, a, b), Sj, S
            )
        return combine(scanned, S)  # (N/P, ...) ⊗ (1, ...) broadcast

    specs = P(axis)
    return shard_map(
        local, mesh=mesh,
        in_specs=(specs,), out_specs=specs,
    )(elems)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "fast_inverse")
)
@highest_precision
def _lqt_backward_time_sharded_impl(
    A, B, Q, xd, R, Qr, xr, Rr, ur, *, mesh, axis, fast_inverse
) -> DPGains:
    d = A.shape[-1]
    dtype = A.dtype
    elems, U, s = value_elements(
        A, B, Q, xd, R, Qr=Qr, xr=xr, Rr=Rr, ur=ur, fast_inverse=fast_inverse
    )
    comb = functools.partial(_combine, fast_inverse=fast_inverse)
    scanned = time_sharded_suffix_scan(
        comb, lambda p: _identity_elems(p, d, dtype), elems, mesh, axis
    )
    # keep the scan results (and gain extraction) sharded over time
    sharding = NamedSharding(mesh, P(axis))
    scanned = jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), scanned
    )
    return gains_from_scanned(A, B, U, s, scanned, fast_inverse=fast_inverse)


def lqt_backward_time_sharded(
    A: jax.Array,
    B: jax.Array,
    Q: jax.Array,
    xd: jax.Array,
    R: jax.Array,
    Qr: Optional[jax.Array] = None,
    xr: Optional[jax.Array] = None,
    Rr: Optional[jax.Array] = None,
    ur: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = "time",
    fast_inverse: bool = False,
) -> DPGains:
    """LQT Riccati with the horizon sharded over `mesh[axis]`.

    Same contract as `ops.riccati.lqt_backward` / `lqt_backward_parallel`
    but the (N, ...) arrays live sharded along the time axis: each device
    scans its chunk, one all_gather joins the chunks. Collective traffic
    is O(P · d²) per solve regardless of N.

    Jitted with (mesh, axis, fast_inverse) static: eager shard_map
    dispatch of the combine chain is catastrophically slow on many-device
    meshes (measured ~70 s/call vs ~1 s jitted at N=64 on the 8-device
    CPU test mesh) and the jit cache makes repeat solves free.
    """
    if fast_inverse and A.shape[-1] > 4:
        raise ValueError(
            f"fast_inverse=True uses the closed-form adjugate inverse, which "
            f"supports state dim <= 4 (got d={A.shape[-1]}); use the default "
            "LU combine for larger states"
        )
    return _lqt_backward_time_sharded_impl(
        A, B, Q, xd, R, Qr, xr, Rr, ur,
        mesh=mesh, axis=axis, fast_inverse=fast_inverse,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "fast_inverse", "return_value")
)
@highest_precision
def _ilqr_backward_time_sharded_impl(
    A, B, Cts, cts, drift, *, mesh, axis, fast_inverse, return_value
):
    d = A.shape[-1]
    dtype = A.dtype
    elems, U, s, A_t, Kc = ilqr_value_elements(
        A, B, Cts, cts, fast_inverse=fast_inverse, drift=drift
    )
    comb = functools.partial(_combine, fast_inverse=fast_inverse)
    scanned = time_sharded_suffix_scan(
        comb, lambda p: _identity_elems(p, d, dtype), elems, mesh, axis
    )
    sharding = NamedSharding(mesh, P(axis))
    scanned = jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), scanned
    )
    gains = gains_from_scanned(
        A_t, B, U, s, scanned, fast_inverse=fast_inverse, drift=drift
    )
    if return_value:
        return gains.K - Kc, gains.k, scanned[4], scanned[3]
    return gains.K - Kc, gains.k


def ilqr_backward_time_sharded(
    A: jax.Array,
    B: jax.Array,
    Cts: jax.Array,
    cts: jax.Array,
    drift: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = "time",
    fast_inverse: bool = False,
    return_value: bool = False,
):
    """General iLQR Riccati (Cux cross terms, optional affine drift) with
    the horizon sharded over `mesh[axis]`.

    Same (K, k) contract as `ops.parallel_riccati.ilqr_backward_parallel`
    — the nonlinear solvers' backward pass distributed across devices:
    completion-of-squares prelude is per-stage (stays sharded), each
    device scans its chunk, ONE all_gather of O(P·d²) chunk totals joins
    them, gain extraction is local. With `drift` this is also the
    pod-scale backward for the box-constrained active-set iteration
    (`ops/constrained_riccati.py::ilqr_backward_box_parallel` freezes
    clamped controls as a drift); `return_value=True` adds the per-stage
    cost-to-go (J, eta) its exchange test needs.
    """
    if fast_inverse and A.shape[-1] > 4:
        raise ValueError(
            f"fast_inverse=True supports state dim <= 4 (got d={A.shape[-1]})"
        )
    return _ilqr_backward_time_sharded_impl(
        A, B, Cts, cts, drift,
        mesh=mesh, axis=axis, fast_inverse=fast_inverse,
        return_value=return_value,
    )
