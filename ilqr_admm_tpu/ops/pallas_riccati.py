"""Fused Pallas kernel for the blocked time-parallel Riccati scan.

The XLA blocked suffix scan (`parallel_riccati._blocked_suffix_scan`)
runs L + nb steps of batched tiny-matrix combines; at d=4 each combine
lowers to dozens of (nb, 4, 4) ops that XLA pads and schedules
individually — ~47 us/step of overhead, 9.6 ms of the 10.4 ms N=10k
solve. This kernel runs the whole level-1 sweep (and the final join)
inside VMEM with a **lane-major layout**: element t = block b * L + j
lives in lane b, so every combine is a fixed set of (1, 128)-row
multiply-adds with compile-time indices — the (I + C J)^{-1} inverse is
the unrolled adjugate (`inv_small`'s math), no LU.

Pipeline:
1. pack elements (N, d, d) -> (L, d*d, nb) slabs (block on lanes);
2. kernel 1: reverse fori_loop over L — each step one 128-wide combine;
   emits all local suffixes and (row 0) the per-block totals;
3. XLA: tiny exclusive suffix scan over the nb block totals;
4. kernel 2: one batched join combine(r[j], S_block) per step, emitting
   only the (J, eta) components needed for gain extraction.

d <= 4 only (adjugate); nb is fixed at 128 so the lane dim is full.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_admm_tpu.ops.parallel_riccati import (
    DPGains,
    _combine,
    _identity_elems,
    gains_from_scanned,
    value_elements,
)
from ilqr_admm_tpu.utils.precision import highest_precision

_F32 = jnp.float32


def _rows(X, d, perm=None):
    """List of (1, n) rows of a (d*d, n) slab (optionally permuted)."""
    idx = range(X.shape[0]) if perm is None else perm
    return [X[i : i + 1, :] for i in idx]


def _cat(rows):
    return jnp.concatenate(rows, axis=0)


def _mm(P, Q, d):
    """(d*d, n) @ (d*d, n) slab matmul: out[i*d+j] = sum_k P[i,k] Q[k,j]."""
    out = []
    for i in range(d):
        for j in range(d):
            acc = P[i * d : i * d + 1, :] * Q[j : j + 1, :]
            for k in range(1, d):
                acc = acc + P[i * d + k : i * d + k + 1, :] * Q[k * d + j : k * d + j + 1, :]
            out.append(acc)
    return _cat(out)


def _mt(P, d):
    """Slab transpose: out[i*d+j] = P[j*d+i]."""
    return _cat([P[j * d + i : j * d + i + 1, :] for i in range(d) for j in range(d)])


def _mv(P, v, d):
    """(d*d, n) @ (d, n) slab matvec."""
    out = []
    for i in range(d):
        acc = P[i * d : i * d + 1, :] * v[0:1, :]
        for k in range(1, d):
            acc = acc + P[i * d + k : i * d + k + 1, :] * v[k : k + 1, :]
        out.append(acc)
    return _cat(out)


def _minor3(M, r, c, d):
    """3x3 minor determinant of the slab matrix with row r / col c removed."""
    rows = [i for i in range(d) if i != r]
    cols = [j for j in range(d) if j != c]
    if d == 2:
        return M[rows[0] * d + cols[0] : rows[0] * d + cols[0] + 1, :]
    if d == 3:
        a, b = rows[0] * d + cols[0], rows[0] * d + cols[1]
        c2, dd = rows[1] * d + cols[0], rows[1] * d + cols[1]
        return (M[a : a + 1] * M[dd : dd + 1] - M[b : b + 1] * M[c2 : c2 + 1])

    def e(i, j):
        return M[rows[i] * d + cols[j] : rows[i] * d + cols[j] + 1, :]

    return (
        e(0, 0) * (e(1, 1) * e(2, 2) - e(1, 2) * e(2, 1))
        - e(0, 1) * (e(1, 0) * e(2, 2) - e(1, 2) * e(2, 0))
        + e(0, 2) * (e(1, 0) * e(2, 1) - e(1, 1) * e(2, 0))
    )


def _inv_slab(M, d):
    """Adjugate inverse of a (d*d, n) slab (d <= 4), scalar-scaled."""
    if d == 1:
        return 1.0 / M
    s = jnp.max(jnp.abs(M), axis=0, keepdims=True)
    Mh = M / s
    adj = _cat(
        [
            ((-1.0) ** (r + c)) * _minor3(Mh, r, c, d)
            for c in range(d)
            for r in range(d)
        ]
    )  # adj[c*d + r] = cofactor(r, c) = adjugate row-major (c is out-row)
    det = adj[0:1, :] * Mh[0:1, :]
    for j in range(1, d):
        det = det + Mh[j : j + 1, :] * adj[j * d : j * d + 1, :]
    return adj / det / s


def _combine_slab(e1, e2, d, I_rows):
    """The conditional-value-function combine on slab components.

    e = (A, b, C, eta, J): matrices (d*d, n), vectors (d, n).
    Mirrors `parallel_riccati._combine` (earlier, later).
    """
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    M = _inv_slab(I_rows + _mm(C1, J2, d), d)
    A2M = _mm(A2, M, d)
    MT = _mt(M, d)
    A1T = _mt(A1, d)
    A = _mm(A2M, A1, d)
    b = _mv(A2M, b1 + _mv(C1, eta2, d), d) + b2
    C = _mm(_mm(A2M, C1, d), _mt(A2, d), d) + C2
    A1T_MT = _mm(A1T, MT, d)
    eta = _mv(A1T_MT, eta2 - _mv(J2, b1, d), d) + eta1
    J = _mm(A1T_MT, _mm(J2, A1, d), d) + J1
    return (A, b, C, eta, J)


def _scan_kernel(A_ref, b_ref, C_ref, eta_ref, J_ref,
                 Ao_ref, bo_ref, Co_ref, etao_ref, Jo_ref,
                 *, L: int, d: int):
    """Level-1 reverse suffix scan: out[j] = e_j o e_{j+1} o ... o e_{L-1},
    every step one 128-lane-wide combine."""
    n = A_ref.shape[-1]
    eye = jnp.concatenate(
        [
            jnp.full((1, n), 1.0 if (i % (d + 1) == 0) else 0.0, _F32)
            for i in range(d * d)
        ],
        axis=0,
    )
    zero_m = jnp.zeros((d * d, n), _F32)
    zero_v = jnp.zeros((d, n), _F32)

    def body(t, carry):
        j = L - 1 - t
        ej = (A_ref[j], b_ref[j], C_ref[j], eta_ref[j], J_ref[j])
        out = _combine_slab(ej, carry, d, eye)
        Ao_ref[j], bo_ref[j], Co_ref[j], etao_ref[j], Jo_ref[j] = out
        return out

    lax.fori_loop(0, L, body, (eye, zero_v, zero_m, zero_v, zero_m))


def _join_kernel(A_ref, b_ref, C_ref, eta_ref, J_ref,
                 SA_ref, Sb_ref, SC_ref, Seta_ref, SJ_ref,
                 etao_ref, Jo_ref, *, L: int, d: int):
    """Final join: out[j] = combine(r[j], S_block) — only (eta, J) emitted
    (all gain extraction needs)."""
    n = A_ref.shape[-1]
    eye = jnp.concatenate(
        [
            jnp.full((1, n), 1.0 if (i % (d + 1) == 0) else 0.0, _F32)
            for i in range(d * d)
        ],
        axis=0,
    )
    S = (SA_ref[:], Sb_ref[:], SC_ref[:], Seta_ref[:], SJ_ref[:])

    def body(j, _):
        ej = (A_ref[j], b_ref[j], C_ref[j], eta_ref[j], J_ref[j])
        _, _, _, eta, J = _combine_slab(ej, S, d, eye)
        etao_ref[j] = eta
        Jo_ref[j] = J
        return 0

    lax.fori_loop(0, L, body, 0)


def _pack(x, nb, L, comp_rows):
    """(N_pad, d, d)|(N_pad, d) -> (L, comp_rows, nb): element t = b*L + j
    in lane b at step j."""
    x = x.reshape((nb, L, comp_rows))
    return jnp.transpose(x, (1, 2, 0))


def _unpack(x, N, comp_rows):
    """(L, comp_rows, nb) -> (nb*L, comp_rows)[:N]."""
    return jnp.transpose(x, (2, 0, 1)).reshape((-1, comp_rows))[:N]


@highest_precision
def lqt_backward_parallel_pallas(
    A: jax.Array,
    B: jax.Array,
    Q: jax.Array,
    xd: jax.Array,
    R: jax.Array,
    Qr=None, xr=None, Rr=None, ur=None,
    nb: int = 128,
    interpret: bool = False,
) -> DPGains:
    """Blocked time-parallel LQT Riccati with the scan fused in Pallas.

    Same contract as `lqt_backward_parallel(block_size=..., fast_inverse
    =True)`; d <= 4. nb blocks ride the 128-lane axis (nb=128 default),
    L = ceil(N/nb) sequential steps. Use for long horizons (N ≳ 2k).
    """
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    if d > 4:
        raise ValueError(f"pallas blocked Riccati supports d <= 4, got {d}")
    dtype = _F32
    A32, B32 = A.astype(dtype), B.astype(dtype)

    elems, U, s = value_elements(
        A32, B32, Q.astype(dtype), xd.astype(dtype), R.astype(dtype),
        Qr=None if Qr is None else Qr.astype(dtype),
        xr=None if xr is None else xr.astype(dtype),
        Rr=None if Rr is None else Rr.astype(dtype),
        ur=None if ur is None else ur.astype(dtype),
        fast_inverse=True,
    )
    L = -(-N // nb)
    pad = nb * L - N
    ident = _identity_elems((), d, dtype)
    padded = tuple(
        jnp.concatenate(
            [x, jnp.broadcast_to(ix, (pad,) + x.shape[1:])], axis=0
        ) if pad else x
        for x, ix in zip(elems, ident)
    )
    # component slabs (L, rows, nb)
    comp_rows = (d * d, d, d * d, d, d * d)
    slabs = tuple(
        _pack(x.reshape(nb * L, -1), nb, L, r)
        for x, r in zip(padded, comp_rows)
    )

    mshape = jax.ShapeDtypeStruct((L, d * d, nb), dtype)
    vshape = jax.ShapeDtypeStruct((L, d, nb), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    r_slabs = pl.pallas_call(
        functools.partial(_scan_kernel, L=L, d=d),
        in_specs=[vmem()] * 5,
        out_specs=tuple([vmem()] * 5),
        out_shape=(mshape, vshape, mshape, vshape, mshape),
        interpret=interpret,
    )(*slabs)

    # exclusive suffix over the nb block totals (tiny, XLA)
    totals = tuple(
        jnp.transpose(x[0], (1, 0)).reshape((nb,) + shp)
        for x, shp in zip(r_slabs, ((d, d), (d,), (d, d), (d,), (d, d)))
    )
    comb = functools.partial(_combine, fast_inverse=True)
    comb_v = jax.vmap(comb)
    # inclusive suffix scan then shift to exclusive
    inc = lax.associative_scan(lambda a, b: comb_v(b, a), totals, reverse=True)
    ident_nb = _identity_elems((1,), d, dtype)
    S_excl = tuple(
        jnp.concatenate([x[1:], jnp.broadcast_to(ix, (1,) + x.shape[1:])], 0)
        for x, ix in zip(inc, ident_nb)
    )
    S_slabs = tuple(
        jnp.transpose(x.reshape(nb, -1), (1, 0)) for x in S_excl
    )

    eta_slab, J_slab = pl.pallas_call(
        functools.partial(_join_kernel, L=L, d=d),
        in_specs=[vmem()] * 10,
        out_specs=(vmem(), vmem()),
        out_shape=(vshape, mshape),
        interpret=interpret,
    )(*r_slabs, *S_slabs)

    eta_all = _unpack(eta_slab, N, d)
    J_all = _unpack(J_slab, N, d * d).reshape(N, d, d)
    scanned = (None, None, None, eta_all, J_all)
    return gains_from_scanned(A32, B32, U, s, scanned, fast_inverse=True)
