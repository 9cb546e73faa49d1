"""Fused Pallas line-search rollout: all alpha candidates in VMEM.

The iLQR/iLQR-ADMM inner loop's dominant single-instance cost at long
horizons is the line-search rollout: a `vmap`-over-candidates
`lax.scan` whose ~1.7 us/step dispatch+pipeline overhead dwarfs the
handful of VPU flops per step (N=500 car: ~0.86 ms per 20-candidate
rollout, pipeline-bound — scan `unroll` recovers only ~18%). This
kernel runs the whole rollout as ONE Pallas program: the candidate
batch lives in the VPU lane axis ((state_dim, 128) state block), the
horizon is a `fori_loop` with near-zero per-step overhead, and the
trajectory streams to a VMEM output block.

Layout: states are (8, 128) f32 blocks — rows = state components
(padded to the f32 sublane tile), lanes = line-search candidates
(padded to 128). The plant supplies a *columns* step
`step_cols(x (d, A), u (m, A)) -> (d, A)` — the same scalar math as
`step` broadcast across lanes, so results are bit-identical to the
vmapped scan per candidate.

Reference seed: the batched-over-alphas rollout `rollout_DP` /
`rollout_batch` (`isls.py:310-334,135-154`).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # f32 sublane tile
_LANES = 128


def asin_newton(z, iters: int = 4):
    """Mosaic-safe arcsin: Newton on sin(y) = z (quadratic; ~1-2 ulp f32
    after 4 iterations for |z| <= 0.9).

    Mosaic has sin/cos/tan/sqrt but no asin/atan lowering; plants whose
    step uses `jnp.arcsin` (CarFrontWheel's axle geometry) substitute
    this inside the kernel (`CarFrontWheel.step(..., _asin=asin_newton)`).
    Not for |z| -> 1 (cos(y) -> 0); the car's argument is dt*v*sin(w)/d,
    far from the pole for any sane dt.
    """
    y = z  # good start for the small-angle regime
    for _ in range(iters):
        y = y - (jnp.sin(y) - z) / jnp.cos(y)
    return y
# whole-trajectory VMEM budget guard: u block + xs block + scratch
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def make_pallas_linesearch_rollout(
    step_cols: Callable,
    N: int,
    d: int,
    m: int,
    n_alphas: int,
    interpret: bool = False,
):
    """Build rollout_all(x0 (d,), u_cands (A, N, m)) -> xs (A, N, d).

    step_cols: plant dynamics over candidate columns, (d, A) x (m, A)
    -> (d, A). A = n_alphas <= 128 (one lane block). The returned
    trajectories match `vmap(rollout_nonlinear)` bit-for-bit per
    candidate (same ops, same order, lane-parallel).
    """
    if d > _SUB or m > _SUB:
        raise ValueError(
            f"state/control dims must fit one sublane tile ({_SUB}); "
            f"got d={d}, m={m} — extend the layout to multi-row blocks"
        )
    if n_alphas > _LANES:
        raise ValueError(
            f"n_alphas={n_alphas} > {_LANES}: one lane block per candidate "
            "batch; split the alpha grid"
        )
    need = (2 * N * _SUB * _LANES + _SUB * _LANES) * 4
    if need > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"horizon N={N} needs ~{need >> 20} MiB of VMEM for the "
            "whole-trajectory layout (budget 12 MiB); use the scan rollout"
        )

    pad_rows = _SUB - d

    def kernel(x0_ref, u_ref, xs_ref, x_scr):
        x_scr[:] = x0_ref[:]

        def body(t, carry):
            x = x_scr[:]
            xs_ref[t] = x
            u = u_ref[t]
            new = step_cols(x[:d], u[:m])  # (d, A) lane-parallel step
            x_scr[:] = jnp.concatenate(
                [new, jnp.zeros((pad_rows, _LANES), new.dtype)], axis=0
            ) if pad_rows else new
            return carry

        jax.lax.fori_loop(0, N, body, 0)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, _SUB, _LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_SUB, _LANES), jnp.float32)],
        interpret=interpret,
    )

    @jax.jit
    def rollout_all(x0, u_cands):
        x0 = x0.astype(jnp.float32)
        u_cands = u_cands.astype(jnp.float32)
        x0p = jnp.zeros((_SUB, _LANES), jnp.float32)
        x0p = x0p.at[:d, :].set(x0[:, None])  # broadcast across lanes
        up = jnp.zeros((N, _SUB, _LANES), jnp.float32)
        up = up.at[:, :m, :n_alphas].set(u_cands.transpose(1, 2, 0))
        xs = call(x0p, up)  # (N, 8, 128)
        return xs[:, :d, :n_alphas].transpose(2, 0, 1)  # (A, N, d)

    return rollout_all


def linesearch_rollout_xla(f, x0, u_cands, unroll: int = 8):
    """XLA oracle for the kernel: vmapped scan rollout over candidates."""
    from ilqr_admm_tpu.ops.rollout import rollout_nonlinear

    return jax.vmap(
        lambda us: rollout_nonlinear(f, x0, us, unroll=unroll)
    )(u_cands)
