"""Matmul-precision policy.

TPU f32 matmuls default to single-pass bf16 multiplication, which is
catastrophic for this problem class (NaN Cholesky factors at the
reference's 1e6 cost weights, diverging ADMM iterates — see
docs/architecture.md §4). Every solver/op whose accuracy feeds a
factorization, a recursion, or an accept/reject decision traces under
HIGHEST precision via this decorator. Hot kernels that manage precision
explicitly (bf16x3 in `ops/pallas_admm.py`, pinned `_mm` in
`solvers/batched.py`) opt out deliberately.
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Trace fn under default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
