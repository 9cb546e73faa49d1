"""ctypes bindings for the native C++ runtime (`native/kinematics.cpp`).

Builds the shared library on first use (g++, cached under native/build).
Provides host-side batched planar-chain kinematics — the counterpart of
the reference's Pinocchio dependency (SURVEY §2.2) — and an independent
C++ LQT Riccati backward pass used as a cross-language oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "kinematics.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libilqr_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
        )
    return _LIB


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        lib.planar_fk.argtypes = [dp, ctypes.c_int, dp, dp]
        lib.planar_fk_batch.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int, dp]
        lib.planar_jacobian.argtypes = [dp, ctypes.c_int, dp, dp]
        lib.planar_jacobian_batch.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int, dp]
        lib.lqt_backward_ref.argtypes = [dp] * 5 + [ctypes.c_int] * 3 + [dp, dp]
        _lib = lib
    return _lib


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def planar_fk(lengths, qs) -> np.ndarray:
    """FK for (n,) or (batch, n) joint angles -> (3,) or (batch, 3)."""
    lib = load()
    lengths = np.ascontiguousarray(lengths, dtype=np.float64)
    qs = np.ascontiguousarray(qs, dtype=np.float64)
    n = lengths.shape[0]
    if qs.ndim == 1:
        out = np.empty(3)
        lib.planar_fk(_cptr(lengths), n, _cptr(qs), _cptr(out))
        return out
    out = np.empty((qs.shape[0], 3))
    lib.planar_fk_batch(_cptr(lengths), n, _cptr(qs), qs.shape[0], _cptr(out))
    return out


def planar_jacobian(lengths, qs) -> np.ndarray:
    """Jacobian for (n,) or (batch, n) angles -> (3, n) or (batch, 3, n)."""
    lib = load()
    lengths = np.ascontiguousarray(lengths, dtype=np.float64)
    qs = np.ascontiguousarray(qs, dtype=np.float64)
    n = lengths.shape[0]
    if qs.ndim == 1:
        out = np.empty((3, n))
        lib.planar_jacobian(_cptr(lengths), n, _cptr(qs), _cptr(out))
        return out
    out = np.empty((qs.shape[0], 3, n))
    lib.planar_jacobian_batch(_cptr(lengths), n, _cptr(qs), qs.shape[0], _cptr(out))
    return out


def lqt_backward_ref(A, B, Q, xd, R):
    """Independent C++ LQT Riccati backward pass. Returns (K, k)."""
    lib = load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    Q = np.ascontiguousarray(Q, dtype=np.float64)
    xd = np.ascontiguousarray(xd, dtype=np.float64)
    R = np.ascontiguousarray(R, dtype=np.float64)
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    K = np.empty((N, m, d))
    k = np.empty((N, m))
    lib.lqt_backward_ref(
        _cptr(A), _cptr(B), _cptr(Q), _cptr(xd), _cptr(R),
        N, d, m, _cptr(K), _cptr(k),
    )
    return K, k
