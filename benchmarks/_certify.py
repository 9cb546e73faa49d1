"""Shared certification helpers for the benchmark suite.

Every README-quoted number must come from (a) a READBACK-terminated
timing window (docs/LATENCY.md: `block_until_ready` can return before
remote work completes on the tunnel backend — a scalar readback of the
last result is the defensible close), and (b) a solution-quality
certificate (feasibility, convergence fraction, f64 oracle cost gap) —
the same machinery as bench.py / bench_wide_certified.py (VERDICT r4 #1).
"""

import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed_rate(run_once, n_per_call: int, K: int = 10, reps: int = 3):
    """Best-of-`reps` readback-terminated windows of K pipelined calls.

    run_once() must RETURN a device array from the final dispatch; the
    window closes on a scalar readback of it (in-order execution ⇒ all
    K calls completed). Returns (rate_per_s, window_s)."""
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(K):
            out = run_once()
        _ = float(np.asarray(out).ravel()[0])  # readback terminates window
        best = min(best, (time.perf_counter() - t0) / K)
    return n_per_call / best, best


def run_oracle(task: str, data: dict) -> dict:
    """Run a f64 CPU oracle (benchmarks/_oracles.py) in a subprocess.

    The parent process holds the TPU client; the child pins CPU+x64
    in-process before any JAX use. Data roundtrips via npz."""
    with tempfile.TemporaryDirectory() as td:
        f_in = os.path.join(td, "in.npz")
        f_out = os.path.join(td, "out.npz")
        np.savez(f_in, **data)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        # never share the TPU-fingerprinted compile cache with a CPU child
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "benchmarks", "_oracles.py"),
             task, f_in, f_out],
            check=True, cwd=REPO, env=env, timeout=3600,
        )
        return dict(np.load(f_out))


def gaps(j_ours, j_star):
    """Relative cost excess of ours over the oracle, (median, max)."""
    j_ours = np.asarray(j_ours, np.float64)
    j_star = np.asarray(j_star, np.float64)
    g = (j_ours - j_star) / np.maximum(np.abs(j_star), 1e-12)
    return float(np.median(g)), float(np.max(g))
