"""Structured solver metrics and observability.

Replaces the reference's `print`-based, `verbose`-gated logging
(SURVEY §5: `admm.py:73-97`, `isls.py:492`) with structured records:
every solver already returns typed info (ADMMInfo, ILQRState/Result
statuses, residual logs as fixed-shape arrays); this module converts them
to plain dicts for logging/JSON and provides a lightweight phase timer.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from typing import Any, Dict

import numpy as np

from ilqr_admm_tpu.problem import SolveStatus


def admm_info_dict(info) -> Dict[str, Any]:
    """ADMMInfo -> JSON-able dict with residual history trimmed to iters."""
    iters = int(info.iters)
    return {
        "iters": iters,
        "prim_res": float(info.prim_res),
        "dual_res": float(info.dual_res),
        "status": SolveStatus(int(info.status)).name,
        "residual_history": np.asarray(info.logs[:iters]).tolist(),
    }


def ilqr_state_dict(state) -> Dict[str, Any]:
    return {
        "iterations": int(state.iteration),
        "cost": float(state.cost),
        "prev_cost": float(state.prev_cost),
        "status": SolveStatus(int(state.status)).name,
    }


class PhaseTimer:
    """Wall-clock phase timing (backward pass / rollout / projection ...).

    Times are host-side; call `block_until_ready` on outputs inside the
    phase for accurate device timing.
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Any]:
        return {
            name: {"total_s": t, "count": self.counts[name], "mean_s": t / self.counts[name]}
            for name, t in self.times.items()
        }

    def dumps(self) -> str:
        return json.dumps(self.summary(), indent=2)
