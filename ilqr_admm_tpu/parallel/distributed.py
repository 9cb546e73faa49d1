"""Multi-host orchestration helpers (JAX multi-controller SPMD).

The reference is single-process (SURVEY §2.3); the TPU-native scale-out
story is standard JAX SPMD: every host runs the same program,
`jax.distributed.initialize` wires the runtime, the global mesh spans
all chips, and the instance axis shards across hosts over DCN while
per-shard compute and `psum` reductions ride ICI within each slice.

Collective traffic in this problem class is tiny relative to compute
(duals are O(N·d) per instance), so scaling efficiency is a
batching/occupancy problem, not a bandwidth one (SURVEY §5).

Usage on a pod slice (same script on every host):

    from ilqr_admm_tpu.parallel import distributed, make_mesh
    distributed.initialize()          # no-op on single host
    mesh = make_mesh()                # spans all global devices
    ...
    # host-local shard of the instance batch:
    x0s_local = distributed.host_shard(x0s_global)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-controller runtime; no-op when single-host.

    With no arguments, relies on the TPU environment's auto-detection
    (GKE / TPU VMs set the coordinator env vars). Returns True when a
    multi-process runtime was initialized.
    """
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    multi_env = (
        coordinator_address is not None
        or (num_processes or 1) > 1
        or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1
    )
    if not multi_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # backend already initialized (single-host interactive use) —
        # multi-host runs must call initialize() before any JAX op.
        return False
    return jax.process_count() > 1


def host_shard(global_array: np.ndarray) -> np.ndarray:
    """This host's contiguous shard of a host-replicated instance batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_array.shape[0] // n
    return global_array[i * per : (i + 1) * per]


def make_global_batch(local_batch, mesh, axis: str = "data"):
    """Assemble a global sharded array from per-host local shards.

    Wraps `jax.make_array_from_process_local_data` so batched solvers can
    consume a (global_batch, ...) array sharded over the instance axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))
