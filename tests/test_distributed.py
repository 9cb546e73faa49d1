"""Multi-process distributed path (`parallel/distributed.py`).

Spawns real OS processes wired through `jax.distributed.initialize`
(Gloo CPU collectives, coordinator on localhost) — the executable
evidence for SURVEY §2.3 "Distributed communication backend" /
"Multi-host orchestration" that the reference lacks entirely.

Each worker: initializes the runtime, takes its `host_shard` of a
host-replicated instance batch, assembles the global sharded array via
`make_global_batch`, solves a constrained LQT-ADMM fleet sharded over
the global ('data',) mesh with a psum-reduced mean-cost metric, and
prints the result; the parent compares every worker's number against a
single-process replay of the same fleet.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np, jax.numpy as jnp
    sys.path.insert(0, {repo!r})
    from ilqr_admm_tpu.parallel import distributed

    ok = distributed.initialize(
        coordinator_address=f"localhost:{{port}}",
        num_processes=nproc, process_id=proc_id,
    )
    assert ok, "multi-process runtime did not initialize"
    assert jax.process_count() == nproc

    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    n_dev = len(jax.devices())

    # --- host_shard partition: every instance assigned exactly once,
    # including the ragged remainder case (nb % nproc != 0)
    for nb_probe in (2 * n_dev, 2 * n_dev + 1):
        probe = np.arange(nb_probe)
        counts = nproc * [0]
        for i in range(nproc):
            # emulate each host's slice arithmetic (pure numpy, no jax)
            per, rem = divmod(nb_probe, nproc)
            start = i * per + min(i, rem)
            stop = start + per + (1 if i < rem else 0)
            counts[i] = stop - start
        assert sum(counts) == nb_probe
    local_ids = distributed.host_shard(np.arange(100))
    print(f"SHARD {{proc_id}} {{local_ids[0]}} {{local_ids[-1]}}", flush=True)

    # --- constrained LQT-ADMM fleet over the GLOBAL mesh
    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.problem import ADMMConfig
    from ilqr_admm_tpu.projections import project_bound
    from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_dp
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    N = 16
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])], dtype=jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(jnp.float32)
    seq = np.zeros(N, np.int32); seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    A = jnp.asarray(A, jnp.float32); B = jnp.asarray(B, jnp.float32)
    cfg = ADMMConfig(max_iter=10, tol=1e-4)

    nb = 2 * n_dev  # divisible: uniform shards for make_global_batch
    x0s_global = np.random.default_rng(0).normal(0, 0.1, (nb, d)).astype(np.float32)
    x0s_local = distributed.host_shard(x0s_global)
    garr = distributed.make_global_batch(x0s_local, mesh)

    def shard_fn(x0s):
        def one(x0):
            x, u, _aux, info = lqt_admm_dp(
                A, B, cost, x0,
                project_u=lambda u: project_bound(u, -5.0, 5.0),
                rho_u=1e-2, cfg=cfg,
            )
            return x, u
        xs, us = jax.vmap(one)(x0s)
        c = cost(xs.reshape(xs.shape[0], N, d), us.reshape(us.shape[0], N, m))
        total = jax.lax.psum(jnp.sum(c), "data")
        cnt = jax.lax.psum(jnp.asarray(c.shape[0], jnp.float32), "data")
        return total / cnt

    mean_cost = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P(),
        check_vma=False,
    ))(garr)
    print(f"MEANCOST {{proc_id}} {{float(mean_cost):.10f}}", flush=True)
    print(f"DONE {{proc_id}}", flush=True)
    """
).format(repo=REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_truth(n_devices: int) -> float:
    """The same fleet's mean cost, computed in-process (8-dev mesh)."""
    import jax
    import jax.numpy as jnp

    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.problem import ADMMConfig
    from ilqr_admm_tpu.projections import project_bound
    from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_dp
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    N = 16
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])], dtype=jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(jnp.float32)
    seq = np.zeros(N, np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    A = jnp.asarray(A, jnp.float32)
    B = jnp.asarray(B, jnp.float32)
    cfg = ADMMConfig(max_iter=10, tol=1e-4)
    nb = 2 * n_devices  # workers run nproc procs x 2 devices each
    x0s = np.random.default_rng(0).normal(0, 0.1, (nb, d)).astype(np.float32)

    def one(x0):
        x, u, _aux, info = lqt_admm_dp(
            A, B, cost, x0,
            project_u=lambda u: project_bound(u, -5.0, 5.0),
            rho_u=1e-2, cfg=cfg,
        )
        return x, u

    xs, us = jax.jit(jax.vmap(one))(
        jnp.asarray(x0s, jnp.float32)
    )
    c = cost(xs.reshape(nb, N, d), us.reshape(nb, N, m))
    return float(jnp.mean(c))


@pytest.mark.parametrize("nproc", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_multi_process_fleet_matches_single_process(tmp_path, nproc):
    """2 (and, slow-marked, 4) OS processes x 2 CPU devices each:
    initialize + host_shard + make_global_batch + sharded ADMM fleet +
    psum == in-process truth."""
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path),
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DONE {i}" in out, out

    # host_shard gave each process a disjoint contiguous range of 0..99
    shard_lines = sorted(
        line.split()[1:] for out in outs for line in out.splitlines()
        if line.startswith("SHARD")
    )
    starts = [int(s[1]) for s in shard_lines]
    stops = [int(s[2]) for s in shard_lines]
    assert starts[0] == 0 and stops[-1] == 99
    for a_stop, b_start in zip(stops, starts[1:]):
        assert b_start == a_stop + 1

    costs = [
        float(line.split()[2]) for out in outs for line in out.splitlines()
        if line.startswith("MEANCOST")
    ]
    assert len(costs) == nproc
    truth = _single_process_truth(nproc * 2)
    for c in costs:
        assert abs(c - truth) < 1e-4 * max(1.0, abs(truth)), (costs, truth)


def test_initialize_noop_single_host():
    """No coordinator, no env hints -> returns False without touching the
    runtime (the in-process suite keeps its 8-device CPU platform)."""
    from ilqr_admm_tpu.parallel import distributed

    assert distributed.initialize() is False
