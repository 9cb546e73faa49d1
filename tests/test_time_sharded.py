"""Time-axis (horizon) sharding of the Riccati over the device mesh.

The distributed "sequence parallelism" of this domain (SURVEY §2.3/§5):
chunks of the horizon live on different devices; one all_gather joins
them. Oracle: the sequential single-device scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.ops.riccati import lqt_backward
from ilqr_admm_tpu.parallel.mesh import make_mesh
from ilqr_admm_tpu.parallel.time_sharded import lqt_backward_time_sharded


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _random_lqt(rng, N=64, d=3, m=2):
    A = jnp.asarray(np.tile(np.eye(d), (N, 1, 1)) + 0.02 * rng.normal(size=(N, d, d)))
    B = jnp.asarray(0.15 * rng.normal(size=(N, d, m)))
    Qd = rng.uniform(0.1, 5.0, size=(N, d))
    Q = jnp.asarray(np.stack([np.diag(q) for q in Qd]))
    xd = jnp.asarray(rng.normal(size=(N, d)))
    R = jnp.asarray(np.tile(np.eye(m) * 0.3, (N, 1, 1)))
    return A, B, Q, xd, R


@pytest.mark.slow
def test_time_sharded_matches_sequential(rng):
    mesh = make_mesh(axis_names=("time",))
    A, B, Q, xd, R = _random_lqt(rng)  # N=64 over 8 devices
    g_seq = lqt_backward(A, B, Q, xd, R)
    g_sh = lqt_backward_time_sharded(A, B, Q, xd, R, mesh=mesh)
    np.testing.assert_allclose(np.asarray(g_sh.K), np.asarray(g_seq.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_sh.k), np.asarray(g_seq.k), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_sh.Quu), np.asarray(g_seq.Quu), atol=1e-8)


def test_time_sharded_with_regularizers_and_fastinv(rng):
    mesh = make_mesh(axis_names=("time",))
    A, B, Q, xd, R = _random_lqt(rng, N=40, d=2, m=1)
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    Qr = jnp.asarray(np.tile(np.eye(d) * 0.3, (N, 1, 1)))
    xr = jnp.asarray(rng.normal(size=(N, d)))
    Rr = jnp.asarray(np.tile(np.eye(m) * 0.1, (N, 1, 1)))
    ur = jnp.asarray(rng.normal(size=(N, m)))
    g_seq = lqt_backward(A, B, Q, xd, R, Qr, xr, Rr, ur)
    g_sh = lqt_backward_time_sharded(
        A, B, Q, xd, R, Qr, xr, Rr, ur, mesh=mesh, fast_inverse=True
    )
    np.testing.assert_allclose(np.asarray(g_sh.K), np.asarray(g_seq.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_sh.k), np.asarray(g_seq.k), atol=1e-8)


def test_time_sharded_rejects_indivisible(rng):
    mesh = make_mesh(axis_names=("time",))
    A, B, Q, xd, R = _random_lqt(rng, N=30)  # 30 % 8 != 0
    with pytest.raises(ValueError):
        lqt_backward_time_sharded(A, B, Q, xd, R, mesh=mesh)


def test_time_sharded_under_jit_with_sharded_inputs(rng):
    """The real usage: inputs already sharded over the time axis, the
    whole backward pass jitted — GSPMD keeps everything distributed."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(axis_names=("time",))
    A, B, Q, xd, R = _random_lqt(rng)
    sh = NamedSharding(mesh, P("time"))
    A, B, Q, xd, R = (jax.device_put(x, sh) for x in (A, B, Q, xd, R))

    f = jax.jit(lambda *a: lqt_backward_time_sharded(*a, mesh=mesh))
    g_sh = f(A, B, Q, xd, R)
    g_seq = lqt_backward(A, B, Q, xd, R)
    np.testing.assert_allclose(np.asarray(g_sh.K), np.asarray(g_seq.K), atol=1e-8)


def test_ilqr_time_sharded_matches_parallel():
    """General iLQR backward (cross terms + drift) over the 8-device
    ('time',) mesh equals the single-device associative-scan result.

    Runs in a SUBPROCESS (fresh interpreter, same isolation pattern as
    test_graft_entry): executing this program late in a long-lived suite
    worker hard-aborts XLA:CPU's collective rendezvous after its 40 s
    spin-wait ("Exiting to ensure a consistent program state") —
    reproduced 4/4 in r5 full-suite runs on a 2-core host regardless of
    worker count, 0/4 in isolation, so the trigger is accumulated
    in-process runtime state, not concurrency. Fresh-process execution
    is deterministic-green.
    """
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_enable_compilation_cache", False)
import numpy as np
import jax.numpy as jnp
from ilqr_admm_tpu.ops.parallel_riccati import ilqr_backward_parallel
from ilqr_admm_tpu.parallel.mesh import make_mesh
from ilqr_admm_tpu.parallel.time_sharded import ilqr_backward_time_sharded

rng = np.random.default_rng(3)
mesh = make_mesh(axis_names=("time",))
N, d, m = 64, 3, 2
A = jnp.asarray(np.tile(np.eye(d), (N, 1, 1)) + 0.02 * rng.normal(size=(N, d, d)))
B = jnp.asarray(0.15 * rng.normal(size=(N, d, m)))
M = rng.normal(size=(N, d + m, d + m))
Cts = jnp.asarray(M @ M.transpose(0, 2, 1) + 0.5 * np.eye(d + m))
cts = jnp.asarray(rng.normal(size=(N, d + m)))
drift = jnp.asarray(0.1 * rng.normal(size=(N, d)))

K_p, k_p = ilqr_backward_parallel(A, B, Cts, cts, drift=drift)
K_s, k_s = ilqr_backward_time_sharded(A, B, Cts, cts, drift, mesh=mesh)
np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_p), atol=1e-8)
np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_p), atol=1e-8)

K_v, k_v, J, eta = ilqr_backward_time_sharded(
    A, B, Cts, cts, drift, mesh=mesh, return_value=True
)
_, _, J_p, eta_p = ilqr_backward_parallel(
    A, B, Cts, cts, drift=drift, return_value=True
)
np.testing.assert_allclose(np.asarray(J), np.asarray(J_p), atol=1e-8)
np.testing.assert_allclose(np.asarray(eta), np.asarray(eta_p), atol=1e-8)
print("ILQR_TIME_SHARDED_OK")
"""
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, cwd=repo, env=env,
    )
    assert proc.returncode == 0 and "ILQR_TIME_SHARDED_OK" in proc.stdout, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )


def test_box_backward_time_sharded_matches_unsharded(rng):
    """The constrained (boxDDP) active-set backward distributed over the
    ('time',) mesh equals the single-device variant — per-pass scans are
    mesh-sharded, the masked model and exchange stay per-stage."""
    from ilqr_admm_tpu.ops.constrained_riccati import ilqr_backward_box_parallel

    mesh = make_mesh(axis_names=("time",))
    N, d, m = 64, 3, 2
    A = jnp.asarray(np.tile(np.eye(d), (N, 1, 1)) + 0.02 * rng.normal(size=(N, d, d)))
    B = jnp.asarray(0.15 * rng.normal(size=(N, d, m)))
    M = rng.normal(size=(N, d + m, d + m))
    Cts = jnp.asarray(M @ M.transpose(0, 2, 1) + 0.5 * np.eye(d + m))
    cts = jnp.asarray(rng.normal(size=(N, d + m)))
    u_nom = jnp.asarray(0.3 * rng.normal(size=(N, m)))
    lo, hi = jnp.asarray([-0.4, -0.4]), jnp.asarray([0.4, 0.4])

    K_u, k_u = ilqr_backward_box_parallel(A, B, Cts, cts, u_nom, lo, hi)
    K_s, k_s = ilqr_backward_box_parallel(
        A, B, Cts, cts, u_nom, lo, hi, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_u), atol=1e-8)
