"""Aux subsystems: TrajOpt spline basis, URDF loader, checkpoint, metrics."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.arm import PlanarArm, load_planar_arm_urdf
from ilqr_admm_tpu.utils.checkpoint import restore_state, save_state
from ilqr_admm_tpu.utils.metrics import PhaseTimer, admm_info_dict
from ilqr_admm_tpu.utils.trajopt import TrajOpt

ASSET = os.path.join(
    os.path.dirname(__file__), "..", "ilqr_admm_tpu", "assets", "planar_3dof.urdf"
)


def test_trajopt_interpolates_nodes():
    ndof = 2
    topt = TrajOpt(ndof)
    h = [0.5, 0.3, 0.7]
    topt.setup_task(h)
    rng = np.random.default_rng(0)
    y_nodes = rng.normal(size=(4, ndof))
    dy0 = np.array([0.2, -0.1])
    dyT = np.array([-0.3, 0.4])

    # node interpolation
    ts = np.concatenate([[0.0], np.cumsum(h)])
    for i, t in enumerate(ts):
        y = topt.get_y(t, y_nodes, dy0, dyT)
        np.testing.assert_allclose(y, y_nodes[i], atol=1e-10)

    # boundary velocities are clamped
    np.testing.assert_allclose(topt.get_dy(0.0, y_nodes, dy0, dyT), dy0, atol=1e-10)
    np.testing.assert_allclose(topt.get_dy(ts[-1], y_nodes, dy0, dyT), dyT, atol=1e-10)

    # C1 continuity at an interior node
    eps = 1e-6
    d_before = topt.get_dy(ts[1] - eps, y_nodes, dy0, dyT)
    d_after = topt.get_dy(ts[1] + eps, y_nodes, dy0, dyT)
    np.testing.assert_allclose(d_before, d_after, atol=1e-4)

    # basis consistency: get_y == Phi @ w
    w = np.concatenate([y_nodes.reshape(-1), dy0, dyT])
    t_probe = 0.63
    np.testing.assert_allclose(
        topt.get_Phi(t_probe) @ w, topt.get_y(t_probe, y_nodes, dy0, dyT), atol=1e-12
    )
    np.testing.assert_allclose(
        topt.get_ddPhi(t_probe) @ w, topt.get_ddy(t_probe, y_nodes, dy0, dyT),
        atol=1e-9,
    )


def test_urdf_loader_matches_analytic():
    arm_file = load_planar_arm_urdf(ASSET, dt=0.01)
    arm_ref = PlanarArm((1.0, 1.0, 1.0), dt=0.01)
    assert arm_file.q_dim == 3
    q = jnp.asarray([0.3, -0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(arm_file.fk(q)), np.asarray(arm_ref.fk(q)), atol=1e-12
    )


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "x_nom": jnp.arange(12.0).reshape(3, 4),
        "duals": (jnp.ones(5), jnp.zeros(2)),
    }
    path = str(tmp_path / "ckpt")
    saved = save_state(path, state)
    restored = restore_state(saved, state)
    np.testing.assert_allclose(np.asarray(restored["x_nom"]), np.asarray(state["x_nom"]))
    np.testing.assert_allclose(np.asarray(restored["duals"][0]), 1.0)


def test_metrics_helpers():
    from ilqr_admm_tpu.solvers.admm import ADMMInfo

    info = ADMMInfo(
        iters=jnp.int32(3), prim_res=jnp.float64(1e-5), dual_res=jnp.float64(2e-5),
        status=jnp.int32(1), logs=jnp.zeros((10, 2)),
    )
    d = admm_info_dict(info)
    assert d["status"] == "CONVERGED" and d["iters"] == 3
    assert len(d["residual_history"]) == 3

    timer = PhaseTimer()
    with timer.phase("backward"):
        pass
    with timer.phase("backward"):
        pass
    s = timer.summary()
    assert s["backward"]["count"] == 2


def test_debug_guards():
    import jax.numpy as jnp
    from ilqr_admm_tpu.utils.debug import assert_finite, checked

    assert_finite({"a": jnp.ones(3)}, "state")
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, jnp.nan])}, "state")

    def bad(x):
        return jnp.log(x)  # nan for negative input

    f = checked(bad)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(2.0))), np.log(2.0))
    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))


def test_distributed_helpers_single_host():
    from ilqr_admm_tpu.parallel import distributed

    assert distributed.initialize() is False  # single host: no-op
    arr = np.arange(16).reshape(16, 1)
    shard = distributed.host_shard(arr)
    assert shard.shape[0] == 16  # one process owns everything
