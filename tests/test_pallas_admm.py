"""Fused Pallas ADMM kernel vs the XLA GEMM path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.ops.pallas_admm import make_pallas_lqt_admm
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost


def _problem(N=40):
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])]).astype(jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(jnp.float32)
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    return plant, A.astype(jnp.float32), B.astype(jnp.float32), cost


def test_pallas_u_only_matches_xla():
    """refresh_every=1 (always-exact bf16x3): iterate-for-iterate match."""
    N = 40
    plant, A, B, cost = _problem(N)
    solve_p = make_pallas_lqt_admm(
        A, B, cost, u_lower=-5.0, u_upper=5.0, rho_u=1e-2,
        n_iters=50, batch_tile=8, refresh_every=1, interpret=True,
    )
    solve_x = make_batched_lqt_admm(
        A, B, cost, project_u=lambda u: project_bound(u, -5.0, 5.0),
        rho_u=1e-2, n_iters=50,
    )
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(16, plant.x_dim)), jnp.float32)
    x_p, u_p, _, zu = solve_p(x0s)
    x_r, u_r = solve_x(x0s)
    # same algorithm modulo warm-start choice and bf16x3 vs f32 matmuls:
    # iterates agree to ADMM-tolerance scale
    assert float(jnp.max(jnp.abs(u_p - u_r))) < 5e-2
    assert float(jnp.max(jnp.abs(x_p - x_r))) < 5e-2  # post-loop Wx recovery
    assert float(jnp.max(jnp.abs(zu))) <= 5.0 + 1e-5  # z feasible by construction


def test_pallas_u_only_delta_converges_to_fixed_point():
    """Single-pass delta updates (refresh_every=8) converge to the SAME
    fixed point as the exact f32 path: the per-iteration bf16 error is
    O(2^-8 |Δs|) and Δs → 0, so the inexact x-update vanishes
    asymptotically (standard inexact-ADMM argument)."""
    N = 40
    plant, A, B, cost = _problem(N)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(16, plant.x_dim)), jnp.float32)
    star = make_batched_lqt_admm(
        A, B, cost, project_u=lambda u: project_bound(u, -5.0, 5.0),
        rho_u=1e-2, n_iters=4000,
    )
    _, u_s = star(x0s)
    solve_p = make_pallas_lqt_admm(
        A, B, cost, u_lower=-5.0, u_upper=5.0, rho_u=1e-2,
        n_iters=1000, batch_tile=8, refresh_every=8, interpret=True,
    )
    _, u_p, _, zu = solve_p(x0s)
    assert float(jnp.max(jnp.abs(u_p - u_s))) < 5e-3
    assert float(jnp.max(jnp.abs(zu))) <= 5.0 + 1e-5


def test_pallas_polish_tightens_primal_residual():
    """bf16x6 polish iterations (the converged_frac fix, VERDICT r2 #3):
    with polish the final primal residual ||u - z|| reaches the f32
    ADMM floor; without it the bf16x3 noise floor dominates. Interpret
    mode emulates the bf16 casts, so the effect reproduces on CPU."""
    N = 40
    plant, A, B, cost = _problem(N)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(16, plant.x_dim)), jnp.float32)

    def prim(polish):
        solve_p = make_pallas_lqt_admm(
            A, B, cost, u_lower=-5.0, u_upper=5.0, rho_u=1e-1,
            n_iters=100, batch_tile=8, polish_iters=polish, interpret=True,
        )
        _, u, _, zu = solve_p(x0s)
        return float(jnp.max(jnp.linalg.norm(u - zu, axis=-1)))

    p0, p12 = prim(0), prim(12)
    assert p12 < 1e-4, (p0, p12)
    assert p12 <= p0


@pytest.mark.slow
def test_pallas_xu_matches_xla():
    N = 30
    plant, A, B, cost = _problem(N)
    d, m = plant.x_dim, plant.u_dim
    rho_x = np.zeros((N, d, d), np.float32)
    rho_x[:] = np.eye(d) * 1e-1

    solve_p = make_pallas_lqt_admm(
        A, B, cost, u_lower=-4.0, u_upper=4.0,
        x_lower=-10.0, x_upper=0.9,
        rho_x=jnp.asarray(rho_x), rho_u=1e-2,
        n_iters=80, batch_tile=8, interpret=True,
    )

    def proj_x(x):
        return jnp.clip(x, -10.0, 0.9)

    solve_x = make_batched_lqt_admm(
        A, B, cost, project_x=proj_x,
        project_u=lambda u: project_bound(u, -4.0, 4.0),
        rho_x=jnp.asarray(rho_x), rho_u=1e-2, n_iters=80,
    )
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(8, d)), jnp.float32)
    x_p, u_p, zx, zu = solve_p(x0s)
    x_r, u_r = solve_x(x0s)
    assert float(jnp.max(jnp.abs(u_p - u_r))) < 5e-2
    assert float(jnp.max(jnp.abs(x_p - x_r))) < 5e-2


def test_pallas_builder_rejects_bounds_without_rho():
    """Bounds without a (nonzero) rho would make the kernel return the
    unconstrained optimum while looking feasible (review finding)."""
    import numpy as np
    import jax.numpy as jnp
    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.ops.pallas_admm import make_pallas_lqt_admm
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    N = 16
    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])])
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d)])
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    with pytest.raises(ValueError, match="rho_u"):
        make_pallas_lqt_admm(A, B, cost, u_lower=-1.0, u_upper=1.0)
    with pytest.raises(ValueError, match="rho_u"):
        make_pallas_lqt_admm(A, B, cost, u_lower=-1.0, u_upper=1.0, rho_u=0.0)


def test_pallas_u_only_early_exit_matches_full_schedule():
    """stop_tol > 0 (per-tile early exit) returns the same solution as
    the fixed-iteration schedule: an easy fleet converges well before
    n_iters, so the exited tiles' polished iterates must agree with the
    full run's; a stop_tol=0 build is the oracle."""
    N = 40
    plant, A, B, cost = _problem(N)
    kw = dict(u_lower=-5.0, u_upper=5.0, rho_u=1e-2, n_iters=120,
              batch_tile=8, refresh_every=1, interpret=True)
    solve_full = make_pallas_lqt_admm(A, B, cost, **kw)
    solve_exit = make_pallas_lqt_admm(A, B, cost, stop_tol=1e-5, **kw)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(16, plant.x_dim)), jnp.float32)
    x_f, u_f, _, zu_f = solve_full(x0s)
    x_e, u_e, _, zu_e = solve_exit(x0s)
    np.testing.assert_allclose(np.asarray(u_e), np.asarray(u_f), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_e), np.asarray(x_f), atol=2e-4)
    assert float(jnp.max(jnp.abs(zu_e))) <= 5.0 + 1e-5
    # early exit does not degrade the primal residual anywhere (one
    # instance of this fleet legitimately needs >120 iters — its tile
    # never exits, so both schedules treat it identically)
    r_f = jnp.max(jnp.abs(u_f - zu_f), axis=1)
    r_e = jnp.max(jnp.abs(u_e - zu_e), axis=1)
    np.testing.assert_allclose(np.asarray(r_e), np.asarray(r_f), atol=2e-4)


def test_pallas_early_exit_with_delta_mode():
    """stop_tol combined with refresh_every=8 (delta-GEMM mode): the
    chunk accounting counts EXECUTED iterations — (check_every-1)
    refresh blocks + 1 polish per chunk — so unconverged tiles run at
    least the fixed schedule's budget; converged output matches."""
    N = 40
    plant, A, B, cost = _problem(N)
    kw = dict(u_lower=-5.0, u_upper=5.0, rho_u=1e-1, n_iters=96,
              batch_tile=8, refresh_every=8, interpret=True)
    solve_full = make_pallas_lqt_admm(A, B, cost, **kw)
    solve_exit = make_pallas_lqt_admm(A, B, cost, stop_tol=1e-5,
                                      check_every=4, **kw)
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.normal(0, 0.1, size=(8, plant.x_dim)), jnp.float32)
    x_f, u_f, _, zu_f = solve_full(x0s)
    x_e, u_e, _, zu_e = solve_exit(x0s)
    np.testing.assert_allclose(np.asarray(u_e), np.asarray(u_f), atol=5e-4)
    r_e = np.asarray(jnp.linalg.norm(u_e - zu_e, axis=-1))
    r_f = np.asarray(jnp.linalg.norm(u_f - zu_f, axis=-1))
    # exited tiles are at least as converged as the fixed schedule
    assert r_e.max() <= r_f.max() + 5e-4, (r_e.max(), r_f.max())


def test_pallas_fleet_shard_map_matches_single_device():
    """shard_map over ('data',) wrapping the fused Pallas kernel — the
    flagship serving path on a real pod (VERDICT r4 #2) — must equal a
    single-device replay exactly: pure instance parallelism, so the
    kernel's per-tile math cannot depend on which device owns the tile.
    Mirrors the `dryrun_multichip` section in `__graft_entry__.py`."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    N = 40
    plant, A, B, cost = _problem(N)
    solve_p = make_pallas_lqt_admm(
        A, B, cost, u_lower=-5.0, u_upper=5.0, rho_u=1e-1,
        n_iters=40, batch_tile=4, interpret=True,
    )
    n_dev = jax.device_count()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharded = jax.jit(jax.shard_map(
        solve_p, mesh=mesh, in_specs=(P("data"),),
        out_specs=(P("data"),) * 4, check_vma=False,
    ))
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(
        rng.normal(0, 0.1, size=(4 * n_dev, plant.x_dim)), jnp.float32
    )
    # cache-loaded multi-device programs can hard-abort on this
    # jaxlib's XLA:CPU runtime (see conftest) — compile fresh
    prev = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        x_s, u_s, _, zu_s = sharded(x0s)
        x_r, u_r, _, zu_r = solve_p(x0s)
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
    np.testing.assert_array_equal(np.asarray(u_s), np.asarray(u_r))
    np.testing.assert_array_equal(np.asarray(x_s), np.asarray(x_r))
    np.testing.assert_array_equal(np.asarray(zu_s), np.asarray(zu_r))
    assert float(jnp.max(jnp.abs(zu_s))) <= 5.0 + 1e-5
