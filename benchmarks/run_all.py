"""Head-to-head harness: reproduce every BASELINE.md row and time it.

Runs the reference's benchmark configurations single-instance (wall-clock
apples-to-apples with the laptop NumPy numbers in BASELINE.md) plus the
batched-throughput headline, and writes `benchmarks/HEADTOHEAD.md` and
`benchmarks/headtohead.json`. Single-call timings include the blocking
dispatch floor analyzed in docs/LATENCY.md.

Run: python benchmarks/run_all.py            (current backend)
"""

import os

# persistent compile cache (first tunnel compile is minutes; reruns are free)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import json
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

RESULTS = []


def _readback(out):
    """Force completion by pulling one scalar of the result to host.

    block_until_ready can return before remote work completes on the
    tunnel backend; an element readback cannot (in-order execution means
    the whole computation finished). Costs one ~30 ms RTT — included in
    the reported wall time, which is therefore conservative for rows
    cheaper than the RTT (the reference laptop numbers have no RTT)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timed(name, ref_ms, fn, oracle=None, reps=3):
    """Warmup + best-of timing; records (ours_ms, ref_ms, oracle note).

    BENCH_ONLY=<substring> env var runs only matching rows (comma-
    separated substrings) — used to add/measure rows without re-running
    the whole suite through the tunnel."""
    only = os.environ.get("BENCH_ONLY")
    if only and not any(s.strip().lower() in name.lower()
                        for s in only.split(",")):
        print(f"{name}: skipped (BENCH_ONLY)")
        return None
    out = fn()
    _readback(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _readback(out)
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    note = oracle(out) if oracle else ""
    RESULTS.append(dict(name=name, ours_ms=round(ms, 2), ref_ms=ref_ms,
                        speedup=round(ref_ms / ms, 2), oracle=note))
    print(f"{name}: {ms:.2f} ms (ref {ref_ms} ms, {ref_ms/ms:.1f}x)  {note}")
    return out


def amortized_ms(fn, K=32, dtype=None):
    """Dispatch-amortized per-call time: K data-dependent calls chained
    inside ONE jit (the scan carry perturbs fn's input so XLA cannot CSE
    or fold them), terminated by a scalar readback. This is the
    on-device number for rows whose single-call wall clock is the ~30 ms
    tunnel RTT (docs/LATENCY.md).

    fn(c) -> pytree output; c is a tiny scalar carry (~1e-30 scale)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32

    def chained(c0):
        def body(c, _):
            leaf = jax.tree_util.tree_leaves(fn(c))[0]
            return jnp.sum(leaf) * jnp.asarray(1e-30, dtype), leaf.ravel()[0]

        return jax.lax.scan(body, c0, None, length=K)[0]

    j = jax.jit(chained)
    float(j(jnp.asarray(0.0, dtype)))  # compile + warm readback
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(j(jnp.asarray(0.0, dtype)))
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


def di_cost(N, d, x_std, u_std, target):
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    zs = jnp.stack([jnp.zeros(d), jnp.asarray(target)]).astype(jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * x_std]).astype(jnp.float32)
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    return viapoint_cost(zs, Qs, seq, u_std, d // 2)


def main():
    from ilqr_admm_tpu.models.car import CarFrontWheel, CarParkingCost
    from ilqr_admm_tpu.models.arm import PlanarArm
    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.ops.lifted import build_Su, build_Sw
    from ilqr_admm_tpu.ops.riccati import quad_cost_model
    from ilqr_admm_tpu.ops.rollout import rollout_nonlinear
    from ilqr_admm_tpu.problem import ADMMConfig, ILQRConfig
    from ilqr_admm_tpu.projections import project_bound
    from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
    from ilqr_admm_tpu.solvers.ilqr import ilqr_init, ilqr_solve
    from ilqr_admm_tpu.solvers.ilqr_admm import ilqr_admm
    from ilqr_admm_tpu.solvers.lqt import lqt_solve_batch, lqt_solve_dp
    from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_batch, lqt_admm_dp
    from ilqr_admm_tpu.solvers.sls_admm import sls_admm
    from ilqr_admm_tpu.utils.cost_assembly import get_double_integrator_AB, viapoint_cost

    backend = jax.default_backend()
    print(f"backend: {backend}; devices: {jax.devices()}")
    f32 = jnp.float32

    # ---- 1. lifted-operator build, N=100 d=2 (ref 3-23 ms)
    N = 100
    di1 = DoubleIntegrator(1, 2, dt=0.01)
    A1, B1 = di1.AB(N)
    A1, B1 = A1.astype(f32), B1.astype(f32)
    # NOTE (anti-folding discipline, applies to every row): each jitted
    # benchmark fn takes its problem data as RUNTIME ARGUMENTS. A no-arg
    # closure jit is all-constant and XLA may fold the entire solve into
    # the executable at compile time, turning the "measurement" into a
    # constant fetch (observed: the arm ADMM row once "ran" in 0.05 ms,
    # below the 26 ms dispatch floor).
    build = jax.jit(lambda A, B: (build_Sw(A), build_Su(A, B)))

    # dispatch-amortized on-device build time: K data-dependent builds
    # chained inside ONE dispatch (the carry feeds the next build's
    # operand so XLA cannot CSE them away); K large enough that the
    # ~30 ms readback RTT is <10% of the window
    K_chain = 1024

    def _chained(A, B):
        def body(c, _):
            Sw = build_Sw(A + c)
            Su = build_Su(A + c, B)
            return jnp.sum(Su) * jnp.asarray(1e-38, f32), Sw[0, 0]

        return jax.lax.scan(body, jnp.asarray(0.0, f32), None,
                            length=K_chain)[0]

    chained = jax.jit(_chained)
    # warm the compile AND the readback channel (first D2H is minutes)
    float(chained(A1, B1))
    t0 = time.perf_counter()
    float(chained(A1, B1))
    per_build_ms = (time.perf_counter() - t0) / K_chain * 1e3

    # the measured column carries the dispatch-amortized per-build time
    # (the way every real consumer dispatches it: the build is jit-fused
    # into the solve / repeated across AB updates), promoted into the
    # table proper per VERDICT r3 #8: a SINGLE host-observed call can
    # never beat the ~30 ms tunnel RTT while the reference op costs
    # 23 ms on a local laptop — measured single-dispatch number kept in
    # the oracle column for transparency.
    _lifted_row_name = "lifted operator build (N=100, d=2, dispatch-amortized)"
    only = os.environ.get("BENCH_ONLY")
    if only and not any(s.strip().lower() in _lifted_row_name.lower()
                        for s in only.split(",")):
        print(f"{_lifted_row_name}: skipped (BENCH_ONLY)")
    else:
        out = build(A1, B1)
        _readback(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = build(A1, B1)
            _readback(out)
            ts.append(time.perf_counter() - t0)
        single_ms = min(ts) * 1e3
        RESULTS.append(dict(
            name=_lifted_row_name,
            ours_ms=round(per_build_ms, 3), ref_ms=23.0,
            speedup=round(23.0 / per_build_ms, 2),
            oracle=(f"K={K_chain} data-dependent builds in one dispatch; "
                    f"single host-observed call {single_ms:.1f} ms "
                    f"(RTT-floored: tunnel ~30 ms > ref 23 ms)"),
        ))
        print(f"lifted operator build: {per_build_ms:.3f} ms/build amortized; "
              f"single call {single_ms:.2f} ms")

    # ---- 2. LQT solve dp+batch, N=100 d=4 (ref 58 ms)
    di2 = DoubleIntegrator(2, 2, dt=0.01)
    A2, B2 = di2.AB(N)
    A2, B2 = A2.astype(f32), B2.astype(f32)
    cost2 = di_cost(N, 4, 1e3, 1e-4, [1.0, 1.0, 0.0, 0.0])
    x0_4 = jnp.zeros(4, f32)
    both = jax.jit(
        lambda A, B, x0: (lqt_solve_dp(A, B, cost2).K,
                          lqt_solve_batch(A, B, cost2, x0)[1])
    )
    timed("LQT solve dp+batch (N=100, d=4)", 58.0,
          lambda: both(A2, B2, x0_4),
          oracle=lambda _: (lambda ms: f"on-device {ms:.2f} ms "
                            f"({58.0 / ms:.0f}x amortized); single call "
                            "is RTT-bound")(
              amortized_ms(lambda c: both(A2, B2, x0_4 + c))))

    # ---- 3/4. ADMM_LQT control bounds (ref 51 / 172 ms)
    cost1 = di_cost(N, 2, 1e6, 1e-2, [1.0, 0.0])
    x0_2 = jnp.zeros(2, f32)
    proj_u = lambda u: project_bound(u, -5.0, 5.0)
    cfg_b = ADMMConfig(max_iter=100, tol=1e-4)
    admm_b = jax.jit(
        lambda x0: lqt_admm_batch(A1, B1, cost1, x0, project_u=proj_u, rho_u=1e-2,
                                  cfg=cfg_b, use_qr=True)[1]
    )
    u_b = timed(
        "ADMM_LQT_Batch control bounds (QR)", 51.0, lambda: admm_b(x0_2),
        oracle=lambda u: (
            f"max|u|={float(jnp.max(jnp.abs(u))):.5f} (bound 5); "
            + (lambda ms: f"on-device {ms:.2f} ms ({51.0 / ms:.0f}x amortized)")(
                amortized_ms(lambda c: admm_b(x0_2 + c)))
        ),
    )
    cfg_d = ADMMConfig(max_iter=500, tol=1e-4)
    admm_d = jax.jit(
        lambda x0: lqt_admm_dp(A1, B1, cost1, x0, project_u=proj_u, rho_u=1e-1,
                               cfg=cfg_d)[1]
    )
    timed("ADMM_LQT_DP control bounds", 172.0, lambda: admm_d(x0_2),
          oracle=lambda u: (
              f"max|u|={float(jnp.max(jnp.abs(u))):.4f}; "
              + (lambda ms: f"on-device {ms:.2f} ms ({172.0 / ms:.0f}x amortized)")(
                  amortized_ms(lambda c: admm_d(x0_2 + c)))
          ))

    # ---- 5. robust SLS-ADMM control bounds (ref 207 ms)
    from scipy.stats import norm
    from ilqr_admm_tpu.projections import project_set_convex, project_soc_unit

    psi_inv = float(norm.ppf(0.95))
    mu = np.array([1.0, 0.0])
    Au = np.diag(np.sqrt([0.0, 0.01]))
    A_hi = jnp.asarray(np.concatenate([Au, (-mu / psi_inv)[None]], 0), f32)
    b_hi = jnp.asarray(np.append(np.zeros(2), 5.0 / psi_inv), f32)
    A_lo = jnp.asarray(np.concatenate([Au, (mu / psi_inv)[None]], 0), f32)
    b_lo = jnp.asarray(np.append(np.zeros(2), 5.0 / psi_inv), f32)

    def proj_u_rob(y):
        return project_set_convex(y, [A_hi, A_lo], [b_hi, b_lo],
                                  [project_soc_unit] * 2, rho=1e1,
                                  max_iter=100, threshold=1e-3)

    sls_fn = jax.jit(
        lambda A, B: sls_admm(A, B, cost1, project_u=proj_u_rob, rho_u=1e2,
                              robust_dim=1,
                              cfg=ADMMConfig(max_iter=50, tol=1e-3, stall_tol=1e-2))[0]
    )
    timed("ADMM_SLS robust control bounds", 207.0, lambda: sls_fn(A1, B1),
          oracle=lambda _: (lambda ms: f"on-device {ms:.2f} ms "
                            f"({207.0 / ms:.0f}x amortized)")(
              amortized_ms(lambda c: sls_fn(A1 + c, B1))))

    # ---- 6. iLQR car parking, N=500 (ref 3580 ms)
    Ncar = 500
    car = CarFrontWheel(dt=15.0 / Ncar)
    ccost = CarParkingCost()
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.normal(size=(Ncar, 2)) * 0.1, f32)
    x0c = jnp.asarray([1.0, 1.0, 3 * np.pi / 2, 0.0], f32)
    cfg_i = ILQRConfig(max_iter=100, max_line_search_iter=40)

    def car_solve(x0_, u0_):
        with jax.default_matmul_precision("highest"):
            s0 = ilqr_init(car.step, ccost, x0_, u0_)
            # parallel_fast backward (adjugate combine inverses +
            # blocked scan): 89.5 vs 140 ms parallel vs 179 ms
            # sequential at the identical 0.9283 golden
            # (bench_car_parallel_riccati.py)
            out = ilqr_solve(car.step, car.get_AB, ccost.get_Cs, ccost,
                             s0, cfg_i, riccati="parallel_fast")
            return out.cost, out.iteration

    car_fn = jax.jit(car_solve)
    timed("iLQR car parking (N=500, parallel Riccati)", 3580.0,
          lambda: car_fn(x0c, u0),
          oracle=lambda ci: (
              f"cost={float(ci[0]):.4f} (ref 0.9283), "
              f"{int(ci[1])} outers (ref 54)"
          ), reps=2)

    # ---- 7. ilqr_admm car control bounds (ref 17400 ms)
    lo = jnp.asarray([-0.5, -2.0], f32)
    hi = jnp.asarray([0.5, 2.0], f32)

    def proj_uc(u):
        return jnp.clip(u.reshape(Ncar, 2), lo, hi).reshape(-1)

    x_nom_c = rollout_nonlinear(car.step, x0c, u0)

    # SQP-style outer line search (bench_outer_ls.py study): the inner
    # ADMM iterates on the linearized prediction with zero rollouts (one
    # explicit-inverse GEMV per iteration), and ONE nonlinear rollout
    # batch per outer step globalizes the result. Dominates both the r1
    # inner-mode schedule and the rho-continuation variant on every axis
    # (TPU: 108 ms / cost 1.9054 / max_viol 6e-6 vs 154 ms / 1.9099 /
    # 1.1e-3).
    car_admm = jax.jit(
        lambda xn, u: ilqr_admm(
            car.step, car.get_AB, ccost, xn, u, get_Cs=ccost.get_Cs,
            project_u=proj_uc, line_search="outer",
            rho_u=jnp.diag(jnp.asarray([1e-2, 1e-3], f32)),
            max_iter=60, max_admm_iter=30,
            alphas=(10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=f32))[:20],
            tol=1e-3, outer_tol=1e-5, osc_tol=1e-5,
        ).cost
    )
    timed("ilqr_admm car control bounds (N=500, SQP outer line search)",
          17400.0, lambda: car_admm(x_nom_c, u0),
          oracle=lambda c: f"cost={float(c):.4f} (ref 1.903)", reps=2)

    # ---- 7b. boxDDP on the same control-limited car (first-class DP
    # treatment the reference lacks; same 17.4 s ADMM reference time)
    from ilqr_admm_tpu.problem import ILQRConfig
    from ilqr_admm_tpu.solvers.boxddp import boxddp_init, boxddp_solve

    # LM regularization schedule (r3): line-search failures escalate reg
    # and retry instead of terminating — r2's config stalled at 1.919.
    # r4: riccati='parallel' — the exactness-certified time-parallel
    # backward (bound-offset active-set freezing, warm-started exchange)
    # converges to the same ADMM golden 1.9054 (KKT-certified vs the
    # sequential backward, test_boxddp) at O(log N) backward depth.
    car_box = jax.jit(
        lambda x0_, u0_: boxddp_solve(
            car.step, car.get_AB, ccost.get_Cs, ccost,
            boxddp_init(car.step, ccost, x0_, u0_, lo, hi),
            u_lower=lo, u_upper=hi,
            cfg=ILQRConfig(max_iter=200, tol_fun=1e-7),
            riccati="parallel", mask_iters=1,
        ).cost
    )
    timed("boxDDP car control bounds (N=500, parallel backward)", 17400.0,
          lambda: car_box(x0c, u0),
          oracle=lambda c: f"cost={float(c):.4f} (ADMM golden 1.9054, ref 1.903), exact bounds, KKT-certified parallel backward",
          reps=2)

    # ---- 7c. hybrid: ADMM globalizes, boxDDP polishes to EXACT bound
    # feasibility + DP local optimality (measured: 1.90532 — better than
    # either pure route — in 20 polish iterations from the ADMM iterate)
    car_hybrid = jax.jit(
        lambda xn, u0_: boxddp_solve(
            car.step, car.get_AB, ccost.get_Cs, ccost,
            boxddp_init(
                car.step, ccost, xn[0],
                jnp.clip(
                    ilqr_admm(
                        car.step, car.get_AB, ccost, xn, u0_,
                        get_Cs=ccost.get_Cs,
                        project_u=proj_uc, line_search="outer",
                        rho_u=jnp.diag(jnp.asarray([1e-2, 1e-3], f32)),
                        max_iter=60, max_admm_iter=30,
                        alphas=(10.0 ** jnp.linspace(0.0, -5.0, 50,
                                                     dtype=f32))[:20],
                        tol=1e-3, outer_tol=1e-5, osc_tol=1e-5,
                    ).u_nom, lo, hi,
                ), lo, hi,
            ),
            u_lower=lo, u_upper=hi,
            cfg=ILQRConfig(max_iter=20, tol_fun=1e-8),
            riccati="parallel", mask_iters=1,  # r4 exact parallel polish
        ).cost
    )
    timed("ADMM->boxDDP hybrid car control bounds (N=500)", 17400.0,
          lambda: car_hybrid(x_nom_c, u0),
          oracle=lambda c: (
              f"cost={float(c):.5f} (beats both pure routes; ref 1.903), "
              "exact bounds"
          ), reps=2)

    # ---- 8. iLQR 3DoF arm (ref 100-131 ms)
    Na = 100
    arm = PlanarArm((1.0, 1.0, 1.0), dt=1.0 / Na)
    d, m, n = arm.x_dim, arm.u_dim, arm.q_dim
    target = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 1.0, 0.0], f32)
    # full-stiff reference weights (ratio 1e10): kept in f32 by the
    # square-root (array-form) Riccati backward pass
    w = jnp.asarray([0.0] * n + [1e6] * n + [0.0, 1e6, 0.0], f32)
    zs = jnp.stack([jnp.zeros(d, f32), target])
    Qs = jnp.stack([jnp.zeros((d, d), f32), jnp.diag(w)])
    seq = np.zeros(Na, dtype=np.int32)
    seq[-1] = 1
    aquad = viapoint_cost(zs, Qs, seq, 1e-4, m)
    x0a = arm.initial_state(jnp.asarray([np.pi / 3, -np.pi / 2, -np.pi / 4], f32))
    u0a = jnp.ones((Na, m), f32)

    def get_Cs_a(xs, us):
        return quad_cost_model(aquad.Q, aquad.xd, aquad.R, xs, us)

    def arm_solve(x0_, u0_):
        with jax.default_matmul_precision("highest"):
            s0 = ilqr_init(arm.step, aquad, x0_, u0_)
            return ilqr_solve(arm.step, arm.get_AB, get_Cs_a, aquad, s0,
                              ILQRConfig(max_iter=30, max_line_search_iter=20),
                              riccati="sqrt").cost

    arm_fn = jax.jit(arm_solve)
    timed("iLQR 3DoF arm (N=100, sqrt Riccati, f32)", 131.0,
          lambda: arm_fn(x0a, u0a),
          oracle=lambda c: (
              f"cost={float(c):.4f} (f64 truth 0.047; ref 0.118); "
              + (lambda ms: f"on-device {ms:.2f} ms ({131.0 / ms:.0f}x amortized)")(
                  amortized_ms(lambda cc: arm_fn(x0a + cc, u0a)))
          ))

    # ---- 9. ilqr_admm 3DoF arm (ref 639 ms)
    x_nom_a = rollout_nonlinear(arm.step, x0a, u0a)

    def proj_ua(u):
        return jnp.clip(u, -6.0, 6.0)

    def proj_xa(x):
        x_ = x.reshape(Na, d)
        x_ = x_.at[-1, 2 * n].set(jnp.clip(x_[-1, 2 * n], 0.5, 1.0))
        x_ = x_.at[:, n : 2 * n].set(jnp.clip(x_[:, n : 2 * n], -1.5, 1.5))
        return x_.reshape(-1)

    rho_xa = np.zeros((Na, d, d), np.float32)
    rho_xa[-1, 2 * n, 2 * n] = 1e1
    for t in range(Na):
        rho_xa[t, n : 2 * n, n : 2 * n] = np.eye(n) * 1e-2

    # anderson_m=5: Anderson-accelerated inner consensus tightens the
    # fixed point within the same iteration budget (late-r4; CPU f64:
    # 0.20006 vs 0.20036 plain at identical budgets)
    arm_admm = jax.jit(
        lambda xn, u: ilqr_admm(
            arm.step, arm.get_AB, aquad, xn, u, quad_cost=aquad,
            project_x=proj_xa, project_u=proj_ua,
            rho_x=jnp.asarray(rho_xa), rho_u=1e-3,
            max_iter=20, max_admm_iter=10,
            alphas=(10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=f32))[:5],
            tol=1e-4, method="dp", riccati="sqrt", anderson_m=5,
        ).cost
    )
    timed("ilqr_admm 3DoF arm state+control (sqrt Riccati, Anderson, f32)", 639.0,
          lambda: arm_admm(x_nom_a, u0a),
          oracle=lambda c: f"cost={float(c):.4f} (ref 0.1996)")

    # ---- 9b. ADMM->AL hybrid on the same arm task: ADMM globalizes,
    # an augmented-Lagrangian polish converges to the FEASIBLE
    # constrained optimum 0.19982 (f64 AL oracle; the reference's
    # reported 0.1996 is infeasible-optimistic — any cost below 0.19982
    # violates a bound). The pure-ADMM row above plateaus at its
    # consensus fixed point (~0.2001 at tol 1e-4).
    from ilqr_admm_tpu.solvers.al_ilqr import al_ilqr_solve

    n3 = arm.q_dim

    def arm_ineq(x, u, t):
        vel = x[n3:2 * n3]
        xe = x[2 * n3]
        is_T = t == Na - 1
        return jnp.concatenate([
            u - 6.0, -u - 6.0, vel - 1.5, -vel - 1.5,
            jnp.atleast_1d(jnp.where(is_T, xe - 1.0, -1.0)),
            jnp.atleast_1d(jnp.where(is_T, 0.5 - xe, -1.0)),
        ])

    def arm_hybrid(xn, u):
        res = ilqr_admm(
            arm.step, arm.get_AB, aquad, xn, u, quad_cost=aquad,
            project_x=proj_xa, project_u=proj_ua,
            rho_x=jnp.asarray(rho_xa), rho_u=1e-3,
            max_iter=12, max_admm_iter=10,
            alphas=(10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=f32))[:5],
            tol=1e-4, method="dp", riccati="sqrt")
        return al_ilqr_solve(
            arm.step, arm.get_AB, get_Cs_a, aquad, res.x_nom[0], res.u_nom,
            ineq=arm_ineq, cfg=ILQRConfig(max_iter=10, tol_fun=1e-7),
            n_al=5, mu0=10.0, tol_con=1e-5, riccati="sqrt").cost

    arm_hybrid_fn = jax.jit(arm_hybrid)
    timed("ilqr_admm->AL hybrid 3DoF arm state+control (f32)", 639.0,
          lambda: arm_hybrid_fn(x_nom_a, u0a),
          oracle=lambda c: (
              f"cost={float(c):.6f} == feasible f64 optimum 0.199817 "
              f"(ref 0.1996 is infeasible-optimistic), exact bounds"))

    # ---- 11. ADMM_LQT_Batch state+control bounds (ref 115 ms, cost 3.09e-2)
    # state-bounds notebook c13: zero tracking cost, terminal pin via
    # projection, |u| <= 3 (test_lqt_admm.py::test_state_and_control_bounds)
    cost_sb = di_cost(N, 2, 0.0, 1e-4, [1.0, 1.0])

    def proj_x_pin(x):
        x_ = x.reshape(N, 2)
        x_ = x_.at[-1, 0].set(jnp.clip(x_[-1, 0], 0.5, 0.5))
        x_ = x_.at[-1, 1].set(0.0)
        return x_.reshape(-1)

    proj_u3 = lambda u: project_bound(u, -3.0, 3.0)
    rho_x_sb = np.zeros((N, 2, 2), np.float32)
    rho_x_sb[-1] = np.eye(2) * 1e1
    sb_fn = jax.jit(
        lambda x0: lqt_admm_batch(
            A1, B1, cost_sb, x0, project_x=proj_x_pin, project_u=proj_u3,
            rho_x=jnp.asarray(rho_x_sb), rho_u=1e-3,
            cfg=ADMMConfig(max_iter=500, tol=1e-3),
        )[:2]
    )
    timed(
        "ADMM_LQT_Batch state+control bounds", 115.0, lambda: sb_fn(x0_2),
        oracle=lambda xu: (
            f"cost={float(cost_sb(xu[0].reshape(N, 2), xu[1].reshape(N, 1))):.2e}"
            f" (ref 3.09e-2), xN={float(xu[0].reshape(N, 2)[-1, 0]):.4f}"
        ),
    )

    # ---- 12/13. ADMM_LQT spherical obstacle avoidance (ref 447 / 1940 ms)
    # obstacle notebook c13-14: 2D double integrator, two circular
    # obstacles via consensus-ADMM + Dykstra refinement
    # (examples/double_integrator_obstacles.py)
    from ilqr_admm_tpu.projections import (
        project_quadratic,
        project_set_convex_dykstra,
    )

    cost_ob = di_cost(N, 4, 1e3, 1e-4, [1.0, 1.0, 0.0, 0.0])
    radii_ob = np.array([0.1, 0.15]) * 1.1
    centers_ob = [jnp.asarray([0.5, 0.5], f32), jnp.asarray([0.5, 0.2], f32)]
    lowers_ob = 0.5 * radii_ob**2
    projs_ob = [
        (lambda c, l: (lambda y: project_quadratic(y - c, l, 1e2) + c))(c, l)
        for c, l in zip(centers_ob, lowers_ob)
    ]
    As_ob = [jnp.eye(2, dtype=f32)] * 2
    bs_ob = [jnp.zeros(2, f32)] * 2

    def proj_x_ob(x):
        x_ = x.reshape(N, 4)
        pos = x_[:, :2]
        pos = project_set_convex(pos, As_ob, bs_ob, projs_ob, rho=1.0,
                                 max_iter=5, threshold=1e-2)
        pos = project_set_convex_dykstra(pos, projs_ob, max_iter=50, tol=1e-5)
        return x_.at[:, :2].set(pos).reshape(-1)

    rho_x_ob = np.zeros((N, 4, 4), np.float32)
    rho_x_ob[:, :2, :2] = np.eye(2)

    def ob_oracle(xu):
        xs = np.asarray(xu[0]).reshape(N, 4)
        us = np.asarray(xu[1]).reshape(N, 2)
        c = float(cost_ob(xs, us))
        clear = min(
            float(np.linalg.norm(xs[:, :2] - np.asarray(cc), axis=-1).min())
            for cc in centers_ob
        )
        return f"cost={c:.3e} (ref 2.68e-1), min clearance {clear:.3f}"

    # use_qr: at plain f32 precision the TPU x-update brushes into
    # obstacle 1 (clearance 0.061-0.097 < radius 0.10 across penalty
    # scales; CPU f32 is fine) — the square-root x-update restores the
    # CPU-grade iterate (cost 2.70e-1, clearance 0.107)
    ob_b = jax.jit(
        lambda x0: lqt_admm_batch(
            A2, B2, cost_ob, x0, project_x=proj_x_ob,
            rho_x=jnp.asarray(rho_x_ob),
            cfg=ADMMConfig(max_iter=500, tol=1e-3), use_qr=True,
        )[:2]
    )
    timed("ADMM_LQT_Batch 2 spherical obstacles", 447.0,
          lambda: ob_b(x0_4), oracle=ob_oracle)
    # DP path needs a stiffer position penalty to stay clear of the
    # obstacles (rho 1: clearance 0.050 < radius 0.10; rho 10: 0.109 at
    # cost 2.77e-1 vs ref 2.701e-1 — CPU sweep)
    rho_x_ob_dp = np.zeros((N, 4, 4), np.float32)
    rho_x_ob_dp[:, :2, :2] = np.eye(2) * 1e1
    ob_d = jax.jit(
        lambda x0: lqt_admm_dp(
            A2, B2, cost_ob, x0, project_x=proj_x_ob,
            rho_x=jnp.asarray(rho_x_ob_dp),
            cfg=ADMMConfig(max_iter=500, tol=1e-3),
        )[:2]
    )
    timed("ADMM_LQT_DP 2 spherical obstacles", 1940.0,
          lambda: ob_d(x0_4), oracle=ob_oracle)

    # ---- 14. ADMM_SLS robust state+control bounds (ref 482 ms)
    # state-bounds notebook c17 (test_sls_robust.py config): terminal
    # SOC rows + per-row control chance SOCs, psi^-1(0.9)
    psi9 = float(norm.ppf(0.9))

    def _soc_pair_rows(psi, hi, lo, var):
        mu_ = np.array([1.0, 0.0])
        Ad = np.diag(np.sqrt([0.0, var]))
        Ah = jnp.asarray(np.concatenate([Ad, (-mu_ / psi)[None]], 0), f32)
        bh = jnp.asarray(np.append(np.zeros(2), hi / psi), f32)
        Al = jnp.asarray(np.concatenate([Ad, (mu_ / psi)[None]], 0), f32)
        bl = jnp.asarray(np.append(np.zeros(2), -lo / psi), f32)
        return [Ah, Al], [bh, bl]

    As_u9, bs_u9 = _soc_pair_rows(psi9, 3.0, -3.0, 0.02)
    As_p9, bs_p9 = _soc_pair_rows(psi9, 0.5, 0.5, 0.02)
    As_v9, bs_v9 = _soc_pair_rows(psi9, 0.0, 0.0, 0.02)
    socs = [project_soc_unit] * 2

    def proj_u_sb(y):
        return project_set_convex(y, As_u9, bs_u9, socs, rho=1e1,
                                  max_iter=20, threshold=1e-2)

    def proj_x_sb(y):
        pos = project_set_convex(y[-2:-1], As_p9, bs_p9, socs, rho=1e1,
                                 max_iter=20, threshold=1e-2)
        vel = project_set_convex(y[-1:], As_v9, bs_v9, socs, rho=1e1,
                                 max_iter=20, threshold=1e-2)
        return y.at[-2:-1].set(pos).at[-1:].set(vel)

    rho_x_r9 = np.zeros((N, 2, 2), np.float32)
    rho_x_r9[-1] = np.eye(2) * 1e3
    slsx_fn = jax.jit(
        lambda A, B: sls_admm(
            A, B, cost_sb, project_x=proj_x_sb, project_u=proj_u_sb,
            rho_x=jnp.asarray(rho_x_r9), rho_u=1e-3, robust_dim=1,
            cfg=ADMMConfig(max_iter=100, tol=1e-5, stall_tol=1e-2),
        )[:2]
    )
    timed(
        "ADMM_SLS robust state+control bounds", 482.0,
        lambda: slsx_fn(A1, B1),
        oracle=lambda dp: (
            f"min u z-score {float(np.min(np.minimum(3.0 - np.asarray(dp[0]), 3.0 + np.asarray(dp[0])) / np.maximum(np.sqrt(0.02) * np.abs(np.asarray(dp[1][:, 0])), 1e-12))):.2f}"
            f" (target {psi9:.2f})"
        ),
    )

    # ---- 15. iLQR batch-LS car (ref 7130 ms)
    # Car state-constraints notebook c13: CarSimple, lifted least-squares
    # inner solve (examples/car_state_constraints.py)
    from ilqr_admm_tpu.models.car import CarSimple

    cars = CarSimple(dt=15.0 / Ncar)
    target_s = jnp.asarray([-5.0, -5.0, np.pi / 4, 0.0], f32)
    zs_s = jnp.stack([jnp.zeros(4, f32), target_s])
    Qs_s = jnp.stack([jnp.zeros((4, 4), f32), jnp.eye(4, dtype=f32) * 1e2])
    seq_s = np.zeros(Ncar, dtype=np.int32)
    seq_s[-1] = 1
    scost = viapoint_cost(zs_s, Qs_s, seq_s, 1e-2, 2)
    x0s_ = jnp.asarray([0.0, -2.0, np.pi / 2, 0.0], f32)
    u0s_ = jnp.zeros((Ncar, 2), f32)

    def get_Cs_s(xs, us):
        return quad_cost_model(scost.Q, scost.xd, scost.R, xs, us)

    def car_batch_solve(x0_, u0_):
        with jax.default_matmul_precision("highest"):
            s0 = ilqr_init(cars.step, scost, x0_, u0_)
            return ilqr_solve(
                cars.step, cars.get_AB, get_Cs_s, scost, s0,
                ILQRConfig(max_iter=50, max_line_search_iter=40),
                method="batch",
            )

    carb_fn = jax.jit(lambda x0_, u0_: car_batch_solve(x0_, u0_).x_nom)
    timed(
        "iLQR batch-LS car (N=500)", 7130.0, lambda: carb_fn(x0s_, u0s_),
        oracle=lambda xs: (
            f"final state err {float(jnp.linalg.norm(xs[-1] - target_s)):.3f}"
        ),
    )

    # ---- 16. ilqr_admm car, 2 rotated-box obstacles (ref 6580 ms)
    # Car state-constraints notebook c20: inf-norm-shell projections
    # composed via consensus ADMM (examples/car_state_constraints.py)
    from ilqr_admm_tpu.projections import project_square

    centers_rb = np.stack([np.array([-7.0, -3.0]), np.array([-3.0, -7.0])])
    a_safe = np.array([[2.5, 1.5], [2.5, 1.5]])
    alpha_rb = -np.pi / 4
    Rrb = np.array([[np.cos(alpha_rb), -np.sin(alpha_rb)],
                    [np.sin(alpha_rb), np.cos(alpha_rb)]])
    Ws_rb, Ws_inv_rb = [], []
    for i in range(2):
        W = np.diag(a_safe[i, 0] / a_safe[i]) @ Rrb.T
        Ws_rb.append(jnp.asarray(W, f32))
        Ws_inv_rb.append(jnp.asarray(np.linalg.inv(W), f32))
    lower_sq = a_safe[:, 0] / 2

    def make_proj_rb(i):
        c = jnp.asarray(centers_rb[i], f32)

        def proj(y):
            z = (y[:, :2] - c) @ Ws_rb[i].T
            z = project_square(z, float(lower_sq[i]), 1e5)
            return y.at[:, :2].set(z @ Ws_inv_rb[i].T + c)

        return proj

    projs_rb = [make_proj_rb(0), make_proj_rb(1)]
    As_rb = [jnp.eye(4, dtype=f32)] * 2
    bs_rb = [jnp.zeros(4, f32)] * 2

    def proj_x_rb(x):
        x_ = x.reshape(Ncar, 4)
        out = project_set_convex(x_, As_rb, bs_rb, projs_rb, rho=1e1,
                                 max_iter=15, threshold=1e-3)
        return out.reshape(-1)

    rho_x_rb = np.zeros((Ncar, 4, 4), np.float32)
    rho_x_rb[:, :2, :2] = np.eye(2) * 1e-1
    x_nom_s = rollout_nonlinear(cars.step, x0s_, u0s_)

    def rb_oracle(res):
        xs = np.asarray(res.x_nom)
        clear = min(
            float(np.abs((xs[:, :2] - centers_rb[i]) @ np.asarray(Ws_rb[i]).T)
                  .max(-1).min())
            for i in range(2)
        )
        return (f"cost={float(res.cost):.3f}, min box distance {clear:.3f} "
                f"(bound {lower_sq[0]:.2f})")

    car_rb = jax.jit(
        lambda xn, u: ilqr_admm(
            cars.step, cars.get_AB, scost, xn, u, get_Cs=get_Cs_s,
            project_x=proj_x_rb, rho_x=jnp.asarray(rho_x_rb),
            max_iter=10, max_admm_iter=10,
            alphas=(10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=f32))[:50],
            tol=1e-1, outer_tol=1e-3, osc_tol=1e-4,
        )
    )
    timed("ilqr_admm car 2 rotated-box obstacles (N=500)", 6580.0,
          lambda: car_rb(x_nom_s, u0s_), oracle=rb_oracle)

    # ---- 17. isls_admm robust 3DoF + 1k-rollout MC (ref 9580 ms total)
    # 3DoF robust notebook c26 (test_isls_robust.py config): robust iSLS
    # synthesis + 1000 on-device MC rollouts + success-rate reduction,
    # all inside the timed window (the reference's 9.58 s is also
    # solve + MC)
    from ilqr_admm_tpu.solvers.isls_admm import isls_admm
    from ilqr_admm_tpu.solvers.lqt import sls_controller
    from ilqr_admm_tpu.ops.rollout import rollout_sls_delta

    VAR_Q0 = 0.1
    x_std_r, u_std_r = 1e3, 1e-4
    target_r = jnp.asarray([0.0] * n + [0.0] * n + [1.5, 2.0, 0.0], f32)
    w_r = jnp.asarray([0.0] * n + [x_std_r] * n + [x_std_r, x_std_r, 0.0], f32)
    zs_r = jnp.stack([jnp.zeros(d, f32), target_r])
    Qs_r = jnp.stack([jnp.zeros((d, d), f32), jnp.diag(w_r)])
    rquad = viapoint_cost(zs_r, Qs_r, seq, u_std_r, m)
    q0_r = jnp.asarray([np.pi / 3, -np.pi / 2, -np.pi / 4], f32)
    x0_r = arm.initial_state(q0_r)
    u0_r = jnp.zeros((Na, m), f32)
    x_nom_r = rollout_nonlinear(arm.step, x0_r, u0_r)

    rng_r = np.random.default_rng(11)
    q0s_mc = rng_r.normal(np.asarray(x_nom_r[0, :n]), np.sqrt(VAR_Q0),
                          size=(1000, n)).astype(np.float32)
    x0s_mc = jnp.asarray(
        np.concatenate(
            [q0s_mc, np.zeros((1000, n), np.float32),
             np.asarray(jax.vmap(arm.fk)(jnp.asarray(q0s_mc)), np.float32)],
            axis=-1,
        )
    )

    def robust_and_mc(xn, u0_, x0s_batch):
        res = isls_admm(
            arm.step, arm.get_AB, rquad, xn, u0_, robust_dim=n,
            quad_cost=rquad, rho_u=1e0,
            joint_alpha=0.958, u_bounds=(-6.0, 6.0), x0_var=VAR_Q0,
            k_max=50, max_admm_iter=10,
            alphas=(10.0 ** jnp.linspace(0.0, -5.0, 50, dtype=f32))[:30],
            outer_tol=1e-4,
        )
        PHI_U = jnp.zeros((m * Na, d * Na), f32).at[:, :n].set(res.phi_u)
        A_r, B_r = arm.get_AB(res.x_nom, res.u_nom)
        K_r, k_r = sls_controller(A_r, B_r, PHI_U, res.du)
        _, us_mc = jax.vmap(
            lambda a: rollout_sls_delta(arm.step, a, K_r, k_r,
                                        res.x_nom, res.u_nom)
        )(x0s_batch)
        ok = jnp.all(jnp.abs(us_mc) <= 6.0 + 1e-3, axis=(1, 2))
        return jnp.mean(ok.astype(f32)), res.cost

    risl_fn = jax.jit(robust_and_mc)
    timed(
        "isls_admm robust 3DoF + 1k-rollout MC", 9580.0,
        lambda: risl_fn(x_nom_r, u0_r, x0s_mc),
        oracle=lambda rc: (
            f"joint MC success {float(rc[0]):.3f} (ref 0.958; "
            f"chi-calibrated joint_alpha=0.958)"
        ),
    )

    # ---- 10. batched throughput headline (no single-instance reference)
    BATCH = 4096
    bsolve = make_batched_lqt_admm(A1, B1, cost1, project_u=proj_u, rho_u=1e-2,
                                   n_iters=100)
    x0s = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (BATCH, 2)), f32)
    out = timed(
        f"batched GEMM-ADMM, {BATCH} instances x 100 iters", 4096 * 172.0 / 5,
        lambda: bsolve(x0s)[1],
        oracle=lambda u: f"{BATCH} instances",
    )

    # ---- write outputs (BENCH_ONLY runs merge into the existing table
    # by row name instead of clobbering it)
    here = os.path.dirname(os.path.abspath(__file__))
    rows_out = RESULTS
    jpath = os.path.join(here, "headtohead.json")
    if os.environ.get("BENCH_ONLY") and os.path.exists(jpath):
        with open(jpath) as fh:
            prev = {r["name"]: r for r in json.load(fh).get("rows", [])}
        for r in RESULTS:
            prev[r["name"]] = r
        rows_out = list(prev.values())
    with open(jpath, "w") as fh:
        json.dump({"backend": backend, "rows": rows_out}, fh, indent=2)
    lines = [
        "# Head-to-head vs BASELINE.md (single-instance wall clock)",
        "",
        f"Backend: {backend}. Reference times: author's laptop NumPy "
        "(BASELINE.md). Timings are readback-terminated: each call's "
        "window closes only when a result scalar lands on the host, so "
        "every row pays one ~30 ms host-device RTT through the remote "
        "tunnel that the reference laptop numbers do not (conservative "
        "for rows cheaper than the RTT; see docs/LATENCY.md). Batched "
        "throughput (RESULTS.md, bench.py) is the headline metric. The "
        "one row whose reference time sits below the RTT (lifted build) "
        "carries its dispatch-amortized on-device time in the oracle "
        "column.",
        "",
        "| Benchmark | ours (ms) | reference (ms) | speedup | oracle |",
        "|---|---|---|---|---|",
    ]
    for r in rows_out:
        lines.append(
            f"| {r['name']} | {r['ours_ms']} | {r['ref_ms']} | "
            f"{r['speedup']}x | {r['oracle']} |"
        )
    with open(os.path.join(here, "HEADTOHEAD.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote benchmarks/HEADTOHEAD.md")


if __name__ == "__main__":
    main()
