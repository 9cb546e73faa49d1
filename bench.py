"""Benchmark: batched constrained-LQT ADMM iterations/s/chip at N=100.

Primary metric per BASELINE.json: ADMM+Riccati iterations/s/chip at
horizon N=100 — each ADMM iteration solves the regularized LQT subproblem
(the Riccati/lifted x-update), applies the projection z-update and the
dual update. The TPU path uses the fused Pallas
kernel (`ops/pallas_admm.py`): the whole iteration loop runs in one
kernel with iterates resident in VMEM and one bf16x3 MXU GEMM per
iteration, batched over 16k instances on one chip (XLA GEMM fallback:
`solvers/batched.py`).

Baseline: the reference `ADMM_LQT_DP` runs 500 ADMM iterations in 172 ms
single-instance (BASELINE.md, control-bounds c13) → ~2,907 iterations/s.

Prints exactly one JSON line.
"""

import json
import os
import time

# persistent compilation cache: the driver's bench run reuses the
# binaries compiled during development instead of recompiling (~minutes)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_ITERS_PER_S = 500 / 0.172  # reference ADMM_LQT_DP (BASELINE.md)

# bf16 MXU peak FLOP/s by device kind (public spec sheets) for the MFU
# certificate; None -> MFU fields omitted.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_bf16_flops():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_BF16.items():
        if kind.lower().startswith(k.lower()):
            return v, kind
    return None, kind


def _oracle_cost_gap(A, B, cost, x0s, z_u):
    """Relative cost gap of the feasible z-iterates vs an f64 oracle.

    Lifts the f32 problem data exactly to f64 (f32->f64 is exact, so the
    oracle solves the *same* QP in higher precision) and solves each
    box-constrained instance min_u u^T M u - 2 r^T u, |u| <= 5 with
    L-BFGS-B. Returns (median, max) of (J(z) - J(u*)) / |J(u*)|.
    """
    from scipy.optimize import minimize

    from ilqr_admm_tpu.ops.lifted import build_Su, sw_x0
    from ilqr_admm_tpu.solvers.lqt import block_diag_stacked

    Su = np.asarray(build_Su(A, B), np.float64)
    Q = np.asarray(block_diag_stacked(cost.Q), np.float64)
    R = np.asarray(block_diag_stacked(cost.R), np.float64)
    xd = np.asarray(cost.lifted_xd(), np.float64)
    M = Su.T @ Q @ Su + R
    dim = M.shape[0]
    bounds = [(-5.0, 5.0)] * dim

    gaps = []
    for x0, z in zip(np.asarray(x0s, np.float64), z_u):
        free = np.asarray(sw_x0(A, jnp.asarray(x0)).reshape(-1), np.float64)
        r = Su.T @ (Q @ (xd - free))
        const = (free - xd) @ Q @ (free - xd)

        def f_and_g(v):
            Mv = M @ v
            return v @ Mv - 2.0 * r @ v, 2.0 * (Mv - r)

        res = minimize(
            f_and_g, z, jac=True, method="L-BFGS-B", bounds=bounds,
            options={"ftol": 1e-16, "gtol": 1e-12, "maxiter": 2000},
        )
        j_opt = res.fun + const
        j_z = z @ (M @ z) - 2.0 * r @ z + const
        gaps.append((j_z - j_opt) / max(abs(j_opt), 1e-12))
    gaps = np.asarray(gaps)
    return float(np.median(gaps)), float(np.max(gaps))


def main():
    from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
    from ilqr_admm_tpu.projections import project_bound
    from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
    from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

    N = 100
    BATCH = 16384
    ADMM_ITERS = 100

    plant = DoubleIntegrator(1, 2, dt=1.0 / N)
    d, m = plant.x_dim, plant.u_dim
    zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.0, 0.0])]).astype(jnp.float32)
    Qs = jnp.stack([jnp.zeros((d, d)), jnp.eye(d) * 1e3]).astype(jnp.float32)
    seq = np.zeros(N, dtype=np.int32)
    seq[-1] = 1
    cost = viapoint_cost(zs, Qs, seq, 1e-2, m)
    A, B = plant.AB(N)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)

    # rho_u = 0.1: the well-scaled penalty for this problem — 100% of
    # 16k instances reach primal residual < 1e-4 within 100 iterations
    # (rho=1e-2, r2's setting, left a 5.5% slow-converging tail; measured
    # CPU f32 sweep: rho 0.1 -> max_prim 4.4e-5 @100 iters, cost gap vs
    # f64 oracle max 4.5e-7). rho changes the ADMM trajectory, not the
    # optimum; the oracle gap assertions below certify that.
    RHO_U = 1e-1
    try:
        from ilqr_admm_tpu.ops.pallas_admm import make_pallas_lqt_admm

        solve_p = make_pallas_lqt_admm(
            A, B, cost, u_lower=-5.0, u_upper=5.0,
            rho_u=RHO_U, n_iters=ADMM_ITERS, batch_tile=2048,
        )
        # probe: Mosaic lowering errors surface at first call, not at
        # build (e.g. CPU backend) — trigger them inside the try
        jax.block_until_ready(solve_p(jnp.zeros((2048, d), jnp.float32)))
        solve = lambda x0s: solve_p(x0s)[:2]
        solve_zu = lambda x0s: solve_p(x0s)[3]
    except Exception:
        solve = make_batched_lqt_admm(
            A, B, cost,
            project_u=lambda u: project_bound(u, -5.0, 5.0),
            rho_u=RHO_U, n_iters=ADMM_ITERS,
        )
        solve_zu = lambda x0s: jnp.clip(solve(x0s)[1], -5.0, 5.0)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(0.0, 0.1, size=(BATCH, d)), jnp.float32)

    # warmup / compile
    x, u = solve(x0s)
    jax.block_until_ready(u)
    assert bool(jnp.all(jnp.isfinite(u)))

    # --- solution-quality certificates (VERDICT r1 #5: the metric must
    # carry convergence / feasibility / optimality evidence, not a
    # max|u| smell test) -------------------------------------------------
    z_u = solve_zu(x0s)
    # feasibility of the reported (projected) iterate — 0 by construction
    max_violation = float(jnp.max(jnp.maximum(jnp.abs(z_u) - 5.0, 0.0)))
    # per-instance primal residual ||u - z|| at the reference ADMM
    # tolerance (control-bounds notebook runs at tol 1e-4)
    prim = jnp.linalg.norm(u - z_u, axis=-1)
    converged_frac = float(jnp.mean((prim < 1e-4).astype(jnp.float32)))
    # cost gap vs an f64 oracle on a subsample: the same QP (the f32
    # problem data lifted exactly to f64) solved to optimality with
    # bound-constrained L-BFGS-B; BASELINE.json's own bar is 1e-4
    cost_gap_med, cost_gap_max = _oracle_cost_gap(
        A, B, cost, x0s[:64], np.asarray(z_u[:64], np.float64)
    )

    assert max_violation == 0.0, f"infeasible z-iterate: {max_violation}"
    # VERDICT r2 #3: the MAX gap and the converged fraction are asserted,
    # not just the median — 99%+ of instances must sit at the reference
    # primal tolerance and every oracle-checked instance within 1e-4.
    assert cost_gap_med <= 1e-4, f"median cost gap {cost_gap_med} > 1e-4"
    assert cost_gap_max <= 1e-4, f"max cost gap {cost_gap_max} > 1e-4"
    assert converged_frac >= 0.99, f"converged_frac {converged_frac} < 0.99"

    # steady-state throughput: pipeline K solves per timing window so
    # per-dispatch gaps amortize away; the window is terminated by a
    # scalar READBACK of the final solve (in-order execution guarantees
    # all K completed) because block_until_ready can return before
    # remote work finishes on the tunnel backend (measured: the two
    # methods agree here, 805 vs 810M it/s at K=100, but readback is the
    # defensible one). The readback channel is already warm — the
    # certificate section above pulled arrays to host. The reported
    # value is the MEDIAN window (IQR alongside); best_window is carried
    # for comparison with contention-spike-sensitive best-of metrics.
    # VERDICT r4 #5 (number hygiene): the reported value is the MEDIAN
    # over the windows, with the IQR carried alongside — single-run
    # best-of deltas (818 vs 824 vs 832M across rounds) are run-to-run
    # drift, not progress; deltas within the IQR band are "flat".
    # BENCH_REPS=12 is the drift-study setting (RESULTS.md).
    K = 100
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # one UNTIMED window first: the very first pipelined window after
    # warmup runs ~5x slow (dispatch pipeline not yet saturated) and a
    # median over few windows would carry that cold start (measured:
    # 3-window median 775M with the cold window vs 813M without)
    for _ in range(K):
        u_last = solve(x0s)[1]
    _ = float(u_last[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(K):
            u_last = solve(x0s)[1]
        _ = float(u_last[0, 0])
        times.append((time.perf_counter() - t0) / K)
    rates = np.sort(BATCH * ADMM_ITERS / np.asarray(times))
    iters_per_s = float(np.median(rates))
    q1, q3 = np.percentile(rates, [25, 75])

    # --- MFU / FLOP accounting (VERDICT r2 #4) --------------------------
    # Useful math per ADMM iteration per instance: the (N*m)x(N*m)
    # response GEMM  s @ Wu  = 2*(Nm)^2 FLOPs (the one matmul the
    # algorithm requires). The kernel issues it as bf16x3 (3 MXU
    # passes), and the MXU tiles 100-wide operands into 128-wide lanes
    # (underfill factor (128/100)^2 on the KxN dims). mfu_useful is the
    # honest number (useful FLOPs vs peak); mfu_issued counts the 3
    # passes; mfu_mxu_occupancy additionally counts the padded lanes —
    # the fraction of peak the MXU pipeline actually sustains.
    Nm = N * m
    useful_flops_per_iter = 2.0 * Nm * Nm
    useful_tflops = iters_per_s * useful_flops_per_iter / 1e12
    pad = 128.0 * -(-Nm // 128)  # lane-padded operand width
    peak, device_kind = _peak_bf16_flops()
    mfu = {
        "device_kind": device_kind,
        "useful_tflops": round(useful_tflops, 2),
        "issued_tflops_bf16x3": round(3 * useful_tflops, 2),
        "lane_underfill": round((pad / Nm) ** 2, 3),
    }
    if peak:
        mfu["mfu_useful"] = round(useful_tflops * 1e12 / peak, 4)
        mfu["mfu_issued"] = round(3 * useful_tflops * 1e12 / peak, 4)
        mfu["mfu_mxu_occupancy"] = round(
            3 * useful_tflops * (pad / Nm) ** 2 * 1e12 / peak, 4
        )

    print(
        json.dumps(
            {
                "metric": "admm_riccati_iterations_per_s_per_chip_N100",
                "value": round(iters_per_s, 1),
                "unit": "ADMM+Riccati iterations/s",
                "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2),
                # run-to-run variability over the timing windows: the
                # value is the MEDIAN window; deltas within the IQR are
                # noise, not progress (RESULTS.md drift study)
                "windows": reps,
                "iqr_low": round(float(q1), 1),
                "iqr_high": round(float(q3), 1),
                "best_window": round(float(rates[-1]), 1),
                **mfu,
                # solution-quality certificates (subsample oracle = 64
                # instances, f64 L-BFGS-B; gaps are relative cost excess
                # of the feasible z-iterate over the true optimum)
                "converged_frac": round(converged_frac, 4),
                "max_violation": max_violation,
                "cost_gap_median": float(f"{cost_gap_med:.3g}"),
                "cost_gap_max": float(f"{cost_gap_max:.3g}"),
            }
        )
    )


if __name__ == "__main__":
    main()
