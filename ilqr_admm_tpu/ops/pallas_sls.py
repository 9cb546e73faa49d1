"""Fused Pallas kernel: batched robust SLS-ADMM with inlined SOC
consensus projections.

The XLA path (`solvers/batched_sls.py`) streams the (batch, Nm, p+1)
iterates through HBM every ADMM iteration and runs the consensus-ADMM
chance-constraint projection as generic vmapped code. This kernel keeps
a batch tile's entire iterate set resident in VMEM across ALL outer
iterations and fuses everything:

- layout: per-column **slabs** — the decision matrix [du | Phi_u-cols]
  is stored as p+1 separate (tile_b, Nm) arrays (stacked on a leading
  static axis), so every reduction of the per-row chance-constraint
  projection (vectors of length p+1 / p+2) becomes *elementwise* VPU
  code over slabs with compile-time scalar coefficients — no strided
  small-axis reductions, no lane waste;
- x-update: p+1 GEMMs (tile_b, Nm) x (Nm, Nm) per iteration as manual
  bf16x3 MXU products (same trick as `ops/pallas_admm.py` — Mosaic
  rejects Precision.HIGH, so split operands and keep the three
  significant cross terms);
- z-update: the intersection-of-SOCs projection (chance-constrained
  bounds, reference notebook construction SURVEY §3.3) runs its
  consensus-ADMM inner loop (`projections/sets.py::project_set_convex`
  semantics, fixed iteration count) entirely on the VPU, with the small
  (p+1, p+1) prefactored inverse unrolled to scalar constants.

Specialization: chance-constrained *control* rows — each row phi of
[du | Phi_u] must satisfy A_i phi + b_i in SOC for a static list of
A_i, with the per-instance scenario parameter (the bound) entering b_i
linearly. This is the robust benchmark class (control chance
constraints); state chance constraints use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_admm_tpu.ops.lifted import build_Su, build_Sx
from ilqr_admm_tpu.ops.pallas_admm import _dot3, _split_bf16
from ilqr_admm_tpu.problem import QuadCost
from ilqr_admm_tpu.solvers.lqt import block_diag_stacked, broadcast_rho

_F32 = jnp.float32
_EPS = 1e-30


def _soc_project_slabs(ws, t):
    """SOC projection of slab-decomposed [w_0..w_{q-1} | t] onto
    ||w|| <= t. ws: list of (tile_b, Nm) slabs; t: (tile_b, Nm).
    Elementwise (VPU) — mirrors `projections/primitives.py:83-98`."""
    n2 = ws[0] * ws[0]
    for w in ws[1:]:
        n2 = n2 + w * w
    n = jnp.sqrt(n2)
    inside = n <= t
    zero = n <= -t
    scale = 0.5 * (n + t) / (n + _EPS)
    w_out = [
        jnp.where(inside, w, jnp.where(zero, 0.0, scale * w)) for w in ws
    ]
    t_out = jnp.where(inside, t, jnp.where(zero, 0.0, 0.5 * (n + t)))
    return w_out, t_out


def _diamond_project_slabs(a, b, w0, w1, r):
    """Exact projection of rows (a, b) onto {w0|a| + w1|b| <= r}.

    The weighted-l1 'diamond' — the chance-constrained control-bounds
    row set |du| + psi*sigma*|phi| <= bound in closed form (p = 1).
    Elementwise over (tile_b, Nm) slabs: the soft-threshold solution
    v_k = sign(v_k) max(|v_k| - lam w_k, 0) with the 2D lambda resolved
    branchlessly (both-active line projection, then the two
    one-coordinate-clamped vertex branches). ~20 VPU ops — replaces the
    generic n_cons_iters-deep consensus-ADMM inner loop entirely, and is
    EXACT (the consensus inner loop is only ever approximately feasible).
    """
    aa = jnp.abs(a)
    ab = jnp.abs(b)
    s = w0 * aa + w1 * ab
    inside = s <= r
    lam = (s - r) / (w0 * w0 + w1 * w1)
    xa = aa - lam * w0
    xb = ab - lam * w1
    # if one soft-thresholded coordinate would go negative, the KKT
    # solution clamps it to 0 and the other to the diamond vertex
    na = jnp.where(xb < 0.0, r / w0, jnp.where(xa < 0.0, 0.0, xa))
    nb = jnp.where(xb < 0.0, 0.0, jnp.where(xa < 0.0, r / w1, xb))
    a_out = jnp.where(inside, a, jnp.sign(a) * na)
    b_out = jnp.where(inside, b, jnp.sign(b) * nb)
    return a_out, b_out


def _sls_admm_kernel(
    bound_ref,  # (tile_b, Nm) per-instance bound broadcast
    U_base_ref,  # (p1, tile_b, Nm) unconstrained x-update base
    W_hi_ref, W_lo_ref,  # (Nm, Nm) composite (l_inv Rr)^T pre-split
    U_out_ref,  # (p1, tile_b, Nm)
    *,
    n_iters: int,
    n_cons_iters: int,
    alpha: float,
    cons_rho: float,
    stop_tol: float,
    check_every: int,
    p1: int,
    soc_A,  # tuple of np (q, p1) matrices (compile-time constants)
    soc_b_fixed,  # tuple of np (q,) vectors
    soc_b_bound,  # tuple of np (q,) vectors: b_i = fixed + bound * coeff
    l_inv_cons,  # np (p1, p1) prefactored consensus inverse
    mxu_dot,  # (a, b_hi, b_lo) -> a@b at the chosen device precision
    z_update: str = "consensus",
    diamond_w=None,  # (p1,) weights when z_update == "diamond"
):
    nsets = len(soc_A)
    # SOC dimension (q-1 "z" comps + 1 "t" comp); unused in diamond mode
    q = soc_A[0].shape[0] if nsets else 0
    bound = bound_ref[:]
    U_base = [U_base_ref[k] for k in range(p1)]

    def b_slab(i, r):
        """Constraint offset b_i[r] as a (tile_b, Nm) slab."""
        c = float(soc_b_fixed[i][r])
        s = float(soc_b_bound[i][r])
        out = jnp.full_like(bound, c)
        if s != 0.0:
            out = out + s * bound
        return out

    def consensus_project(ys):
        """Project each row vector y (slab list, len p1) onto the
        intersection {phi : A_i phi + b_i in SOC for all i}."""
        # init: z_i = A_i y + b_i, lambda_i = 0  (sets.py:107-108)
        zs = []
        for i in range(nsets):
            zi = []
            for r in range(q):
                acc = jnp.zeros_like(ys[0])
                for k in range(p1):
                    a = float(soc_A[i][r, k])
                    if a != 0.0:
                        acc = acc + a * ys[k]
                zi.append(acc + b_slab(i, r))
            zs.append(zi)
        lmbs = [[jnp.zeros_like(ys[0]) for _ in range(q)] for _ in range(nsets)]

        def x_update(zs, lmbs):
            """x = l_inv_cons (y + rho * sum_i A_i^T (z_i - b_i - l_i)),
            unrolled with compile-time coefficients."""
            rx = []
            for k in range(p1):
                acc = ys[k]
                for i in range(nsets):
                    for r in range(q):
                        a = float(soc_A[i][r, k])
                        if a != 0.0:
                            acc = acc + (cons_rho * a) * (
                                zs[i][r] - b_slab(i, r) - lmbs[i][r]
                            )
                rx.append(acc)
            xs = []
            for k in range(p1):
                acc = jnp.zeros_like(ys[0])
                for j in range(p1):
                    c = float(l_inv_cons[k, j])
                    if c != 0.0:
                        acc = acc + c * rx[j]
                xs.append(acc)
            return xs

        def body(_, carry):
            zs, lmbs = carry
            xs = x_update(zs, lmbs)
            # z / dual updates per set (sets.py:126-136)
            zs_new, lmbs_new = [], []
            for i in range(nsets):
                Ax_b = []
                for r in range(q):
                    acc = b_slab(i, r)
                    for k in range(p1):
                        a = float(soc_A[i][r, k])
                        if a != 0.0:
                            acc = acc + a * xs[k]
                    Ax_b.append(acc)
                w_in = [Ax_b[r] + lmbs[i][r] for r in range(q)]
                w_out, t_out = _soc_project_slabs(w_in[:-1], w_in[-1])
                z_new = w_out + [t_out]
                l_new = [
                    lmbs[i][r] + Ax_b[r] - z_new[r] for r in range(q)
                ]
                zs_new.append(z_new)
                lmbs_new.append(l_new)
            return zs_new, lmbs_new

        # pack nested lists into tuples for the fori carry
        def pack(nested):
            return tuple(tuple(row) for row in nested)

        zs, lmbs = lax.fori_loop(
            0, n_cons_iters, lambda i, c: tuple(map(pack, body(i, c))),
            (pack(zs), pack(lmbs)),
        )
        # one final x-update so the result reflects the last duals
        return x_update(zs, lmbs)

    def outer_body(_, carry):
        Z, L, U = carry
        # x-update: U_k = U_base_k + (Z_k - L_k) @ W. The p1 slab GEMMs
        # are PACKED into one (p1*tile_b, Nm) x (Nm, Nm) MXU product
        # (VERDICT r4 #3): one issue instead of p1, better systolic
        # utilization at these small per-slab row counts.
        tile_b = U_base[0].shape[0]
        S = jnp.concatenate([Z[k] - L[k] for k in range(p1)], axis=0)
        P = mxu_dot(S, W_hi_ref[:], W_lo_ref[:])
        U_new = tuple(
            U_base[k] + P[k * tile_b:(k + 1) * tile_b] for k in range(p1)
        )
        ys = [alpha * U_new[k] + (1.0 - alpha) * Z[k] + L[k] for k in range(p1)]
        if z_update == "diamond":
            a_out, b_out = _diamond_project_slabs(
                ys[0], ys[1], float(diamond_w[0]), float(diamond_w[1]), bound
            )
            Z_new = (a_out, b_out)
        else:
            Z_new = tuple(consensus_project(ys))
        L_new = tuple(L[k] + U_new[k] - Z_new[k] for k in range(p1))
        return Z_new, L_new, U_new

    Z0 = tuple(U_base[k] for k in range(p1))
    L0 = tuple(jnp.zeros_like(U_base[0]) for _ in range(p1))
    if stop_tol > 0.0:
        # per-TILE early exit (same design as pallas_admm r4): residual
        # checked every `check_every` iterations — per-iteration checks
        # block Mosaic's pipelining. At this kernel's large rho_u the
        # primal residual |U - Z| is tight from the first iterations
        # while the DUAL residual (per-iteration z motion) is the live
        # one, so the test takes the max of both. The iterates carry the
        # mxu_dot precision floor (~7e-4 for the default bf16x3); pick
        # stop_tol above it. n_chunks is a ceil: an unconverged tile
        # runs up to check_every-1 iterations PAST n_iters (extra
        # iterations only tighten convergence; results therefore differ
        # slightly from the stop_tol=0 schedule for stragglers).
        n_chunks = -(-n_iters // check_every)

        def w_cond(state):
            return jnp.logical_and(state[0] < n_chunks, state[4] >= stop_tol)

        def w_body(state):
            i, Z, L, U, _r = state
            Z, L, U = lax.fori_loop(
                0, check_every - 1, outer_body, (Z, L, U)
            )
            Z_prev = Z
            Z, L, U = outer_body(0, (Z, L, U))
            r = jnp.asarray(0.0, U[0].dtype)
            for k in range(p1):
                r = jnp.maximum(r, jnp.max(jnp.abs(U[k] - Z[k])))
                r = jnp.maximum(r, jnp.max(jnp.abs(Z[k] - Z_prev[k])))
            return (i + 1, Z, L, U, r)

        big = jnp.asarray(jnp.inf, U_base[0].dtype)
        _, Z, L, U, _ = lax.while_loop(
            w_cond, w_body, (jnp.int32(0), Z0, L0, Z0, big)
        )
    else:
        Z, L, U = lax.fori_loop(0, n_iters, outer_body, (Z0, L0, Z0))
    for k in range(p1):
        U_out_ref[k] = U[k]


def make_pallas_sls_admm(
    A,
    B,
    cost: QuadCost,
    soc_A,
    soc_b_fixed,
    soc_b_bound,
    rho_u,
    robust_dim: int = 1,
    n_iters: int = 50,
    n_cons_iters: int = 20,
    cons_rho: float = 10.0,
    alpha: float = 1.0,
    batch_tile: int = 256,
    gemm_precision: str = "f32",
    stop_tol: float = 0.0,
    check_every: int = 8,
    interpret: bool = False,
    z_update: str = "consensus",
    diamond_w=None,
):
    """Build a fused-Pallas batched robust SLS-ADMM solver.

    z_update='diamond' (requires robust_dim == 1 and `diamond_w`, a pair
    of weights) replaces the inner consensus-ADMM projection with the
    EXACT closed-form projection of each row onto the weighted-l1 ball
    {w0 |du_r| + w1 |phi_r| <= bound} — mathematically the same row set
    as the two-SOC intersection of the chance-constrained control-bounds
    construction, at ~20 VPU ops per iteration instead of a
    n_cons_iters-deep inner loop, and exactly feasible (soc_A/soc_b are
    ignored; pass empty tuples).

    stop_tol > 0 enables per-TILE early exit (residual checked every
    `check_every` iterations; see `ops/pallas_admm.py` for the measured
    design rules) — heterogeneous scenario fleets sorted by `bounds`
    group stragglers so easy tiles stop early.

    Chance-constrained control rows: every row phi (length p+1 =
    robust_dim+1) of [du | Phi_u-cols] must satisfy
    `soc_A[i] @ phi + b_i in SOC` for each constraint set i, with
    b_i = soc_b_fixed[i] + bound * soc_b_bound[i] and `bound` the
    per-instance scenario parameter. soc_* are numpy arrays (they are
    baked into the kernel as scalar constants).

    Returns solve(bounds (batch,)) -> (du (batch, Nm),
    phi_u (batch, Nm, Nd), U (batch, Nm, p+1)), matching
    `solvers/batched_sls.py::make_batched_sls_admm` outputs.
    """
    N, d = A.shape[0], A.shape[-1]
    m = B.shape[-1]
    p = robust_dim
    p1 = p + 1
    dtype = _F32
    A = A.astype(dtype)
    B = B.astype(dtype)

    if z_update not in ("consensus", "diamond"):
        raise ValueError(f"unknown z_update {z_update!r}")
    if z_update == "diamond":
        if p1 != 2 or diamond_w is None or len(diamond_w) != 2:
            raise ValueError(
                "z_update='diamond' requires robust_dim == 1 and "
                "diamond_w = (w_du, w_phi)"
            )
        diamond_w = np.asarray(diamond_w, np.float64)
        if not np.all(diamond_w > 0.0):
            # a zero weight makes r/w infinite in the vertex-clamp
            # branch of the closed-form projection -> NaN iterates with
            # no error (e.g. the sigma=0 no-uncertainty degenerate case:
            # use plain box bounds / pallas_admm instead)
            raise ValueError(
                f"diamond_w must be strictly positive, got {tuple(diamond_w)}"
            )
        soc_A, soc_b_fixed, soc_b_bound = (), (), ()
        l_inv_cons = np.eye(p1)
    else:
        soc_A = tuple(np.asarray(a, np.float64) for a in soc_A)
        soc_b_fixed = tuple(np.asarray(b, np.float64) for b in soc_b_fixed)
        soc_b_bound = tuple(np.asarray(b, np.float64) for b in soc_b_bound)
        if len({a.shape[0] for a in soc_A}) != 1:
            # the kernel unrolls SOC rows with q = soc_A[0].shape[0]; ragged
            # sets would have their extra rows silently dropped
            raise ValueError(
                "all soc_A constraint sets must have the same number of rows; "
                f"got {[a.shape[0] for a in soc_A]} — zero-pad the smaller sets"
            )
        lc = np.eye(p1)
        for a in soc_A:
            lc = lc + cons_rho * (a.T @ a)
        l_inv_cons = np.linalg.inv(lc)

    from ilqr_admm_tpu.solvers.lqt import lqt_solve_sls

    with jax.default_matmul_precision("highest"):
        PHI_unc, _ = lqt_solve_sls(A, B, cost)

        Su = build_Su(A, B)
        # first p columns of Sw, built directly (O(N d^2 p) vs the dense
        # (Nd)^2 operator)
        Sx = build_Sx(A, p).reshape(-1, p)
        Rr = broadcast_rho(rho_u, m, N, dtype)
        Rr_l = block_diag_stacked(Rr)

        Qlift = block_diag_stacked(cost.Q).astype(dtype)
        SuTQ = Su.T @ Qlift
        l_side = SuTQ @ Su + block_diag_stacked(cost.R).astype(dtype) + Rr_l
        l_inv = jnp.linalg.inv(l_side)
        r_ff = SuTQ @ cost.lifted_xd().astype(dtype)
        r_fb = -SuTQ @ Sx
        r_base = jnp.concatenate([r_ff[:, None], r_fb], axis=-1)  # (Nm, p1)

        U_base_cols = (l_inv @ r_base).T  # (p1, Nm)
        W = (l_inv @ Rr_l).T  # (Nm, Nm); U += (Z-L) @ W

    if gemm_precision == "bf16x3":
        # 3 full-rate bf16 MXU passes; drops the O(2^-16) lo.lo term —
        # measured insufficient through the ill-conditioned (l_inv Rr)
        # operator at N=100 (19% solution drift vs the f32 XLA path),
        # kept as an option for well-conditioned problems.
        W_hi, W_lo = _split_bf16(W)
        mxu_dot = _dot3
    elif gemm_precision == "f32":
        W_hi, W_lo = W, jnp.zeros_like(W)
        mxu_dot = lambda a, b_hi, b_lo: jnp.dot(
            a, b_hi, preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        raise ValueError(f"unknown gemm_precision {gemm_precision!r}")

    kernel = functools.partial(
        _sls_admm_kernel,
        n_iters=n_iters, n_cons_iters=n_cons_iters, alpha=alpha,
        cons_rho=cons_rho, p1=p1,
        stop_tol=float(stop_tol), check_every=int(check_every),
        soc_A=soc_A, soc_b_fixed=soc_b_fixed, soc_b_bound=soc_b_bound,
        l_inv_cons=l_inv_cons, mxu_dot=mxu_dot,
        z_update=z_update, diamond_w=diamond_w,
    )

    Nm, Nd = N * m, N * d

    @jax.jit
    def solve(bounds):
        batch = bounds.shape[0]
        assert batch % batch_tile == 0, "batch must be a multiple of batch_tile"
        bounds_slab = jnp.broadcast_to(
            bounds.astype(dtype)[:, None], (batch, Nm)
        )
        U_base = jnp.broadcast_to(
            U_base_cols[:, None, :], (p1, batch, Nm)
        )

        grid = (batch // batch_tile,)
        U = pl.pallas_call(
            kernel,
            grid=grid,
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((batch_tile, Nm), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p1, batch_tile, Nm), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Nm, Nm), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Nm, Nm), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p1, batch_tile, Nm), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((p1, batch, Nm), dtype),
        )(bounds_slab, U_base, W_hi, W_lo)

        U = jnp.transpose(U, (1, 2, 0))  # (batch, Nm, p1)
        du = U[:, :, 0]
        phi_u = jnp.concatenate(
            [U[:, :, 1:p1],
             jnp.broadcast_to(PHI_unc[:, p:], (batch,) + PHI_unc[:, p:].shape)],
            axis=-1,
        )
        return du, phi_u, U

    return solve
