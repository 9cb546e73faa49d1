"""Generic two-block scaled ADMM driver as a bounded `lax.while_loop`.

Functional equivalent of the reference `ADMM()` (`admm.py:6-106`):
x-update from a caller-supplied `f_argmin` closure, z-update from
projection operators with over-relaxation, scaled dual update
λ += (x - z), and the reference's two stopping rules — absolute
primal/dual residual tolerance and relative-stall detection
(`admm.py:72-85`) — plus a hard iteration cap.

Differences from the reference (all jit/vmap motivated):
- fixed-shape residual logs (max_iter, 2) instead of a Python list;
- structured `ADMMInfo` status instead of prints;
- optional residual *weights* so the weighted-residual variants used by
  `ADMM_SLS` / `isls_admm` (`sls.py:411-418`, `isls.py:653-660`) are the
  same driver instead of inlined copies.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_admm_tpu.problem import ADMMConfig, SolveStatus

_EPS = 1e-30


class ADMMInfo(NamedTuple):
    iters: jax.Array  # int — iterations executed
    prim_res: jax.Array
    dual_res: jax.Array
    status: jax.Array  # SolveStatus value
    logs: jax.Array  # (max_iter, 2) primal/dual residual history (0 beyond iters)


def _norm(x):
    return jnp.sqrt(jnp.sum(x * x))


def _rho_is_zero(rho) -> bool:
    """Concrete all-zero penalty (reference-style 'off' spelling).

    A traced value cannot be proven zero, so it is treated as nonzero;
    only the two tracer-conversion errors are interpreted that way —
    anything else (a bad type, a ragged nested list) is a real bug in
    the caller's rho and must surface.
    """
    import numpy as _np

    try:
        return bool(_np.all(_np.asarray(rho) == 0))
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
        return False  # traced value — cannot prove zero


def validate_constraint_blocks(project_x, rho_x, project_u, rho_u):
    """Each ADMM constraint block needs BOTH its projection and penalty.

    A projection without a (nonzero) rho would be silently ignored by
    the x-update (the solver would return the unconstrained optimum
    while appearing to run constrained ADMM); a nonzero rho without its
    projection would inject a zero-target penalty that biases the
    solution. The reference fails with an opaque TypeError in the same
    situations (`Rr @ u` with `Rr=None`, `sls.py`/`isls.py`); here it is
    a clear error at the API boundary. rho=0 with no projection is the
    reference-style explicit 'off' and is accepted.
    """
    for name, proj, rho in (
        ("x", project_x, rho_x), ("u", project_u, rho_u),
    ):
        if proj is not None and (rho is None or _rho_is_zero(rho)):
            raise ValueError(
                f"project_{name} is set but rho_{name}={rho!r}: the "
                f"projection would be silently ignored by the x-update; "
                f"pass a nonzero rho_{name}"
            )
        if proj is None and rho is not None and not _rho_is_zero(rho):
            raise ValueError(
                f"rho_{name}={rho!r} is set but project_{name} is None: "
                f"this would inject a zero-target penalty that biases "
                f"the solution; pass project_{name} or drop rho_{name}"
            )


def _make_plain_step(f_argmin, project_x, project_u, cfg, wx, wu, dtype):
    """One plain scaled-ADMM iteration as a pure function of (z, λ).

    Returns (out, z_x_new, z_u_new, lmb_x_new, lmb_u_new, prim, dual) —
    the building block the Anderson-accelerated driver wraps as the
    fixed-point map T(v).

    KEEP IN SYNC with the plain branch of `admm_solve`'s body: the same
    relaxation/projection/dual/residual sequence lives there interleaved
    with the accel/adaptive carry slots (a shared helper would have to
    thread all of that through; the certificates require the two copies
    to define identical iterations)."""
    has_x = project_x is not None
    has_u = project_u is not None

    def step(z_x, z_u, lmb_x, lmb_u):
        reg_x = z_x - lmb_x if has_x else None
        reg_u = z_u - lmb_u if has_u else None
        out = f_argmin(reg_x, reg_u)
        x_x, x_u = out[0], out[1]
        prim = jnp.asarray(0.0, dtype)
        dual = jnp.asarray(0.0, dtype)
        z_x_new, lmb_x_new = z_x, lmb_x
        z_u_new, lmb_u_new = z_u, lmb_u
        if has_x:
            z_rel = cfg.alpha * x_x + (1.0 - cfg.alpha) * z_x
            z_x_new = project_x(z_rel + lmb_x)
            r = x_x - z_x_new
            lmb_x_new = lmb_x + r
            prim = prim + _norm(wx(r))
            dual = dual + _norm(wx(z_x_new - z_x))
        if has_u:
            z_rel = cfg.alpha * x_u + (1.0 - cfg.alpha) * z_u
            z_u_new = project_u(z_rel + lmb_u)
            r = x_u - z_u_new
            lmb_u_new = lmb_u + r
            prim = prim + _norm(wu(r))
            dual = dual + _norm(wu(z_u_new - z_u))
        return out, z_x_new, z_u_new, lmb_x_new, lmb_u_new, prim, dual

    return step


def _admm_solve_anderson(
    plain_step, shape_x, shape_u, cfg, z_x, z_u, lmb_x, lmb_u, zeros_out,
    dtype, has_x=True, has_u=True,
):
    """Safeguarded type-II Anderson acceleration of the ADMM map.

    The fixed-point variable is v = (z_x, z_u, λ_x, λ_u) flattened; one
    plain ADMM iteration is T(v) and g = T(v) - v its residual. The last
    `anderson_m` secant pairs (Δv_i, Δg_i) feed a regularized
    least-squares for the extrapolation weights γ (Walker & Ni 2011,
    type II), giving v⁺ = v + g - (ΔV + ΔG)ᵀγ. Safeguard: whenever
    ‖g‖ exceeds `anderson_safeguard` x the best residual since the last
    restart, the memory is cleared and a plain step is taken (SCS-3.0
    style restart-on-increase). Convergence is declared only on a plain
    step's residuals and the returned iterates are that plain step's
    outputs, so results carry unaccelerated-ADMM certificates.
    """
    import numpy as _np

    # the fixed-point vector carries only ENABLED constraint blocks: a
    # disabled block's (z, λ) never changes, and packing it would
    # multiply the secant-memory/gram work by dead zeros (3x for the
    # common control-bounds-only case with d=2m)
    sx = int(_np.prod(shape_x)) if has_x else 0
    su = int(_np.prod(shape_u)) if has_u else 0
    D = 2 * (sx + su)
    m = cfg.anderson_m
    z_x_const, z_u_const, l_x_const, l_u_const = z_x, z_u, lmb_x, lmb_u

    def pack(zx, zu, lx, lu):
        parts = []
        if has_x:
            parts.append(zx.reshape(-1))
        if has_u:
            parts.append(zu.reshape(-1))
        if has_x:
            parts.append(lx.reshape(-1))
        if has_u:
            parts.append(lu.reshape(-1))
        return jnp.concatenate(parts)

    def unpack(v):
        zx = v[:sx].reshape(shape_x) if has_x else z_x_const
        zu = v[sx : sx + su].reshape(shape_u) if has_u else z_u_const
        lx = v[sx + su : 2 * sx + su].reshape(shape_x) if has_x else l_x_const
        lu = v[2 * sx + su :].reshape(shape_u) if has_u else l_u_const
        return zx, zu, lx, lu

    big = jnp.asarray(1e6, dtype)
    logs0 = jnp.zeros((cfg.max_iter, 2), dtype)
    eye_m = jnp.eye(m, dtype=dtype)

    def cond(state):
        j, *_rest, status = state
        return jnp.logical_and(j < cfg.max_iter, status == SolveStatus.RUNNING)

    def body(state):
        (j, v, ret, ret_score, prim, dual, logs, mem_dv, mem_dg, prev_v,
         prev_g, has_prev, best, flat_prev, status) = state
        z_x, z_u, l_x, l_u = unpack(v)
        out, zx_n, zu_n, lx_n, lu_n, prim_new, dual_new = plain_step(
            z_x, z_u, l_x, l_u
        )
        v_plain = pack(zx_n, zu_n, lx_n, lu_n)
        g = v_plain - v
        gnorm = _norm(g)

        restart = jnp.logical_and(
            has_prev, gnorm > cfg.anderson_safeguard * best
        )
        push = jnp.logical_and(has_prev, jnp.logical_not(restart))
        mem_dv_p = jnp.roll(mem_dv, -1, axis=0).at[-1].set(v - prev_v)
        mem_dg_p = jnp.roll(mem_dg, -1, axis=0).at[-1].set(g - prev_g)
        zero_dv = jnp.zeros_like(mem_dv)
        mem_dv_new = jnp.where(push, mem_dv_p, jnp.where(restart, zero_dv, mem_dv))
        mem_dg_new = jnp.where(push, mem_dg_p, jnp.where(restart, zero_dv, mem_dg))

        # type-II LS for the mixing weights; zero (unfilled) rows drop out
        # through the Tikhonov term, and an all-zero memory yields γ=0 ⇒
        # v_aa = v + g = the plain step.
        gram = mem_dg_new @ mem_dg_new.T
        reg = cfg.anderson_reg * jnp.trace(gram) + jnp.asarray(1e-30, dtype)
        gam = jnp.linalg.solve(gram + reg * eye_m, mem_dg_new @ g)
        v_aa = v + g - (mem_dv_new + mem_dg_new).T @ gam
        # near the dtype's residual floor the secant pairs are noise and
        # extrapolation chatters around the tolerance instead of
        # finishing (same fallback as the batched mirror,
        # batched.py::abody) — take plain steps below a
        # machine-precision-scaled floor
        eps = jnp.finfo(dtype).eps
        noise_floor = 1e3 * eps * (1.0 + _norm(v_plain))
        use_aa = jnp.logical_and(gnorm > noise_floor, jnp.logical_not(restart))
        v_next = jnp.where(use_aa, v_aa, v_plain)

        best_new = jnp.where(
            restart, jnp.asarray(jnp.inf, dtype), jnp.minimum(best, gnorm)
        )
        logs = logs.at[j].set(jnp.stack([prim_new, dual_new]))
        converged = jnp.logical_and(prim_new < cfg.tol, dual_new < cfg.tol)
        prim_change = jnp.abs(prim - prim_new) / (prim + _EPS)
        dual_change = jnp.abs(dual - dual_new) / (dual + _EPS)
        flat = jnp.logical_and(
            prim_change < cfg.stall, dual_change < cfg.stall
        )
        # a restart re-enters the plain map — residuals can repeat across
        # the revert without being a genuine stall
        flat = jnp.logical_and(flat, jnp.logical_not(restart))
        # Anderson's residual sequence is non-monotone: one flat pair of
        # plain residuals mid-extrapolation is routine, so STALLED needs
        # two CONSECUTIVE flat iterations (the plain-ADMM relative-change
        # test assumes monotone decay, which only holds for anderson_m=0)
        stalled = jnp.logical_and(flat, flat_prev)
        status_new = jnp.where(
            converged,
            SolveStatus.CONVERGED,
            jnp.where(stalled, SolveStatus.STALLED, SolveStatus.RUNNING),
        ).astype(jnp.int32)
        # the RETURNED iterate is the best plain evaluation seen (by
        # combined residual), not the last: if extrapolation wanders on
        # an inexact fixed-point map (e.g. nested inner-ADMM projections
        # solved to loose tolerance), the caller still gets at least the
        # best plain-ADMM iterate the run produced.
        # On convergence the loop exits THIS iteration, and status must
        # describe the returned iterate — force-take the converging one
        # (it satisfies both tolerances by definition) even if an earlier
        # iterate had a marginally lower combined score.
        score_new = prim_new + dual_new
        take = jnp.logical_or(score_new < ret_score[0], converged)
        ret_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(take, new, old),
            (out, zx_n, zu_n, lx_n, lu_n), ret,
        )
        ret_score_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(take, new, old),
            (score_new, prim_new, dual_new), ret_score,
        )
        return (
            j + 1, v_next, ret_new, ret_score_new, prim_new, dual_new, logs,
            mem_dv_new, mem_dg_new, v, g, jnp.logical_not(restart), best_new,
            flat, status_new,
        )

    v0 = pack(z_x, z_u, lmb_x, lmb_u)
    ret0 = (zeros_out, z_x, z_u, lmb_x, lmb_u)
    inf = jnp.asarray(jnp.inf, dtype)
    state0 = (
        jnp.int32(0), v0, ret0, (inf, big, big), big, big, logs0,
        jnp.zeros((m, D), dtype), jnp.zeros((m, D), dtype),
        jnp.zeros((D,), dtype), jnp.zeros((D,), dtype),
        jnp.asarray(False), inf, jnp.asarray(False),
        jnp.int32(SolveStatus.RUNNING),
    )
    (j, _v, ret, ret_score, _prim, _dual, logs, *_mem, status) = lax.while_loop(
        cond, body, state0
    )
    out, z_x, z_u, lmb_x, lmb_u = ret
    status = jnp.where(status == SolveStatus.RUNNING, SolveStatus.MAX_ITER, status)
    # info reports the RETURNED (best-scoring plain) iterate's residuals;
    # `logs` keeps the full per-iteration history either way
    _score, prim, dual = ret_score
    info = ADMMInfo(iters=j, prim_res=prim, dual_res=dual, status=status, logs=logs)
    x_x, x_u = out[0], out[1]
    aux = out[2] if len(out) > 2 else None
    return x_x, x_u, aux, lmb_x, lmb_u, z_x, z_u, info


def admm_solve(
    f_argmin: Callable,
    project_x: Optional[Callable],
    project_u: Optional[Callable],
    shape_x,
    shape_u,
    cfg: ADMMConfig,
    z_x_init=None,
    z_u_init=None,
    lmb_x_init=None,
    lmb_u_init=None,
    weight_x: Optional[Callable] = None,
    weight_u: Optional[Callable] = None,
    rho_weight_x: Optional[Callable] = None,
    rho_weight_u: Optional[Callable] = None,
    dtype=jnp.float32,
):
    """Run scaled two-block ADMM.

    f_argmin(reg_x, reg_u) -> (x_x, x_u, aux): the x-update. reg_* are
    (z - λ) regularization targets (None-block handling: when project_x
    (resp. project_u) is None that block is disabled, as in the reference
    `admm.py:18-23`, and reg_* is passed as None).

    project_x / project_u: z-update projections mapping arrays of
    shape_x / shape_u to the constraint sets.

    weight_x / weight_u: optional callables r -> weighted r applied inside
    the residual norms (weighted-residual ADMM variants).

    rho_weight_x / rho_weight_u: base-penalty weightings r -> rho_base·r
    used only by the adaptive-rho balancing rule — the true dual residual
    is rho·(z_new - z_old) (Boyd §3.3), and the base rho lives in the
    caller's Qr/Rr matrices which this driver cannot see. Identity when
    omitted (i.e. base penalty treated as 1).

    Returns (x_x, x_u, aux, lmb_x, lmb_u, z_x, z_u, info: ADMMInfo).
    """
    has_x = project_x is not None
    has_u = project_u is not None
    if not (has_x or has_u):
        raise ValueError("at least one of project_x / project_u is required")

    wx = weight_x if weight_x is not None else (lambda r: r)
    wu = weight_u if weight_u is not None else (lambda r: r)
    rwx = rho_weight_x if rho_weight_x is not None else (lambda r: r)
    rwu = rho_weight_u if rho_weight_u is not None else (lambda r: r)
    adaptive = cfg.adaptive_rho
    if adaptive and cfg.rho_freq < 1:
        raise ValueError(f"rho_freq must be >= 1, got {cfg.rho_freq}")
    accel = cfg.accel
    if accel and adaptive:
        raise ValueError(
            "accel=True is incompatible with adaptive_rho=True: the "
            "momentum sequence assumes a fixed penalty (each rho change "
            "would invalidate the accumulated extrapolation)"
        )
    anderson = cfg.anderson_m > 0
    if anderson and (accel or adaptive):
        raise ValueError(
            "anderson_m > 0 is incompatible with accel/adaptive_rho: "
            "Anderson extrapolates the fixed-point map of a *fixed* ADMM "
            "iteration (momentum or penalty changes would alter the map "
            "mid-memory)"
        )

    z_x = jnp.zeros(shape_x, dtype) if z_x_init is None else jnp.asarray(z_x_init)
    z_u = jnp.zeros(shape_u, dtype) if z_u_init is None else jnp.asarray(z_u_init)
    lmb_x = jnp.zeros(shape_x, dtype) if lmb_x_init is None else jnp.asarray(lmb_x_init)
    lmb_u = jnp.zeros(shape_u, dtype) if lmb_u_init is None else jnp.asarray(lmb_u_init)

    # Shape-infer the x-update outputs to build a zero init for the carry.
    one = jnp.asarray(1.0, dtype)
    if adaptive:
        try:
            out_shapes = jax.eval_shape(
                f_argmin, z_x - lmb_x if has_x else None,
                z_u - lmb_u if has_u else None, one,
            )
        except TypeError as e:
            raise ValueError(
                "adaptive_rho=True requires an f_argmin accepting "
                "(reg_x, reg_u, rho_scale); this x-update takes only "
                "(reg_x, reg_u) — adaptive penalties are supported by "
                "the batch LQT (lqt_admm_batch(use_qr=False)), DP LQT "
                "(lqt_admm_dp) and robust-SLS (sls_admm) x-updates"
            ) from e
    else:
        out_shapes = jax.eval_shape(
            f_argmin, z_x - lmb_x if has_x else None, z_u - lmb_u if has_u else None
        )
    zeros_out = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), out_shapes
    )

    if anderson:
        plain_step = _make_plain_step(
            f_argmin, project_x, project_u, cfg, wx, wu, dtype
        )
        return _admm_solve_anderson(
            plain_step, shape_x, shape_u, cfg, z_x, z_u, lmb_x, lmb_u,
            zeros_out, dtype, has_x=has_x, has_u=has_u,
        )

    big = jnp.asarray(1e6, dtype)
    logs0 = jnp.zeros((cfg.max_iter, 2), dtype)

    def cond(state):
        j, *_rest, status = state
        return jnp.logical_and(j < cfg.max_iter, status == SolveStatus.RUNNING)

    def body(state):
        # In accelerated mode the z/lmb carry slots hold the extrapolated
        # (hat) iterates used by the x-update; acc carries the last
        # accepted (z, lmb), the momentum coefficient a, and the combined
        # restart residual c (Goldstein et al. 2014, Alg. 8).
        if accel:
            (j, z_x, z_u, lmb_x, lmb_u, _, prim, dual, logs, s, acc,
             status) = state
            (z_x_prev, z_u_prev, lmb_x_prev, lmb_u_prev, a_mom, c_prev,
             ok_prev) = acc
        else:
            j, z_x, z_u, lmb_x, lmb_u, _, prim, dual, logs, s, status = state

        reg_x = z_x - lmb_x if has_x else None
        reg_u = z_u - lmb_u if has_u else None
        out = f_argmin(reg_x, reg_u, s) if adaptive else f_argmin(reg_x, reg_u)
        x_x, x_u = out[0], out[1]

        prim_new = jnp.asarray(0.0, dtype)
        dual_new = jnp.asarray(0.0, dtype)
        dual_bal = jnp.asarray(0.0, dtype)
        c_new = jnp.asarray(0.0, dtype)

        if has_x:
            z_relaxed = cfg.alpha * x_x + (1.0 - cfg.alpha) * z_x
            z_x_new = project_x(z_relaxed + lmb_x)
            r_x = x_x - z_x_new
            lmb_x_new = lmb_x + r_x
            prim_new = prim_new + _norm(wx(r_x))
            # dual residual against the last *accepted* z in accel mode
            z_x_ref = z_x_prev if accel else z_x
            dual_new = dual_new + _norm(wx(z_x_new - z_x_ref))
            if adaptive:
                dual_bal = dual_bal + _norm(rwx(z_x_new - z_x))
            if accel:
                # rho-weighted combined residual (Goldstein c_k uses
                # ||y - y_hat||^2/rho + rho||z - z_hat||^2; with scaled
                # duals both terms carry a factor rho, supplied by the
                # rho_weight hooks so blocks with different penalties are
                # weighted consistently; identity hooks = single-rho).
                dl, dz = lmb_x_new - lmb_x, z_x_new - z_x
                c_new = c_new + jnp.sum(dl * rwx(dl)) + jnp.sum(dz * rwx(dz))
            lmb_x = lmb_x_new
            z_x = z_x_new
        if has_u:
            z_relaxed = cfg.alpha * x_u + (1.0 - cfg.alpha) * z_u
            z_u_new = project_u(z_relaxed + lmb_u)
            r_u = x_u - z_u_new
            lmb_u_new = lmb_u + r_u
            prim_new = prim_new + _norm(wu(r_u))
            z_u_ref = z_u_prev if accel else z_u
            dual_new = dual_new + _norm(wu(z_u_new - z_u_ref))
            if adaptive:
                dual_bal = dual_bal + _norm(rwu(z_u_new - z_u))
            if accel:
                dl, dz = lmb_u_new - lmb_u, z_u_new - z_u
                c_new = c_new + jnp.sum(dl * rwu(dl)) + jnp.sum(dz * rwu(dz))
            lmb_u = lmb_u_new
            z_u = z_u_new

        if accel:
            # accept: extrapolate; reject: revert to last accepted pair,
            # reset momentum, inflate the monitor by 1/eta.
            ok = c_new < cfg.accel_eta * c_prev
            a_next = jnp.where(
                ok, 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * a_mom * a_mom)), one
            )
            beta = jnp.where(ok, (a_mom - 1.0) / a_next, jnp.asarray(0.0, dtype))

            def _mix(z_new, z_prev):
                hat = z_new + beta * (z_new - z_prev)
                return (
                    jnp.where(ok, hat, z_prev),
                    jnp.where(ok, z_new, z_prev),
                )

            z_x, z_x_prev = _mix(z_x, z_x_prev)
            z_u, z_u_prev = _mix(z_u, z_u_prev)
            lmb_x, lmb_x_prev = _mix(lmb_x, lmb_x_prev)
            lmb_u, lmb_u_prev = _mix(lmb_u, lmb_u_prev)
            c_next = jnp.where(ok, c_new, c_prev / cfg.accel_eta)
            acc = (z_x_prev, z_u_prev, lmb_x_prev, lmb_u_prev, a_next,
                   c_next, ok)

        logs = logs.at[j].set(jnp.stack([prim_new, dual_new]))

        converged = jnp.logical_and(prim_new < cfg.tol, dual_new < cfg.tol)
        if accel:
            # only an *accepted* step may converge: on a reject the loop
            # returns the reverted previous (z, lambda) from acc, so the
            # candidate's residuals do not describe the returned state
            converged = jnp.logical_and(converged, ok)
        prim_change = jnp.abs(prim - prim_new) / (prim + _EPS)
        dual_change = jnp.abs(dual - dual_new) / (dual + _EPS)
        stalled = jnp.logical_and(prim_change < cfg.stall, dual_change < cfg.stall)
        if accel:
            # a restart reverts to the last accepted iterate and the step
            # after it recomputes that same point, so residuals repeat
            # exactly across both — not a genuine stall; require two
            # consecutive accepted (momentum) steps before trusting it
            stalled = jnp.logical_and(stalled, jnp.logical_and(ok, ok_prev))

        s_new = s
        if adaptive:
            # residual balancing (Boyd et al. 2011, §3.4.1): grow rho when
            # the primal residual dominates, shrink when the dual does;
            # rescale scaled duals lambda = y/rho by the inverse factor.
            # Updates run every rho_freq iterations — per-iteration
            # updates ping-pong between grow/shrink and stall convergence.
            dual_true = s * dual_bal  # rho·(z_new - z_old), Boyd (3.12)
            fac = jnp.where(
                prim_new > cfg.rho_mu * dual_true,
                jnp.asarray(cfg.rho_tau, dtype),
                jnp.where(
                    dual_true > cfg.rho_mu * prim_new,
                    jnp.asarray(1.0 / cfg.rho_tau, dtype),
                    one,
                ),
            )
            adapt_now = jnp.logical_and(
                j % cfg.rho_freq == cfg.rho_freq - 1, j < cfg.rho_freeze_after
            )
            fac = jnp.where(adapt_now, fac, one)
            s_new = jnp.clip(s * fac, cfg.rho_scale_min, cfg.rho_scale_max)
            rescale = s / s_new
            lmb_x = lmb_x * rescale
            lmb_u = lmb_u * rescale

        status_new = jnp.where(
            converged,
            SolveStatus.CONVERGED,
            jnp.where(stalled, SolveStatus.STALLED, SolveStatus.RUNNING),
        ).astype(jnp.int32)
        if accel:
            return (
                j + 1, z_x, z_u, lmb_x, lmb_u, out, prim_new, dual_new,
                logs, s_new, acc, status_new,
            )
        return (
            j + 1, z_x, z_u, lmb_x, lmb_u, out, prim_new, dual_new, logs,
            s_new, status_new,
        )

    if accel:
        acc0 = (z_x, z_u, lmb_x, lmb_u, one, jnp.asarray(jnp.inf, dtype),
                jnp.asarray(True))
        state0 = (
            jnp.int32(0), z_x, z_u, lmb_x, lmb_u, zeros_out, big, big,
            logs0, one, acc0, jnp.int32(SolveStatus.RUNNING),
        )
        (j, _zx_hat, _zu_hat, _lx_hat, _lu_hat, out, prim, dual, logs, _s,
         acc, status) = lax.while_loop(cond, body, state0)
        z_x, z_u, lmb_x, lmb_u, _a, _c, _ok = acc  # last *accepted* iterates
    else:
        state0 = (
            jnp.int32(0), z_x, z_u, lmb_x, lmb_u, zeros_out, big, big, logs0,
            one, jnp.int32(SolveStatus.RUNNING),
        )
        (j, z_x, z_u, lmb_x, lmb_u, out, prim, dual, logs, _s,
         status) = lax.while_loop(cond, body, state0)
    status = jnp.where(status == SolveStatus.RUNNING, SolveStatus.MAX_ITER, status)
    info = ADMMInfo(iters=j, prim_res=prim, dual_res=dual, status=status, logs=logs)
    x_x, x_u = out[0], out[1]
    aux = out[2] if len(out) > 2 else None
    return x_x, x_u, aux, lmb_x, lmb_u, z_x, z_u, info
