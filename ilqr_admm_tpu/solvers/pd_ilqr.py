"""Primal-dual (multiple-shooting) iLQR.

Beyond the reference (whose iLQR is single-shooting: the state
trajectory is always a rollout of the controls, `isls.py:310-334`).
Following "Primal-Dual iLQR" (PAPERS.md, arXiv 2403.00748) and the
Gauss-Newton multiple-shooting family, BOTH the state trajectory x and
the controls u are decision variables, with the dynamics enforced
through defects

    d_t = f(x_t, u_t) - x_{t+1}

that are driven to zero over iterations instead of holding exactly at
every iterate. What this buys on top of the reference-style iLQR:

- **infeasible initialization**: warm-start from any state path (e.g. a
  straight-line interpolation to the goal) with no controls known —
  impossible for single shooting, whose iterates are always rollouts;
- **a primal-dual iterate**: the costate (multiplier) trajectory
  lambda_t = v_t + V_t dx_t comes out of the same backward pass, giving
  KKT residuals as a principled convergence measure;
- **stage-parallel linearization**: f/A/B evaluate at (x_t, u_t) pairs
  that need no sequential rollout — one vmap over the horizon.

Algorithm per iteration (all `lax.scan`s, jit/vmap-ready):

1. linearize dynamics and expand the cost at (x, u) (vmapped);
2. backward Riccati sweep WITH defects: the linear terms pick up
   A_t^T (V d_t) / B_t^T (V d_t) contributions;
3. forward *linear* sweep for each line-search alpha:
   du_t = alpha k_t + K_t dx_t,  dx_{t+1} = A_t dx_t + B_t du_t + alpha d_t
   (alpha scales both the feedforward and the defect contraction);
4. accept the candidate minimizing the merit cost + mu * ||defects||_1.

For a linear-quadratic problem one iteration with alpha = 1 closes all
defects and lands exactly on the optimum from ANY initialization (the
LQ-exactness oracle in `tests/test_pd_ilqr.py`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_factor, cho_solve

from ilqr_admm_tpu.problem import ILQRConfig, SolveStatus, line_search_alphas
from ilqr_admm_tpu.utils.precision import highest_precision


class PDILQRState(NamedTuple):
    x_nom: jax.Array  # (N, d) state decision variables (defects allowed)
    u_nom: jax.Array  # (N, m)
    lam: jax.Array  # (N, d) costates (lambda_t at stage t)
    cost: jax.Array  # scalar true cost (ignores defects)
    defect: jax.Array  # scalar max |d_t|
    merit: jax.Array  # cost + mu * ||defects||_1 at this iterate
    prev_merit: jax.Array
    iteration: jax.Array
    status: jax.Array


def pd_ilqr_init(
    cost_fn: Callable, f: Callable, x_init, u_init, mu: float = 10.0
) -> PDILQRState:
    """Initialize from an ARBITRARY state path + control guess.

    x_init need not satisfy the dynamics (that is the point); use e.g. a
    straight-line interpolation from x0 to the goal with zero controls.
    x_init[0] must be the true initial state (it is held fixed).
    """
    xs = jnp.asarray(x_init)
    us = jnp.asarray(u_init)
    c = cost_fn(xs, us)
    d = _defects(f, xs, us)
    big = jnp.asarray(jnp.inf, c.dtype)
    return PDILQRState(
        x_nom=xs, u_nom=us, lam=jnp.zeros_like(xs), cost=c,
        defect=jnp.max(jnp.abs(d)),
        merit=c + mu * jnp.sum(jnp.abs(d)), prev_merit=big,
        iteration=jnp.int32(0), status=jnp.int32(SolveStatus.RUNNING),
    )


def _defects(f, xs, us):
    """d_t = f(x_t, u_t) - x_{t+1} for t = 0..N-2; (N-1, d)."""
    nxt = jax.vmap(f)(xs[:-1], us[:-1])
    return nxt - xs[1:]


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


@highest_precision
def pd_ilqr_iterate(
    f: Callable,
    get_AB: Callable,
    get_Cs: Callable,
    cost_fn: Callable,
    state: PDILQRState,
    alphas: jax.Array,
    mu: float = 10.0,
):
    """One primal-dual iteration. Returns (new_state, accept, (K, k))."""
    xs, us = state.x_nom, state.u_nom
    N, d = xs.shape
    m = us.shape[-1]
    dtype = xs.dtype

    A, B = get_AB(xs, us)
    cts, Cts = get_Cs(xs, us)
    # per-stage expansion blocks: cts (N, d+m) gradients, Cts (N, d+m, d+m)
    cx, cu = cts[:, :d], cts[:, d:]
    Cxx, Cuu = Cts[:, :d, :d], Cts[:, d:, d:]
    Cux = Cts[:, d:, :d]

    defects = _defects(f, xs, us)  # (N-1, d)

    # ---- backward sweep with defects -------------------------------------
    V_term = Cxx[-1]
    v_term = cx[-1]

    def bstep(carry, inp):
        V, v = carry
        At, Bt, Cxxt, Cuut, Cuxt, cxt, cut, dt_ = inp
        # value expansion propagated through x_{t+1} = A dx + B du + d
        vb = v + V @ dt_
        qx = cxt + At.T @ vb
        qu = cut + Bt.T @ vb
        Qxx = Cxxt + At.T @ V @ At
        Quu = Cuut + Bt.T @ V @ Bt
        Qux = Cuxt + Bt.T @ V @ At
        cf = cho_factor(_sym(Quu) + 1e-9 * jnp.eye(m, dtype=dtype))
        sol = -cho_solve(cf, jnp.concatenate([Qux, qu[:, None]], axis=-1))
        Kt, kt = sol[:, :-1], sol[:, -1]
        V_new = _sym(Qxx + Qux.T @ Kt + Kt.T @ Qux + Kt.T @ Quu @ Kt)
        v_new = qx + Qux.T @ kt + Kt.T @ qu + Kt.T @ Quu @ kt
        return (V_new, v_new), (Kt, kt, V, v)

    inp = (A[:-1], B[:-1], Cxx[:-1], Cuu[:-1], Cux[:-1], cx[:-1], cu[:-1],
           defects)
    (V0, v0), (K, k, V_next, v_next) = lax.scan(
        bstep, (V_term, v_term), inp, reverse=True
    )

    # ---- forward linear sweep per alpha -----------------------------------
    def sweep(alpha):
        def fstep(dx, inp):
            Kt, kt, At, Bt, dt_ = inp
            du = alpha * kt + Kt @ dx
            dx_next = At @ dx + Bt @ du + alpha * dt_
            return dx_next, (dx, du)

        dx_last, (dxs, dus) = lax.scan(
            fstep, jnp.zeros((d,), dtype), (K, k, A[:-1], B[:-1], defects)
        )
        # u_{N-1} unused by convention (final-step gains zero)
        dxs_full = jnp.concatenate([dxs, dx_last[None]], axis=0)
        dus_full = jnp.concatenate([dus, jnp.zeros((1, m), dtype)], axis=0)
        x_c = xs + dxs_full
        u_c = us + dus_full
        c = cost_fn(x_c, u_c)
        d_c = _defects(f, x_c, u_c)
        merit = c + mu * jnp.sum(jnp.abs(d_c))
        merit = jnp.where(jnp.isnan(merit), jnp.inf, merit)
        return x_c, u_c, merit, c, jnp.max(jnp.abs(d_c))

    xs_c, us_c, merits, costs, dmaxs = jax.vmap(sweep)(alphas)
    ind = jnp.argmin(merits)
    accept = merits[ind] < state.merit

    x_new = jnp.where(accept, xs_c[ind], xs)
    u_new = jnp.where(accept, us_c[ind], us)
    # costates at the accepted iterate: lambda_t = v_t + V_t dx_t, with
    # V_next[t] = V_{t+1}, v_next[t] = v_{t+1} (the reverse-scan carries,
    # emitted in forward time order) and lambda_0 from (V0, v0)
    dx_acc = x_new - xs
    lam_tail = v_next + jnp.einsum("tij,tj->ti", V_next, dx_acc[1:])
    lam_0 = v0 + V0 @ dx_acc[0]
    lam = jnp.concatenate([lam_0[None], lam_tail], axis=0)

    new_state = PDILQRState(
        x_nom=x_new, u_nom=u_new, lam=lam,
        cost=jnp.where(accept, costs[ind], state.cost),
        defect=jnp.where(accept, dmaxs[ind], state.defect),
        merit=jnp.where(accept, merits[ind], state.merit),
        prev_merit=state.merit,
        iteration=state.iteration + 1,
        status=state.status,
    )
    return new_state, accept, (K, k)


def pd_ilqr_solve(
    f: Callable,
    get_AB: Callable,
    get_Cs: Callable,
    cost_fn: Callable,
    state0: PDILQRState,
    cfg: ILQRConfig = ILQRConfig(),
    mu: float = 10.0,
    tol_defect: float = 1e-6,
) -> PDILQRState:
    """Full primal-dual iLQR solve as a jittable while_loop.

    Converges when BOTH the merit change is below tol_fun and the max
    defect is below tol_defect (an infeasible iterate with flat merit is
    not converged).
    """
    alphas = line_search_alphas(cfg, state0.x_nom.dtype)

    def cond(state):
        return jnp.logical_and(
            state.iteration < cfg.max_iter,
            state.status == SolveStatus.RUNNING,
        )

    def body(state):
        new_state, accept, _ = pd_ilqr_iterate(
            f, get_AB, get_Cs, cost_fn, state, alphas, mu=mu
        )
        small_step = (
            jnp.abs(new_state.prev_merit - new_state.merit) < cfg.tol_fun
        )
        feasible = new_state.defect < tol_defect
        converged = jnp.logical_and(small_step, feasible)
        # a rejected step on a feasible iterate cannot improve further;
        # rejected-but-infeasible keeps iterating (until max_iter)
        status = jnp.where(
            jnp.logical_not(accept),
            jnp.where(feasible, SolveStatus.LINE_SEARCH_FAILED,
                      SolveStatus.RUNNING),
            jnp.where(converged, SolveStatus.CONVERGED, SolveStatus.RUNNING),
        ).astype(jnp.int32)
        return new_state._replace(status=status)

    state = lax.while_loop(cond, body, state0)
    done = state.status != SolveStatus.RUNNING
    return state._replace(
        status=jnp.where(done, state.status, SolveStatus.MAX_ITER).astype(jnp.int32)
    )
