from ilqr_admm_tpu.solvers.lqt import (
    lqt_solve_batch,
    lqt_solve_batch_full,
    lqt_solve_sls_full,
    lqt_solve_dp,
    lqt_solve_sls,
    sls_controller,
    lifted_normal_eqs,
    broadcast_rho,
)
from ilqr_admm_tpu.solvers.admm import admm_solve, ADMMInfo
from ilqr_admm_tpu.solvers.lqt_admm import lqt_admm_batch, lqt_admm_dp
from ilqr_admm_tpu.solvers.sls_admm import sls_admm
from ilqr_admm_tpu.solvers.ilqr import (
    ILQRState,
    ilqr_init,
    ilqr_iterate_dp,
    ilqr_iterate_batch,
    ilqr_iterate_sls,
    ilqr_solve,
)
from ilqr_admm_tpu.solvers.ilqr_admm import ilqr_admm, ilqr_admm_continuation
from ilqr_admm_tpu.solvers.pd_ilqr import (
    PDILQRState,
    pd_ilqr_init,
    pd_ilqr_iterate,
    pd_ilqr_solve,
)
from ilqr_admm_tpu.solvers.isls_admm import isls_admm
from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
from ilqr_admm_tpu.solvers.batched_sls import make_batched_sls_admm
from ilqr_admm_tpu.solvers.mpc import (
    MPCConstrainedState,
    MPCState,
    make_mpc_step,
    make_mpc_step_boxddp,
    make_mpc_step_constrained,
    mpc_constrained_init,
    mpc_init,
    run_mpc,
)
from ilqr_admm_tpu.solvers.implicit import fixed_point, lqt_admm_implicit
from ilqr_admm_tpu.solvers.boxddp import boxddp_init, boxddp_iterate, boxddp_solve
from ilqr_admm_tpu.solvers.barrier_ilqr import barrier_ilqr_solve, make_barrier
from ilqr_admm_tpu.solvers.al_ilqr import ALResult, al_ilqr_solve

__all__ = [
    "lqt_solve_batch",
    "lqt_solve_batch_full",
    "lqt_solve_sls_full",
    "lqt_solve_dp",
    "lqt_solve_sls",
    "sls_controller",
    "lifted_normal_eqs",
    "broadcast_rho",
    "admm_solve",
    "ADMMInfo",
    "lqt_admm_batch",
    "lqt_admm_dp",
    "sls_admm",
    "ILQRState",
    "ilqr_init",
    "ilqr_iterate_dp",
    "ilqr_iterate_batch",
    "ilqr_iterate_sls",
    "ilqr_solve",
    "ilqr_admm",
    "ilqr_admm_continuation",
    "isls_admm",
    "make_batched_lqt_admm",
    "make_batched_sls_admm",
    "MPCState",
    "make_mpc_step",
    "make_mpc_step_boxddp",
    "mpc_init",
    "run_mpc",
    "MPCConstrainedState",
    "make_mpc_step_constrained",
    "mpc_constrained_init",
    "fixed_point",
    "lqt_admm_implicit",
    "boxddp_init",
    "boxddp_iterate",
    "boxddp_solve",
    "barrier_ilqr_solve",
    "make_barrier",
    "ALResult",
    "al_ilqr_solve",
]
