from ilqr_admm_tpu.ops.lifted import (
    build_Sw,
    build_Su,
    build_Sx,
    su_apply,
    su_t_apply,
    sw_x0,
)
from ilqr_admm_tpu.ops.riccati import (
    lqt_backward,
    lqt_backward_ff,
    ilqr_backward,
    DPGains,
)
from ilqr_admm_tpu.ops.rollout import (
    rollout_linear,
    rollout_closed_loop,
    rollout_nonlinear,
    rollout_sls,
    rollout_sls_delta,
)
from ilqr_admm_tpu.ops.parallel_riccati import (
    lqt_backward_parallel,
    rollout_closed_loop_parallel,
)
from ilqr_admm_tpu.ops.sls_synthesis import (
    causal_cholesky_factors,
    causal_trailing_solve,
    sls_synthesize,
)

__all__ = [
    "build_Sw",
    "build_Su",
    "build_Sx",
    "su_apply",
    "su_t_apply",
    "sw_x0",
    "lqt_backward",
    "lqt_backward_parallel",
    "rollout_closed_loop_parallel",
    "lqt_backward_ff",
    "ilqr_backward",
    "DPGains",
    "rollout_linear",
    "rollout_closed_loop",
    "rollout_nonlinear",
    "rollout_sls",
    "rollout_sls_delta",
    "causal_cholesky_factors",
    "causal_trailing_solve",
    "sls_synthesize",
]
