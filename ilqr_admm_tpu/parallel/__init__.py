from ilqr_admm_tpu.parallel.mesh import make_mesh, instance_sharding
from ilqr_admm_tpu.parallel.batch import (
    batched_lqt_admm_dp,
    batched_ilqr_solve,
    sharded_instance_solve,
    mc_success_rate,
)
from ilqr_admm_tpu.parallel.time_sharded import (
    lqt_backward_time_sharded,
    time_sharded_suffix_scan,
)
from ilqr_admm_tpu.parallel.consensus import (
    project_set_convex_stacked,
    project_set_convex_sharded,
)

__all__ = [
    "project_set_convex_stacked",
    "project_set_convex_sharded",
    "make_mesh",
    "instance_sharding",
    "batched_lqt_admm_dp",
    "batched_ilqr_solve",
    "sharded_instance_solve",
    "mc_success_rate",
    "lqt_backward_time_sharded",
    "time_sharded_suffix_scan",
]
