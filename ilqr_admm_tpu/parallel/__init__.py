from ilqr_admm_tpu.parallel.mesh import make_mesh, instance_sharding
from ilqr_admm_tpu.parallel.batch import (
    batched_lqt_admm_dp,
    batched_ilqr_solve,
    sharded_instance_solve,
    mc_success_rate,
)

__all__ = [
    "make_mesh",
    "instance_sharding",
    "batched_lqt_admm_dp",
    "batched_ilqr_solve",
    "sharded_instance_solve",
    "mc_success_rate",
]
