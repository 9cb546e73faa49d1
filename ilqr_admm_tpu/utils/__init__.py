from ilqr_admm_tpu.utils.trajopt import TrajOpt
from ilqr_admm_tpu.utils.cost_assembly import (
    find_mus,
    find_precs,
    get_double_integrator_AB,
    run_once,
    selection_matrix,
    construct_Z,
    nullspace_matrix,
    nullspace_matrix2,
    augment_Qt,
    augment_mut,
    find_augmented_precs,
    batch_cost_vars,
    viapoint_cost,
)

__all__ = [
    "TrajOpt",
    "find_mus",
    "find_precs",
    "get_double_integrator_AB",
    "run_once",
    "selection_matrix",
    "construct_Z",
    "nullspace_matrix",
    "nullspace_matrix2",
    "augment_Qt",
    "augment_mut",
    "find_augmented_precs",
    "batch_cost_vars",
    "viapoint_cost",
]
