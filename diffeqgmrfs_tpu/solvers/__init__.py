from diffeqgmrfs_tpu.solvers.blueprints import (
    CholeskySolverBlueprint,
    GNCholeskySolverBlueprint,
    CGSolverBlueprint,
    PardisoGMRFSolverBlueprint,
    RBMCStrategy,
    TakahashiStrategy,
)
from diffeqgmrfs_tpu.solvers.gauss_newton import (
    GaussNewtonOptimizer,
    GaussNewtonResult,
    gauss_newton,
    gauss_newton_solve,
    blueprint_gn_kwargs,
    NewtonDecrementCriterion,
    StepNumberCriterion,
    OrCriterion,
)
