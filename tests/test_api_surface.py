"""API-surface parity test: every symbol the reference consumes from its GMRF
engine (SURVEY.md §2.3) has a working analog here.

This is the analog of the reference's Aqua.jl code-quality suite
(`/root/reference/test/runtests.jl`): a structural check that the public
surface is complete and importable.
"""

import importlib

import pytest

# (module, symbol) pairs mapping SURVEY.md §2.3 names to our analogs
SURFACE = [
    # types / constructors
    ("diffeqgmrfs_tpu.fem", "FEMDiscretization"),
    ("diffeqgmrfs_tpu.models", "MaternSPDE"),
    ("diffeqgmrfs_tpu.models", "AdvectionDiffusionSPDE"),
    ("diffeqgmrfs_tpu.gmrf", "GMRF"),
    ("diffeqgmrfs_tpu.gmrf", "ConcreteConstantMeshSTGMRF"),
    ("diffeqgmrfs_tpu.gmrf", "ImplicitEulerConstantMeshSTGMRF"),
    ("diffeqgmrfs_tpu.gmrf", "ConstrainedGMRF"),
    ("diffeqgmrfs_tpu.models", "ImplicitEulerSSM"),
    ("diffeqgmrfs_tpu.models", "joint_ssm"),
    ("diffeqgmrfs_tpu.gmrf", "LinearMapWithSqrt"),
    ("diffeqgmrfs_tpu.solvers", "CholeskySolverBlueprint"),
    ("diffeqgmrfs_tpu.solvers", "GNCholeskySolverBlueprint"),
    ("diffeqgmrfs_tpu.solvers", "CGSolverBlueprint"),
    ("diffeqgmrfs_tpu.solvers", "PardisoGMRFSolverBlueprint"),
    ("diffeqgmrfs_tpu.solvers", "RBMCStrategy"),
    ("diffeqgmrfs_tpu.solvers", "GaussNewtonOptimizer"),
    ("diffeqgmrfs_tpu.solvers", "OrCriterion"),
    ("diffeqgmrfs_tpu.solvers", "NewtonDecrementCriterion"),
    ("diffeqgmrfs_tpu.solvers", "StepNumberCriterion"),
    # functions
    ("diffeqgmrfs_tpu.models", "discretize"),
    ("diffeqgmrfs_tpu.gmrf", "condition_on_observations"),
    ("diffeqgmrfs_tpu.fem", "evaluation_matrix"),
    ("diffeqgmrfs_tpu.fem", "derivative_matrices"),
    ("diffeqgmrfs_tpu.fem", "second_derivative_matrices"),
    ("diffeqgmrfs_tpu.fem", "node_selection_matrix"),
    ("diffeqgmrfs_tpu.fem", "spatial_to_spatiotemporal"),
    ("diffeqgmrfs_tpu.models", "product_matern"),
    ("diffeqgmrfs_tpu.gmrf", "constrainify_linear_system"),
    ("diffeqgmrfs_tpu.gmrf", "mean"),
    ("diffeqgmrfs_tpu.gmrf", "std"),
    ("diffeqgmrfs_tpu.gmrf", "sample"),
    ("diffeqgmrfs_tpu.gmrf", "sqmahal"),
    ("diffeqgmrfs_tpu.gmrf", "precision_map"),
    ("diffeqgmrfs_tpu.gmrf", "to_matrix"),
    ("diffeqgmrfs_tpu.gmrf", "time_means"),
    ("diffeqgmrfs_tpu.gmrf", "transform_free_to_full"),
    ("diffeqgmrfs_tpu.fem", "create_inflated_rectangle"),
    ("diffeqgmrfs_tpu.fem", "assemble_mass"),
    ("diffeqgmrfs_tpu.fem", "assemble_stiffness"),
    # in-repo reference package surface (src/DiffEqGMRFs.jl)
    ("diffeqgmrfs_tpu.ops", "btd_cholesky"),  # tridiagonal_cholesky
    ("diffeqgmrfs_tpu.problems", "DarcyFEMObservations"),
    ("diffeqgmrfs_tpu.problems", "BurgersFEMResidual"),
    ("diffeqgmrfs_tpu.problems", "BurgersCollocationResidual"),
    ("diffeqgmrfs_tpu.models.shallow_water", "LinearShallowWaterSPDE"),
    ("diffeqgmrfs_tpu.models.shallow_water", "discretize_shallow_water"),
    ("diffeqgmrfs_tpu.datasets", "DarcyDataset"),
    ("diffeqgmrfs_tpu.datasets", "BurgersDataset"),
    ("diffeqgmrfs_tpu.datasets", "get_xy_idcs"),
    ("diffeqgmrfs_tpu.metrics", "rmse"),
    ("diffeqgmrfs_tpu.metrics", "max_err"),
    ("diffeqgmrfs_tpu.metrics", "rel_err"),
    ("diffeqgmrfs_tpu.fem", "get_periodic_constraint"),
    ("diffeqgmrfs_tpu.fem", "uniform_unit_square_discretization"),
    ("diffeqgmrfs_tpu.fem", "periodic_unit_interval_discretization"),
    ("diffeqgmrfs_tpu.utils.plotting", "plot_spatiotemporal_gmrf"),
]


@pytest.mark.parametrize("module,symbol", SURFACE)
def test_symbol_exists(module, symbol):
    mod = importlib.import_module(module)
    assert hasattr(mod, symbol), f"{module}.{symbol} missing"
