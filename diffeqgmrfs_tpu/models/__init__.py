from diffeqgmrfs_tpu.models.matern import (
    MaternSPDE,
    discretize_matern,
    matern_spatial_dense,
    matern_precision_host,
)
from diffeqgmrfs_tpu.models.advection_diffusion import (
    AdvectionDiffusionSPDE,
    ImplicitEulerSSM,
    joint_ssm,
    discretize_advection_diffusion,
)
from diffeqgmrfs_tpu.models.product_matern import product_matern


def discretize(spde, disc, ts=None, **kw):
    """Reference-style generic `discretize` dispatch
    (`GaussianMarkovRandomFields.discretize`)."""
    from diffeqgmrfs_tpu.models.matern import MaternSPDE
    from diffeqgmrfs_tpu.models.advection_diffusion import AdvectionDiffusionSPDE

    if isinstance(spde, MaternSPDE):
        return discretize_matern(spde, disc, **kw)
    if isinstance(spde, AdvectionDiffusionSPDE):
        return discretize_advection_diffusion(spde, disc, ts, **kw)
    if hasattr(spde, "discretize"):
        return spde.discretize(disc, ts, **kw)
    raise TypeError(f"unknown SPDE type {type(spde)}")
