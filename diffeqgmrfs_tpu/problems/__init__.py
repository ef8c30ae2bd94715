from diffeqgmrfs_tpu.problems.darcy import (
    DarcyFEMObservations,
    DarcyCollocationObservations,
    nearest_grid_indices,
)
from diffeqgmrfs_tpu.problems.burgers import (
    BurgersFEMResidual,
    BurgersCollocationResidual,
    assemble_burgers_mass_diffusion_matrices,
)
from diffeqgmrfs_tpu.problems.elliptic import EllipticCubicResidual
