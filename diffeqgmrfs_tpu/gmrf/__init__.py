from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.gmrf.gmrf import (
    GMRF,
    CompactGMRF,
    ConcreteConstantMeshSTGMRF,
    ImplicitEulerConstantMeshSTGMRF,
    ConstrainedGMRF,
    mean,
    std,
    sample,
    sqmahal,
    precision_map,
    to_matrix,
    time_means,
)
from diffeqgmrfs_tpu.gmrf.conditioning import condition_on_observations, add_ata
from diffeqgmrfs_tpu.gmrf.compat import (
    constrainify_linear_system,
    transform_free_to_full,
    LinearMapWithSqrt,
)
