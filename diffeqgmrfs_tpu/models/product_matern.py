"""Separable (Kronecker) temporal x spatial Matérn space-time priors.

Analog of the reference's `product_matern(temporal_spde, N_t, spatial_spde,
disc; solver_blueprint=)` (`/root/reference/scripts/burgers/
solve_burgers_gmrf-collocation.jl:138`). For a product covariance
Sigma = Sigma_t (x) Sigma_s the precision is Q = Q_t (x) Q_s; with the
time-major dof layout x[t * N_s + s] this is block-structured with blocks
Q_t[a,b] * Q_s — block-tridiagonal whenever the temporal precision is
tridiagonal (temporal smoothness 0 -> alpha=1 -> OU process, which is what
the reference uses: `MaternSPDE{1}(range=..., smoothness=0, σ²=0.1)`,
`scripts/plots/burger_priors.jl:91`).

The temporal Matérn is discretized by P1 FEM on the *index grid* 0..N_t-1
(the reference passes only `length(ts)`, so temporal lengthscales are in
index units).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.discretization import FEMDiscretization
from diffeqgmrfs_tpu.fem.mesh import IntervalMesh
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.gmrf.gmrf import (
    GMRF,
    ConstrainedGMRF,
    ConcreteConstantMeshSTGMRF,
)
from diffeqgmrfs_tpu.models.matern import (
    MaternSPDE,
    matern_precision_host,
    matern_spatial_dense,
)
from diffeqgmrfs_tpu.ops.btd import BTD
from diffeqgmrfs_tpu.solvers.blueprints import DEFAULT_BLUEPRINT


def temporal_matern_precision(spde: MaternSPDE, N_t: int) -> sp.csr_matrix:
    """1D Matérn precision on the unit-spaced index grid of N_t points."""
    mesh = IntervalMesh(0.0, float(N_t - 1), N_t - 1, order=1)
    disc = FEMDiscretization(mesh, element_order=1, quad_degree=2)
    return matern_precision_host(spde, disc, None)


def product_matern(
    temporal_spde: MaternSPDE,
    N_t: int,
    spatial_spde: MaternSPDE,
    disc: FEMDiscretization,
    solver_blueprint=None,
    dtype=jnp.float64,
):
    """Kronecker ST-GMRF prior Q = Q_t (x) Q_s."""
    bp = solver_blueprint or DEFAULT_BLUEPRINT
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    has_constraints = len(affine.prescribed_dofs) > 0
    am = affine if has_constraints else None

    Q_t = temporal_matern_precision(temporal_spde, N_t).tocoo()
    bw_t = int(np.max(np.abs(Q_t.row - Q_t.col))) if Q_t.nnz else 0
    if bw_t > 1:
        raise NotImplementedError(
            "temporal Matérn with bandwidth > 1 (smoothness > 0) would need "
            "block-pentadiagonal storage; reference uses smoothness=0"
        )
    Qt = np.asarray(Q_t.todense())
    Q_s = matern_spatial_dense(spatial_spde, disc, am).astype(dtype)
    n = Q_s.shape[0]

    diag = jnp.asarray(np.diag(Qt), dtype=dtype)[:, None, None] * Q_s[None]
    sub = jnp.asarray(np.diag(Qt, -1), dtype=dtype)[:, None, None] * Q_s[None]
    Q = BTD(diag, sub, N_t * n)

    mu = jnp.zeros(N_t * n, dtype=dtype)
    inner = ConcreteConstantMeshSTGMRF(mu, Q, None, bp, disc, N_t)
    if has_constraints:
        return ConstrainedGMRF(inner, affine.replicate(N_t))
    return inner
