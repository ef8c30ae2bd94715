"""diffeqgmrfs_tpu — TPU-native probabilistic PDE solvers through GMRFs.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the Julia
reference stack `timweiland/DiffEqGMRFs.jl` + `GaussianMarkovRandomFields.jl`
(see SURVEY.md): Whittle–Matérn and advection–diffusion SPDE priors discretized
by FEM into sparse-precision Gaussians, information-form conditioning on PDE
residuals and data, Gauss–Newton MAP optimization for nonlinear PDEs, and
posterior sampling / marginal-variance estimation.

TPU-first design
----------------
Unlike the reference (CHOLMOD/Pardiso unstructured sparse Cholesky on CPU),
every precision matrix here is kept in *block-tridiagonal* (BTD) form:

* spatiotemporal GMRFs are natively block-tridiagonal in time
  (cf. reference `src/tridiagonal_cholesky.jl`), and
* purely spatial GMRFs on structured meshes are banded under lexicographic
  node ordering, and a banded matrix with half-bandwidth <= bs is
  block-tridiagonal with block size bs.

All factorizations, solves, sampling, and selected-inverse (Takahashi)
marginal variances then run as dense-blocked POTRF/TRSM/SYRK/GEMM sweeps that
map straight onto the TPU MXU, batched with `vmap` over dataset instances and
posterior samples and sharded with `shard_map` over device meshes.

Structure vs. values
--------------------
Mesh topology, dof maps, and sparsity patterns are static NumPy (computed once,
host-side); all numeric values flow through JAX so that assembly, conditioning,
Gauss–Newton, and sampling jit-compile into single XLA programs.
"""

from diffeqgmrfs_tpu.utils.config import enable_x64, default_float

enable_x64()

from diffeqgmrfs_tpu import fem, ops, gmrf, models, solvers, datasets, parallel, utils, problems
from diffeqgmrfs_tpu.metrics import rmse, max_err, rel_err

__version__ = "0.1.0"
