"""GMRF distribution types.

TPU-native analogs of the reference engine's Gaussian types (SURVEY.md §2.3):

* `GMRF(mean, precision)` — Gaussian with block-tridiagonal sparse precision
* `ConcreteConstantMeshSTGMRF` / `ImplicitEulerConstantMeshSTGMRF` —
  spatiotemporal GMRFs on a fixed spatial mesh x time grid, where the BTD
  block size *is* the spatial dof count
* `ConstrainedGMRF` — free-dof Gaussian with affine reconstruction of
  prescribed dofs (periodic / Dirichlet BCs)

All types are pytrees: they can be constructed, conditioned, and queried
inside jit/vmap, which is how dataset sweeps batch over instances.

Naming note: the reference exposes Julia functions `mean(x)`, `std(x)`,
`rand(rng, x)`, `sqmahal(x, v)`; here they are methods plus module-level
aliases of the same names (mean_/std_ variants avoid shadowing).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.btd import BTD
from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky, btd_cholesky
from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.solvers.blueprints import (
    CholeskySolverBlueprint,
    CGSolverBlueprint,
    RBMCStrategy,
    TakahashiStrategy,
    DEFAULT_BLUEPRINT,
)


def _rbmc_variance(Q: BTD, F: BTDCholesky, n_samples: int, key):
    """Rao-Blackwellized MC marginal variance estimate.

    With x_k ~ N(0, Q^{-1}):  Var_i = 1/Q_ii + E[ h_i^2 ],
    h_i = (1/Q_ii) * sum_{j != i} Q_ij x_j = ((Q x)_i - Q_ii x_i) / Q_ii.
    Analog of the reference's `RBMCStrategy(n)` (SURVEY.md §2.3).
    """
    z = F.sample_zero_mean(key, n_samples)  # [k, n]
    d = Q.diagonal()
    r = Q.matvec(z)  # [k, n]
    h = (r - d[None, :] * z) / d[None, :]
    return 1.0 / d + jnp.mean(h * h, axis=0)


@jax.tree_util.register_pytree_node_class
@dataclass
class GMRF:
    """Gaussian with mean `mu` and BTD precision Q."""

    mu: jnp.ndarray
    precision: BTD
    factor: BTDCholesky | None = None
    blueprint: CholeskySolverBlueprint = DEFAULT_BLUEPRINT

    def tree_flatten(self):
        return (self.mu, self.precision, self.factor), (self.blueprint,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])

    def __len__(self):
        return self.precision.n

    @property
    def n(self):
        return self.precision.n

    # -- factorization -------------------------------------------------------

    def _make_factor(self):
        gemm = getattr(self.blueprint, "gemm_solves", False)
        chunks = getattr(self.blueprint, "dist_chunks", 0)
        if chunks and self.precision.N % chunks == 0 and (
            self.precision.N // chunks >= 2
        ):
            # parallel-in-time nested-dissection factor (ops/dist_btd):
            # chunk interiors batch over [P] and shard over a mesh time
            # axis (blueprint.mesh); full posterior surface incl.
            # Takahashi variances (takahashi_diag_dist)
            from diffeqgmrfs_tpu.ops.dist_btd import dist_btd_cholesky

            return dist_btd_cholesky(
                self.precision, chunks,
                mesh=getattr(self.blueprint, "mesh", None),
            )
        if getattr(self.blueprint, "mixed_precision", False):
            from diffeqgmrfs_tpu.ops.refine import MixedPrecisionFactor

            return MixedPrecisionFactor(self.precision, gemm_solves=gemm)
        F = btd_cholesky(self.precision)
        if gemm:
            from diffeqgmrfs_tpu.ops.inverse_solver import BTDInverseSolver

            return BTDInverseSolver.from_factor(F)
        return F

    def factorize(self) -> "GMRF":
        if self.factor is not None:
            return self
        return replace(self, factor=self._make_factor())

    @property
    def precision_chol(self) -> BTDCholesky:
        if self.factor is None:
            object.__setattr__(self, "factor", self._make_factor())
        return self.factor

    # -- reference API surface ----------------------------------------------

    def mean(self):
        return self.mu

    def precision_map(self) -> BTD:
        return self.precision

    def solve(self, b):
        return self.precision_chol.solve(b)

    def variance(self, var_strategy=None):
        vs = var_strategy or self.blueprint.var_strategy
        if isinstance(vs, RBMCStrategy):
            key = jax.random.PRNGKey(vs.seed)
            return _rbmc_variance(
                self.precision, self.precision_chol, vs.n_samples, key
            )
        F = self.precision_chol
        if hasattr(F, "variance_diag_rescued"):
            # SRIFNewtonFactor: exact unit-solve rescue of entries the
            # Takahashi recursion overflows on (lax.cond — free on the
            # all-finite path; flagship N800x100 n_std_nonfinite -> 0)
            return F.variance_diag_rescued()
        if hasattr(F, "variance_diag"):  # MixedPrecisionFactor
            return F.variance_diag()
        return takahashi_diag(F)

    def std(self, var_strategy=None):
        return jnp.sqrt(self.variance(var_strategy))

    def sample(self, key, n_samples: int = 1):
        """Joint samples [n_samples, n] (reference `rand(rng, x)`)."""
        return self.mu[None, :] + self.precision_chol.sample_zero_mean(key, n_samples)

    def sqmahal(self, v):
        """(v - mu)^T Q (v - mu) (reference `sqmahal`)."""
        d = jnp.asarray(v) - self.mu
        return jnp.dot(d, self.precision.matvec(d))

    def logpdf(self, v):
        """Gaussian log-density (gives NLL = -logpdf; cf.
        `scripts/burgers/solve_burgers_gmrf-collocation.jl:213-215`)."""
        n = self.n
        return 0.5 * (
            self.precision_chol.log_det()
            - n * jnp.log(2 * jnp.pi)
            - self.sqmahal(v)
        )

    def log_det_precision(self):
        return self.precision_chol.log_det()


@jax.tree_util.register_pytree_node_class
@dataclass
class CompactGMRF(GMRF):
    """Spatial GMRF in production-memory form: `precision` is the f32 BTD
    (factorization storage) while `precision64` holds the same matrix as a
    compact padded-row (ELL) RowOp in f64 for operator application —
    refinement residuals, exact rhs/sqmahal, RBMC probes.

    At Darcy production sizes the f64 BTD of the precision is ~6x the ELL
    footprint (dense [bs, bs] blocks vs ~nnz rows), and conditioning through
    `MatFreeConditionFactor` keeps only the f32 factor resident."""

    precision64: object = None  # RowOp (ELL, f64)
    diag64: jnp.ndarray = None  # diag of the f64 precision (host-precomputed:
    # RowOp cols turn into tracers through jit signatures, so the diagonal
    # cannot be extracted structurally inside a trace)
    q_pack_idx: jnp.ndarray = None  # packed-scatter plan for the ELL values
    # (ops/packed.py); set -> conditioning assembles + factors in packed
    # banded-block storage and `precision` is a ShapeOnly stub
    sqrt32: object = None  # RowOp (f32): sparse Λ with Λ^T Λ = Q — the SRIF
    # operand (ops/srif.py) enabling f32 square-root factorization where
    # cond(H) exceeds 1/eps_f32 (blueprint sqrt_factor=True)
    sqrt_plan: object = None  # ATAWindowPlan for sqrt32's rows (host-built)
    sqrt_R32: object = None  # PackedBTDRFactor: PRE-REDUCED prior sqrt
    # (R_Λ = qr(Λ·diag(sqrt_cs0)), ops/srif.py prior_factor) — conditioning
    # then QRs only [R_Λ·rescale; sqrt(tau) A] per instance (the SRIF
    # measurement-update form, ~2x fewer per-instance QR flops)
    sqrt_cs0: jnp.ndarray = None  # column equilibration R_Λ was built at

    def tree_flatten(self):
        return (
            self.mu,
            self.precision,
            self.factor,
            self.precision64,
            self.diag64,
            self.q_pack_idx,
            self.sqrt32,
            self.sqrt_plan,
            self.sqrt_R32,
            self.sqrt_cs0,
        ), (self.blueprint,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0],
            children[1],
            children[2],
            aux[0],
            children[3],
            children[4],
            children[5],
            children[6],
            children[7],
            children[8],
            children[9],
        )

    def sqmahal(self, v):
        d = jnp.asarray(v) - self.mu
        return jnp.dot(d, self.precision64.matvec(d))

    def drop_sqrt_operands(self):
        """Copy without the raw sqrt operand (sqrt32 rows + window plan).

        When the SRIF measurement-update prefactor (sqrt_R32) is active,
        conditioning never touches the raw Λ rows — but `device_put` on the
        whole pytree would still make them HBM-resident (~1 GB at Darcy
        N300: 0.25 GB values + 0.75 GB window-plan indices), on top of the
        5.35 GB prefactor + 5.35 GB per-instance factor that define the
        16 GB budget. Drivers prune before `device_put`; the original
        (host) object keeps the operands for non-prefactor fallbacks.
        """
        if self.sqrt_R32 is None:
            raise ValueError("no prefactor present; sqrt operands are live")
        return CompactGMRF(
            self.mu, self.precision, self.factor, self.blueprint,
            self.precision64, self.diag64, self.q_pack_idx,
            None, None, self.sqrt_R32, self.sqrt_cs0,
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class ConcreteConstantMeshSTGMRF(GMRF):
    """Spatiotemporal GMRF on a fixed spatial mesh x time grid.

    The BTD time-block structure is the `tridiagonal_cholesky` structure of
    the reference (`src/tridiagonal_cholesky.jl`); `N_t` x `N_s` dofs in
    time-major layout. Analog of `ConcreteConstantMeshSTGMRF`
    (`scripts/burgers/solve_burgers_gmrf-collocation.jl:251-256`).
    """

    disc: object = None  # FEMDiscretization (static)
    N_t: int = 1

    def tree_flatten(self):
        return (self.mu, self.precision, self.factor), (
            self.blueprint,
            self.disc,
            self.N_t,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0], aux[1], aux[2])

    @property
    def N_s(self):
        return self.n // self.N_t

    def time_slices(self, v=None):
        """[N_t, N_s] view of a space-time vector (default: the mean)."""
        v = self.mu if v is None else jnp.asarray(v)
        return v.reshape(self.N_t, self.N_s)

    def time_means(self):
        """Per-timestep means (reference `time_means`)."""
        return self.time_slices()


@jax.tree_util.register_pytree_node_class
@dataclass
class ImplicitEulerConstantMeshSTGMRF(ConcreteConstantMeshSTGMRF):
    """ST-GMRF that remembers its implicit-Euler SSM origin (analog of
    `ImplicitEulerConstantMeshSTGMRF`,
    `scripts/burgers/solve_burgers_gmrf-fem.jl:187-193`)."""

    ssm: object = None  # ImplicitEulerSSM (static metadata)

    def tree_flatten(self):
        return (self.mu, self.precision, self.factor), (
            self.blueprint,
            self.disc,
            self.N_t,
            self.ssm,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0], children[1], children[2], aux[0], aux[1], aux[2], aux[3]
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class ConstrainedGMRF:
    """GMRF on free dofs with affine reconstruction of prescribed dofs.

    Analog of `ConstrainedGMRF(inner, prescribed_dofs, free_dofs,
    free_to_prescribed_map, free_to_prescribed_offset)`
    (`scripts/solve_burger.jl:268-274`). All public queries speak the FULL
    dof space; `inner_gmrf` lives on free dofs.
    """

    inner_gmrf: GMRF
    affine: AffineMap

    def tree_flatten(self):
        return (self.inner_gmrf,), (self.affine,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    def __len__(self):
        return self.affine.n_full

    @property
    def n(self):
        return self.affine.n_full

    @property
    def prescribed_dofs(self):
        return self.affine.prescribed_dofs

    @property
    def free_dofs(self):
        return self.affine.free_dofs

    @property
    def precision_chol(self):
        return self.inner_gmrf.precision_chol

    def mean(self):
        return self.affine.free_to_full(self.inner_gmrf.mean())

    def precision_map(self):
        return self.inner_gmrf.precision_map()

    def variance(self, var_strategy=None):
        vf = self.inner_gmrf.variance(var_strategy)
        # prescribed dof i = coef * free[master] + const -> var coef^2 * var
        return jnp.asarray(self.affine.s_coef) ** 2 * vf[..., self.affine.s_col]

    def std(self, var_strategy=None):
        return jnp.sqrt(self.variance(var_strategy))

    def sample(self, key, n_samples: int = 1):
        s = self.inner_gmrf.sample(key, n_samples)
        return self.affine.free_to_full(s)

    def sqmahal(self, v):
        return self.inner_gmrf.sqmahal(self.affine.restrict(v))

    def log_det_precision(self):
        return self.inner_gmrf.log_det_precision()

    def factorize(self):
        return ConstrainedGMRF(self.inner_gmrf.factorize(), self.affine)


# -- module-level reference-style functions ---------------------------------


def mean(x):
    return x.mean()


def std(x, var_strategy=None):
    return x.std(var_strategy)


def sample(key, x, n_samples: int = 1):
    return x.sample(key, n_samples)


def sqmahal(x, v):
    return x.sqmahal(v)


def precision_map(x):
    return x.precision_map()


def to_matrix(Q: BTD):
    return Q.to_dense()


def time_means(x):
    return x.time_means()
