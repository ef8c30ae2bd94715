"""Solver blueprints: configuration objects mirroring the reference's.

The reference dispatches linear algebra through blueprint objects
(`CholeskySolverBlueprint`, `GNCholeskySolverBlueprint`, `CGSolverBlueprint`,
`PardisoGMRFSolverBlueprint` — SURVEY.md §2.3). Here the direct solver is
always the block-tridiagonal Cholesky (ops/cholesky.py); there is no
fill-reducing permutation to manage because structure is fixed by
construction, so the reference's `perm=` argument is accepted for API parity
and ignored (with the permutation-reuse *benefit* — one symbolic setup reused
across instances — obtained automatically from static BTD patterns).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax


@dataclass(frozen=True)
class VarianceStrategy:
    pass


@dataclass(frozen=True)
class TakahashiStrategy(VarianceStrategy):
    """Exact marginal variances by selected inversion (ops/takahashi.py).

    Default here — strictly better than sampling on BTD factors."""


@dataclass(frozen=True)
class RBMCStrategy(VarianceStrategy):
    """Rao-Blackwellized Monte Carlo variance estimator with n samples.

    API-parity analog of the reference's `RBMCStrategy(n; rng=)`
    (`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:100`).
    """

    n_samples: int = 50
    seed: int = 0


@dataclass(frozen=True)
class CholeskySolverBlueprint:
    """Direct solver config (`CholeskySolverBlueprint(var_strategy=, perm=)`).

    mixed_precision=True factors in f32 on the MXU with f64 iterative
    refinement for mean solves (ops/refine.py) — the TPU production path.

    gemm_solves=True converts the factor to GEMM-only solve form
    (ops/inverse_solver.py: W_i = L_i^{-1} precomputed once; every
    substitution step becomes a pure matmul, and Takahashi variances reuse
    the same inverses). Worth it whenever a factor serves many solves —
    sampling, RBMC probes, refinement loops — since TRSM runs ~6x below
    MXU GEMM throughput on v5e.
    """

    var_strategy: VarianceStrategy = field(default_factory=TakahashiStrategy)
    perm: object = None  # accepted for parity; orderings are structural here
    compute_variance: bool = True
    mixed_precision: bool = False
    gemm_solves: bool = False
    # factor dtype for the compact/packed conditioning paths: "f32" (MXU,
    # + f64 refinement; valid while cond(equilibrated H) < 1/eps_f32 ~ 1e7)
    # or "f64" (emulated on TPU, ~47x slower, needed when the squared
    # observation operator pushes cond ~ N^4 past f32 — Darcy N_xy >~ 100)
    factor_dtype: str = "f32"
    # sqrt_factor=True factors the STACKED square-root system
    # [Λ_Q; sqrt(tau) A] by windowed QR (ops/srif.py) instead of forming
    # H = Q + tau A^T A: factor error scales with sqrt(cond(H)), keeping
    # f32 valid at cond(H) up to ~1e14 — the production answer to the
    # f64-factor regime above. Requires a prior discretized with sqrt=True.
    sqrt_factor: bool = False
    # SRIF window-QR chunking: "auto" (chunk to 2bs rows when the stacked
    # window exceeds 3bs — bounded workspace, ~1.7x QR flops), "off"
    # (single full-stack QR per window — fastest when it fits), or an int
    # chunk row count.
    srif_chunk: object = "auto"
    # MXU matmul precision inside the SRIF QR: "float32" (default) or
    # "tensorfloat32" (faster trailing updates; refinement absorbs the
    # reduced factor accuracy while 2e-6 * sqrt(cond H) < 1)
    srif_precision: str = "float32"
    # SRIF QR engine: "xla" (monolithic Householder), "bhh" (blocked
    # Householder panels + GEMM trailing updates — MXU-rate bulk), "bcgs2"
    # (BCGS2 + shifted-CholQR3 panels — all-GEMM at near-Householder
    # stability; fastest stable engine on TPU), "bcgs" (experimental
    # single-pass all-GEMM Gram-Schmidt)
    srif_qr_impl: str = "xla"
    # SRIF window-QR factor dtype: "f32" (default; valid to cond(H)~1e14)
    # or "f64" (TPU-emulated, ~47x QR cost — the exact-direction arm for
    # systems beyond the f32 sqrt validity, e.g. the flagship N800x100
    # fine-dt ST Newton systems; bypasses the f32 prefactor)
    srif_qr_dtype: str = "f32"
    # substitution sweep dtype through the f32 SRIF factor: "cond"
    # (default: f32 sweep, XLA-conditional f64 re-sweep only when the f32
    # result overflows — the healthy path never pays TPU's emulated-f64
    # rate), "f32", or "f64" (always; 2.5-4.3x per-Newton-step regression
    # measured when this ran unconditionally, RESULTS.md round 2)
    sub_dtype: str = "cond"
    # SRIF solve strategy: "refine" (monotone Richardson refinement against
    # the f32 factor) or "pcg" (preconditioned CG — converges at the Krylov
    # rate where Richardson diverges, i.e. factors beyond f32 validity:
    # the flagship Burgers N800x100 fine-dt ST Newton systems)
    srif_solve: str = "refine"
    srif_pcg_iters: int = 32
    # BTD factor-sweep options for the f32 MXU factor (ops/cholesky.py
    # btd_cholesky kwargs): `factor_winv_trsm` replaces the sweep TRSM
    # with a panel-inverse GEMM chain of this panel size (slope-measured
    # ~8x over monolithic TRSM on v5e at bs=2048, identical solve
    # residual), `factor_precision` sets the sweep matmul precision
    # ("float32" 6-pass | "tensorfloat32" 3-pass at ~2.1x GEMM rate —
    # refinement absorbs the difference at production conditions).
    factor_winv_trsm: int | None = None
    factor_precision: str = "float32"
    # blocked-panel POTRF inside the sweep (f32 panel chols + MXU-rate
    # trailing GEMMs at factor_precision); panel=128 with winv_trsm=128
    # and bfloat16 is the fastest measured v5e config (16.4 TF/s vs 9.5
    # monolithic at bs=2048, solve residual 5.7e-7 vs 2.5e-7)
    factor_panel: int | None = None
    # mean-solve refinement iteration count (None = per-factor default).
    # Contraction per iteration ~ eps_factor * sqrt(cond H) for the SRIF
    # path — at Darcy N300 (~2e-4) two iterations already reach the f64
    # floor; each extra iteration costs a full H application + solve.
    refine_iters: int | None = None
    # parallel-in-time factorization: nested-dissection elimination over
    # the time axis with this many chunks (ops/dist_btd; 0 = sequential
    # sweep). Requires N % dist_chunks == 0 and N/dist_chunks >= 2. With
    # `mesh` set, chunk interiors shard over the mesh's "time" axis.
    # SRIF measurement-update prefactor (conditioning/GN): pre-reduce the
    # instance-independent prior rows once; per-instance QR stacks only
    # [R_prior·rescale; sqrt(tau) A]. On by default when the prior
    # carries a precomputed factor (discretize_matern sqrt_prefactor).
    dist_chunks: int = 0
    mesh: object = None
    sqrt_prefactor: bool = True

    def factor_opts(self) -> dict:
        """kwargs for `btd_cholesky` on the f32 factor path ({} = defaults)."""
        fo = {}
        if self.factor_winv_trsm:
            fo["winv_trsm"] = int(self.factor_winv_trsm)
        if self.factor_panel:
            fo["panel"] = int(self.factor_panel)
        if self.factor_precision != "float32":
            fo["precision"] = self.factor_precision
        return fo


@dataclass(frozen=True)
class GNCholeskySolverBlueprint(CholeskySolverBlueprint):
    """Cholesky blueprint for Gauss-Newton inner solves
    (`GNCholeskySolverBlueprint(p)`): no variance machinery needed.

    Carries the FULL Gauss-Newton factorization-path selection (the analog
    of the reference's blueprint dispatch,
    `/root/reference/scripts/burgers/solve_burgers_gmrf-fem.jl:170-181`):

    * `mixed_precision` (inherited): f32 factor + f64 refinement
    * `sqrt_factor` (inherited): SRIF windowed QR of the stacked
      square-root system — never forms H (spatial via CompactGMRF sqrt
      operands; spatiotemporal via `st_sqrt_ops` aux)
    * `toeplitz`: hold a constant-mesh ST prior in distinct-block form
      inside the Newton loop (no full-size f64 BTD in the loop body)
    * `damping`: backtracking on the MAP objective over step fractions
      {1, 1/2, 1/4, 1/8}
    * `materialize_H`: build the posterior-precision BTD at the solution
      (skip for MAP-mean-only or sqrt-factored posteriors)
    """

    compute_variance: bool = False
    toeplitz: bool = False
    damping: bool = False
    materialize_H: bool = True

    def __init__(self, perm=None, **kw):
        import dataclasses as _dc

        object.__setattr__(self, "perm", perm)
        for f_ in _dc.fields(GNCholeskySolverBlueprint):
            if f_.name == "perm":
                continue
            if f_.name in kw:
                v = kw.pop(f_.name)
            elif f_.default is not _dc.MISSING:
                v = f_.default
            else:
                v = f_.default_factory()
            object.__setattr__(self, f_.name, v)
        if kw:
            raise TypeError(f"unknown blueprint options: {sorted(kw)}")
        object.__setattr__(self, "compute_variance", False)


@dataclass(frozen=True)
class CGSolverBlueprint:
    """Conjugate-gradient solver option (`CGSolverBlueprint()`,
    `/root/reference/src/spdes/shallow_water.jl:130`), block-Jacobi
    preconditioned on the BTD diagonal blocks."""

    maxiter: int = 1000
    tol: float = 1e-10
    var_strategy: VarianceStrategy = field(default_factory=RBMCStrategy)


@dataclass(frozen=True)
class PardisoGMRFSolverBlueprint(CholeskySolverBlueprint):
    """Parity alias (`/root/reference/scripts/plots/burger_priors.jl:123`).

    Pardiso is an Intel-CPU direct solver; on TPU the equivalent direct
    method is the same BTD Cholesky, so this is an alias."""


DEFAULT_BLUEPRINT = CholeskySolverBlueprint()
