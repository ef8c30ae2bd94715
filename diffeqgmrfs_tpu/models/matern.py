"""Whittle-Matérn SPDE priors discretized by FEM (Lindgren-Rue).

Analog of the reference engine's `MaternSPDE{D}(range=, smoothness=, σ²=)` /
`(κ=, ν=)` and its `discretize(spde, disc)` (SURVEY.md §2.3; call sites
`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:93-94`,
`_research/elliptic_chen24.jl:125-127`). The construction follows the
pattern visible in the in-repo clone `src/spdes/shallow_water.jl:170-196`:

    M~      = lumped mass,   G = stiffness
    K       = kappa^2 M~ + G
    Q_1     = K
    Q_2     = K^T M~^{-1} K
    Q_a     = K^T M~^{-1} Q_{a-2} M~^{-1} K          (alpha = nu + d/2)
    Q       = (sigma2_natural / sigma2_goal) * Q_alpha
    sigma2_natural = Gamma(nu) / (Gamma(nu + d/2) (4 pi)^{d/2} kappa^{2 nu})

Smoothness convention (inferred from call sites): in 2D `smoothness` = nu
(`MaternSPDE{2}(smoothness=2)` -> alpha=3); in 1D nu = smoothness + 1/2
(`MaternSPDE{1}(smoothness=0)` -> nu=1/2, alpha=1 — the temporal OU prior of
`product_matern`, `scripts/plots/burger_priors.jl:91`). Both yield integer
alpha. kappa = sqrt(8 nu) / range (`scripts/burgers/solve_burgers_gmrf-fem.jl:91`).

Matérn parameters are static floats in every reference workload, so the
precision is built host-side with scipy.sparse (exact, fast, no MXU needed)
and scattered once into BTD block storage; dense spatial exports feed the
space-time priors (models/advection_diffusion.py) where blocks are dense
anyway. Constraints are hard-condensed to free dofs (S^T Q S) rather than
soft-pinned with tiny noise as the reference does
(`shallow_water.jl:172-175`) — see ConstrainedGMRF.
"""

from __future__ import annotations

from contextlib import nullcontext as _nullcontext


def _trace_state_clean() -> bool:
    """True when NOT under an outer jax trace (host fast paths use jit
    internally, which must not run inside another trace)."""
    from jax._src import core as _core

    return _core.trace_state_clean()
from dataclasses import dataclass
from fractions import Fraction
from math import gamma, pi, sqrt

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.assembly import assemble_mass, assemble_stiffness
from diffeqgmrfs_tpu.fem.discretization import FEMDiscretization
from diffeqgmrfs_tpu.ops.btd import BTD, make_btd_pattern, choose_block_size
from diffeqgmrfs_tpu.gmrf.gmrf import GMRF, ConstrainedGMRF
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.solvers.blueprints import DEFAULT_BLUEPRINT


@dataclass(frozen=True)
class MaternSPDE:
    """(kappa^2 - Delta)^{alpha/2} u = W on R^d, alpha = nu + d/2."""

    d: int
    range: float | None = None
    smoothness: float | None = None
    sigma_sq: float = 1.0
    kappa: float | None = None
    nu: float | Fraction | None = None

    def resolved(self):
        """-> (kappa, nu, alpha:int, sigma_sq)."""
        if self.nu is not None:
            nu = float(self.nu)
        elif self.smoothness is not None:
            nu = float(self.smoothness) + (2 - self.d) / 2.0
        else:
            raise ValueError("need smoothness or nu")
        if self.kappa is not None:
            kappa = float(self.kappa)
        elif self.range is not None:
            kappa = sqrt(8.0 * nu) / float(self.range)
        else:
            raise ValueError("need range or kappa")
        alpha = nu + self.d / 2.0
        alpha_i = int(round(alpha))
        if abs(alpha - alpha_i) > 1e-9 or alpha_i < 1:
            raise ValueError(f"alpha = nu + d/2 = {alpha} must be a positive integer")
        return kappa, nu, alpha_i, self.sigma_sq

    def natural_variance(self) -> float:
        kappa, nu, _, _ = self.resolved()
        return gamma(nu) / (gamma(nu + self.d / 2) * (4 * pi) ** (self.d / 2) * kappa ** (2 * nu))


# ---------------------------------------------------------------------------
# Host-side assembly (static parameters)
# ---------------------------------------------------------------------------


def host_mass_stiffness(disc: FEMDiscretization):
    """Assembled (lumped mass diag, stiffness csr) on FULL dofs, NumPy.

    Mass lumping is HRZ (diagonal scaling): row-sum lumping is singular for
    quadratic elements (vertex shape functions integrate to ~0 on triangles).
    """
    g = disc.geometry
    cd = disc.dof_handler.cell_dofs_field(disc.dof_handler.field_names[0])
    n = disc.ndofs
    nd = cd.shape[1]

    # element integrals + HRZ scaling + lumped-mass scatter as one fused
    # XLA-CPU program — this host's numpy einsum/add.at lack SIMD (~20 s
    # at Darcy N300 for what the compiled loop does in <1 s)
    def kernel(w_detJ, phi, grad, cdv):
        s = phi.sum(axis=1)
        cell_mass = w_detJ @ (s * s)  # sum_ij Me[c,i,j]
        diag = jnp.einsum("cq,qi->ci", w_detJ, phi * phi)  # Me[c,i,i]
        Ge = jnp.einsum("cq,cqid,cqjd->cij", w_detJ, grad, grad)
        diag = diag * (cell_mass / diag.sum(axis=1))[:, None]
        m = jnp.zeros(n, w_detJ.dtype).at[cdv.reshape(-1)].add(
            diag.reshape(-1)
        )
        return m, Ge

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and _trace_state_clean():
        # NOT under an outer trace: jit returns concrete arrays
        with jax.default_device(cpu):
            m_lumped, Ge = jax.jit(kernel)(
                np.asarray(g.w_detJ), np.asarray(g.phi), np.asarray(g.grad),
                np.asarray(cd),
            )
        m_lumped = np.asarray(m_lumped)
        Ge = np.asarray(Ge)
    else:
        # inside a trace this stays a PURE HOST computation (numpy in,
        # numpy out) — callers trace host_mass_stiffness for structure
        Me = np.einsum("cq,qi,qj->cij", g.w_detJ, g.phi, g.phi)
        Ge = np.einsum("cq,cqid,cqjd->cij", g.w_detJ, g.grad, g.grad)
        diag = np.einsum("cii->ci", Me)
        cell_mass = Me.sum(axis=(1, 2))
        diag = diag * (cell_mass / diag.sum(axis=1))[:, None]
        m_lumped = np.zeros(n)
        np.add.at(m_lumped, cd.reshape(-1), diag.reshape(-1))
    r = np.repeat(cd[:, :, None], nd, axis=2).reshape(-1)
    c = np.repeat(cd[:, None, :], nd, axis=1).reshape(-1)
    G = sp.coo_matrix(
        (Ge.reshape(-1), (r, c)), shape=(n, n)
    ).tocsr()
    return m_lumped, G


def condense_matrix(A: sp.spmatrix, am: AffineMap) -> sp.csr_matrix:
    """S^T A S with the affine embedding S (host-side)."""
    n_full = am.n_full
    S = sp.coo_matrix(
        (am.s_coef, (np.arange(n_full), am.s_col)), shape=(n_full, am.n_free)
    ).tocsr()
    return (S.T @ A @ S).tocsr()


def condense_diag(d: np.ndarray, am: AffineMap) -> np.ndarray:
    """Free-dof lumped mass: S^T diag(d) S is diagonal when coefs are 0/1
    one-hot per free dof (true for Dirichlet + periodic)."""
    out = np.zeros(am.n_free)
    np.add.at(out, am.s_col, am.s_coef**2 * d)
    return out


def matern_precision_host(spde: MaternSPDE, disc: FEMDiscretization, affine: AffineMap | None = None):
    """Free-dof Matérn precision as scipy CSR (float64)."""
    kappa, nu, alpha, sigma_sq = spde.resolved()
    m, G = host_mass_stiffness(disc)
    if affine is not None and len(affine.prescribed_dofs):
        G = condense_matrix(G, affine)
        m = condense_diag(m, affine)
    K = (kappa**2) * sp.diags(m) + G
    Minv = sp.diags(1.0 / m)
    if alpha % 2 == 1:
        Q = K  # Q_1
        n_lift = (alpha - 1) // 2
    else:
        Q = (K.T @ Minv @ K).tocsr()  # Q_2
        n_lift = (alpha - 2) // 2
    for _ in range(n_lift):
        Q = (K.T @ Minv @ Q @ Minv @ K).tocsr()
    ratio = spde.natural_variance() / sigma_sq
    return (ratio * Q).tocsr()


def matern_sqrt_host(
    spde: MaternSPDE, disc: FEMDiscretization, affine: AffineMap | None = None
) -> sp.csr_matrix:
    """Fill-free sparse square root Λ of the Matérn precision: Q = Λᵀ Λ.

    SRIF operand (ops/srif.py): factoring the stacked [Λ; sqrt(tau) A]
    by QR keeps the f32 factor valid at cond(H) up to ~1e14, where direct
    f32 Cholesky of H breaks down (Darcy N_xy >= 128, RESULTS.md).

    Construction avoids ALL factor fill by using the per-cell element
    square root: K = kappa^2 M~ + G = E^T E with E = stack_c(L_c^T P_c),
    L_c = chol(kappa^2 diag(hrz_c) + G_c) — 6x6 dense per cell. Then with
    F = M~^{-1} K (lumped mass, as sparse as K):

        alpha = 2m+1:  Λ = sqrt(ratio) E F^m        (Λ^T Λ = K (M^{-1}K)^{2m})
        alpha = 2m:    Λ = sqrt(ratio) M~^{-1/2} K F^{m-1}

    Rows stay local (cell m-ring stencils, ~tens of nnz) instead of the
    O(bandwidth) dense rows a banded Cholesky of Q would produce. Matches
    `matern_precision_host` exactly, including HRZ lumping and constraint
    condensation order (condense K, m first, then powers).
    """
    kappa, nu, alpha, sigma_sq = spde.resolved()
    g = disc.geometry
    Me = np.einsum("cq,qi,qj->cij", g.w_detJ, g.phi, g.phi)
    Ge = np.einsum("cq,cqid,cqjd->cij", g.w_detJ, g.grad, g.grad)
    diag_c = np.einsum("cii->ci", Me)
    hrz = diag_c * (Me.sum(axis=(1, 2)) / diag_c.sum(axis=1))[:, None]
    nd = Me.shape[1]
    Ke = (kappa**2) * hrz[:, :, None] * np.eye(nd)[None] + Ge
    Lc = np.linalg.cholesky(Ke)  # [C, nd, nd] lower
    cd = disc.dof_handler.cell_dofs_field(disc.dof_handler.field_names[0])
    C = cd.shape[0]
    n = disc.ndofs
    rows = np.repeat(np.arange(C * nd), nd)
    cols = np.broadcast_to(cd[:, None, :], (C, nd, nd)).reshape(-1)
    vals = Lc.transpose(0, 2, 1).reshape(-1)  # row (c, j) = L_c[:, j]
    E = sp.coo_matrix((vals, (rows, cols)), shape=(C * nd, n)).tocsr()
    # lumped mass + stiffness on full dofs (same HRZ as host_mass_stiffness)
    m = np.zeros(n)
    np.add.at(m, cd.reshape(-1), hrz.reshape(-1))
    r = np.repeat(cd[:, :, None], nd, axis=2).reshape(-1)
    c = np.repeat(cd[:, None, :], nd, axis=1).reshape(-1)
    G = sp.coo_matrix((Ge.reshape(-1), (r, c)), shape=(n, n)).tocsr()
    if affine is not None and len(affine.prescribed_dofs):
        S = sp.coo_matrix(
            (affine.s_coef, (np.arange(affine.n_full), affine.s_col)),
            shape=(affine.n_full, affine.n_free),
        ).tocsr()
        E = (E @ S).tocsr()
        G = (S.T @ G @ S).tocsr()
        m = condense_diag(m, affine)
    K = (kappa**2) * sp.diags(m) + G
    F = (sp.diags(1.0 / m) @ K).tocsr()
    if alpha % 2 == 1:
        Lam = E
        for _ in range((alpha - 1) // 2):
            Lam = (Lam @ F).tocsr()
    else:
        Lam = (sp.diags(1.0 / np.sqrt(m)) @ K).tocsr()
        for _ in range((alpha - 2) // 2):
            Lam = (Lam @ F).tocsr()
    ratio = spde.natural_variance() / sigma_sq
    Lam = (np.sqrt(ratio) * Lam).tocsr()
    Lam.eliminate_zeros()
    return Lam


def csr_to_btd(Q: sp.csr_matrix, bs: int | None = None, dtype=jnp.float64) -> BTD:
    Qc = Q.tocoo()
    pat = make_btd_pattern(Qc.row, Qc.col, Q.shape[0], bs=bs)
    A = pat.scatter(jnp.asarray(Qc.data, dtype=dtype))
    return A.add_identity_padding()


def discretize_matern(
    spde: MaternSPDE,
    disc: FEMDiscretization,
    solver_blueprint=None,
    bs: int | None = None,
    compact: bool = False,
    packed: bool = False,
    sqrt: bool = False,
    sqrt_prefactor="auto",
):
    """FEM-discretize a Matérn SPDE into a GMRF prior.

    Analog of `GaussianMarkovRandomFields.discretize(spde, disc)`
    (`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:94`). Returns a
    `ConstrainedGMRF` when the discretization carries constraints.

    compact=True returns a `CompactGMRF`: f32 BTD for factorization + f64
    ELL operator for exact application — the production-memory path (the
    f64 BTD at Darcy N_xy=300 is ~11 GB; the ELL is ~0.5 GB).

    packed=True (implies compact) additionally skips the device BTD of Q
    entirely: conditioning assembles + factors in PACKED banded-block
    storage (ops/packed.py), halving both operator and factor HBM — the
    only way Darcy N_xy=300 fits a 16 GB v5e.

    sqrt=True (implies packed) additionally ships the fill-free sparse
    square root Λ (Q = Λ^T Λ, `matern_sqrt_host`) + its window plan, so
    conditioning with a `sqrt_factor=True` blueprint runs the SRIF windowed
    QR (ops/srif.py) — f32-valid at cond(H) up to ~1e14.
    """
    packed = packed or sqrt
    compact = compact or packed
    bp = solver_blueprint or DEFAULT_BLUEPRINT
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    has_constraints = len(affine.prescribed_dofs) > 0
    Q = matern_precision_host(spde, disc, affine if has_constraints else None)
    if compact:
        from diffeqgmrfs_tpu.fem.operators import RowOp
        from diffeqgmrfs_tpu.gmrf.gmrf import CompactGMRF

        Q64 = RowOp.from_csr(Q, dtype=jnp.float64)
        diag64 = jnp.asarray(Q.diagonal(), dtype=jnp.float64)
        mu = jnp.zeros(Q.shape[0], dtype=jnp.float64)
        if packed:
            # never materialize Q's BTD: ship a packed scatter plan built on
            # the ELL structure (padding slots sentinel-dropped) and carry
            # only shape metadata as `precision`
            from diffeqgmrfs_tpu.ops.packed import (
                ShapeOnly,
                make_packed_scatter_idx,
            )
            from diffeqgmrfs_tpu.ops.btd import choose_block_size

            n = Q.shape[0]
            Qr = Q.tocsr()
            coo = Q.tocoo()
            bw = int(np.max(np.abs(coo.row - coo.col))) if coo.nnz else 0
            bs_p = bs or choose_block_size(bw + 1, n)
            counts = np.diff(Qr.indptr)
            # rows=None -> ELL row pattern and the padding mask are built
            # IN-GRAPH (this host's numpy is ~50-100x slower than the
            # fused XLA loop at 41M entries; see make_packed_scatter_idx)
            q_idx = make_packed_scatter_idx(
                None, np.asarray(Q64.cols), n, bs_p, valid_counts=counts
            )
            sqrt32 = sqrt_plan = sqrt_R32 = sqrt_cs0 = None
            if sqrt:
                from diffeqgmrfs_tpu.ops.ata_windows import auto_split
                from diffeqgmrfs_tpu.ops.srif import (
                    rowop_window_plan,
                    srif_packed_qr,
                )

                Lam = matern_sqrt_host(
                    spde, disc, affine if has_constraints else None
                )
                sqrt32 = RowOp.from_csr(Lam, dtype=jnp.float32)
                # fine (split) windows: same R factor, ~1.8x fewer QR
                # flops; valid because Lam rows span <= bw + 1 <= bs_p
                sqrt_plan = rowop_window_plan(
                    sqrt32, n, bs_p, split=auto_split(bs_p)
                ).to_device()
                Nb = -(-n // bs_p)
                if sqrt_prefactor == "auto":
                    sqrt_prefactor = bs_p >= 512
                if sqrt_prefactor and Nb > 1:
                    # pre-reduce the instance-independent prior rows ONCE
                    # (SRIF measurement-update form): conditioning then
                    # stacks only [R_Λ·rescale; sqrt(tau) A] per instance
                    sqrt_cs0 = jnp.asarray(
                        1.0 / np.sqrt(np.asarray(diag64)), dtype=jnp.float32
                    )
                    # plan threaded through the jit SIGNATURE, not the
                    # closure: closed-over arrays lower as HLO constants,
                    # and at N_xy=300 the ~100 MB of window-plan indices
                    # overflow the relay's compile-request body (HTTP 413)
                    sqrt_R32 = jax.jit(
                        lambda p, v, c: srif_packed_qr(
                            [(p, v)], n, Nb, bs_p,
                            dtype=jnp.float32, col_scale=c,
                        )
                    )(sqrt_plan, sqrt32.vals, sqrt_cs0)
            inner = CompactGMRF(
                mu,
                ShapeOnly(n, -(-n // bs_p), bs_p),
                None,
                bp,
                Q64,
                diag64,
                jnp.asarray(q_idx),
                sqrt32,
                sqrt_plan,
                sqrt_R32,
                sqrt_cs0,
            )
        else:
            Qb32 = csr_to_btd(Q, bs=bs, dtype=jnp.float32)
            inner = CompactGMRF(mu, Qb32, None, bp, Q64, diag64)
    else:
        Qb = csr_to_btd(Q, bs=bs)
        mu = jnp.zeros(Q.shape[0], dtype=Qb.dtype)
        inner = GMRF(mu, Qb, None, bp)
    if has_constraints:
        return ConstrainedGMRF(inner, affine)
    return inner


def matern_spatial_dense(spde: MaternSPDE, disc: FEMDiscretization, affine: AffineMap | None = None):
    """Dense free-dof Matérn precision [n_free, n_free] (for ST priors whose
    spatial blocks are dense anyway)."""
    Q = matern_precision_host(spde, disc, affine)
    return jnp.asarray(Q.toarray())
