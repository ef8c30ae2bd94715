"""Mixed-precision solves: f32 MXU factorization + f64 iterative refinement.

TPU v5e has no f64 MXU; emulated f64 matmuls are ~50x slower than f32 (see
bench notes). The reference's accuracy regime (observation precisions
1e8..1e18 on unit-scale priors, `_research/burgers_chen24.jl:101`) demands
f64 *results*, so the production path is:

  1. symmetric diagonal equilibration  H~ = D^{-1/2} H D^{-1/2}
     (removes the scale spread the huge noise terms introduce),
  2. block-tridiagonal Cholesky of H~ in float32 on the MXU,
  3. iterative refinement in float64: r = b - H x (BTD matvec, cheap in f64),
     dx = f32-solve(r), until the residual stagnates or tol is met.

Refinement converges when cond(H~) << 1/eps_f32 ~ 1e7; the `info` output
reports the final relative residual so callers can fall back to the f64
factorization when equilibration is not enough.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.btd import BTD
from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky, BTDCholesky


def equilibrate(H: BTD):
    """-> (H_scaled, d) with H_s = D^{-1/2} H D^{-1/2}, d = diag(H)^{1/2}.

    Padding rows (identity diagonal) keep scale 1 — `pad_vec` zero-fills,
    which would zero the padded diagonal and destroy positive-definiteness
    of the scaled matrix."""
    d = jnp.sqrt(H.diagonal())
    dinv = 1.0 / d
    db = H.pad_vec(dinv)  # [N, bs]; padding slots are 0 here
    pad_mask = H.pad_vec(jnp.ones_like(dinv))  # 1 on real rows, 0 on padding
    db = db + (1.0 - pad_mask)  # -> 1 on padding rows
    diag = H.diag * db[:, :, None] * db[:, None, :]
    lower = H.lower * db[1:, :, None] * db[:-1, None, :] if H.N > 1 else H.lower
    return BTD(diag, lower, H.n), d


@jax.tree_util.register_pytree_node_class
class RefinedFactor:
    """f32 factor of the equilibrated matrix + f64 refinement solve."""

    def tree_flatten(self):
        return (self.Hs, self.d, self.F32), (self.refine_iters,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.Hs, obj.d, obj.F32 = children
        obj.refine_iters = aux[0]
        return obj

    def __init__(self, H: BTD, refine_iters: int = 3, gemm_solves: bool = False,
                 factor_opts=None):
        # only the SCALED f64 operator is kept (for refinement residuals);
        # holding the unscaled H as well doubles resident HBM at production
        # sizes (~3 GB per copy for Burgers N_x=1000)
        self.Hs, self.d = equilibrate(H)
        Hs32 = BTD(
            self.Hs.diag.astype(jnp.float32),
            self.Hs.lower.astype(jnp.float32),
            self.Hs.n,
        )
        self.F32 = btd_cholesky(Hs32, **(factor_opts or {}))
        if gemm_solves:
            from diffeqgmrfs_tpu.ops.inverse_solver import BTDInverseSolver

            self.F32 = BTDInverseSolver.from_factor(self.F32)
        self.refine_iters = refine_iters

    def _solve_scaled(self, b):
        """Solve H~ y = b via the f32 factor (computed in f32, cast back)."""
        y = self.F32.solve(b.astype(jnp.float32))
        return y.astype(b.dtype)

    def solve(self, b):
        """Solve H x = b with f64 refinement. Returns (x, rel_residual)."""
        b = jnp.asarray(b)
        bs = b * (1.0 / self.d)  # scaled rhs: H~ y = D^{-1/2} b, x = D^{-1/2} y
        y = self._solve_scaled(bs)
        for _ in range(self.refine_iters):
            r = bs - self.Hs.matvec(y)
            y = y + self._solve_scaled(r)
        rel = jnp.linalg.norm(bs - self.Hs.matvec(y)) / (jnp.linalg.norm(bs) + 1e-300)
        return y * (1.0 / self.d), rel


def solve_mixed_precision(H: BTD, b, refine_iters: int = 3):
    """One-shot mixed-precision solve (see RefinedFactor)."""
    return RefinedFactor(H, refine_iters).solve(b)


class MatFreeRefinedFactor:
    """Mixed-precision factor of H = Q + tau J^T J that never materializes
    H in f64.

    Production Newton systems (Burgers N_x=1000: ~3.3 GB per f64 BTD copy)
    OOM a 16 GB v5e when Q, H, and the scaled H coexist. Here only the f32
    equilibrated factor is materialized:

      diag(H) = diag(Q) + tau * colsum over merged slots  (f64, vectors only)
      H~32    = cast_f32( D^-1/2 Q D^-1/2 + scatter64(scaled J products) )
      residuals for refinement apply H in OPERATOR form:
          H t = Q t + tau J^T (J t)

    The scaled system is *assembled* in f64 (f32 scatter accumulation loses
    digits to cancellation and degrades the refinement contraction by ~10x)
    but only its f32 cast stays resident — the f64 intermediates are
    transient and freed by XLA after the cast.

    `jtj_scaled(vals64) -> BTD(f64)` abstracts the scatter/window path
    applied to pre-scaled Jacobian values.
    """

    def __init__(self, Q: BTD, Jc, tau, jtj_scaled, refine_iters: int = 3,
                 factor_opts=None):
        self.Q = Q
        self.Jc = Jc
        self.tau = tau
        self.refine_iters = refine_iters
        # f64 diagonal of H: diag(J^T J)_j = sum_r (sum_{slots of col j} v)^2
        # (duplicate column slots merged per row — rowop_col_sumsq).
        diagH = Q.diagonal() + tau * rowop_col_sumsq(Jc, Q.n)
        self.d = jnp.sqrt(diagH)
        dinv = 1.0 / self.d
        # scaled system assembled in f64 (accumulated into the scaled-Q
        # buffer to avoid a second full-size BTD), only the f32 cast resident
        Qs, _ = _scale_btd(Q, dinv)
        Jv_scaled = Jc.vals * dinv[Jc.cols] * jnp.sqrt(tau)
        try:
            Hs = jtj_scaled(Jv_scaled, init=Qs)
        except TypeError:  # callback without init support
            Hs = Qs + jtj_scaled(Jv_scaled)
        H32 = BTD(
            Hs.diag.astype(jnp.float32), Hs.lower.astype(jnp.float32), Hs.n
        )
        H32 = _unit_pad(H32)
        self.F32 = btd_cholesky(H32, **(factor_opts or {}))

    def _apply_H(self, t):
        """H t = Q t + tau J^T (J t), f64."""
        return self.Q.matvec(t) + self.tau * self.Jc.rmatvec(self.Jc.matvec(t))

    def _apply_Hs(self, y):
        return self._apply_H(y / self.d) / self.d

    def _solve32(self, b):
        return self.F32.solve(b.astype(jnp.float32)).astype(self.Q.dtype)

    def solve(self, b):
        b = jnp.asarray(b)
        bs = b / self.d
        y = self._solve32(bs)
        for _ in range(self.refine_iters):
            y = y + self._solve32(bs - self._apply_Hs(y))
        return y / self.d

    def matvec_H(self, x):
        return self._apply_H(x)


def rowop_col_sumsq(A, n):
    """diag(A^T A) with duplicate (row, col) slots merged before squaring.

    Rows of stacked operators may carry the same column in several slots;
    sum-then-square per (row, col) is required for the true diagonal."""
    import numpy as np_

    cols_np = np_.asarray(A.cols)
    n_rows, K = cols_np.shape
    keys = (
        np_.repeat(np_.arange(n_rows, dtype=np_.int64), K) * n
        + cols_np.reshape(-1).astype(np_.int64)
    )
    uniq, inv = np_.unique(keys, return_inverse=True)
    merged_col = (uniq % n).astype(np_.int32)
    merged = jnp.zeros(len(uniq), dtype=A.vals.dtype).at[inv].add(
        A.vals.reshape(-1)
    )
    return jnp.zeros(n, dtype=A.vals.dtype).at[merged_col].add(merged**2)


@jax.tree_util.register_pytree_node_class
class SymSumOp:
    """H = Q + tau A^T A in pure operator form (f64 action, no BTD storage).

    The posterior precision of a conditioned `CompactGMRF`: `Q` is the
    prior precision as a symmetric padded-row (ELL) RowOp, `A` the
    observation RowOp. Provides the duck-typed surface GMRF queries use of
    a precision (`matvec`, `diagonal`, `n`, `nnz`)."""

    def __init__(self, Q, A, tau, diag_Q=None, a_plan=None):
        self.Q = Q
        self.A = A
        self.tau = tau
        # optional ATAWindowPlan with a transpose ELL: A^T r as a pure
        # gather instead of a scatter-add (TPU scatters serialize —
        # ~5x on the refinement residuals at Darcy N300)
        self.a_plan = (
            a_plan if a_plan is not None and
            getattr(a_plan, "t_rows", None) is not None else None
        )
        if diag_Q is None:  # slots with cols[r,k] == r hold the diagonal
            import numpy as np_

            mask = np_.asarray(Q.cols) == np_.arange(Q.n_cols)[:, None]
            diag_Q = jnp.sum(Q.vals * jnp.asarray(mask, dtype=Q.vals.dtype), axis=1)
        self.diag_Q = diag_Q

    def tree_flatten(self):
        return (self.Q, self.A, self.tau, self.diag_Q, self.a_plan), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.Q, obj.A, obj.tau, obj.diag_Q, obj.a_plan = children
        return obj

    @property
    def n(self):
        return self.Q.n_cols

    @property
    def dtype(self):
        return self.Q.vals.dtype

    def matvec(self, x):
        r = self.A.matvec(x)
        if self.a_plan is not None:
            at_r = self.a_plan.rmatvec(self.A.vals, r)
        else:
            at_r = self.A.rmatvec(r)
        return self.Q.matvec(x) + self.tau * at_r

    def diagonal(self):
        return self.diag_Q + self.tau * rowop_col_sumsq(self.A, self.n)

    def nnz(self) -> int:
        return int(self.Q.vals.size + self.A.vals.size)


@jax.tree_util.register_pytree_node_class
class MatFreeConditionFactor:
    """Mixed-precision factor of H = Q + tau A^T A keeping only the f32
    equilibrated BTD factor + compact operators resident.

    The production-scale conditioning path (Darcy N_xy=300: the f64 BTD of
    H alone is ~11 GB; here resident HBM is the f32 factor (~3.7 GB) plus
    ~0.5 GB of ELL operators):

      d        = sqrt(diag Q (f64 vector) + tau colsumsq(A))
      H~32     = scale(Q32_btd, 1/d) + scatter((sqrt(tau)/d ∘ A)^T (..))    [f32]
      F32      = btd_cholesky(H~32)
      solve    : f64 iterative refinement, residuals through the OPERATOR
                 H x = Q x + tau A^T (A x)  (ELL gathers, never materialized)

    Same drop-in surface as MixedPrecisionFactor."""

    def tree_flatten(self):
        return (self.H_op, self.d, self.F32), (self.refine_iters, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.H_op, obj.d, obj.F32 = children
        obj.refine_iters, obj.n = aux
        return obj

    def __init__(
        self,
        Q32: BTD,
        H_op: SymSumOp,
        pattern,
        refine_iters: int = 3,
        gemm_solves: bool = False,
        packed_q_idx=None,
        factor_dtype: str = "f32",
        factor_opts=None,
    ):
        self.H_op = H_op
        self.n = Q32.n
        self.refine_iters = refine_iters
        fdt = jnp.float64 if factor_dtype == "f64" else jnp.float32
        if getattr(pattern, "colsq_inv", None) is not None:
            # host-precomputed merge plan: works when A.cols are traced
            diagH = H_op.diag_Q + H_op.tau * pattern.colsq(H_op.A.vals)
        else:
            diagH = H_op.diagonal()  # f64
        self.d = jnp.sqrt(diagH)
        dinv = 1.0 / self.d
        A_scaled = H_op.A.scale(jnp.sqrt(H_op.tau).astype(jnp.float64))
        Av32 = (A_scaled.vals * dinv[jnp.asarray(H_op.A.cols)]).astype(fdt)
        if packed_q_idx is not None:
            # PACKED production path: Q never exists as a device BTD.
            # Scale the ELL values per entry (dinv_i dinv_j), scatter into
            # packed banded-block storage, window-accumulate tau A^T A,
            # factor packed (half the HBM of the full-block path).
            if not hasattr(pattern, "local_cols"):
                raise ValueError(
                    "packed conditioning requires an ATAWindowPlan pattern"
                )
            from diffeqgmrfs_tpu.ops.packed import (
                packed_scatter,
                ata_packed_windows,
                packed_cholesky,
            )

            Q = H_op.Q
            Qv32 = (Q.vals * dinv[:, None] * dinv[jnp.asarray(Q.cols)]).astype(fdt)
            Hp = packed_scatter(
                packed_q_idx, Qv32, Q32.n, Q32.N, Q32.bs, dtype=fdt
            )
            Hp = ata_packed_windows(pattern, Av32, Hp)
            self.F32 = packed_cholesky(Hp.add_identity_padding())
            return
        dinv32 = dinv.astype(fdt)
        Qs32, _ = _scale_btd(
            Q32 if Q32.dtype == fdt else BTD(
                Q32.diag.astype(fdt), Q32.lower.astype(fdt), Q32.n
            ),
            dinv32,
        )
        if hasattr(pattern, "local_cols"):  # ATAWindowPlan: scatter-free GEMMs
            from diffeqgmrfs_tpu.ops.ata_windows import ata_btd_windows

            H32 = ata_btd_windows(pattern, Av32, dtype=fdt, init=Qs32)
        else:
            from diffeqgmrfs_tpu.fem.operators import RowOp

            A32 = RowOp(H_op.A.cols, Av32, Q32.n)
            H32 = Qs32 + pattern.scatter(A32.ata_values())
        H32 = _unit_pad(H32)
        # factor_opts only applies to the f32 MXU factor (an f64 factor is
        # already the slow fallback; keep it on the plain substitution path)
        self.F32 = btd_cholesky(
            H32, **((factor_opts or {}) if fdt == jnp.float32 else {})
        )
        if gemm_solves:
            from diffeqgmrfs_tpu.ops.inverse_solver import BTDInverseSolver

            self.F32 = BTDInverseSolver.from_factor(self.F32)

    @property
    def dtype(self):
        return self.H_op.dtype

    def _apply_Hs(self, y):
        return self.H_op.matvec(y / self.d) / self.d

    def _solve32(self, b):
        return self.F32.solve(b.astype(self.F32.dtype)).astype(self.dtype)

    def solve(self, b):
        b = jnp.asarray(b)
        bs = b / self.d
        y = self._solve32(bs)
        n_ref = 0 if self.F32.dtype == jnp.float64 else self.refine_iters
        for _ in range(n_ref):
            y = y + self._solve32(bs - self._apply_Hs(y))
        return y / self.d

    def backward_solve(self, b):
        y = self.F32.backward_solve(jnp.asarray(b).astype(self.F32.dtype))
        return y.astype(self.dtype) * (1.0 / self.d)

    def sample_zero_mean(self, key, n_samples: int = 1):
        y = self.F32.sample_zero_mean(key, n_samples).astype(self.dtype)
        return y * (1.0 / self.d)[None, :]

    def variance_diag(self):
        if hasattr(self.F32, "variance_diag"):  # PackedBTDCholesky
            v = self.F32.variance_diag().astype(self.dtype)
        else:
            from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag

            v = takahashi_diag(self.F32).astype(self.dtype)
        return v / (self.d**2)

    def log_det(self):
        return self.F32.log_det().astype(self.dtype) + 2.0 * jnp.sum(
            jnp.log(self.d)
        )

    def nnz(self) -> int:
        return self.F32.nnz()


def srif_condition_scale(H_op, a_plan):
    """Equilibration scale d = sqrt(diag(H)) for the SRIF conditioning
    stack — the single definition shared by SRIFConditionFactor and
    external (chunked / host-orchestrated) factor builders, so a
    `prefactored` factor's col_scale (1/d) matches the solve surface's."""
    if getattr(a_plan, "colsq_inv", None) is not None:
        diagH = H_op.diag_Q + H_op.tau * a_plan.colsq(H_op.A.vals)
    else:
        diagH = H_op.diagonal()
    return jnp.sqrt(diagH)


@jax.tree_util.register_pytree_node_class
class SRIFConditionFactor(MatFreeConditionFactor):
    """Square-root-information factor of H = Q + tau A^T A: windowed QR of
    the stacked [Λ_Q; sqrt(tau) A] (ops/srif.py), never forming H.

    The f32 factor error scales with sqrt(cond(H)) instead of cond(H), so
    the f32 MXU path stays valid through the Darcy production regime
    (cond(H~) ~ N_xy^4 ~ 1e10 at N_xy=300) where direct f32 Cholesky breaks
    down and the reference would lean on f64 CHOLMOD
    (`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:167-170`).
    Downstream surface (solve/refine, sampling, Takahashi variances,
    log-det) is inherited from MatFreeConditionFactor — the packed factor
    R^T is a drop-in PackedBTDCholesky. `lam_plan` is the window plan for
    the sqrt operand, built host-side at prior construction (values may be
    tracers here).
    """

    def __init__(self, H_op: SymSumOp, a_plan, sqrt_op, lam_plan, n, N, bs,
                 refine_iters: int = 4, chunk="auto",
                 matmul_precision: str = "float32", qr_impl: str = "xla",
                 gemm_solves: bool = False, prior_R=None, prior_cs0=None,
                 prefactored=None):
        from diffeqgmrfs_tpu.ops.srif import srif_packed_qr

        self.H_op = H_op
        self.n = n
        self.refine_iters = refine_iters
        self.d = srif_condition_scale(H_op, a_plan)
        Av = H_op.A.vals * jnp.sqrt(H_op.tau)
        cs = 1.0 / self.d
        if prefactored is not None:
            # factor built outside (host-orchestrated chunked sweep,
            # ops/srif.srif_packed_qr_chunked) with col_scale == 1/d from
            # srif_condition_scale on the SAME (H_op, a_plan) — only the
            # solve/refine/posterior surface is constructed here
            self.F32 = prefactored
        elif prior_R is not None:
            # SRIF measurement-update form: the instance-independent prior
            # rows were pre-reduced once into R_Λ = qr(Λ·diag(cs0)); stack
            # only [R_Λ·(cs/cs0); sqrt(tau) A] here (~2x fewer QR flops
            # when Λ dominates the row count — ops/srif.py prior_factor)
            self.F32 = srif_packed_qr(
                [(a_plan, Av)],
                n, N, bs, dtype=jnp.float32, col_scale=cs,
                chunk_rows=None if chunk == "off" else chunk,
                matmul_precision=matmul_precision,
                qr_impl=qr_impl,
                prior_factor=prior_R,
                prior_rescale=cs.astype(jnp.float32)
                / jnp.asarray(prior_cs0, jnp.float32),
            )
        else:
            self.F32 = srif_packed_qr(
                [(lam_plan, sqrt_op.vals), (a_plan, Av)],
                n, N, bs, dtype=jnp.float32, col_scale=cs,
                chunk_rows=None if chunk == "off" else chunk,
                matmul_precision=matmul_precision,
                qr_impl=qr_impl,
            )
        if gemm_solves:
            # in-place GEMM-form solves (zero extra HBM); banded packing
            # only — the full-offdiag variant has RFullInverseSolver
            from diffeqgmrfs_tpu.ops.packed import (
                PackedBTDRFactor,
                PackedRInverseSolver,
            )

            if type(self.F32) is PackedBTDRFactor:
                self.F32 = PackedRInverseSolver.from_factor(self.F32)


def _scale_btd(H: BTD, dinv):
    db = H.pad_vec(dinv)
    pad_mask = H.pad_vec(jnp.ones_like(dinv))
    db = db + (1.0 - pad_mask)
    diag = H.diag * db[:, :, None] * db[:, None, :]
    lower = H.lower * db[1:, :, None] * db[:-1, None, :] if H.N > 1 else H.lower
    return BTD(diag, lower, H.n), db


def _unit_pad(H32: BTD) -> BTD:
    return H32.add_identity_padding()


@jax.tree_util.register_pytree_node_class
class MixedPrecisionFactor:
    """Drop-in factor with the BTDCholesky surface, backed by the f32 factor
    of the equilibrated matrix.

    * `solve` refines to ~f64 accuracy (mean solves),
    * `sample_zero_mean` / `variance_diag` / `log_det` run on the f32 factor
      directly (statistical quantities; f32 is ample) with the diagonal
      scaling undone: H = D^{1/2} H~ D^{1/2} implies
      H^{-1} = D^{-1/2} H~^{-1} D^{-1/2} and
      log det H = log det H~ + sum log d^2.
    """

    def tree_flatten(self):
        return (self._rf,), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._rf = children[0]
        obj.n = aux[0]
        return obj

    def __init__(self, H: BTD, refine_iters: int = 3, gemm_solves: bool = False,
                 factor_opts=None):
        self._rf = RefinedFactor(H, refine_iters, gemm_solves=gemm_solves,
                                 factor_opts=factor_opts)
        self.n = H.n

    @property
    def dtype(self):
        return self._rf.Hs.dtype

    def solve(self, b):
        x, _ = self._rf.solve(b)
        return x

    def backward_solve(self, b):
        """L~^{-T} on the scaled system, mapped back: used for sampling."""
        y = self._rf.F32.backward_solve(jnp.asarray(b).astype(jnp.float32))
        return y.astype(self.dtype) * (1.0 / self._rf.d)

    def sample_zero_mean(self, key, n_samples: int = 1):
        y = self._rf.F32.sample_zero_mean(key, n_samples).astype(self.dtype)
        return y * (1.0 / self._rf.d)[None, :]

    def variance_diag(self):
        from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag

        v = takahashi_diag(self._rf.F32).astype(self.dtype)
        return v / (self._rf.d**2)

    def log_det(self):
        return self._rf.F32.log_det().astype(self.dtype) + 2.0 * jnp.sum(
            jnp.log(self._rf.d)
        )

    def nnz(self) -> int:
        return self._rf.F32.nnz()


class SRIFNewtonFactor:
    """Square-root Newton-system factor: windowed QR of the stacked
    [sqrt-ops of Q; sqrt(tau) J] (ops/srif.py) — the Gauss-Newton analog of
    SRIFConditionFactor, f32-valid at cond(H) up to ~1e14 (elliptic Chen24
    N=100, `_research/elliptic_chen24.jl`, where the equilibrated f32
    Cholesky goes indefinite — RESULTS.md).

    `sqrt_ops`: list of (window plan, values) whose stacked rows S_Q satisfy
    S_Q^T S_Q = Q — e.g. [(lam_plan, lam_vals)] for a Matérn prior, plus
    (obs_plan, sqrt(tau_b) * A_b.vals) when the GN prior is itself a
    conditioned posterior. `j_plan` doubles as J's SRIF row plan (the same
    ATAWindowPlan the Gram path uses). Refinement residuals apply H in
    operator form: H t = Q t + tau J^T (J t) via the f64 ELL prior.
    """

    def __init__(self, q_ell, q_diag, sqrt_ops, j_plan, Jc, tau,
                 n, N, bs, refine_iters: int = 4, chunk="auto",
                 qr_impl: str = "xla", prior_R=None, prior_cs0=None,
                 sub_dtype: str = "cond", qr_dtype: str = "f32",
                 solve_method: str = "refine", pcg_iters: int = 32):
        from diffeqgmrfs_tpu.ops.srif import srif_packed_qr

        self.q_ell = q_ell
        self.sub_dtype = sub_dtype
        self.Jc = Jc
        self.tau = tau
        self.refine_iters = refine_iters
        self.solve_method = solve_method
        self.pcg_iters = pcg_iters
        # transpose ELL of J when the window plan carries one: J^T r as a
        # pure gather instead of a scatter-add. TPU scatters serialize —
        # probe_resolve measured 430 ms scatter vs 89 ms gather at Darcy
        # N300 shapes, and _apply_H fires EVERY PCG/refinement iteration
        # (96x per Newton step on the flagship f64-Krylov path).
        self.j_tplan = (
            j_plan
            if getattr(j_plan, "t_rows", None) is not None
            else None
        )
        if getattr(j_plan, "colsq_inv", None) is not None:
            diagH = q_diag + tau * j_plan.colsq(Jc.vals)
        else:
            diagH = q_diag + tau * rowop_col_sumsq(Jc, n)
        self.d = jnp.sqrt(diagH)
        cs = 1.0 / self.d
        if qr_dtype == "f64":
            # exact-direction arm: windows QR in (TPU-emulated, ~47x) f64,
            # for systems beyond even the sqrt-factor's f32 validity
            # (cond(H) > ~1e14 — the flagship N800x100 fine-dt ST Newton
            # systems where f32 directions are garbage and the alpha=0
            # damping safeguard pins GN at its warm start). The f32
            # prefactor (prior_R) is bypassed — the full stack is reduced
            # each step so no f32 error enters the factor.
            ops = list(sqrt_ops) + [(j_plan, Jc.vals * jnp.sqrt(tau))]
            self.F32 = srif_packed_qr(
                ops, n, N, bs, dtype=jnp.float64, col_scale=cs,
                chunk_rows=None if chunk == "off" else chunk,
                qr_impl=qr_impl,
            ).clamp_diag()
            self.sub_dtype = "f64"
        elif prior_R is not None:
            # measurement-update form: the prior rows S_Q are Newton-step
            # invariant — pre-reduced ONCE (gauss_newton_solve hoists the
            # stage-1 QR out of the while_loop); each step QRs only
            # [R_Q·(cs/cs0); sqrt(tau) J]
            self.F32 = srif_packed_qr(
                [(j_plan, Jc.vals * jnp.sqrt(tau))],
                n, N, bs, dtype=jnp.float32, col_scale=cs,
                chunk_rows=None if chunk == "off" else chunk,
                qr_impl=qr_impl,
                prior_factor=prior_R,
                prior_rescale=cs.astype(jnp.float32)
                / jnp.asarray(prior_cs0, jnp.float32),
            ).clamp_diag()
        else:
            ops = list(sqrt_ops) + [(j_plan, Jc.vals * jnp.sqrt(tau))]
            self.F32 = srif_packed_qr(
                ops, n, N, bs, dtype=jnp.float32, col_scale=cs,
                chunk_rows=None if chunk == "off" else chunk,
                qr_impl=qr_impl,
            ).clamp_diag()

    def _apply_H(self, t):
        r = self.Jc.matvec(t)
        if self.j_tplan is not None:
            jt_r = self.j_tplan.rmatvec(self.Jc.vals, r)
        else:
            jt_r = self.Jc.rmatvec(r)
        return self.q_ell.matvec(t) + self.tau * jt_r

    def matvec_H(self, x):
        return self._apply_H(x)

    def _apply_Hs(self, y):
        return self._apply_H(y / self.d) / self.d

    def _solve32(self, b):
        """Substitution dtype policy (`sub_dtype`):

        - 'f32': cast rhs, sweep in f32 (fastest; overflows to NaN on TPU
          at cond(R) ~ 1e8 — the N800 x 100 fine-dt ST systems).
        - 'f64': sweep in the rhs dtype. Flop count is O(N bs^2) but TPU
          f64 triangular solves are EMULATED — measured 2.5-4.3x per-step
          regressions (chen24 N1000 155 -> 383 s, elliptic N100 13 -> 56 s)
          when this ran unconditionally.
        - 'cond' (default): f32 sweep, with an XLA conditional f64 re-sweep
          ONLY when the f32 result is non-finite. Unbatched programs pay
          f32 cost on the healthy path; under vmap lax.cond degrades to
          both-branch execution — batched drivers that know their range
          should pass 'f32'."""
        if self.sub_dtype == "f64" or b.dtype == jnp.float32:
            return self.F32.solve(b)
        y32 = self.F32.solve(b.astype(jnp.float32)).astype(b.dtype)
        if self.sub_dtype == "f32":
            return y32
        from jax import lax

        return lax.cond(
            jnp.all(jnp.isfinite(y32)),
            lambda: y32,
            lambda: self.F32.solve(b),
        )

    def solve(self, b):
        """Monotone (safeguarded) refinement: a correction is kept only if
        it reduces the true residual. Beyond the sqrt-factor's f32 range
        (fine-dt ST systems at N_x >= 800 x N_t = 100, RESULTS.md round 2)
        plain refinement DIVERGES at ~2x/iter; the safeguard pins the
        solve at first-solve quality instead of amplifying to NaN.

        solve_method="pcg" upgrades the Richardson refinement to
        preconditioned CG on the equilibrated system (preconditioner
        M = R32^T R32, applied via the same two triangular sweeps):
        Richardson diverges whenever rho(I - M^{-1}Hs) > 1, i.e. the f32
        factor is beyond its validity, but M^{-1}Hs stays SPD-similar, so
        CG still converges at the sqrt(cond(M^{-1}Hs)) Krylov rate — the
        garbage-direction fix for the flagship N800x100 systems. Breakdown
        (non-finite or non-positive curvature) is guarded; the iterate
        with the best true residual is returned."""
        b = jnp.asarray(b)
        bs_ = b / self.d
        if self.solve_method == "pcg":
            # Krylov arithmetic in f64 REGARDLESS of the pipeline dtype:
            # on the fully-f32 stepwise path a f32 rhs would (a) run the
            # recurrences at an eps32*cond(Hs) direction floor and (b) keep
            # _solve32's sub_dtype='cond' overflow rescue from ever firing,
            # so at flagship conditioning (f32 sweeps overflow, refine.py
            # _solve32 note) the preconditioner silently degraded to z:=r —
            # unpreconditioned f32 CG (queue M flagship_pcg, rel_err ~1.0).
            # The matvecs/sweeps here are O(N bs^2) — trivial next to the
            # per-step windowed QR even with TPU-emulated f64.
            bs64 = bs_.astype(jnp.float64)
            y64 = self._solve32(bs64)
            return (self._solve_pcg(bs64, y64) / self.d).astype(b.dtype)
        y = self._solve32(bs_)
        r = bs_ - self._apply_Hs(y)
        rn = jnp.linalg.norm(r)
        for _ in range(self.refine_iters):
            y_new = y + self._solve32(r)
            r_new = bs_ - self._apply_Hs(y_new)
            rn_new = jnp.linalg.norm(r_new)
            keep = jnp.isfinite(rn_new) & (rn_new < rn)
            y = jnp.where(keep, y_new, y)
            r = jnp.where(keep, r_new, r)
            rn = jnp.where(keep, rn_new, rn)
        return y / self.d

    def _solve_pcg(self, bs_, y0):
        """PCG on Hs y = bs_ from the first-sweep iterate y0, preconditioned
        by the f32 factor. Fixed-trip lax.fori_loop (constant program size);
        all Krylov arithmetic in the rhs dtype (f64 on the production path),
        preconditioner applications through the f32 sweeps."""
        from jax import lax

        def finite(v, alt):
            return jnp.where(jnp.isfinite(v), v, alt)

        y0 = jnp.where(jnp.isfinite(y0), y0, jnp.zeros_like(y0))
        r0 = bs_ - self._apply_Hs(y0)
        z0 = self._solve32(r0)
        z0 = jnp.where(jnp.isfinite(z0), z0, r0)
        rz0 = jnp.vdot(r0, z0)
        rn0 = jnp.linalg.norm(r0)

        def body(_, carry):
            y, r, p, rz, best_y, best_rn = carry
            Ap = self._apply_Hs(p)
            pAp = jnp.vdot(p, Ap)
            ok = jnp.isfinite(pAp) & (pAp > 0.0)
            alpha = jnp.where(ok, rz / pAp, 0.0)
            alpha = finite(alpha, 0.0)
            y = y + alpha * p
            r = r - alpha * Ap
            rn = jnp.linalg.norm(r)
            better = jnp.isfinite(rn) & (rn < best_rn)
            best_y = jnp.where(better, y, best_y)
            best_rn = jnp.where(better, rn, best_rn)
            z = self._solve32(r)
            z = jnp.where(jnp.isfinite(z), z, r)
            rz_new = jnp.vdot(r, z)
            beta = jnp.where(
                jnp.isfinite(rz_new) & (jnp.abs(rz) > 0.0), rz_new / rz, 0.0
            )
            beta = finite(beta, 0.0)
            p = z + beta * p
            rz = finite(rz_new, rz)
            return (y, r, p, rz, best_y, best_rn)

        init = (y0, r0, z0, rz0, y0, finite(rn0, jnp.inf))
        out = lax.fori_loop(0, self.pcg_iters, body, init)
        return out[4]

    # -- posterior-factor surface (drop-in for GMRF.factor) ------------------
    # H = D^{1/2} H~ D^{1/2} => H^{-1} = D^{-1/2} H~^{-1} D^{-1/2},
    # log det H = log det H~ + sum log d^2; statistical quantities ride the
    # f32 packed R factor directly (same as MatFreeConditionFactor).

    @property
    def dtype(self):
        return self.d.dtype

    def variance_diag(self):
        """Marginal variances with the `sub_dtype` overflow policy of
        `_solve32`: the f32 Takahashi recursion OVERFLOWS on clamped
        beyond-f32-validity factors (diag floored at 2e-7 rel -> inverse
        entries ~5e6 -> Sigma products past f32 max within a few blocks
        — the flagship N800x100 std NaN, RESULTS.md round 2) while the
        f64 recursion of the SAME clamped factor is finite and correct.
        'cond' re-runs in f64 only when the f32 pass is non-finite
        (under vmap lax.cond executes both branches — batched drivers
        in a known-healthy range pass sub_dtype='f32')."""
        from jax import lax

        if self.sub_dtype == "f64":
            v = self.F32.variance_diag(jnp.float64)
        else:
            v32 = self.F32.variance_diag()
            if self.sub_dtype == "f32":
                v = v32
            else:  # 'cond'
                v = lax.cond(
                    jnp.all(jnp.isfinite(v32)),
                    lambda: v32.astype(jnp.float64),
                    lambda: self.F32.variance_diag(jnp.float64),
                )
        return v.astype(self.dtype) / (self.d**2)

    def variance_diag_rescued(self, max_rescue: int = 1024):
        """`variance_diag` plus an EXACT per-column rescue of any entries
        still non-finite after the f64 Takahashi recursion (flagship
        N800x100: 418-651 of 160k entries — VERDICT r2 weak #3/#8).

        The Takahashi recursion overflows because it accumulates CHAINS
        of huge equilibrated inverse entries (Sigma products); a single
        column solve spans them only linearly, so
        v_i = (H~^{-1})_{ii} / d_i^2 via one batched f64 unit-vector
        substitution through the SAME factor is finite where the
        recursion is not — and is exactly the quantity the recursion
        would have produced. `max_rescue` keeps shapes static under jit;
        entries beyond it (never observed) stay non-finite and counted.

        "Bad" includes NON-POSITIVE entries, not just non-finite ones:
        the f64 recursion on a clamped factor can cancel to a finite
        NEGATIVE variance, which passes `isfinite` but NaNs at the
        `sqrt` in `GMRF.std` — the flagship N800x100 rescue no-op
        (queue r5c: n_std_nonfinite still 418-651 with the rescue
        live; the non-finite STDS were sqrt(negative finite VARIANCE),
        so the old `isfinite(v)` predicate never fired)."""
        from jax import lax

        v = self.variance_diag()
        n = self.F32.n

        k = min(max_rescue, n)

        def _is_bad(v):
            return ~jnp.isfinite(v) | (v <= 0)

        def rescue(v):
            bad = _is_bad(v)
            # bad indices first (argsort of the good mask)
            idx = jnp.argsort(jnp.where(bad, 0, 1))[:k]
            E = (
                jnp.zeros((k, n), jnp.float64)
                .at[jnp.arange(k), idx]
                .set(1.0)
            )
            X = self.F32.solve(E)  # f64 substitution through f32 factor
            vr = X[jnp.arange(k), idx].astype(self.dtype) / (
                self.d[idx] ** 2
            )
            return v.at[idx].set(jnp.where(bad[idx], vr, v[idx]))

        return lax.cond(~jnp.any(_is_bad(v)), lambda v: v, rescue, v)

    def sample_zero_mean(self, key, n_samples: int = 1):
        """Posterior samples R^{-1} z with the same overflow policy: the
        f32 backward sweep through a clamped factor can overflow; the
        'cond' rescue re-runs the sweep in f64 (substitution honors the
        rhs dtype) on the SAME white noise."""
        from jax import lax

        n = self.F32.n
        if self.sub_dtype == "f64":
            z = jax.random.normal(key, (n_samples, n), dtype=jnp.float64)
            y = self.F32.backward_solve(z)
        else:
            z = jax.random.normal(key, (n_samples, n), dtype=jnp.float32)
            y32 = self.F32.backward_solve(z)
            if self.sub_dtype == "f32":
                y = y32
            else:  # 'cond'
                y = lax.cond(
                    jnp.all(jnp.isfinite(y32)),
                    lambda: y32.astype(jnp.float64),
                    lambda: self.F32.backward_solve(
                        z.astype(jnp.float64)
                    ),
                )
        return y.astype(self.dtype) * (1.0 / self.d)[None, :]

    def log_det(self):
        return self.F32.log_det().astype(self.dtype) + 2.0 * jnp.sum(
            jnp.log(self.d)
        )

    def nnz(self) -> int:
        return self.F32.nnz()


@jax.tree_util.register_pytree_node_class
class GNPrecisionOp:
    """Posterior precision H = Q + tau J^T J in pure operator form — the
    `precision` slot of a Gauss-Newton posterior GMRF when H is never
    materialized (sqrt/SRIF path). `q_op` is any object with `.matvec`
    (full f64 BTD, ToeplitzBTD, or ELL RowOp); `diag_h` is the
    host-or-trace-computed diagonal of H (the SRIF factor's d^2)."""

    def __init__(self, q_op, Jc, tau, diag_h, n):
        self.q_op = q_op
        self.Jc = Jc
        self.tau = tau
        self.diag_h = diag_h
        self.n = n

    def tree_flatten(self):
        return (self.q_op, self.Jc, self.tau, self.diag_h), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.q_op, obj.Jc, obj.tau, obj.diag_h = children
        obj.n = aux[0]
        return obj

    @property
    def dtype(self):
        return self.diag_h.dtype

    def matvec(self, x):
        return self.q_op.matvec(x) + self.tau * self.Jc.rmatvec(
            self.Jc.matvec(x)
        )

    def diagonal(self):
        return self.diag_h

    def nnz(self) -> int:
        q_nnz = self.q_op.nnz() if hasattr(self.q_op, "nnz") else 0
        return int(q_nnz + self.Jc.vals.size)


class ToeplitzMatFreeFactor:
    """Mixed-precision Newton-system factor for constant-mesh ST priors
    held in DISTINCT-BLOCK (Toeplitz) form (ops/btd.ToeplitzBTD).

    The GN while-loop body then carries only ~4 spatial blocks of the f64
    prior instead of the full [N_t, bs, bs] BTD — at Burgers N_x=800 x 100
    steps the f64 BTD path ballooned to 43 GB of loop copies (XLA x64
    hi/lo pair emulation x while-loop copy insertion); here the resident
    f64 state is ~85 MB and the only [N_t, bs, bs] buffers are the f32
    scaled system and its factor.

        diag(H) = diag_toeplitz(Q) + tau * colsumsq(J)       (f64 vectors)
        H32     = Q.scaled_btd(1/d, f32) + scatter32(scaled J products)
        refinement residuals: H t = Q.matvec(t) + tau J^T (J t)
                              (Toeplitz matvec: 4 shared-block GEMMs)
    """

    def __init__(self, q_top, Jc, tau, jtj_scaled32, refine_iters: int = 5,
                 factor_opts=None):
        self.q_top = q_top
        self.Jc = Jc
        self.tau = tau
        self.refine_iters = refine_iters
        diagH = q_top.diagonal() + tau * rowop_col_sumsq(Jc, q_top.n)
        self.d = jnp.sqrt(diagH)
        dinv = 1.0 / self.d
        # scale in f64, cast to f32 (f32 accumulation loses PD-ness to
        # cancellation — observed NaN factors at Burgers N_x>=200 x 100;
        # the f64 buffer is a TRANSIENT, not carried across the loop)
        Qs = q_top.scaled_btd(dinv, dtype=q_top.dtype)
        Qs32 = BTD(
            Qs.diag.astype(jnp.float32), Qs.lower.astype(jnp.float32), Qs.n
        )
        Jv32 = (Jc.vals * dinv[jnp.asarray(Jc.cols)] * jnp.sqrt(tau)).astype(
            jnp.float32
        )
        H32 = jtj_scaled32(Jv32, init=Qs32)
        self.F32 = btd_cholesky(H32, **(factor_opts or {}))

    def _apply_H(self, t):
        return self.q_top.matvec(t) + self.tau * self.Jc.rmatvec(
            self.Jc.matvec(t)
        )

    def matvec_H(self, x):
        return self._apply_H(x)

    def _apply_Hs(self, y):
        return self._apply_H(y / self.d) / self.d

    def _solve32(self, b):
        return self.F32.solve(b.astype(jnp.float32)).astype(b.dtype)

    def solve(self, b):
        b = jnp.asarray(b)
        bs_ = b / self.d
        y = self._solve32(bs_)
        for _ in range(self.refine_iters):
            y = y + self._solve32(bs_ - self._apply_Hs(y))
        return y / self.d


class EllMatFreeFactor:
    """Mixed-precision Newton-system factor with the prior precision held
    ONLY as a compact f64 ELL operator (RowOp) — no f64 BTD is resident.

    The f64 BTD of a production ST prior is ~3.4 GB, which XLA's TPU x64
    emulation stores as f32 hi/lo pairs and then COPIES around while-loop
    boundaries — observed 31.5 GB peak for the chen24 Burgers N_x=1000
    Gauss-Newton body. Here the f32 scaled system is scattered directly
    from the ELL values (q_pattern: BTDPattern over the ELL structure) and
    the f64 action for refinement residuals is ELL-gather + J products:

        H t = Q t + tau J^T (J t)

    Peak per step: two f32 BTD buffers (scaled system + factor).
    """

    def __init__(
        self,
        q_ell,
        q_diag,
        q_pattern,
        Jc,
        tau,
        jtj_scaled32,
        refine_iters: int = 5,
        q_coo=None,
        factor_opts=None,
    ):
        self.q_ell = q_ell
        self.Jc = Jc
        self.tau = tau
        self.refine_iters = refine_iters
        n = q_pattern.n
        diagH = q_diag + tau * rowop_col_sumsq(Jc, n)
        self.d = jnp.sqrt(diagH)
        dinv = 1.0 / self.d
        if q_coo is not None:
            # scatter in the pattern's (CSR COO) entry order — the padded
            # ELL order does not match the pattern's nnz layout
            q_rows, q_cols, q_vals = q_coo
            Qv32 = (
                q_vals * dinv[jnp.asarray(q_rows)] * dinv[jnp.asarray(q_cols)]
            ).astype(jnp.float32)
        else:
            Qv32 = (
                q_ell.vals * dinv[:, None] * dinv[jnp.asarray(q_ell.cols)]
            ).astype(jnp.float32)
        Qs32 = q_pattern.scatter(Qv32)
        Jv32 = (Jc.vals * dinv[jnp.asarray(Jc.cols)] * jnp.sqrt(tau)).astype(
            jnp.float32
        )
        H32 = jtj_scaled32(Jv32, init=Qs32)
        H32 = _unit_pad(H32)
        self.F32 = btd_cholesky(H32, **(factor_opts or {}))

    def _apply_H(self, t):
        return self.q_ell.matvec(t) + self.tau * self.Jc.rmatvec(
            self.Jc.matvec(t)
        )

    def matvec_H(self, x):
        return self._apply_H(x)

    def _apply_Hs(self, y):
        return self._apply_H(y / self.d) / self.d

    def _solve32(self, b):
        return self.F32.solve(b.astype(jnp.float32)).astype(b.dtype)

    def solve(self, b):
        b = jnp.asarray(b)
        bs = b / self.d
        y = self._solve32(bs)
        for _ in range(self.refine_iters):
            y = y + self._solve32(bs - self._apply_Hs(y))
        return y / self.d
