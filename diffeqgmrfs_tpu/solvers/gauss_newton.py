"""Gauss-Newton MAP optimization for nonlinear PDE residuals.

Analog of the reference engine's `GaussNewtonOptimizer(μ_prior, Q_prior,
f_and_J, noise, y, x0; solver_bp=, stopping_criterion=)` + `optimize`
(SURVEY.md §2.3; call sites `/root/reference/scripts/burgers/
solve_burgers_gmrf-fem.jl:172-183`, `_research/elliptic_chen24.jl:148-161`,
hand-rolled equivalent `scripts/solve_burger.jl:143-180`). The iteration
maximizes the Gaussian posterior with linearized residual f(x) ~ y:

    H_k     = Q + tau * J_k^T J_k
    x_{k+1} = H_k^{-1} ( Q mu_prior + tau * J_k^T (J_k x_k - (f(x_k) - y)) )

TPU-first: the loop is a `lax.while_loop` whose body re-assembles the
Jacobian values into a *fixed* BTD sparsity (the reference re-factorizes with
a fixed CHOLMOD permutation per step, `GNCholeskySolverBlueprint(p)`;
here the fixed structure is the static scatter pattern) and runs one blocked
Cholesky sweep — so an entire Gauss-Newton solve jit-compiles into a single
XLA program and vmaps over dataset instances.

Stopping criteria compose like the reference's
(`OrCriterion([NewtonDecrementCriterion(1e-5), StepNumberCriterion(10)])`,
`_research/elliptic_chen24.jl:156-159`). The Newton decrement is
sqrt(dx^T H dx).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.btd import BTD
from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky
from diffeqgmrfs_tpu.fem.operators import RowOp
from diffeqgmrfs_tpu.solvers.blueprints import GNCholeskySolverBlueprint


# -- stopping criteria -------------------------------------------------------


@dataclass(frozen=True)
class NewtonDecrementCriterion:
    tol: float = 1e-6

    def should_stop(self, state) -> jnp.ndarray:
        return state["newton_decrement"] < self.tol


@dataclass(frozen=True)
class StepNumberCriterion:
    max_steps: int = 10

    def should_stop(self, state) -> jnp.ndarray:
        return state["step"] >= self.max_steps

    @property
    def bound(self):
        return self.max_steps


@dataclass(frozen=True)
class OrCriterion:
    criteria: tuple

    def __init__(self, criteria):
        object.__setattr__(self, "criteria", tuple(criteria))

    def should_stop(self, state):
        stop = jnp.asarray(False)
        for c in self.criteria:
            stop = jnp.logical_or(stop, c.should_stop(state))
        return stop

    @property
    def bound(self):
        bounds = [c.bound for c in self.criteria if hasattr(c, "bound")]
        return min(bounds) if bounds else None


DEFAULT_CRITERION = OrCriterion(
    [NewtonDecrementCriterion(1e-6), StepNumberCriterion(20)]
)


def _criterion_bound(criterion, hard_cap: int = 100) -> int:
    b = getattr(criterion, "bound", None)
    return int(b) if b is not None else hard_cap


# -- optimizer ---------------------------------------------------------------


@dataclass
class GaussNewtonResult:
    """Final optimizer state (reference exposes `.xₖ`, `.Jₖ`, `.Q_mat`,
    `.r_obs_norm_history`)."""

    x_k: jnp.ndarray  # MAP iterate (free dofs if prior constrained)
    J_k: RowOp  # final Jacobian (free-dof columns)
    Q_mat: BTD  # prior precision
    H: BTD  # final Q + tau J^T J
    r_obs_norm_history: jnp.ndarray  # [max_steps + 1], NaN-padded
    n_steps: jnp.ndarray  # number of Newton steps taken
    noise: float
    factor: object = None  # final-iterate factor of H (SRIF path); carries
    # the full posterior surface (solve/sample/variance_diag/log_det)
    precision_op: object = None  # operator-form H (GNPrecisionOp) when the
    # BTD H is never materialized
    newton_decrement: jnp.ndarray = None  # decrement of the LAST step taken
    # (host-side stopping tests in per-step dispatch mode)

    def posterior(self, blueprint=None, affine=None):
        """GMRF with mean x_k and precision Q + tau J^T J — what the
        reference scripts rebuild by hand
        (`solve_burgers_gmrf-fem.jl:186-193`). On the SRIF path the
        precision is operator-form and the factor is the final windowed-QR
        factor (no BTD H is ever materialized)."""
        from diffeqgmrfs_tpu.gmrf.gmrf import GMRF, ConstrainedGMRF

        if self.factor is not None:
            g = GMRF(
                self.x_k,
                self.precision_op if self.precision_op is not None else self.H,
                self.factor,
                blueprint or GNCholeskySolverBlueprint(),
            )
        else:
            g = GMRF(
                self.x_k, self.H, None, blueprint or GNCholeskySolverBlueprint()
            )
        if affine is not None:
            return ConstrainedGMRF(g, affine)
        return g


def blueprint_gn_kwargs(bp, Q, aux=None) -> dict:
    """Derive the `gauss_newton_solve` factorization-path arguments from a
    blueprint (the analog of the reference's blueprint dispatch,
    `/root/reference/scripts/burgers/solve_burgers_gmrf-fem.jl:170-181`).

    `aux`: prebuilt structures the paths need — drivers build these
    host-side once per config and thread them through the jit signature:
      - "ata_pattern" / "ata_window_plan": J^T J scatter/window structure
      - "sqrt_ops": SRIF square-root operands [(plan, vals), ...]
      - "q_ell"/"q_diag"/"q_pattern"/"q_coo": compact prior forms
      - "final_factor": return the final-iterate SRIF factor (default True
        on the sqrt path)
    """
    aux = dict(aux or {})
    kw = {
        "damping": getattr(bp, "damping", False),
        "materialize_H": getattr(bp, "materialize_H", True),
    }
    for k in ("ata_pattern", "ata_window_plan", "q_ell", "q_diag",
              "q_pattern", "q_coo"):
        if aux.get(k) is not None:
            kw[k] = aux[k]
    if getattr(bp, "sqrt_factor", False):
        if "sqrt_ops" not in aux:
            raise ValueError(
                "sqrt_factor blueprint requires aux['sqrt_ops'] (and a "
                "window plan for J in aux['ata_window_plan'])"
            )
        kw["sqrt_ops"] = aux["sqrt_ops"]
        if kw.get("q_ell") is None and getattr(bp, "toeplitz", False):
            from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD

            q_op = ToeplitzBTD.from_btd(Q)
            kw["q_ell"] = q_op
            kw["q_diag"] = q_op.diagonal()
        if aux.get("q_mu") is not None:
            kw["q_mu"] = aux["q_mu"]
        if aux.get("srif_prior_R") is not None:
            # precomputed stage-1 prefactor (stepwise drivers: built once
            # in the setup program, reused by every per-step program)
            kw["prior_R"] = aux["srif_prior_R"]
            kw["prior_cs0"] = aux["srif_prior_cs0"]
        kw["final_factor"] = aux.get("final_factor", True)
        kw["final_gemm"] = getattr(bp, "gemm_solves", False)
        kw["srif_qr_impl"] = getattr(bp, "srif_qr_impl", "xla")
        kw["srif_qr_dtype"] = getattr(bp, "srif_qr_dtype", "f32")
        kw["sub_dtype"] = getattr(bp, "sub_dtype", "cond")
        kw["srif_solve"] = getattr(bp, "srif_solve", "refine")
        kw["srif_pcg_iters"] = getattr(bp, "srif_pcg_iters", 32)
        kw["materialize_H"] = False
        if aux.get("srif_prefactor") is not None:
            kw["prefactor"] = bool(aux["srif_prefactor"])
    else:
        kw["mixed_precision"] = getattr(bp, "mixed_precision", False)
        if getattr(bp, "toeplitz", False):
            from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD

            kw["q_toeplitz"] = ToeplitzBTD.from_btd(Q)
    fo = bp.factor_opts() if hasattr(bp, "factor_opts") else {}
    if fo:
        kw["factor_opts"] = fo
    return kw


def gauss_newton(
    mu_prior,
    Q,
    f_and_J,
    noise,
    y,
    x0,
    blueprint=None,
    aux=None,
    criterion=None,
    affine=None,
) -> "GaussNewtonResult":
    """Blueprint-dispatched Gauss-Newton solve: path selection (mixed
    precision / Toeplitz / SRIF / damping) lives on the blueprint, prebuilt
    structures in `aux` (see `blueprint_gn_kwargs`)."""
    bp = blueprint or GNCholeskySolverBlueprint()
    return gauss_newton_solve(
        mu_prior, Q, f_and_J, noise, y, x0,
        criterion=criterion, affine=affine,
        **blueprint_gn_kwargs(bp, Q, aux),
    )


class GaussNewtonOptimizer:
    """See module docstring. `f_and_J(w_full) -> (f, J: RowOp)` must return a
    Jacobian with static column structure; w_full is in the FULL dof space
    (the optimizer maps through the prior's affine constraints). The
    `solver_bp` blueprint selects the factorization path (mixed precision /
    Toeplitz / SRIF / damping); `aux` carries the prebuilt structures those
    paths need (see `blueprint_gn_kwargs`)."""

    def __init__(
        self,
        mu_prior,
        Q_prior,
        f_and_J,
        noise,
        y,
        x0,
        solver_bp=None,
        stopping_criterion=None,
        affine=None,
        aux=None,
    ):
        # Accept a GMRF/ConstrainedGMRF in place of (mu, Q) pieces
        self.affine = affine
        if isinstance(Q_prior, BTD):
            self.Q = Q_prior
        else:
            raise TypeError("Q_prior must be a BTD precision")
        self.mu_prior = jnp.asarray(mu_prior)
        self.f_and_J = f_and_J
        self.noise = noise
        self.y = jnp.asarray(y)
        self.x0 = jnp.asarray(x0)
        self.solver_bp = solver_bp or GNCholeskySolverBlueprint()
        self.criterion = stopping_criterion or DEFAULT_CRITERION
        self.aux = aux
        self.result: GaussNewtonResult | None = None

    # reference-style accessors
    @property
    def x_k(self):
        return self.result.x_k

    @property
    def J_k(self):
        return self.result.J_k

    @property
    def Q_mat(self):
        return self.result.Q_mat

    @property
    def r_obs_norm_history(self):
        h = self.result.r_obs_norm_history
        return h[~jnp.isnan(h)]

    def _full(self, x_free):
        if self.affine is None:
            return x_free
        return self.affine.free_to_full(x_free)

    def _condense_J(self, J: RowOp) -> RowOp:
        if self.affine is None:
            return J
        return self.affine.condense_rowop(J)

    def optimize(self) -> GaussNewtonResult:
        self.result = gauss_newton(
            self.mu_prior,
            self.Q,
            self.f_and_J,
            self.noise,
            self.y,
            self.x0,
            blueprint=self.solver_bp,
            aux=self.aux,
            criterion=self.criterion,
            affine=self.affine,
        )
        return self.result


def gauss_newton_solve(
    mu_prior,
    Q: BTD,
    f_and_J,
    noise,
    y,
    x0,
    criterion=None,
    affine=None,
    mixed_precision: bool = False,
    ata_pattern=None,
    ata_window_plan=None,
    materialize_H: bool = True,
    q_ell=None,
    q_diag=None,
    q_pattern=None,
    q_coo=None,
    sqrt_ops=None,
    q_toeplitz=None,
    damping: bool = False,
    final_factor: bool = False,
    final_gemm: bool = False,
    srif_qr_impl: str = "xla",
    srif_qr_dtype: str = "f32",
    q_mu=None,
    factor_opts=None,
    prior_R=None,
    prior_cs0=None,
    prefactor: bool = True,
    sub_dtype: str = "cond",
    srif_solve: str = "refine",
    srif_pcg_iters: int = 32,
) -> GaussNewtonResult:
    """Functional Gauss-Newton loop (jit/vmap-friendly).

    mixed_precision=True factorizes each Newton system in f32 on the MXU with
    f64 iterative refinement (ops/refine.py) — the TPU production path; the
    default keeps the native-dtype (f64) factorization.

    ata_pattern: optional prebuilt J^T J -> BTD scatter pattern for the
    CONDENSED Jacobian (thread it through the jit signature to keep the giant
    index array out of the HLO; see BTDPattern docstring).
    ata_window_plan: alternative scatter-free J^T J path via block-window
    GEMMs (ops/ata_windows.py) — preferred on TPU where giant scatter-adds
    serialize; takes precedence over ata_pattern.

    (q_ell, q_diag, q_pattern): prior precision in compact f64 ELL form +
    its scatter pattern into BTD storage. With mixed_precision, the Newton
    body then never holds ANY f64 BTD: the f32 scaled system is scattered
    directly from the ELL values and refinement residuals apply Q by ELL
    gathers (ops/refine.py EllMatFreeFactor). On TPU, f64 arrays are
    emulated as f32 hi/lo pairs and copied around while-loop boundaries —
    a 3.4 GB f64 prior BTD ballooned to 31.5 GB peak at chen24 Burgers
    N_x=1000; this path runs the same config in a few GB.

    damping: backtracking step control — evaluate the true MAP objective
    phi(x) = tau ||f(x) - y||^2 + (x - mu)^T Q (x - mu) at step fractions
    {1, 1/2, 1/4, 1/8} and take the best (jit-friendly: all candidates
    evaluated, argmin select). Plain GN diverges on shocky Burgers
    trajectories over long horizons (N_t=100 at nu=0.01: iterates end up
    WORSE than the IC-conditioned prior, or overflow to NaN); the
    reference caps steps instead (`_research/burgers_chen24.jl:147-150`),
    which works only from good initializations.

    q_toeplitz: constant-mesh ST prior precision in distinct-block form
    (ops/btd.ToeplitzBTD — 4 spatial blocks instead of the full [N_t, bs,
    bs] BTD). With mixed_precision, the Newton loop then never holds ANY
    full-size f64 buffer: the f32 scaled system is materialized from the
    shared blocks and refinement residuals ride 4 shared-block GEMMs
    (ops/refine.ToeplitzMatFreeFactor). The memory answer for production
    ST configs (Burgers N_x=800 x 100 steps: 43 GB of f64 loop copies ->
    ~2 GB resident f32).

    sqrt_ops: list of (ATAWindowPlan, values) whose stacked rows S_Q satisfy
    S_Q^T S_Q = Q. With q_ell + ata_window_plan, each Newton system is then
    factored by SRIF windowed QR (ops/srif.py SRIFNewtonFactor) on the
    stacked [S_Q; sqrt(tau) J] — f32-valid at cond(H) up to ~1e14, the
    answer to the elliptic-Chen24-N=100 regime where the equilibrated f32
    Cholesky goes indefinite (RESULTS.md).
    """
    from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached
    from diffeqgmrfs_tpu.ops.refine import RefinedFactor
    from diffeqgmrfs_tpu.ops.ata_windows import ata_btd_windows

    criterion = criterion or DEFAULT_CRITERION
    max_steps = _criterion_bound(criterion)
    mu_prior = jnp.asarray(mu_prior)
    y = jnp.asarray(y)
    tau = jnp.asarray(noise, dtype=Q.dtype)
    use_ell = q_ell is not None

    def full(x):
        return x if affine is None else affine.free_to_full(x)

    def condense(J):
        return J if affine is None else affine.condense_rowop(J)

    if ata_window_plan is not None:
        def jtj(Jc):
            return ata_btd_windows(ata_window_plan, Jc.vals, tau=tau, dtype=Q.dtype)

        def jtj_scaled(vals, init=None):
            return ata_btd_windows(
                ata_window_plan, vals, tau=1.0, dtype=Q.dtype, init=init
            )
    else:
        if ata_pattern is not None:
            pat = ata_pattern
        else:
            # Trace one evaluation to fix the Jacobian structure.
            _, J0 = f_and_J(full(jnp.asarray(x0)))
            Jc0 = condense(J0)
            pat = ata_pattern_cached(Jc0, Q.n, Q.bs)

        def jtj(Jc):
            return pat.scatter(Jc.ata_values() * tau)

        def jtj_scaled(vals, init=None):
            if init is not None:
                # chunk the outer-product scatter so the pair-product
                # transient stays ~100 MB instead of n_rows*K^2*8 bytes
                n_rows, K = vals.shape
                n_chunks = max(1, min(8, n_rows // 4096))
                csize = -(-n_rows // n_chunks)
                buf = jnp.concatenate(
                    [init.diag.reshape(-1), init.lower.reshape(-1)]
                )
                for c in range(n_chunks):
                    v = vals[c * csize : (c + 1) * csize]
                    p = (v[:, :, None] * v[:, None, :]).reshape(-1)
                    idx = pat.flat_idx.reshape(-1)[
                        c * csize * K * K : (c + 1) * csize * K * K
                    ]
                    buf = buf.at[idx].add(p.astype(buf.dtype), mode="drop")
                diag = buf[: pat.diag_size].reshape(pat.N, pat.bs, pat.bs)
                lower = buf[pat.diag_size :].reshape(
                    max(pat.N - 1, 0), pat.bs, pat.bs
                )
                from diffeqgmrfs_tpu.ops.btd import BTD as _BTD

                return _BTD(diag, lower, pat.n)
            v = vals[:, :, None] * vals[:, None, :]
            return pat.scatter(v.reshape(-1))

    if q_mu is not None:
        # exact prior INFORMATION vector eta = Q mu (+ tau_b A^T y for a
        # conditioned prior), supplied directly: the MAP problem is fully
        # determined by (Q, eta) — no solved conditioned mean needed, which
        # matters when the conditioned prior alone is beyond factorable
        # range (fine-dt ST priors at N_x >= 800; RESULTS.md round 2)
        Qmu = jnp.asarray(q_mu)
    elif q_toeplitz is not None:
        Qmu = q_toeplitz.matvec(mu_prior)
    elif use_ell:
        Qmu = q_ell.matvec(mu_prior)
    else:
        Qmu = Q.matvec(mu_prior)

    def jtj_scaled32(vals, init):
        """Scaled J^T J accumulated in the init buffer's (f32) dtype."""
        if ata_window_plan is not None:
            return ata_btd_windows(
                ata_window_plan, vals, tau=1.0, dtype=init.diag.dtype, init=init
            )
        return pat.scatter_into(init, vals[:, :, None] * vals[:, None, :])

    # SRIF measurement-update form: the prior rows S_Q are Newton-step
    # invariant, so pre-reduce them ONCE here (hoisted out of the
    # while_loop — XLA carries R_Q as a loop-invariant operand; stepwise
    # drivers compute it once in setup and pass prior_R through aux); each
    # GN step then QRs only [R_Q·rescale; sqrt(tau) J] (ops/srif.py
    # prior_factor). Gated on a real flop advantage: the bs triangular
    # R_Q rows must replace substantially more raw prior rows per window.
    srif_prior_R, srif_prior_cs0 = prior_R, prior_cs0
    if (
        prefactor
        and srif_prior_R is None
        and sqrt_ops is not None
        and ata_window_plan is not None
        and Q.N > 1
    ):
        plans = [p for p, _ in sqrt_ops]
        rows_per_win = sum(p.rows.shape[1] for p in plans)
        p_spans = [p.max_span for p in plans]
        p_splits = {p.split for p in plans}
        prior_banded = all(0 <= s < Q.bs for s in p_spans)
        if prior_banded:
            # stage-2 must stay banded too (a banded prefactor cannot feed
            # a full-offdiagonal output)
            eligible = (
                0 <= ata_window_plan.max_span < Q.bs and len(p_splits) == 1
            )
        else:
            eligible = p_splits == {1} and ata_window_plan.split == 1
        if srif_qr_dtype == "f64":
            eligible = False  # f64 windows rebuild the full stack per step
        if eligible and rows_per_win >= 2 * Q.bs:
            from diffeqgmrfs_tpu.ops.srif import srif_packed_qr

            srif_prior_cs0 = (1.0 / jnp.sqrt(q_diag)).astype(jnp.float32)
            srif_prior_R = srif_packed_qr(
                sqrt_ops, Q.n, Q.N, Q.bs, dtype=jnp.float32,
                col_scale=srif_prior_cs0, chunk_rows="auto",
                qr_impl=srif_qr_impl,
            )

    def q_apply(t):
        if q_toeplitz is not None:
            return q_toeplitz.matvec(t)
        if use_ell:
            return q_ell.matvec(t)
        return Q.matvec(t)

    def body(carry):
        x, _, step, hist, _ = carry
        f, J = f_and_J(full(x))
        Jc = condense(J)
        r_norm = jnp.linalg.norm(f - y)
        hist = hist.at[step].set(r_norm)
        # Delta-form Newton system: H dx = -grad = Qmu - Q x - tau J^T(f-y),
        # x_new = x + dx. Algebraically identical to solving H x_new = rhs
        # directly, but numerically decisive near a good iterate: the direct
        # form recovers dx by the subtraction x_new - x, amplifying the
        # solve's relative error by ||x||/||dx|| (at the warm-started
        # flagship N800x100 runs that ratio made every direction garbage
        # regardless of solver quality — RESULTS.md queue L/M).
        rhs = Qmu - q_apply(x) - tau * Jc.rmatvec(f - y)
        if q_toeplitz is not None and mixed_precision:
            from diffeqgmrfs_tpu.ops.refine import ToeplitzMatFreeFactor

            F = ToeplitzMatFreeFactor(q_toeplitz, Jc, tau, jtj_scaled32,
                                      factor_opts=factor_opts)
            dx = F.solve(rhs)
            x_new = x + dx
            Hdx = F.matvec_H(dx)
        elif sqrt_ops is not None:
            # SRIF path: QR of [S_Q; sqrt(tau) J], never forming H
            from diffeqgmrfs_tpu.ops.refine import SRIFNewtonFactor

            F = SRIFNewtonFactor(
                q_ell, q_diag, sqrt_ops, ata_window_plan, Jc, tau,
                Q.n, Q.N, Q.bs, qr_impl=srif_qr_impl,
                prior_R=srif_prior_R, prior_cs0=srif_prior_cs0,
                sub_dtype=sub_dtype, qr_dtype=srif_qr_dtype,
                solve_method=srif_solve, pcg_iters=srif_pcg_iters,
            )
            dx = F.solve(rhs)
            x_new = x + dx
            Hdx = F.matvec_H(dx)
        elif use_ell and mixed_precision:
            # ELL path: no f64 BTD anywhere in the loop body
            from diffeqgmrfs_tpu.ops.refine import EllMatFreeFactor

            F = EllMatFreeFactor(
                q_ell, q_diag, q_pattern, Jc, tau, jtj_scaled32,
                refine_iters=5, q_coo=q_coo, factor_opts=factor_opts,
            )
            dx = F.solve(rhs)
            x_new = x + dx
            Hdx = F.matvec_H(dx)
        elif mixed_precision:
            # matrix-free mixed precision: the f64 Newton system is never
            # materialized (production ST systems are ~GBs per BTD copy)
            from diffeqgmrfs_tpu.ops.refine import MatFreeRefinedFactor

            F = MatFreeRefinedFactor(Q, Jc, tau, jtj_scaled, refine_iters=4,
                                     factor_opts=factor_opts)
            dx = F.solve(rhs)
            x_new = x + dx
            Hdx = F.matvec_H(dx)
        else:
            H = Q + jtj(Jc)
            dx = btd_cholesky(H).solve(rhs)
            x_new = x + dx
            Hdx = H.matvec(dx)
        if damping:
            # backtracking on the true MAP objective (all candidates
            # evaluated, argmin select — jit/while_loop friendly).
            # All reductions accumulate in f64: on the f32 pipeline the
            # quad term cancels two ~1e9-scale dots down to ~1e4 (flagship
            # N800x100 probe, RESULTS.md queue K), so f32 dots carry ~1e2
            # of noise — enough to accept steps that worsen the true
            # objective. f64 dots over f32 operands are bandwidth-trivial.
            def _d64(a, b):
                return jnp.dot(
                    a.astype(jnp.float64), b.astype(jnp.float64)
                )

            tau64 = tau.astype(jnp.float64)

            def quad(xc):
                if q_mu is not None:
                    # (x-mu)'Q(x-mu) = x'Qx - 2 x'eta + const(mu)
                    return _d64(xc, q_apply(xc)) - 2.0 * _d64(xc, Qmu)
                dmu = xc - mu_prior
                return _d64(dmu, q_apply(dmu))

            def phi(xc):
                f_c, _ = f_and_J(full(xc))  # J is dead -> DCE'd
                df = (f_c - y).astype(jnp.float64)
                return tau64 * jnp.sum(df * df) + quad(xc)

            alphas = (1.0, 0.5, 0.25, 0.125)
            cands = jnp.stack([x + a * dx for a in alphas])
            phis = jnp.stack([phi(c) for c in cands])
            phis = jnp.where(jnp.isnan(phis), jnp.inf, phis)
            k = jnp.argmin(phis)
            # alpha=0 safeguard: when EVERY candidate worsens the true
            # objective (a garbage Newton direction — e.g. the factor is
            # beyond its f32 validity range at the N800x100 ST systems),
            # REJECT the step instead of being forced to move 0.125*dx.
            # Without this, GN warm-started at a near-optimal iterate
            # (forward march, rel_err 1.75e-2) walked away to rel_err ~1.3
            # at the flagship config (queue K flagship_damped). phi at the
            # current iterate reuses the body's residual eval (f at x).
            df0 = (f - y).astype(jnp.float64)
            phi0 = tau64 * jnp.sum(df0 * df0) + quad(x)
            x_new = jnp.where(phis[k] < phi0, cands[k], x)
        # decrement from the UNSCALED dx/Hdx: it measures proximity of the
        # full Newton model — scaling by the damping fraction would shrink
        # it 8x per 1/8 backtrack and stop while phi still decreases
        decrement = jnp.sqrt(jnp.abs(jnp.dot(dx, Hdx)))
        if damping:
            # a rejected step (x_new == x) is a fixed point: the same
            # linearization reproduces the same rejected dx forever —
            # zero the decrement so the stopping criterion fires now
            decrement = jnp.where(phis[k] < phi0, decrement, 0.0)
        return (x_new, decrement, step + 1, hist, r_norm)

    def cond(carry):
        x, decrement, step, hist, r_norm = carry
        state = {"newton_decrement": decrement, "step": step, "r_norm": r_norm}
        return jnp.logical_not(criterion.should_stop(state))

    hist0 = jnp.full((max_steps + 1,), jnp.nan, dtype=Q.dtype)
    init = (
        jnp.asarray(x0),
        jnp.asarray(jnp.inf, dtype=Q.dtype),
        jnp.asarray(0),
        hist0,
        jnp.asarray(jnp.inf, dtype=Q.dtype),
    )
    x_fin, decrement_fin, n_steps, hist, _ = lax.while_loop(cond, body, init)

    # Final residual/Jacobian at the solution (for posterior precision)
    f_fin, J_fin = f_and_J(full(x_fin))
    Jc_fin = condense(J_fin)
    hist = hist.at[n_steps].set(jnp.linalg.norm(f_fin - y))
    # The posterior precision costs an extra f64 BTD (+ assembly transients);
    # skip it when the caller only needs the MAP mean (materialize_H=False).
    H_fin = (Q + jtj(Jc_fin)) if materialize_H else None
    fac = prec_op = None
    if final_factor and sqrt_ops is not None:
        # final-iterate SRIF factor: the full posterior surface (mean solves,
        # sampling, Takahashi variances, log-det) without ever forming H
        from diffeqgmrfs_tpu.ops.refine import SRIFNewtonFactor, GNPrecisionOp

        fac = SRIFNewtonFactor(
            q_ell, q_diag, sqrt_ops, ata_window_plan, Jc_fin, tau,
            Q.n, Q.N, Q.bs, qr_impl=srif_qr_impl,
            prior_R=srif_prior_R, prior_cs0=srif_prior_cs0,
            sub_dtype=sub_dtype, qr_dtype=srif_qr_dtype,
        )
        if final_gemm:
            from diffeqgmrfs_tpu.ops.packed import PackedBTDRFullFactor
            from diffeqgmrfs_tpu.ops.inverse_solver import RFullInverseSolver

            if isinstance(fac.F32, PackedBTDRFullFactor):
                # GEMM-only solve form: sampling/std/refinement on the
                # posterior run ~6x faster than TRSM sweeps on the MXU
                fac.F32 = RFullInverseSolver.from_factor(fac.F32)
        prec_op = GNPrecisionOp(q_ell, Jc_fin, tau, fac.d**2, Q.n)
    return GaussNewtonResult(
        x_k=x_fin,
        J_k=Jc_fin,
        Q_mat=Q,
        H=H_fin,
        r_obs_norm_history=hist,
        n_steps=n_steps,
        noise=noise,
        factor=fac,
        precision_op=prec_op,
        newton_decrement=decrement_fin,
    )
