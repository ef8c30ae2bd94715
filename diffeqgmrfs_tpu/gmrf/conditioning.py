"""Information-form conditioning: the core posterior update.

`condition_on_observations(x, A, precision, y)` implements the Gaussian
information-form update the whole reference pipeline rests on
(SURVEY.md §2.3; `/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:167`):

    Q+  = Q + tau * A^T A
    mu+ = Q+^{-1} (Q mu + tau * A^T y)

A is a `RowOp` (static column structure), so tau A^T A lands in the BTD
precision through one precomputed scatter pattern; the pattern is cached per
(A structure, block partition) — the TPU analog of the reference's reuse of
the CHOLMOD symbolic factorization / permutation across instances
(`solve_darcy_gmrf-fem.jl:169,174`).

Conditioning a `ConstrainedGMRF` condenses the observation operator onto the
free dofs first (A -> A S, y -> y - A g), which is the reference's
`constrainify_linear_system` (`scripts/solve_burger.jl:120-123`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.btd import BTD, BTDPattern, make_btd_pattern
from diffeqgmrfs_tpu.fem.operators import RowOp
from diffeqgmrfs_tpu.gmrf.gmrf import GMRF, ConstrainedGMRF
from diffeqgmrfs_tpu.solvers.blueprints import DEFAULT_BLUEPRINT

_ATA_PATTERN_CACHE: dict[tuple, BTDPattern] = {}


def _rmatvec_gather(plan, A: RowOp, y):
    """A^T y through the plan's transpose ELL when it carries one (pure
    gather — TPU scatter-adds serialize: 430 vs 89 ms at Darcy N300,
    probe_resolve); falls back to the RowOp scatter-add."""
    if getattr(plan, "t_rows", None) is not None:
        return plan.rmatvec(A.vals, y)
    return A.rmatvec(y)


def ata_pattern_cached(A: RowOp, n: int, bs: int) -> BTDPattern:
    """Cache the A^T A -> BTD scatter pattern per (structure, partition)."""
    key = (
        hashlib.sha1(np.ascontiguousarray(A.cols)).hexdigest(),
        A.cols.shape,
        n,
        bs,
    )
    pat = _ATA_PATTERN_CACHE.get(key)
    if pat is None:
        r, c = A.ata_structure()
        pat = make_btd_pattern(r, c, n, bs=bs)
        _ATA_PATTERN_CACHE[key] = pat
    return pat


def add_ata(Q: BTD, A: RowOp, tau, pattern: BTDPattern | None = None) -> BTD:
    """Q + tau * A^T A in BTD form.

    Pass a prebuilt `pattern` (ideally threaded through the jit signature,
    see BTDPattern docstring) to avoid inlining giant index constants into
    the HLO; otherwise the pattern is built/cached at trace time.
    """
    pat = pattern if pattern is not None else ata_pattern_cached(A, Q.n, Q.bs)
    if hasattr(pat, "local_cols"):  # ATAWindowPlan: scatter-free GEMM path
        from diffeqgmrfs_tpu.ops.ata_windows import ata_btd_windows

        return ata_btd_windows(pat, A.vals, tau=tau, dtype=Q.dtype, init=Q)
    if pat.N != Q.N:
        raise ValueError("partition mismatch between Q and A^T A pattern")
    ata = pat.scatter(A.ata_values() * tau)
    return Q + ata


def condition_st_sqrt(
    mu_prior,
    q_top,
    prior_sqrt_ops,
    A_c: RowOp,
    precision,
    y,
    a_plan,
    refine_iters: int = 1,
    return_factor: bool = False,
):
    """IC conditioning of a Toeplitz-form ST prior through the SRIF
    square-root machinery — no f64 BTD anywhere:
    -> (mu_ic, q_top_ic, eta_ic).

    `eta_ic = Q mu_prior + tau A^T y` is the EXACT (f64, solve-free)
    information vector of the conditioned prior: downstream Gauss-Newton
    should consume it via `aux["q_mu"]` so the MAP problem is exact even
    when `mu_ic` itself is only approximately solvable — at fine-dt
    production sizes (Burgers N_x >= 800 x N_t = 100) the conditioned
    prior's equilibrated condition exceeds even the sqrt-factor f32 range
    and the refinement for mu_ic DIVERGES past the first correction
    (hence refine_iters=1; mu_ic is report/initial-iterate grade, ~0.5%
    relative at N_x=800).

    The posterior precision H = Q + tau A^T A is factored as the windowed
    QR of [prior sqrt operands; sqrt(tau) A] (exactly the Gauss-Newton
    SRIF path with J := A), the mean solved with f64 refinement against
    the Toeplitz operator, and the conditioned prior returned in Toeplitz
    form with the observation update folded into the first block
    (observations must live on time slice 0 — the reference's IC
    conditioning, `scripts/burgers/solve_burgers_gmrf-fem.jl:161`).
    """
    from diffeqgmrfs_tpu.ops.refine import SRIFNewtonFactor
    from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD

    tau = jnp.asarray(precision, dtype=q_top.dtype)
    F = SRIFNewtonFactor(
        q_top, q_top.diagonal(), prior_sqrt_ops, a_plan, A_c, tau,
        q_top.n, q_top.N, q_top.bs, refine_iters=refine_iters,
    )
    y64 = jnp.asarray(y, dtype=q_top.dtype)
    if getattr(a_plan, "t_rows", None) is not None:
        # A^T y as a pure gather (TPU scatter-adds serialize; see
        # SRIFNewtonFactor.j_tplan)
        aty = a_plan.rmatvec(A_c.vals, y64)
    else:
        aty = A_c.rmatvec(y64)
    eta = q_top.matvec(mu_prior) + tau * aty
    mu_ic = F.solve(eta)
    # observation update on the first block: d_first += tau * A_0^T A_0
    bs = q_top.bs
    n_rows = A_c.n_rows
    Ad = jnp.zeros((n_rows, bs), dtype=q_top.dtype)
    Ad = Ad.at[
        jnp.arange(n_rows)[:, None], jnp.asarray(A_c.cols)
    ].add(A_c.vals.astype(q_top.dtype))
    d_first = q_top.d_first + tau * (Ad.T @ Ad)
    q_ic = ToeplitzBTD(
        d_first, q_top.d_mid, q_top.d_last, q_top.off, q_top.N, q_top.n
    )
    if return_factor:
        # F.F32 is the QR of exactly [S_prior; sqrt(tau) A] at column
        # equilibration 1/F.d = 1/sqrt(diag(q_ic)) — i.e. the SRIF
        # measurement-update PREFACTOR of the conditioned prior. Returning
        # it lets the downstream Gauss-Newton stack only
        # [R_ic·rescale; sqrt(tau_f) J] per Newton step (ops/srif.py
        # prior_factor) at zero extra stage-1 cost.
        pre = (F.F32, (1.0 / F.d).astype(jnp.float32))
        return mu_ic, q_ic, eta, pre
    return mu_ic, q_ic, eta


def condition_on_observations(
    x,
    A: RowOp,
    precision: float,
    y,
    solver_blueprint=None,
    pattern: BTDPattern | None = None,
):
    """Posterior of x given y ~ N(A x, (precision)^{-1} I).

    `pattern`: optional prebuilt A^T A -> BTD scatter pattern (for the
    condensed operator when x is constrained)."""
    bp = solver_blueprint or DEFAULT_BLUEPRINT
    if isinstance(x, ConstrainedGMRF):
        A_free = x.affine.condense_rowop(A)
        y_free = jnp.asarray(y) - x.affine.offset_shift(A)
        inner = condition_on_observations(
            x.inner_gmrf, A_free, precision, y_free, solver_blueprint=bp,
            pattern=pattern,
        )
        return ConstrainedGMRF(inner, x.affine)

    from diffeqgmrfs_tpu.gmrf.gmrf import CompactGMRF

    if isinstance(x, CompactGMRF):
        # Production-memory path: posterior precision stays in OPERATOR form
        # (SymSumOp), only the f32 equilibrated factor is materialized.
        from diffeqgmrfs_tpu.ops.refine import SymSumOp, MatFreeConditionFactor

        tau64 = jnp.asarray(precision, dtype=x.precision64.vals.dtype)
        pat = (
            pattern
            if pattern is not None
            else ata_pattern_cached(A, x.precision.n, x.precision.bs)
        )
        H_op = SymSumOp(
            x.precision64, A, tau64, diag_Q=x.diag64,
            a_plan=pat if hasattr(pat, "t_rows") else None,
        )
        if getattr(bp, "sqrt_factor", False):
            # SRIF path: QR of the stacked [Λ; sqrt(tau) A] — f32-valid at
            # cond(H) up to ~1/eps_f32^2 (ops/srif.py)
            ri = getattr(bp, "refine_iters", None)
            use_pre = (
                x.sqrt_R32 is not None
                and getattr(bp, "sqrt_prefactor", True)
            )
            if x.sqrt32 is None and not use_pre:
                raise ValueError(
                    "sqrt_factor blueprint requires a prior discretized "
                    "with sqrt=True (no Λ operand on this CompactGMRF), "
                    "or an active sqrt prefactor (sqrt_R32)"
                )
            if not hasattr(pat, "local_cols"):
                raise ValueError(
                    "sqrt_factor conditioning requires an ATAWindowPlan "
                    "pattern for the observation operator"
                )
            from diffeqgmrfs_tpu.ops.refine import SRIFConditionFactor
            factor = SRIFConditionFactor(
                H_op, pat, x.sqrt32, x.sqrt_plan,
                x.precision.n, x.precision.N, x.precision.bs,
                **({} if ri is None else {"refine_iters": int(ri)}),
                chunk=getattr(bp, "srif_chunk", "auto"),
                matmul_precision=getattr(bp, "srif_precision", "float32"),
                qr_impl=getattr(bp, "srif_qr_impl", "xla"),
                gemm_solves=getattr(bp, "gemm_solves", False),
                prior_R=x.sqrt_R32 if use_pre else None,
                prior_cs0=x.sqrt_cs0 if use_pre else None,
            )
            rhs = x.precision64.matvec(x.mu) + tau64 * _rmatvec_gather(
                pat, A, jnp.asarray(y, dtype=tau64.dtype)
            )
            return GMRF(factor.solve(rhs), H_op, factor, bp)
        ri = getattr(bp, "refine_iters", None)
        factor = MatFreeConditionFactor(
            x.precision,
            H_op,
            pat,
            **({} if ri is None else {"refine_iters": int(ri)}),
            gemm_solves=getattr(bp, "gemm_solves", False),
            packed_q_idx=x.q_pack_idx,
            factor_dtype=getattr(bp, "factor_dtype", "f32"),
            factor_opts=bp.factor_opts() if hasattr(bp, "factor_opts") else None,
        )
        rhs = x.precision64.matvec(x.mu) + tau64 * _rmatvec_gather(
            pat, A, jnp.asarray(y, dtype=tau64.dtype)
        )
        return GMRF(factor.solve(rhs), H_op, factor, bp)

    Q = x.precision
    tau = jnp.asarray(precision, dtype=Q.dtype)
    Q_new = add_ata(Q, A, tau, pattern=pattern)
    rhs = Q.matvec(x.mu) + tau * A.rmatvec(jnp.asarray(y))
    post = type(x).tree_unflatten(
        x.tree_flatten()[1], (x.mu, Q_new, None)
    )
    post.blueprint = bp
    from diffeqgmrfs_tpu.solvers.blueprints import CGSolverBlueprint

    if isinstance(bp, CGSolverBlueprint):
        # iterative path (`CGSolverBlueprint`, shallow_water.jl:130); the
        # factor is still built lazily if std/sampling is requested later
        from diffeqgmrfs_tpu.ops.cg import cg_solve

        post.mu = cg_solve(Q_new, rhs, tol=bp.tol, maxiter=bp.maxiter)
        return post
    post = post.factorize()
    mu_new = post.factor.solve(rhs)
    post.mu = mu_new
    return post
