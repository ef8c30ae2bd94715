"""Square-root-information (SRIF) factorization: windowed block QR.

f32 Cholesky of the posterior precision H = Q + tau A^T A fails once
cond(H~) > 1/eps_f32 — for Darcy FEM observations (squared stiffness in
A^T A) that happens between N_xy=64 and N_xy=128, far below the reference
config N_xy=300 (`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl`).
The classical fix is never to form H: factor the STACKED square-root system

    S = [ Lambda ; sqrt(tau) A ],      S^T S = H,   Lambda^T Lambda = Q

by orthogonal transforms only. Householder QR computes R with
R = R_exact (I + F), ||F|| ~ eps * cond(S) = eps * sqrt(cond(H)), so the
factor stays VALID in f32 at cond(H) up to ~1/eps_f32^2 ~ 1e14, and f64
iterative refinement against the operator form of H contracts at rate
~eps_f32 * sqrt(cond(H)) per step. R^T is exactly the Cholesky factor of H
(up to row signs), so the result drops straight into packed banded-block
storage (`PackedBTDRFactor`, the upper/R-form sibling of
`PackedBTDCholesky`) and every downstream consumer (solves, sampling,
Takahashi variances, log-det) works unchanged.

Structure: all operands are banded with row support <= bs, so rows group
into the same two-block windows as the A^T A Gram path
(`ops/ata_windows.ATAWindowPlan`). The sweep processes windows left to
right keeping an upper-trapezoidal carry of bs rows:

    step b:  T   = [ carry ; rows(window b) ]          [(bs + m_b), 2bs]
             R_T = qr(T, mode='r')                      (MXU Householder)
             out: R[b, b] = R_T[:bs, :bs],  R[b, b+1] = R_T[:bs, bs:]
             carry' = R_T[bs:2bs, bs:]  (already upper-triangular)

This is the QR analog of the blocked Cholesky sweep
(`/root/reference/src/tridiagonal_cholesky.jl:65-82`) and the batch form of
the Kalman square-root information filter. Per-window cost is one dense
QR of ~[3bs, 2bs] — ~8x the flops of the Cholesky step, but in f32 on the
MXU instead of ~47x-slower emulated f64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from diffeqgmrfs_tpu.ops.packed import (
    PackedBTDCholesky,
    PackedBTDRFactor,
    PackedBTDRFullFactor,
)


def _window_panel(plan, vals, b, bs, dtype, col_scale=None, rows_slice=None):
    """Dense [R, plan.width] panel of window b's rows (compare-accumulate
    via ata_windows.dense_rows_from_slots — TPU generic scatter is ~5x
    slower). `col_scale`: optional per-global-column scaling
    (equilibration), padded to N*bs. `rows_slice`: optional static (k0, k1)
    sub-range of the window's row slots (chunked QR)."""
    rows = jnp.asarray(plan.rows)
    mask = jnp.asarray(plan.mask, dtype=dtype)
    lcols = jnp.asarray(plan.local_cols)
    if rows_slice is not None:
        k0, k1 = rows_slice
        rows = rows[:, k0:k1]
        mask = mask[:, k0:k1]
        lcols = lcols[:, k0:k1]
    v = (vals[rows[b]] * mask[b][:, None]).astype(dtype)
    if col_scale is not None:
        gcols = b * plan.bs_f + lcols[b]
        v = v * col_scale[gcols].astype(dtype)
    from diffeqgmrfs_tpu.ops.ata_windows import dense_rows_from_slots

    return dense_rows_from_slots(v, lcols[b], plan.width)


def _shifted_cholqr(P, passes: int = 2, shift_passes: int | None = None):
    """Panel orthonormalization by shifted CholeskyQR: -> (Q, R) with
    Q R = P EXACTLY (per-pass Q := P R^{-1}, so reconstruction never
    degrades) and Q orthonormal to ~m*eps after `passes` passes.

    The shift s ~ m*eps*||G|| keeps the f32 Cholesky of the Gram valid for
    panel conditions up to ~1/(m*eps); it ALSO bounds the achievable
    orthonormality at ~s (Q^T Q = I - s R^{-T}R^{-1} + ...), which is what
    capped the all-shifted bcgs2 engine at ~1e-2/1e-3 panel orthogonality
    (~3 lost factor digits at the cond~1e4-1e5 production windows,
    RESULTS.md "QR engine accuracy").

    shift_passes (default: all): number of INITIAL passes that use the
    full m-scaled shift; the remaining passes use a ~m/p-smaller floor
    shift (8*eps*maxdiag). Each full-shift pass contracts the panel
    condition by ~sqrt(s) (cond_k+1 ~ cond_k * sqrt(s)); once
    cond^2 < 1/eps the unshifted-class Cholesky of the near-identity Gram
    is safe and one-two floor-shift passes drive orthonormality to the
    ~eps representation level — Householder-grade panels from pure
    GEMM/TRSM. Two full + two floor passes cover window cond up to ~1e5
    (the measured production range) in f32.
    All-zero columns (structural padding) get Q = 0 and a sqrt(s)-level
    diagonal, below the rounding floor of the assembled system.
    """
    m, p = P.shape
    eps = jnp.finfo(P.dtype).eps
    if shift_passes is None:
        shift_passes = passes
    R_acc = None
    eye = jnp.eye(p, dtype=P.dtype)
    for k in range(passes):
        G = P.T @ P
        s_full = 8.0 * m * eps * jnp.max(jnp.diagonal(G))
        if k < shift_passes:
            Rp = jnp.linalg.cholesky(G + (s_full + 1e-30) * eye).T
        else:
            # floor-shift pass: reaches ~eps orthonormality, but the
            # Cholesky goes indefinite (NaN fill) when the panel condition
            # entering this pass still exceeds the f32 range (measured:
            # elliptic N100 TPU windows) — fall back to the full shift for
            # THAT pass only (those panels keep the ~s-level cap; the SRIF
            # refinement loop absorbs it). NaN at the last diagonal flags
            # any failed pivot (NaN propagates down the factorization).
            s_floor = 8.0 * eps * jnp.max(jnp.diagonal(G))
            Rp = jnp.linalg.cholesky(G + (s_floor + 1e-30) * eye).T
            Rp = jnp.where(
                jnp.isnan(Rp[p - 1, p - 1]),
                jnp.linalg.cholesky(G + (s_full + 1e-30) * eye).T,
                Rp,
            )
        P = lax.linalg.triangular_solve(Rp, P, left_side=False, lower=False)
        R_acc = Rp if R_acc is None else Rp @ R_acc
    return P, R_acc


def _bhh_qr_r(T, panel: int = 512, reorth: bool = True):
    """R factor of T [m, n] by blocked HOUSEHOLDER panels + GEMM trailing
    updates: each panel is factored by XLA's Householder QR (orthonormal to
    ~eps), and the trailing block is updated as A - Q (Q^T A) — two
    MXU-rate GEMMs instead of Householder's serialized reflector
    applications over the whole width. This is block Gram-Schmidt with
    Householder-quality panels; `reorth` adds a second projection pass
    (BCGS2), restoring near-Householder factor quality at the cost of two
    extra GEMMs per panel (the trailing GEMMs dominate, so the QR rides
    the MXU at a large fraction of peak instead of XLA qr's ~50%).
    """
    m, n = T.shape
    A = T
    R = jnp.zeros((n, n), T.dtype)
    for j in range(0, n, panel):
        pj = min(panel, n - j)
        Qp, Rp = jnp.linalg.qr(A[:, j : j + pj], mode="reduced")
        R = R.at[j : j + pj, j : j + pj].set(Rp[:pj])
        if j + pj < n:
            Tr = A[:, j + pj :]
            S = Qp.T @ Tr
            Tr = Tr - Qp @ S
            if reorth:
                S2 = Qp.T @ Tr
                Tr = Tr - Qp @ S2
                S = S + S2
            A = A.at[:, j + pj :].set(Tr)
            R = R.at[j : j + pj, j + pj :].set(S[:pj])
    return R


def _tshh_qr_r(T, panel: int = 512, reorth: bool = True, max_chunks: int = 8):
    """R factor of T [m, n]: blocked Householder panels where each PANEL is
    factored by a two-stage TSQR tree instead of one tall serialized
    Householder QR.

    `_bhh_qr_r` already moves the trailing updates onto the MXU, but its
    panel factorization `qr([m, panel])` remains XLA's column-serialized
    Householder over the FULL m rows — at the Darcy-N300 window shape
    ([22272, 7424], panel 512) the 15 panel QRs are ~8% of the flops yet
    dominate wall-clock. Here each panel splits into K row chunks factored
    by ONE batched QR ([K, m/K, p] — XLA's per-column sweep then processes
    all K chunks simultaneously), and the chunk R factors reduce through a
    single small QR ([K*p, p]). The panel Q is never formed: with
    Q_panel = blkdiag(Qc) @ Q2, the trailing projection/update are batched
    GEMMs through the (Qc, Q2) pair. Orthonormality is Householder-quality
    (a product of exactly-orthonormal factors), so the factor error keeps
    the ~eps sqrt(cond) SRIF bound; `reorth` adds the BCGS2 second pass.
    """
    m, n = T.shape
    A = T
    R = jnp.zeros((n, n), T.dtype)
    for j in range(0, n, panel):
        pj = min(panel, n - j)
        # chunk count: keep chunks at least 2*pj tall so the tree pays off
        K = max(1, min(max_chunks, m // max(2 * pj, 1)))
        if K == 1:
            Qp, Rp = jnp.linalg.qr(A[:, j : j + pj], mode="reduced")
            R = R.at[j : j + pj, j : j + pj].set(Rp[:pj])
            if j + pj < n:
                Tr = A[:, j + pj :]
                S = Qp.T @ Tr
                Tr = Tr - Qp @ S
                if reorth:
                    S2 = Qp.T @ Tr
                    Tr = Tr - Qp @ S2
                    S = S + S2
                A = A.at[:, j + pj :].set(Tr)
                R = R.at[j : j + pj, j + pj :].set(S[:pj])
            continue
        mc = -(-m // K)  # chunk height; zero-pad below (R is unchanged)
        mp = mc * K
        P = A[:, j : j + pj]
        if mp != m:
            P = jnp.concatenate(
                [P, jnp.zeros((mp - m, pj), A.dtype)], axis=0
            )
        Qc, Rc = jnp.linalg.qr(P.reshape(K, mc, pj), mode="reduced")
        Q2, Rp = jnp.linalg.qr(Rc.reshape(K * pj, pj), mode="reduced")
        R = R.at[j : j + pj, j : j + pj].set(Rp)
        if j + pj < n:
            Tr = A[:, j + pj :]
            nt = Tr.shape[1]
            if mp != m:
                Tr = jnp.concatenate(
                    [Tr, jnp.zeros((mp - m, nt), A.dtype)], axis=0
                )
            Q2c = Q2.reshape(K, pj, pj)

            def project(Tr):
                # S = Q_panel^T Tr ; Tr -= Q_panel S  (all batched GEMMs)
                W = jnp.einsum("kmp,kmn->kpn", Qc, Tr.reshape(K, mc, nt))
                S = jnp.einsum("kpq,kpn->qn", Q2c, W)
                U = jnp.einsum("kpq,qn->kpn", Q2c, S)
                Tr = (
                    Tr.reshape(K, mc, nt)
                    - jnp.einsum("kmp,kpn->kmn", Qc, U)
                ).reshape(mp, nt)
                return Tr, S

            Tr, S = project(Tr)
            if reorth:
                Tr, S2 = project(Tr)
                S = S + S2
            A = A.at[:, j + pj :].set(Tr[:m])
            R = R.at[j : j + pj, j + pj :].set(S)
    return R


def _bcgs_qr_r(
    T,
    panel: int = 512,
    passes: int = 3,
    reorth: bool = False,
    shift_passes: int | None = None,
):
    """R factor of T [m, n] by right-looking block Gram-Schmidt with
    shifted-CholQR panels — QR built ENTIRELY from GEMM/TRSM (MXU-rate,
    and it rides `default_matmul_precision`), unlike Householder QR whose
    panel factorization serializes (XLA qr measured ~11 TF/s vs 22.5 f32 /
    35.5 tf32 GEMM on v5e).

    reorth=False (qr_impl="bcgs"): single projection pass (block MGS
    across panels) — inter-panel orthogonality degrades as
    ~eps_mm * cond(T). Measured on the cond~1e10 SRIF test (cond(S)~1e5,
    f32): refinement contracts at ~0.03-0.16/step (vs ~1e-5/step for
    Householder) — usable but needing ~4x the refinement iterations, so
    single-pass stays EXPERIMENTAL.

    reorth=True (qr_impl="bcgs2"): the same BCGS2 second projection pass
    `_bhh_qr_r` uses — with eps-orthonormal panels (shifted CholQR,
    passes=3 ~ CholeskyQR3: one shifted pass caps the panel condition,
    two more drive orthonormality to ~m*eps) the two-pass projection
    restores near-Householder inter-panel orthogonality while every flop
    stays GEMM/TRSM. The trailing update costs 4 GEMMs per panel instead
    of 2 (same count as bhh reorth), but the serialized Householder panel
    factorization — which dominates bhh's wall-clock — is gone. TPU
    probe (2688x1792 window, f32): bcgs 50.8 TF/s, bhh noreorth 16.6,
    XLA qr 13.0.

    shift_passes: staged shifts (see _shifted_cholqr) — qr_impl="bcgs4"
    uses (passes=4, shift_passes=2): two full-shift passes contract the
    panel condition below the f32-Cholesky range, two floor-shift passes
    drive orthonormality to ~eps, removing bcgs2's ~s-level panel
    orthogonality cap (its 3-lost-digits / 12-refinement-iteration cost)
    while staying all-GEMM.
    """
    m, n = T.shape
    A = T
    R = jnp.zeros((n, n), T.dtype)
    for j in range(0, n, panel):
        pj = min(panel, n - j)
        Qp, Rp = _shifted_cholqr(A[:, j:j + pj], passes, shift_passes)
        R = R.at[j:j + pj, j:j + pj].set(Rp)
        if j + pj < n:
            Tr = A[:, j + pj:]
            S = Qp.T @ Tr
            Tr = Tr - Qp @ S
            if reorth:
                S2 = Qp.T @ Tr
                Tr = Tr - Qp @ S2
                S = S + S2
            A = A.at[:, j + pj:].set(Tr)
            R = R.at[j:j + pj, j + pj:].set(S)
    return R


def srif_packed_qr(
    operands,
    n: int,
    N: int,
    bs: int,
    dtype=jnp.float32,
    col_scale=None,
    chunk_rows: int | None = None,
    matmul_precision: str = "float32",
    qr_impl: str = "xla",
    panel: int = 512,
    full_offdiag="auto",
    prior_factor: PackedBTDRFactor | None = None,
    prior_rescale=None,
    window_range=None,
    state=None,
    finalize: bool = True,
) -> PackedBTDRFactor:
    """QR-factor the stacked banded system into a packed R-form factor.

    operands: list of (plan: ATAWindowPlan, vals [n_rows, K]) — the stacked
    S is the union of all operands' rows. Every plan must share (n, N, bs).
    col_scale: optional [n]-vector; columns of S are scaled by it
    (symmetric equilibration of H = S^T S). Returns R as a
    `PackedBTDRFactor` (positive diagonal, padding rows set to identity).

    qr_impl: "xla" (Householder via jnp.linalg.qr), "bhh" (blocked
    Householder panels + GEMM trailing updates; BCGS2 reorth pass),
    "bhh1" (bhh without the reorthogonalization pass — single-pass block
    Gram-Schmidt with Householder panels: the fastest Householder-grade
    engine measured on the v5e [~19.9 TF/s actual flops vs xla's 13.0 at
    the N300 window shape]; inter-panel orthogonality degrades as
    ~eps*cond(panel-block) like classical BGS, so validate accuracy at
    the target condition before production use), "bcgs2" (BCGS2 with
    shifted-CholQR3 panels — ALL-GEMM, near-Householder stability; the
    fast stable engine), or "bcgs" (single-pass block Gram-Schmidt —
    experimental; factor error ~ eps_mm * cond(S), absorbed by
    refinement while << 1 but needing ~4x the iterations).

    matmul_precision: MXU precision for the QR's internal GEMMs.
    "float32" (default) gives factor error ~ eps_f32 sqrt(cond H);
    "tensorfloat32" trades ~5 decimal digits of factor accuracy
    (refinement still contracts while 2e-6 sqrt(cond H) < 1) for
    considerably faster trailing updates on the MXU.

    prior_factor / prior_rescale: SRIF measurement-update form. When the
    stacked system is [Λ; sqrt(tau) A] with Λ INSTANCE-INDEPENDENT (the
    prior sqrt — 4n of the 5n stacked rows at Darcy N300), pre-reduce Λ
    once into its triangular factor R_Λ = qr(Λ·diag(cs0)) and pass it
    here: each window then stacks only [carry; R_Λ rows; instance rows],
    cutting per-instance QR flops ~2x on top of the split-window win.
    `prior_rescale` ([n] or [N*bs]) re-scales R_Λ's COLUMNS from its
    build-time equilibration cs0 to this call's col_scale cs
    (rescale = cs/cs0) — column scaling preserves triangularity, so the
    two-stage QR computes the same R as the one-shot stack (TSQR
    associativity), up to the f32 error of R_Λ which the refinement
    loop absorbs. Banded (strictly-lower) packing only.

    window_range / state / finalize: stepped-sweep surface for
    host-orchestrated chunked dispatch (`srif_packed_qr_chunked`). When
    `window_range=(b0, b1)` is given (ints or traced scalars), only loop
    iterations [b0, b1) of the window sweep run, starting from `state`
    (the raw loop carry of a previous call; zeros when None) — banded
    state is (P, carry), full-offdiagonal state is (P, U, carry).  With
    `finalize=False` the raw state is returned instead of a factor; the
    last chunk (or a trailing call with an empty range) passes
    `finalize=True` to fold the final diagonal block and fix padding.
    One XLA program serves every chunk (traced bounds), so a jitted
    chunk function with a DONATED state bounds peak HBM at
    [state + one chunk's QR workspace] instead of the whole sweep's
    live set — the v5e fit for the N300 measurement-update prefactor
    (RESULTS.md queue K/L: the fused program needs 18.7 GiB vs 15.75).

    chunk_rows: when set, each window's tall stack is triangularized by
    SEQUENTIAL row-block QRs of at most (2bs + chunk_rows) rows —
    mathematically identical (R is unique up to row signs), but peak QR
    workspace is bounded by the chunk instead of the full window row count.
    At Darcy N_xy=300 the one-shot (22k x 7424) window QR plus the resident
    packed factor exceeds v5e HBM; chunking trades ~1.5x QR flops for
    fitting. Default (None) keeps the single full-stack QR per window.
    """
    for plan, _ in operands:
        if (plan.N, plan.bs) != (N, bs):
            raise ValueError("operand plan partition mismatch")
    splits = {plan.split for plan, _ in operands}
    if len(splits) != 1:
        raise ValueError(f"operand plans disagree on split: {splits}")
    split = splits.pop()
    bs_f = bs // split
    W = bs + bs_f  # window width (2bs when split == 1)
    # strictly-lower slot packing of R[b, b+1] is valid only while the
    # scalar bandwidth of H = S^T S stays < bs, i.e. every operand row
    # spans < bs columns. ST joint precisions (dense time-coupling blocks)
    # violate this -> emit the full off-diagonal block instead
    # (PackedBTDRFullFactor). max_span == -1 means "unknown": be safe.
    spans = [plan.max_span for plan, _ in operands]
    needs_full = any(s < 0 or s >= bs for s in spans)
    full_req = full_offdiag  # caller's request, before auto-resolution
    if full_offdiag == "auto":
        full_offdiag = needs_full
    elif not full_offdiag and needs_full:
        raise ValueError(
            f"banded (strictly-lower) R packing requested but an operand row "
            f"spans >= bs columns (spans={spans}, bs={bs}); the factor's "
            f"off-diagonal block would be silently truncated — use "
            f"full_offdiag=True"
        )
    if isinstance(chunk_rows, str) and chunk_rows == "auto":
        # with slot-local consumers the unchunked sweep fits at Darcy
        # N_xy=300 (~5.5bs stacked rows) and is ~25% faster than 2bs
        # chunks; chunk only for much taller stacks
        total_R = sum(plan.rows.shape[1] for plan, _ in operands)
        chunk_rows = 2 * bs if total_R > 8 * bs else None
    cs = None
    if col_scale is not None:
        cs = jnp.asarray(col_scale)
        pad = N * bs - n
        if pad:
            cs = jnp.concatenate([cs, jnp.ones((pad,), cs.dtype)])
    rs = None
    prior_full = isinstance(prior_factor, PackedBTDRFullFactor)
    if prior_factor is not None:
        if prior_full:
            # a full-offdiagonal prefactor forces the full-offdiagonal
            # output form (its rows span up to 2bs columns)
            if full_req is False:
                raise ValueError(
                    "banded packing requested but prior_factor has full "
                    "off-diagonal blocks"
                )
            full_offdiag = True
        elif full_offdiag:
            raise NotImplementedError(
                "full-offdiagonal output requires a PackedBTDRFullFactor "
                "prior_factor (banded prefactor rows cannot reconstruct "
                "dense time-coupling blocks)"
            )
        if N == 1:
            raise NotImplementedError("prior_factor requires N > 1")
        if (prior_factor.N, prior_factor.bs) != (N, bs):
            raise ValueError("prior_factor partition mismatch")
        if prior_rescale is not None:
            rs = jnp.asarray(prior_rescale)
            pad = N * bs - rs.shape[0]
            if pad:
                rs = jnp.concatenate([rs, jnp.ones((pad,), rs.dtype)])

    def prior_rows(b, B, t):
        """[bs_f, W] rows of the precomputed prior factor for fine window
        b = split*B + t: a static slice of slot B's dense row expansion
        (left = triu -> R[B,B], strict-tril -> R[B,B+1])."""
        slot = lax.dynamic_slice(
            prior_factor.P, (B, 0), (1, bs * bs)
        ).reshape(bs, bs)
        i = jnp.arange(bs)[:, None]
        j = jnp.arange(bs)[None, :]
        dense = jnp.concatenate(
            [jnp.where(j >= i, slot, 0.0), jnp.where(j < i, slot, 0.0)],
            axis=1,
        )  # [bs, 2bs]
        rows = dense[t * bs_f : (t + 1) * bs_f, t * bs_f : t * bs_f + W]
        if rs is not None:
            gcols = b * bs_f + jnp.arange(W)
            rows = rows * rs[gcols].astype(rows.dtype)
        return rows.astype(dtype)

    def prior_rows_full(b):
        """[bs, 2bs] block row b of a full-offdiagonal prefactor:
        [triu(R[b,b]) | R[b,b+1]] (split == 1, W == 2bs)."""
        slot = lax.dynamic_slice(
            prior_factor.P, (b, 0), (1, bs * bs)
        ).reshape(bs, bs)
        uslot = lax.dynamic_slice(
            prior_factor.U, (b, 0), (1, bs * bs)
        ).reshape(bs, bs)
        rows = jnp.concatenate([jnp.triu(slot), uslot], axis=1)
        if rs is not None:
            gcols = b * bs + jnp.arange(2 * bs)
            rows = rows * rs[gcols].astype(rows.dtype)
        return rows.astype(dtype)

    def panels(b, rows_slice=None, op_idx=None):
        sel = operands if op_idx is None else [operands[op_idx]]
        return [
            _window_panel(
                plan, jnp.asarray(vals), b, bs, dtype, cs, rows_slice
            )
            for plan, vals in sel
        ]

    def chunk_plan():
        """Static (op_idx, k0, k1) chunks covering all operand row slots."""
        chunks = []
        for i, (plan, _) in enumerate(operands):
            R = plan.rows.shape[1]
            step = chunk_rows if chunk_rows else R
            for k0 in range(0, R, step):
                chunks.append((i, k0, min(k0 + step, R)))
        return chunks

    def qr_r(T):
        if qr_impl == "bcgs":
            return _bcgs_qr_r(T, panel=panel)[:W]
        if qr_impl == "bcgs2":
            return _bcgs_qr_r(T, panel=panel, reorth=True)[:W]
        if qr_impl == "bcgs4":
            return _bcgs_qr_r(
                T, panel=panel, passes=4, reorth=True, shift_passes=2
            )[:W]
        if qr_impl == "bhh":
            return _bhh_qr_r(T, panel=panel)[:W]
        if qr_impl == "bhh1":
            return _bhh_qr_r(T, panel=panel, reorth=False)[:W]
        if qr_impl == "tshh":
            return _tshh_qr_r(T, panel=panel)[:W]
        return jnp.linalg.qr(T, mode="r")[:W]

    def reduce_window(b, carry, extra=None):
        """Triangularize [carry; (prior rows;) window rows] -> R_T [W, W]."""
        pre = [carry] + ([extra] if extra is not None else [])
        if chunk_rows is None:
            T = jnp.concatenate(pre + panels(b), axis=0)
            if T.shape[0] < W:
                T = jnp.pad(T, ((0, W - T.shape[0]), (0, 0)))
            return qr_r(T)
        Rcur = carry
        for ci, (i, k0, k1) in enumerate(chunk_plan()):
            M = panels(b, rows_slice=(k0, k1), op_idx=i)[0]
            head = [Rcur] + ([extra] if (extra is not None and ci == 0) else [])
            T = jnp.concatenate(head + [M], axis=0)
            if T.shape[0] < W:
                T = jnp.pad(T, ((0, W - T.shape[0]), (0, 0)))
            Rcur = qr_r(T)
        return Rcur

    with jax.default_matmul_precision(matmul_precision):
        if N == 1:
            if window_range is not None or state is not None:
                raise ValueError("window_range/state require N > 1")
            T = jnp.concatenate(panels(0), axis=0)[:, :bs]
            if T.shape[0] < bs:
                T = jnp.pad(T, ((0, bs - T.shape[0]), (0, 0)))
            R_T = jnp.linalg.qr(T, mode="r")[:bs]
            s = jnp.where(jnp.diag(R_T) < 0, -1.0, 1.0).astype(dtype)
            R = jnp.triu(s[:, None] * R_T)
            return _fix_padding(PackedBTDRFactor(R.reshape(1, -1), n, bs))

        Nw = N - 1
        # FLAT [N, bs*bs] slots: the reshape at the slot boundary pins the
        # factor to a plain 2D row-major layout — with 3D storage, XLA
        # reconciled QR-producer and triangular-solve-consumer preferences
        # by transposing the whole buffer's layout and double-copying the
        # 5 GB loop carry (see PackedBTDRFactor docstring)
        P0 = jnp.zeros((N, bs * bs), dtype=dtype)
        carry0 = jnp.zeros((bs, W), dtype=dtype)

        if full_offdiag:
            if split != 1:
                raise ValueError(
                    "split > 1 requires banded operands (row span < bs); "
                    "full-offdiagonal factors need split=1 plans"
                )
            U0 = jnp.zeros((Nw, bs * bs), dtype=dtype)

            def body(b, state):
                P, U, carry = state
                extra = (
                    prior_rows_full(b) if prior_factor is not None else None
                )
                R_T = reduce_window(b, carry, extra)
                s = jnp.where(jnp.diagonal(R_T) < 0, -1.0, 1.0).astype(dtype)
                R_T = s[:, None] * R_T
                P = lax.dynamic_update_slice(
                    P, jnp.triu(R_T[:bs, :bs]).reshape(1, -1), (b, 0)
                )
                U = lax.dynamic_update_slice(
                    U, R_T[:bs, bs:].reshape(1, -1), (b, 0)
                )
                return P, U, jnp.pad(R_T[bs:, bs:], ((0, 0), (0, bs)))

            b_lo, b_hi = (0, Nw) if window_range is None else window_range
            st0 = (P0, U0, carry0) if state is None else state
            P, U, carry = lax.fori_loop(b_lo, b_hi, body, st0)
            if not finalize:
                return P, U, carry
            carry_last = carry[:, :bs]
            if prior_factor is not None:
                # fold in the prefactor's final diagonal block (its rows
                # never pass through a window — windows end at block N-2)
                slotN = prior_factor.P[N - 1].reshape(bs, bs)
                last_rows = jnp.triu(slotN).astype(dtype)
                if rs is not None:
                    gcols = (N - 1) * bs + jnp.arange(bs)
                    last_rows = last_rows * rs[gcols][None, :].astype(dtype)
                carry_last = jnp.linalg.qr(
                    jnp.concatenate([carry_last, last_rows], axis=0),
                    mode="r",
                )[:bs]
            s = jnp.where(jnp.diagonal(carry_last) < 0, -1.0, 1.0).astype(
                dtype
            )
            Rlast = jnp.triu(s[:, None] * carry_last)
            P = lax.dynamic_update_slice(P, Rlast.reshape(1, -1), (N - 1, 0))
            return _fix_padding_full(PackedBTDRFullFactor(P, U, n, bs))

        def body(B, state):
            # R-form packing: slot B = triu(R[B,B]) + strict-tril(R[B,B+1]),
            # assembled from the `split` fine windows of big block B —
            # ONE untransposed write per slot. Fine window b emits the
            # R rows of fine block b ([bs_f, W] at static inner offset
            # t*bs_f); the carry (rows not yet triangular-final) spans
            # the next bs columns.
            P, carry = state
            Ebig = jnp.zeros((bs, 2 * bs), dtype=dtype)
            for t in range(split):
                b = split * B + t if split > 1 else B
                extra = (
                    prior_rows(b, B, t) if prior_factor is not None else None
                )
                R_T = reduce_window(b, carry, extra)
                s = jnp.where(jnp.diagonal(R_T) < 0, -1.0, 1.0).astype(dtype)
                R_T = s[:, None] * R_T
                Ebig = lax.dynamic_update_slice(
                    Ebig, R_T[:bs_f], (t * bs_f, t * bs_f)
                )
                # carry covers the next bs columns; the last bs_f columns
                # of the next window start empty
                carry = jnp.pad(R_T[bs_f:, bs_f:], ((0, 0), (0, bs_f)))
            slot = jnp.triu(Ebig[:, :bs]) + jnp.tril(Ebig[:, bs:], -1)
            P = lax.dynamic_update_slice(P, slot.reshape(1, -1), (B, 0))
            return P, carry

        b_lo, b_hi = (0, N - 1) if window_range is None else window_range
        st0 = (P0, carry0) if state is None else state
        P, carry = lax.fori_loop(b_lo, b_hi, body, st0)
        if not finalize:
            return P, carry
        # final block: carry's left half is R[N-1, N-1] (upper-tri; right
        # half is structurally zero — no operand column reaches past n_pad)
        carry_last = carry[:, :bs]
        if prior_factor is not None:
            # the prefactor's LAST block rows never pass through a window
            # (windows end at big block N-2): fold them in with one extra
            # [2bs, bs] reduction over the final block's columns
            slotN = prior_factor.P[N - 1].reshape(bs, bs)
            last_rows = jnp.triu(slotN).astype(dtype)
            if rs is not None:
                gcols = (N - 1) * bs + jnp.arange(bs)
                last_rows = last_rows * rs[gcols][None, :].astype(dtype)
            carry_last = jnp.linalg.qr(
                jnp.concatenate([carry_last, last_rows], axis=0), mode="r"
            )[:bs]
        s = jnp.where(jnp.diagonal(carry_last) < 0, -1.0, 1.0).astype(dtype)
        Rlast = jnp.triu(s[:, None] * carry_last)
        P = lax.dynamic_update_slice(P, Rlast.reshape(1, -1), (N - 1, 0))
        return _fix_padding(PackedBTDRFactor(P, n, bs))


@functools.lru_cache(maxsize=32)
def _chunked_programs(n, N, bs, dtype_name, full_eff, kw_key):
    """Jitted (step, final) chunk programs for srif_packed_qr_chunked,
    cached on the static configuration so repeated per-instance calls hit
    the SAME jit cache (fresh closures per call would recompile the big
    chunk program for every instance)."""
    dtype = jnp.dtype(dtype_name)
    kw = dict(kw_key)

    def _run(ops, cs, pf, rs, state, rng, fin):
        return srif_packed_qr(
            list(ops), n, N, bs, dtype=dtype, col_scale=cs,
            prior_factor=pf, prior_rescale=rs, full_offdiag=full_eff,
            window_range=rng, state=state, finalize=fin, **kw,
        )

    step = jax.jit(functools.partial(_run, fin=False), donate_argnums=(4,))
    final = jax.jit(functools.partial(_run, fin=True), donate_argnums=(4,))
    return step, final


def srif_packed_qr_chunked(
    operands,
    n: int,
    N: int,
    bs: int,
    *,
    chunk_windows: int = 16,
    dtype=jnp.float32,
    col_scale=None,
    prior_factor=None,
    prior_rescale=None,
    full_offdiag="auto",
    **kw,
):
    """Host-orchestrated chunked window sweep: the SAME factor as
    `srif_packed_qr`, built by ceil((N-1)/chunk_windows) dispatches of one
    jitted chunk program with a DONATED loop state (P[, U], carry).

    Peak device memory per dispatch = resident inputs (operand values,
    window plans, optional prefactor) + the state (aliased in/out via
    donation) + ONE chunk's QR workspace — instead of the fused sweep's
    whole live set. At Darcy N300 with the measurement-update prefactor
    the fused conditioning program needs 18.7 GiB (> the v5e's 15.75,
    RESULTS.md queue K); the chunked sweep fits with headroom, re-enabling
    the prefactor's ~2.4x per-instance QR-flop cut on 16 GB chips.

    Values must be CONCRETE (host orchestration dispatches per chunk) —
    call outside jit. Traced chunk bounds keep it ONE compile; the window
    plans and all operand arrays thread through the jit signature (never
    baked as constants — the relay's HTTP compile-request limit,
    docs/RELAY_FAULT_REPORT.md).
    """
    if N == 1:
        return srif_packed_qr(
            operands, n, N, bs, dtype=dtype, col_scale=col_scale,
            prior_factor=prior_factor, prior_rescale=prior_rescale,
            full_offdiag=full_offdiag, **kw,
        )
    plans = tuple(p for p, _ in operands)
    spans = [p.max_span for p in plans]
    needs_full = any(s < 0 or s >= bs for s in spans)
    prior_full = isinstance(prior_factor, PackedBTDRFullFactor)
    full_eff = (
        (needs_full or prior_full)
        if full_offdiag == "auto"
        else bool(full_offdiag)
    )
    splits = {p.split for p in plans}
    if len(splits) != 1:
        raise ValueError(f"operand plans disagree on split: {splits}")
    W = bs + bs // splits.pop()

    kw_key = tuple(sorted(kw.items()))
    step, final = _chunked_programs(
        n, N, bs, np.dtype(dtype).name, bool(full_eff), kw_key
    )

    nloop = N - 1
    P0 = jnp.zeros((N, bs * bs), dtype)
    carry0 = jnp.zeros((bs, W), dtype)
    state = (
        (P0, jnp.zeros((nloop, bs * bs), dtype), carry0)
        if full_eff
        else (P0, carry0)
    )
    cs = None if col_scale is None else jnp.asarray(col_scale)
    rs = None if prior_rescale is None else jnp.asarray(prior_rescale)
    ops = tuple(operands)
    for b0 in range(0, nloop, chunk_windows):
        b1 = min(b0 + chunk_windows, nloop)
        state = step(
            ops, cs, prior_factor, rs, state,
            (jnp.asarray(b0), jnp.asarray(b1)),
        )
    return final(
        ops, cs, prior_factor, rs, state,
        (jnp.asarray(nloop), jnp.asarray(nloop)),
    )


def _fix_padding(F: PackedBTDRFactor) -> PackedBTDRFactor:
    """Unit diagonal on padding rows (cols >= n) so triangular solves stay
    finite; padded rhs entries are zero so the unit block is inert."""
    N, bs, n = F.N, F.bs, F.n
    if N * bs == n:
        return F
    # padding rows (N*bs - n < bs) all live in the LAST slot; fixing only
    # that slot avoids a whole-buffer indexed scatter, which would make XLA
    # keep a second (dim0-minor) layout copy of the 5 GB factor at N_xy=300
    # detect padding purely by row/col index: structurally-zero columns
    # from the Householder path leave exact zeros, but the bcgs engine's
    # shifted CholeskyQR leaves ~sqrt(shift)-level values on padding slots
    # that a magnitude test would miss (ADVICE r1) — zero every padding
    # entry, then unit diagonal. Padding columns live in the LAST slot's
    # triu (R[N-1,N-1]) and the SECOND-TO-LAST slot's strict-tril
    # (R[N-2,N-1]); fixing only those slots keeps every write slot-local
    # (whole-buffer scatters force a second layout copy of the factor).
    pad_row = (N - 1) * bs + jnp.arange(bs) >= n  # [bs] bool
    didx = jnp.arange(bs) * (bs + 1)
    upper = jnp.triu(jnp.ones((bs, bs), dtype=bool))
    last = F.P[N - 1].reshape(bs, bs)
    keep = jnp.where(pad_row[:, None] | (upper & pad_row[None, :]), 0.0, 1.0)
    last = (last * keep.astype(last.dtype)).reshape(-1)
    last = last.at[didx].set(jnp.where(pad_row, 1.0, last[didx]))
    P = lax.dynamic_update_slice(F.P, last[None], (N - 1, 0))
    if N >= 2:
        prev = F.P[N - 2].reshape(bs, bs)
        keep2 = jnp.where(~upper & pad_row[None, :], 0.0, 1.0)
        prev = prev * keep2.astype(prev.dtype)
        P = lax.dynamic_update_slice(P, prev.reshape(1, -1), (N - 2, 0))
    return type(F)(P, n, bs)


def _fix_padding_full(F: PackedBTDRFullFactor) -> PackedBTDRFullFactor:
    """Padding fix-up for the full-offdiagonal R factor: unit diagonal on
    padding rows of the last triu slot, zero on its padding rows/cols and on
    padding COLUMNS of U[N-2] (which addresses block N-1)."""
    N, bs, n = F.N, F.bs, F.n
    if N * bs == n:
        return F
    pad_row = (N - 1) * bs + jnp.arange(bs) >= n
    didx = jnp.arange(bs) * (bs + 1)
    upper = jnp.triu(jnp.ones((bs, bs), dtype=bool))
    last = F.P[N - 1].reshape(bs, bs)
    keep = jnp.where(pad_row[:, None] | (upper & pad_row[None, :]), 0.0, 1.0)
    last = (last * keep.astype(last.dtype)).reshape(-1)
    last = last.at[didx].set(jnp.where(pad_row, 1.0, last[didx]))
    P = lax.dynamic_update_slice(F.P, last[None], (N - 1, 0))
    U = F.U
    if N >= 2:
        u = F.U[N - 2].reshape(bs, bs)
        u = u * jnp.where(pad_row[None, :], 0.0, 1.0).astype(u.dtype)
        U = lax.dynamic_update_slice(U, u.reshape(1, -1), (N - 2, 0))
    return type(F)(P, U, n, bs)


def rowop_window_plan(A, n: int, bs: int, zero_slots="auto", split: int = 1):
    """ATAWindowPlan for a RowOp's rows (SRIF operand form).

    zero_slots="auto" marks structurally-zero slots (ELL padding /
    condensation zeros) from the CURRENT values — valid when the structure
    has zeros exactly where every instance does (true for from_csr padding
    and constraint condensation)."""
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    zs = None
    if isinstance(zero_slots, str) and zero_slots == "auto":
        zs = np.asarray(A.vals) == 0.0
        if not zs.any():
            zs = None
    elif zero_slots is not None:
        zs = np.asarray(zero_slots, dtype=bool)
    return make_ata_window_plan(
        np.asarray(A.cols), n, bs, zero_slots=zs, split=split
    )
