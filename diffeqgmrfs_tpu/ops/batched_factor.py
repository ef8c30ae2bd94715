"""Batched small-matrix factor kernels for level-batched multifrontal work.

XLA's `jnp.linalg.cholesky` / `triangular_solve` lower to per-COLUMN
serial expanders that do not vectorize across a leading batch axis: on
v5e, vmapped cholesky over fronts of size 64..2048 measured 0.01..3.4
TF/s (experiments/probe_front_rates.py) — two orders of magnitude off
the 16+ TF/s the blocked-panel BTD sweep reaches on big single blocks.
That rate gap is exactly what blocks the nested-dissection/multifrontal
path (ROADMAP "Open" item 0): ND's 5-8x flop reduction is worthless if
its many small fronts run 100x below the banded sweep's rate.

The fix mirrors `ops/blocked_factor.py` but batches DOWN the recursion:

- base case [B, b, b] (b <= 32): fully unrolled Cholesky-Crout — b steps
  of batch-parallel elementwise/matvec ops (VPU work over the whole
  batch at every step; no per-matrix serialization),
- panel TRSMs with the same unrolled base (b steps of batched AXPY),
- all trailing updates are single batched GEMMs ([B, m, p] @ [B, p, p])
  that ride the MXU.

For front n with base b, the non-GEMM work is ~(b/n)^2 of the flops.

Reference context: the per-block dense cholesky of
`/root/reference/src/tridiagonal_cholesky.jl:65-82` — here re-shaped for
MANY independent small blocks instead of one large one.
"""

from __future__ import annotations

import jax.numpy as jnp


def potrf_unrolled(A):
    """Lower Cholesky of SPD A [..., b, b] with a fully unrolled Crout
    sweep: every step is batch-parallel. Intended for b <= 32 (the loop
    is unrolled at trace time). Strict upper of the result is zero.
    """
    b = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(b):
        d = A[..., j, j]
        if j:
            d = d - jnp.sum(L[..., j, :j] * L[..., j, :j], axis=-1)
        dj = jnp.sqrt(d)
        L = L.at[..., j, j].set(dj)
        if j + 1 < b:
            c = A[..., j + 1 :, j]
            if j:
                c = c - jnp.einsum(
                    "...ik,...k->...i", L[..., j + 1 :, :j], L[..., j, :j]
                )
            L = L.at[..., j + 1 :, j].set(c / dj[..., None])
    return L


def trsm_right_T_unrolled(L, B):
    """Solve X L^T = B for X [..., m, b], L [..., b, b] lower, unrolled
    over the b columns (batch-parallel forward substitution)."""
    b = L.shape[-1]
    X = jnp.zeros_like(B)
    for j in range(b):
        c = B[..., :, j]
        if j:
            c = c - jnp.einsum(
                "...mk,...k->...m", X[..., :, :j], L[..., j, :j]
            )
        X = X.at[..., :, j].set(c / L[..., j, j][..., None])
    return X


def trsm_left_unrolled(L, B, transpose: bool = False):
    """Solve L X = B (or L^T X = B) for X [..., b, k], unrolled rows."""
    b = L.shape[-1]
    X = jnp.zeros_like(B)
    rng = range(b) if not transpose else range(b - 1, -1, -1)
    for j in rng:
        c = B[..., j, :]
        if not transpose and j:
            c = c - jnp.einsum(
                "...k,...kn->...n", L[..., j, :j], X[..., :j, :]
            )
        if transpose and j + 1 < b:
            c = c - jnp.einsum(
                "...k,...kn->...n", L[..., j + 1 :, j], X[..., j + 1 :, :]
            )
        X = X.at[..., j, :].set(c / L[..., j, j][..., None])
    return X


def batched_cholesky(A, panel: int = 64, base: int = 16):
    """Lower Cholesky of SPD A [..., n, n], blocked so that all O(n^3)
    work beyond the [base, base] diagonal blocks is batched GEMM.

    panel: outer right-looking block size (trailing SYRK granularity).
    base: unrolled-Crout block size inside each panel factorization.
    """
    n = A.shape[-1]
    if n <= base:
        return potrf_unrolled(A)
    L = jnp.zeros_like(A)
    for k in range(0, n, panel):
        p = min(panel, n - k)
        Akk = A[..., k : k + p, k : k + p]
        # factor the [.., p, p] diagonal block with base-unrolled blocking
        Lkk = _panel_cholesky(Akk, base)
        L = L.at[..., k : k + p, k : k + p].set(Lkk)
        if k + p < n:
            B = A[..., k + p :, k : k + p]
            Lcol = _panel_trsm_right_T(Lkk, B, base)
            L = L.at[..., k + p :, k : k + p].set(Lcol)
            A = A.at[..., k + p :, k + p :].add(
                -(Lcol @ jnp.swapaxes(Lcol, -1, -2))
            )
    return L


def _panel_cholesky(A, base: int):
    """[..., p, p] Cholesky by base-unrolled blocks + GEMM updates."""
    p = A.shape[-1]
    if p <= base:
        return potrf_unrolled(A)
    L = jnp.zeros_like(A)
    for k in range(0, p, base):
        b = min(base, p - k)
        Lkk = potrf_unrolled(A[..., k : k + b, k : k + b])
        L = L.at[..., k : k + b, k : k + b].set(Lkk)
        if k + b < p:
            B = A[..., k + b :, k : k + b]
            Lcol = trsm_right_T_unrolled(Lkk, B)
            L = L.at[..., k + b :, k : k + b].set(Lcol)
            A = A.at[..., k + b :, k + b :].add(
                -(Lcol @ jnp.swapaxes(Lcol, -1, -2))
            )
    return L


def _panel_trsm_right_T(L, B, base: int):
    """X L^T = B with L [..., p, p] lower: base-unrolled TRSMs + GEMMs."""
    p = L.shape[-1]
    if p <= base:
        return trsm_right_T_unrolled(L, B)
    X = jnp.zeros_like(B)
    for k in range(0, p, base):
        b = min(base, p - k)
        Bk = B[..., :, k : k + b]
        if k:
            Bk = Bk - X[..., :, :k] @ jnp.swapaxes(
                L[..., k : k + b, :k], -1, -2
            )
        X = X.at[..., :, k : k + b].set(
            trsm_right_T_unrolled(L[..., k : k + b, k : k + b], Bk)
        )
    return X


def batched_tsolve_right_T(L, B, base: int = 16):
    """Solve X L^T = B for X [..., m, n], L [..., n, n] lower — the
    multifrontal L21 computation — base-unrolled TRSMs + GEMM panels."""
    return _panel_trsm_right_T(L, B, base)


def batched_tsolve_left(L, B, panel: int = 64, base: int = 16,
                        transpose: bool = False):
    """Solve L X = B (or L^T X = B), L [..., n, n] lower, batched-blocked:
    GEMM accumulation across panels + base-unrolled small TRSMs."""
    n = L.shape[-1]
    if n <= base:
        return trsm_left_unrolled(L, B, transpose=transpose)
    X = jnp.zeros_like(B)
    rng = list(range(0, n, panel))
    if transpose:
        rng = rng[::-1]
    for k in rng:
        p = min(panel, n - k)
        Bk = B[..., k : k + p, :]
        if not transpose and k:
            Bk = Bk - L[..., k : k + p, :k] @ X[..., :k, :]
        if transpose and k + p < n:
            Bk = Bk - jnp.swapaxes(
                L[..., k + p :, k : k + p], -1, -2
            ) @ X[..., k + p :, :]
        Lkk = L[..., k : k + p, k : k + p]
        # inner base-blocked substitution within the panel
        Xk = jnp.zeros_like(Bk)
        brng = list(range(0, p, base))
        if transpose:
            brng = brng[::-1]
        for kk in brng:
            bb = min(base, p - kk)
            Bkk = Bk[..., kk : kk + bb, :]
            if not transpose and kk:
                Bkk = Bkk - Lkk[..., kk : kk + bb, :kk] @ Xk[..., :kk, :]
            if transpose and kk + bb < p:
                Bkk = Bkk - jnp.swapaxes(
                    Lkk[..., kk + bb :, kk : kk + bb], -1, -2
                ) @ Xk[..., kk + bb :, :]
            Xk = Xk.at[..., kk : kk + bb, :].set(
                trsm_left_unrolled(
                    Lkk[..., kk : kk + bb, kk : kk + bb],
                    Bkk,
                    transpose=transpose,
                )
            )
        X = X.at[..., k : k + p, :].set(Xk)
    return X
