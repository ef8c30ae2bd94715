"""Blocked-panel dense factor kernels: POTRF/TRSM as GEMM + small panels.

XLA's monolithic `jnp.linalg.cholesky` / `triangular_solve` on TPU run the
whole [bs, bs] operation through the serial Cholesky/TRSM expanders —
measured ~0.3 ms / ~0.6 ms at bs=2048 f32 on v5e vs ~0.03 / ~0.1 ms
MXU-ideal (ROADMAP r1 "Known gaps" #2). The classical fix (LAPACK's own
design) is blocking: factor a [p, p] panel with the slow kernel, turn ALL
trailing work into dense GEMMs that run at MXU rate. For bs = 2048,
p = 256: the slow part shrinks by (bs/p)^2 = 64x of the flops while the
remaining ~97% of flops ride jnp.matmul.

These are drop-in replacements used by the BTD sweep (`ops/cholesky.py`)
and the packed factor when `panel` is set; reference algorithm being
accelerated: the per-block dense `cholesky` / TRSM of
`/root/reference/src/tridiagonal_cholesky.jl:65-82`.

The panel loop is Python-unrolled at trace time (static shapes per panel;
bs/p ~ 8-16 iterations), so everything vmaps/scans like the monolithic
ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def blocked_cholesky(A, panel: int = 256):
    """Lower Cholesky of SPD A [..., n, n] by right-looking panel blocking.

    Equivalent to jnp.linalg.cholesky (strict upper not zeroed by the
    monolithic op either — we zero it for parity).
    """
    n = A.shape[-1]
    if n <= panel:
        return jnp.linalg.cholesky(A)
    L = jnp.zeros_like(A)
    for k in range(0, n, panel):
        p = min(panel, n - k)
        Akk = A[..., k : k + p, k : k + p]
        Lkk = jnp.linalg.cholesky(Akk)
        L = L.at[..., k : k + p, k : k + p].set(Lkk)
        if k + p < n:
            # panel column: L[k+p:, k:k+p] = A[k+p:, k:k+p] Lkk^{-T}
            B = A[..., k + p :, k : k + p]
            Lcol = lax.linalg.triangular_solve(
                Lkk, B, left_side=False, lower=True, transpose_a=True
            )
            L = L.at[..., k + p :, k : k + p].set(Lcol)
            # trailing SYRK as one GEMM (the MXU-rate bulk of the flops)
            A = A.at[..., k + p :, k + p :].add(
                -(Lcol @ jnp.swapaxes(Lcol, -1, -2))
            )
    return L


def blocked_tsolve_right_T(L, B, panel: int = 256):
    """Solve X L^T = B for X [..., m, n], L [..., n, n] lower — the BTD
    sweep's C_i = B_i L_{i-1}^{-T} — with column-panel blocking: each step
    is one GEMM accumulation plus a [m, p] small TRSM.
    """
    n = L.shape[-1]
    if n <= panel:
        return lax.linalg.triangular_solve(
            L, B, left_side=False, lower=True, transpose_a=True
        )
    X = jnp.zeros_like(B)
    for k in range(0, n, panel):
        p = min(panel, n - k)
        Lkk = L[..., k : k + p, k : k + p]
        Bk = B[..., :, k : k + p]
        if k:
            # B_k - X[:, :k] @ (L[k:k+p, :k])^T
            Bk = Bk - X[..., :, :k] @ jnp.swapaxes(
                L[..., k : k + p, :k], -1, -2
            )
        Xk = lax.linalg.triangular_solve(
            Lkk, Bk, left_side=False, lower=True, transpose_a=True
        )
        X = X.at[..., :, k : k + p].set(Xk)
    return X


def blocked_tsolve_left(L, B, panel: int = 256, transpose: bool = False):
    """Solve L X = B (or L^T X = B) for X [..., n, k], L lower — blocked
    forward/backward substitution: GEMM accumulation + [p, k] small TRSMs.
    """
    n = L.shape[-1]
    if n <= panel:
        return lax.linalg.triangular_solve(
            L, B, left_side=True, lower=True, transpose_a=transpose
        )
    X = jnp.zeros_like(B)
    rng = range(0, n, panel)
    if transpose:
        rng = reversed(list(rng))
    for k in rng:
        p = min(panel, n - k)
        Lkk = L[..., k : k + p, k : k + p]
        Bk = B[..., k : k + p, :]
        if not transpose and k:
            Bk = Bk - L[..., k : k + p, :k] @ X[..., :k, :]
        if transpose and k + p < n:
            Bk = Bk - jnp.swapaxes(
                L[..., k + p :, k : k + p], -1, -2
            ) @ X[..., k + p :, :]
        Xk = lax.linalg.triangular_solve(
            Lkk, Bk, left_side=True, lower=True, transpose_a=transpose
        )
        X = X.at[..., k : k + p, :].set(Xk)
    return X
