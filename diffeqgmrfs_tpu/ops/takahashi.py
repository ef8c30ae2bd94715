"""Takahashi selected inversion on block-tridiagonal Cholesky factors.

Exact posterior marginal variances in O(N * bs^3) — the "fast path" the
reference lacks (it estimates variances with 50-sample RBMC,
`RBMCStrategy(50)` at `/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:100`,
which costs 50 block solves and is only approximate).

For A = L L^T with L block lower-bidiagonal (L_i diagonal blocks, C_i
subdiagonal blocks), the inverse's diagonal blocks satisfy the backward
recursion (derived from (L^{-1})_{j,i} = (...) C_i L_i^{-1} for j > i):

    Sigma_N = L_N^{-T} L_N^{-1}
    Sigma_i = L_i^{-T} L_i^{-1} + (C_i L_i^{-1})^T Sigma_{i+1} (C_i L_i^{-1})

Each step is one triangular inverse + two GEMMs on [bs, bs] blocks — the same
MXU-dense cost class as the factorization itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky


def takahashi_diag(F):
    """Diagonal of A^{-1} (marginal variances), [n].

    Accepts a `BTDCholesky` (triangular inverses computed per step) or a
    `BTDInverseSolver` (the W_i = L_i^{-1} blocks it already holds are
    reused — the selected inversion and the GEMM-only solve form share
    those inverses)."""
    with jax.default_matmul_precision("float32"):
        if hasattr(F, "Ws"):  # BTDInverseSolver: inverses precomputed
            return takahashi_diag_from_inverses(F.Ws, F.Cs, F.n)
        return _takahashi_diag(F)


def _takahashi_diag(F: BTDCholesky):
    bs = F.bs
    eye = jnp.eye(bs, dtype=F.dtype)

    def inv_lower(L):
        return lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True
        )

    W_N = inv_lower(F.Ls[-1])
    Sigma_N = W_N.T @ W_N

    def step(Sigma_next, inp):
        L_i, C_i = inp
        W = inv_lower(L_i)  # L_i^{-1}
        G = C_i @ W  # C_i L_i^{-1}
        Sigma_i = W.T @ W + G.T @ (Sigma_next @ G)
        return Sigma_i, jnp.diagonal(Sigma_i)

    if F.N > 1:
        _, diags = lax.scan(
            step, Sigma_N, (F.Ls[:-1], F.Cs), reverse=True
        )
        all_diag = jnp.concatenate([diags, jnp.diagonal(Sigma_N)[None]], axis=0)
    else:
        all_diag = jnp.diagonal(Sigma_N)[None]
    return all_diag.reshape(-1)[: F.n]


def takahashi_diag_from_inverses(Ws, Cs, n):
    """Same recursion with precomputed W_i = L_i^{-1}: GEMM-only per step."""
    N = Ws.shape[0]
    Sigma_N = Ws[-1].T @ Ws[-1]

    def step(Sigma_next, inp):
        W, C_i = inp
        G = C_i @ W
        Sigma_i = W.T @ W + G.T @ (Sigma_next @ G)
        return Sigma_i, jnp.diagonal(Sigma_i)

    if N > 1:
        _, diags = lax.scan(step, Sigma_N, (Ws[:-1], Cs), reverse=True)
        all_diag = jnp.concatenate([diags, jnp.diagonal(Sigma_N)[None]], axis=0)
    else:
        all_diag = jnp.diagonal(Sigma_N)[None]
    return all_diag.reshape(-1)[:n]
