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


def takahashi_diag_dist(F):
    """Takahashi selected inversion on the nested-dissection (dist) factor
    — marginal variances for `ops/dist_btd.DistBTDCholesky` (and the
    QR-built `ops/dist_srif` factor, which shares the container).

    The ND column (p, i) has below-diagonal blocks at rows (p, i+1)
    (W_i^T) and s_{p-1} (V_i^T), so the general selected-inverse step

        Sigma_jj = X^T X + G^T Sigma_{S,S} G,   G = L_{S,j} X,  X = L_jj^{-1}
        Sigma_{S,j} = -Sigma_{S,S} G

    closes over a per-chunk carry (Sigma_{i+1,i+1}, Sigma_{i+1,s_{p-1}})
    plus the chunk constant Sigma_{s_{p-1},s_{p-1}}. The separator phase is
    the classic BTD recursion on the reduced factor (extended with the
    adjacent off-diagonal blocks Sigma_{p+1,p} the interiors need), and
    the interior phase is a reverse scan BATCHED over chunks — variance
    extraction is parallel-in-time like the factorization itself.
    """
    P, k, bs, n = F.P, F.k, F.bs, F.n
    red = F.red
    eye = jnp.eye(bs, dtype=F.dtype)

    def inv_lower(L):
        return lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)

    # ---- reduced-factor blocks as (lower diag blocks, subdiag blocks) ----
    if hasattr(red, "Ls"):  # BTDCholesky
        L_sep = red.Ls
        C_sep = red.Cs
    else:  # PackedBTDRFullFactor: L = R^T
        Ps = red.P.reshape(P, bs, bs)
        L_sep = jnp.swapaxes(jnp.triu(Ps), -1, -2)
        C_sep = jnp.swapaxes(red.U.reshape(-1, bs, bs), -1, -2)

    with jax.default_matmul_precision("float32"):
        # ---- separator phase: Sigma_pp and O_p = Sigma_{p+1,p} ----
        X_N = inv_lower(L_sep[-1])
        Sigma_last = X_N.T @ X_N

        def sep_step(Sigma_next, inp):
            L_p, C_p = inp
            X = inv_lower(L_p)
            G = C_p @ X
            O_p = -(Sigma_next @ G)  # Sigma_{p+1, p}
            Sigma_p = X.T @ X + G.T @ (Sigma_next @ G)
            return Sigma_p, (Sigma_p, O_p)

        if P > 1:
            _, (Sigmas, Os) = lax.scan(
                sep_step, Sigma_last, (L_sep[:-1], C_sep), reverse=True
            )
            Sigma_sep = jnp.concatenate([Sigmas, Sigma_last[None]], axis=0)
            O_sep = Os  # [P-1, bs, bs], O_sep[p] = Sigma_{p+1, p}
        else:
            Sigma_sep = Sigma_last[None]
            O_sep = jnp.zeros((0, bs, bs), F.dtype)

        sep_diag = jnp.diagonal(Sigma_sep, axis1=-2, axis2=-1)  # [P, bs]
        if k == 1:
            return sep_diag.reshape(-1)[:n]

        # ---- interior phase: reverse scan over i, batched over chunks ----
        # chunk constants: Sigma_{s_{p-1}, s_{p-1}} (zeros for chunk 0)
        Sigma_ss = jnp.concatenate(
            [jnp.zeros((1, bs, bs), F.dtype), Sigma_sep[:-1]], axis=0
        )
        # init carry at i = k-2: Sigma_d = Sigma_{s_p,s_p},
        # Sigma_c = Sigma_{s_p, s_{p-1}} = O_sep[p-1] (zeros for chunk 0)
        Sigma_d0 = Sigma_sep
        Sigma_c0 = jnp.concatenate(
            [jnp.zeros((1, bs, bs), F.dtype), O_sep], axis=0
        )

        inv_lower_b = jax.vmap(inv_lower)

        def int_step(carry, inp):
            Sigma_d, Sigma_c = carry  # [P, bs, bs] each
            L_i, W_i, V_i = inp
            X = inv_lower_b(L_i)
            Gw = jnp.swapaxes(W_i, -1, -2) @ X
            Gv = jnp.swapaxes(V_i, -1, -2) @ X
            cross = jnp.swapaxes(Gw, -1, -2) @ (Sigma_c @ Gv)
            Sigma_i = (
                jnp.swapaxes(X, -1, -2) @ X
                + jnp.swapaxes(Gw, -1, -2) @ (Sigma_d @ Gw)
                + cross
                + jnp.swapaxes(cross, -1, -2)
                + jnp.swapaxes(Gv, -1, -2) @ (Sigma_ss @ Gv)
            )
            # Sigma_{i, s_{p-1}} = -(Sigma_{i, i+1...}) via
            # Sigma_{s,j} = -Sigma_{s,S} G: Sigma_{s-, i} =
            #   -(Sigma_{s-, i+1} Gw + Sigma_{s-, s-} Gv); store transposed
            Sigma_c_new = -(
                jnp.swapaxes(Sigma_c, -1, -2) @ Gw + Sigma_ss @ Gv
            )
            return (Sigma_i, jnp.swapaxes(Sigma_c_new, -1, -2)), jnp.diagonal(
                Sigma_i, axis1=-2, axis2=-1
            )

        xs = (
            jnp.swapaxes(F.L, 0, 1),
            jnp.swapaxes(F.W, 0, 1),
            jnp.swapaxes(F.V, 0, 1),
        )
        _, int_diags = lax.scan(
            int_step, (Sigma_d0, Sigma_c0), xs, reverse=True
        )
        # int_diags [k-1, P, bs] -> [P, k-1, bs]; append separator diag
        diags = jnp.concatenate(
            [jnp.swapaxes(int_diags, 0, 1), sep_diag[:, None]], axis=1
        )
        return diags.reshape(-1)[:n]
