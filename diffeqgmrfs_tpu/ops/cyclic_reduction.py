"""Parallel-in-time BTD solves via block cyclic reduction.

The Cholesky sweep (ops/cholesky.py) is a loop-carried chain over time
blocks — perfect on one chip, serial across a time-sharded mesh. Block
cyclic reduction restructures the solve into log2(N) *levels*; within each
level every block is processed independently (batched dense Cholesky/solve/
GEMM, i.e. `vmap` -> MXU), and the only cross-block dependence is
nearest-neighbor — so a time-sharded mesh runs each level in parallel with
one halo exchange, the GMRF analog of ring-attention over the sequence axis
(SURVEY.md §2.4/§5.7).

Elimination of odd blocks at each level (A symmetric: A[i+1,i]=L_i,
A[i,i+1]=L_i^T):

    D'_j   = D_j - L_{j-1} D_{j-1}^{-1} L_{j-1}^T - L_j^T D_{j+1}^{-1} L_j
    L'_{j} = - L_{j+1} D_{j+1}^{-1} L_j            (new sub-block j->j+2)
    b'_j   = b_j - L_{j-1} D_{j-1}^{-1} b_{j-1} - L_j^T D_{j+1}^{-1} b_{j+1}

then back-substitute the odd blocks from their even neighbors. ~2.5x the
flops of the sequential sweep, O(log N) depth. Cost is paid once per SOLVE
(there is no reusable factor), so the sweep factor stays the default on a
single chip; cyclic reduction is the scale-out path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.btd import BTD


def _pad_pow2(A: BTD, b):
    """Pad to a power-of-two number of blocks with identity diagonals."""
    N, bs = A.N, A.bs
    N2 = 1 << max(int(np.ceil(np.log2(max(N, 1)))), 0)
    if N2 == N:
        return A.diag, A.lower, b, N
    eye = jnp.broadcast_to(jnp.eye(bs, dtype=A.dtype), (N2 - N, bs, bs))
    diag = jnp.concatenate([A.diag, eye], axis=0)
    lower = jnp.concatenate(
        [A.lower, jnp.zeros((N2 - 1 - A.lower.shape[0], bs, bs), A.dtype)], axis=0
    )
    b = jnp.concatenate([b, jnp.zeros((N2 - N, bs, b.shape[-1]), A.dtype)], axis=0)
    return diag, lower, b, N


def _chol_solve(D, X):
    """Batched SPD solve via dense Cholesky: D [*, bs, bs], X [*, bs, k]."""
    L = jnp.linalg.cholesky(D)
    Y = lax.linalg.triangular_solve(L, X, left_side=True, lower=True)
    return lax.linalg.triangular_solve(
        L, Y, left_side=True, lower=True, transpose_a=True
    )


def cr_solve(A: BTD, b):
    """Solve A x = b by block cyclic reduction. b: [..., n]."""
    with jax.default_matmul_precision("float32"):
        bb, batch_shape = _to_blocks(A, b)
        diag, lower, bb, N_true = _pad_pow2(A, bb)
        x = _cr_recurse(diag, lower, bb)
        x = x[: A.N]
        flat = x.reshape(A.N * A.bs, -1)[: A.n]
        return flat.T.reshape(*batch_shape, A.n)


def _to_blocks(A: BTD, b):
    b = jnp.asarray(b)
    batch_shape = b.shape[:-1]
    k = 1
    for s in batch_shape:
        k *= s
    bb = b.reshape(k, b.shape[-1]).T
    pad = A.N * A.bs - b.shape[-1]
    if pad:
        bb = jnp.pad(bb, ((0, pad), (0, 0)))
    return bb.reshape(A.N, A.bs, k), batch_shape


def _cr_recurse(diag, lower, b):
    """diag [N, bs, bs], lower [N-1, bs, bs], b [N, bs, k] with N = 2^m."""
    N, bs, k = b.shape
    if N == 1:
        return _chol_solve(diag[0], b[0])[None]
    if N == 2:
        # direct 2-block solve via the sweep
        L0 = jnp.linalg.cholesky(diag[0])
        C = lax.linalg.triangular_solve(
            L0, lower[0], left_side=False, lower=True, transpose_a=True
        )
        S = diag[1] - C @ C.T
        y0 = lax.linalg.triangular_solve(L0, b[0], left_side=True, lower=True)
        L1 = jnp.linalg.cholesky(S)
        y1 = lax.linalg.triangular_solve(
            L1, b[1] - C @ y0, left_side=True, lower=True
        )
        x1 = lax.linalg.triangular_solve(
            L1, y1, left_side=True, lower=True, transpose_a=True
        )
        x0 = lax.linalg.triangular_solve(
            L0, y0 - C.T @ x1, left_side=True, lower=True, transpose_a=True
        )
        return jnp.stack([x0, x1])

    # odd blocks: indices 1, 3, ..., N-1 ; even: 0, 2, ..., N-2
    D_odd = diag[1::2]  # [N/2, bs, bs]
    D_even = diag[0::2]
    L_into_odd = lower[0::2]  # L_{2j} : even 2j -> odd 2j+1
    L_from_odd = lower[1::2]  # L_{2j+1}: odd 2j+1 -> even 2j+2  [N/2 - 1]
    b_odd = b[1::2]
    b_even = b[0::2]

    # D_odd^{-1} applied to everything coupling through odd blocks
    inv_b = _chol_solve(D_odd, b_odd)  # [N/2, bs, k]

    # even block j (global index 2j) couples to odd 2j+1 below via L_{2j}
    # and odd 2j-1 above via L_{2j-1}:
    # below: L_{2j}^T D_{2j+1}^{-1} (L_{2j} | b_{2j+1})
    corr_below_D = jnp.swapaxes(L_into_odd, -1, -2) @ _chol_solve(
        D_odd, L_into_odd
    )
    corr_below_b = jnp.swapaxes(L_into_odd, -1, -2) @ inv_b
    # contribution from odd 2j-1 (above): L_{2j-1} D_{2j-1}^{-1} (L_{2j-1}^T, b)
    corr_above_D = jnp.concatenate(
        [
            jnp.zeros((1, bs, bs), diag.dtype),
            L_from_odd @ _chol_solve(D_odd[:-1], jnp.swapaxes(L_from_odd, -1, -2)),
        ],
        axis=0,
    )
    corr_above_b = jnp.concatenate(
        [
            jnp.zeros((1, bs, k), diag.dtype),
            L_from_odd @ inv_b[:-1],
        ],
        axis=0,
    )
    D_new = D_even - corr_below_D - corr_above_D
    b_new = b_even - corr_below_b - corr_above_b
    # new sub-diagonal: even 2j -> even 2j+2 through odd 2j+1:
    # L'_j = - L_{2j+1} D_{2j+1}^{-1} L_{2j}
    L_new = -(L_from_odd @ _chol_solve(D_odd[:-1], L_into_odd[:-1]))

    x_even = _cr_recurse(D_new, L_new, b_new)

    # back-substitute odd blocks:
    # x_{2j+1} = D^{-1} (b_odd - L_{2j} x_{2j} - L_{2j+1}^T x_{2j+2})
    upper_term = jnp.concatenate(
        [
            jnp.swapaxes(L_from_odd, -1, -2) @ x_even[1:],
            jnp.zeros((1, bs, k), diag.dtype),
        ],
        axis=0,
    )
    rhs_odd = b_odd - L_into_odd @ x_even - upper_term
    x_odd = _chol_solve(D_odd, rhs_odd)

    x = jnp.zeros((N, bs, k), diag.dtype)
    x = x.at[0::2].set(x_even)
    x = x.at[1::2].set(x_odd)
    return x
