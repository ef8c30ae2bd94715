"""Nested-dissection flop analysis for the 2D spatial factorization.

Question (ROADMAP round-3 item 0): the banded/BTD factorization of the
Darcy posterior precision is O(n * bw^2) with bw ~ 6 sqrt(n) — what would
RECURSIVE nested dissection cost on the SAME structure, given our stencil
is much wider than the textbook 5-point case?

Method: build H = Q + tau A^T A (exact production structure) at several
mesh sizes, order it by geometric recursive bisection (separator = dof
strip of the coupling width), and factor with SuperLU in NATURAL order
(no re-permutation, threshold pivoting off) — L's column counts give the
exact fill and Cholesky-equivalent flops sum_j nnz(L[:,j])^2. Compare to
the banded sweep's N*(bs^3/3 + 2bs^3).

Also reports the SQUARE-ROOT variant's stencil width (Lambda has
element-local support — 1-cell coupling vs Q's 3-cell), which sets the
separator width a multifrontal QR on the stacked system would see.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def nd_order(coords, cut_width, min_size=64):
    """Geometric recursive bisection: returns a permutation (interiors
    first, separators last, recursively)."""
    idx = np.arange(coords.shape[0])

    def rec(ids, axis):
        if len(ids) <= min_size:
            return [ids]
        c = coords[ids, axis]
        mid = np.median(c)
        sep = ids[np.abs(c - mid) <= cut_width / 2]
        left = ids[c < mid - cut_width / 2]
        right = ids[c > mid + cut_width / 2]
        if len(sep) == 0 or not len(left) or not len(right):
            return [ids]
        return rec(left, 1 - axis) + rec(right, 1 - axis) + [sep]

    parts = rec(idx, 0)
    return np.concatenate(parts)


def chol_flops_via_splu(H, perm):
    """Exact fill/flops of Cholesky in the given order (SuperLU, natural
    order, no pivoting; L mirrors the Cholesky structure)."""
    Hp = H[perm][:, perm].tocsc()
    lu = spla.splu(
        Hp, permc_spec="NATURAL", diag_pivot_thresh=0.0,
        options=dict(SymmetricMode=True),
    )
    L = lu.L.tocsc()
    counts = np.diff(L.indptr)
    flops = float(np.sum(counts.astype(np.float64) ** 2))
    return L.nnz, flops


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE
    from diffeqgmrfs_tpu.models.matern import (
        matern_precision_host, matern_sqrt_host,
    )
    from diffeqgmrfs_tpu.ops.btd import choose_block_size

    for N_xy in (16, 32, 64, 128):
        disc = uniform_unit_square_discretization(N_xy, element_order=2)
        spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
        Q = matern_precision_host(spde, disc).tocsr()
        n = Q.shape[0]
        coords = np.asarray(disc.mesh.coords)[: n]  # dof coords (P2 nodes)
        h = 1.0 / (2 * N_xy)  # P2 node spacing
        # banded reference
        coo = Q.tocoo()
        bw = int(np.max(np.abs(coo.row - coo.col)))
        bs = choose_block_size(bw + 1, n)
        Nb = -(-n // bs)
        banded = Nb * (bs**3 / 3 + 2 * bs**3)
        # Q coupling range in node spacings
        d = coords[coo.row] - coords[coo.col]
        rng_q = np.max(np.abs(d)) / h
        # ND on H (Q structure dominates; A^T A of the FEM operator shares it)
        t0 = time.time()
        perm = nd_order(coords, cut_width=(rng_q + 0.5) * h)
        nnz, flops = chol_flops_via_splu(Q + 1e3 * sp.eye(n), perm)
        # sqrt stencil width
        Lam = matern_sqrt_host(spde, disc).tocoo()
        dl = coords[np.minimum(Lam.row, n - 1)] - coords[Lam.col]
        rng_l = np.max(np.abs(dl)) / h
        print(
            f"N_xy={N_xy:4d} n={n:7d} bw={bw:5d} bs={bs:5d} "
            f"banded={banded:.2e}  ND: nnz(L)={nnz:.2e} "
            f"flops={flops:.2e} ratio={banded / flops:6.1f}x  "
            f"range(Q)={rng_q:.0f} range(Lam)={rng_l:.0f} nodes "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
