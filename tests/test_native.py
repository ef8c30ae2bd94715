"""Native structure engine (C++/ctypes) vs NumPy fallback equivalence."""

import numpy as np
import pytest

from diffeqgmrfs_tpu.utils import native


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "native structure library failed to build"


def test_btd_flat_index_matches_fallback():
    rng = np.random.default_rng(0)
    n, bs = 37, 8
    N = (n + bs - 1) // bs
    i = rng.integers(0, n, size=500)
    j = np.clip(i + rng.integers(-7, 8, size=500), 0, n - 1)
    flat_native, bad_native = native.btd_flat_index(i, j, n, bs, N)
    lib = native._LIB
    try:
        native._LIB = None  # force fallback
        flat_np, bad_np = native.btd_flat_index(i, j, n, bs, N)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(flat_native, flat_np)
    assert bad_native == bad_np == 0


def test_row_structure_matches_scipy_path():
    from diffeqgmrfs_tpu.fem import unit_square_discretization
    from diffeqgmrfs_tpu.fem.assembly import _rowop_structure

    disc = unit_square_discretization(4, element_order=2)
    cd = disc.dof_handler.cell_dofs_field("u")
    cols_n, slot_n, K_n = native.row_structure(cd, disc.ndofs)
    # scipy path (copy of the fallback logic via the cached function with
    # native disabled)
    import diffeqgmrfs_tpu.fem.assembly as asm

    lib = native._LIB
    try:
        native._LIB = None
        asm._rowop_structure.cache_clear()
        cols_s, slot_s, K_s = asm._rowop_structure(
            cd.tobytes(), cd.shape, disc.ndofs
        )
    finally:
        native._LIB = lib
        asm._rowop_structure.cache_clear()
    assert K_n == K_s
    np.testing.assert_array_equal(cols_n, cols_s)
    np.testing.assert_array_equal(slot_n, slot_s)


def test_rcm_reduces_bandwidth():
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    n = 120
    # banded matrix under a random permutation
    rows, cols = [], []
    for i in range(n):
        for j in range(max(0, i - 3), min(n, i + 4)):
            rows.append(i)
            cols.append(j)
    p = rng.permutation(n)
    rows, cols = p[np.array(rows)], p[np.array(cols)]
    A = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    bw_before = int(np.abs(A.tocoo().row - A.tocoo().col).max())
    perm = native.rcm_ordering(A.indptr, A.indices)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    Ap = A.tocoo()
    bw_after = int(np.abs(inv[Ap.row] - inv[Ap.col]).max())
    assert bw_after <= 10
    assert bw_after < bw_before
