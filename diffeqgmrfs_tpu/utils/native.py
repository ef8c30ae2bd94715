"""ctypes bindings for the native structure engine (native/structure.cpp).

The host-side symbolic layer (orderings, scatter-pattern building) in C++ —
the TPU-native replacement for the analyze phase of the reference's
CHOLMOD/Pardiso stack (SURVEY.md §2.0). Builds the shared library on first
use if a compiler is available; every entry point has a NumPy fallback so
the framework works without the native lib.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libgmrfstruct.so")


def _build():
    src = os.path.join(_NATIVE_DIR, "structure.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
             "-o", _SO, src],
            cwd=_NATIVE_DIR,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DIFFEQGMRFS_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        I64 = ctypes.POINTER(ctypes.c_int64)
        I32 = ctypes.POINTER(ctypes.c_int32)
        lib.rcm_ordering.restype = ctypes.c_int
        lib.rcm_ordering.argtypes = [ctypes.c_int64, I64, I64, I64]
        lib.btd_flat_index.restype = ctypes.c_int64
        lib.btd_flat_index.argtypes = [
            ctypes.c_int64, I64, I64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, I64,
        ]
        lib.row_structure.restype = ctypes.c_int64
        lib.row_structure.argtypes = [
            ctypes.c_int64, ctypes.c_int64, I32, ctypes.c_int64,
            ctypes.c_int64, I64, I64,
        ]
        lib.coo_bandwidth.restype = ctypes.c_int64
        lib.coo_bandwidth.argtypes = [ctypes.c_int64, I64, I64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def rcm_ordering(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation of a symmetric CSR pattern."""
    n = len(indptr) - 1
    lib = get_lib()
    if lib is not None:
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        perm = np.empty(n, dtype=np.int64)
        lib.rcm_ordering(n, _p64(indptr), _p64(indices), _p64(perm))
        return perm
    # scipy fallback
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = sp.csr_matrix(
        (np.ones(len(indices)), indices, indptr), shape=(n, n)
    )
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True), dtype=np.int64)


def btd_flat_index(rows, cols, n: int, bs: int, N: int):
    """-> (flat_idx, n_out_of_band). See BTDPattern."""
    rows = np.ascontiguousarray(rows, dtype=np.int64).reshape(-1)
    cols = np.ascontiguousarray(cols, dtype=np.int64).reshape(-1)
    lib = get_lib()
    if lib is not None:
        flat = np.empty(rows.shape[0], dtype=np.int64)
        bad = lib.btd_flat_index(
            rows.shape[0], _p64(rows), _p64(cols), n, bs, N, _p64(flat)
        )
        return flat, int(bad)
    # NumPy fallback
    diag_size = N * bs * bs
    total = diag_size + max(N - 1, 0) * bs * bs
    bi, bj = rows // bs, cols // bs
    d = bi - bj
    flat = np.where(
        d == 0,
        bi * bs * bs + (rows % bs) * bs + (cols % bs),
        np.where(
            d == 1,
            diag_size + bj * bs * bs + (rows % bs) * bs + (cols % bs),
            total,
        ),
    )
    return flat, int(np.sum(np.abs(d) > 1))


def row_structure(cell_dofs: np.ndarray, ndofs: int):
    """-> (cols [ndofs, K], slot [nc*nd*nd], K)."""
    lib = get_lib()
    cell_dofs = np.ascontiguousarray(cell_dofs, dtype=np.int32)
    nc, nd = cell_dofs.shape
    if lib is not None:
        null64 = ctypes.cast(None, ctypes.POINTER(ctypes.c_int64))
        K = int(lib.row_structure(nc, nd, _p32(cell_dofs), ndofs, 0, null64, null64))
        cols = np.empty((ndofs, K), dtype=np.int64)
        slot = np.empty(nc * nd * nd, dtype=np.int64)
        lib.row_structure(nc, nd, _p32(cell_dofs), ndofs, K, _p64(cols), _p64(slot))
        return cols, slot, K
    return None  # caller falls back to the NumPy/scipy path


def coo_bandwidth(rows, cols) -> int:
    rows = np.ascontiguousarray(rows, dtype=np.int64).reshape(-1)
    cols = np.ascontiguousarray(cols, dtype=np.int64).reshape(-1)
    lib = get_lib()
    if lib is not None and rows.size:
        return int(lib.coo_bandwidth(rows.shape[0], _p64(rows), _p64(cols)))
    return int(np.max(np.abs(rows - cols))) if rows.size else 0
