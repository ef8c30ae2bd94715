"""Pipeline-parallel batched BTD factor sweep (parallel/pipeline.py)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from diffeqgmrfs_tpu.ops import BTD, btd_cholesky
from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky
from diffeqgmrfs_tpu.parallel.pipeline import pipelined_batched_btd_cholesky
from tests.test_btd import random_btd_spd


def _batch(M, N, bs, key):
    ds, ls = [], []
    for m in range(M):
        A = random_btd_spd(jax.random.fold_in(key, m), N, bs, n=N * bs)
        ds.append(A.diag)
        ls.append(A.lower)
    return jnp.stack(ds), jnp.stack(ls)


def _mesh(p):
    devs = np.array(jax.devices()[:p])
    return Mesh(devs, ("pp",))


def test_pipelined_factor_matches_serial():
    M, N, bs, p = 6, 8, 16, 4
    diag, lower = _batch(M, N, bs, jax.random.PRNGKey(0))
    mesh = _mesh(p)
    Ls, Cs = pipelined_batched_btd_cholesky(diag, lower, mesh)
    assert Ls.shape == (M, N, bs, bs) and Cs.shape == (M, N - 1, bs, bs)
    for m in range(M):
        F0 = btd_cholesky(BTD(diag[m], lower[m], N * bs))
        assert np.allclose(
            np.tril(np.asarray(Ls[m])), np.tril(np.asarray(F0.Ls)), atol=1e-9
        ), m
        assert np.allclose(np.asarray(Cs[m]), np.asarray(F0.Cs), atol=1e-9), m


def test_pipelined_factor_solves():
    """Factors from the pipeline drop into the standard solve surface."""
    M, N, bs, p = 3, 4, 8, 2
    diag, lower = _batch(M, N, bs, jax.random.PRNGKey(1))
    mesh = _mesh(p)
    Ls, Cs = pipelined_batched_btd_cholesky(diag, lower, mesh)
    b = jax.random.normal(jax.random.PRNGKey(2), (N * bs,), dtype=jnp.float64)
    for m in range(M):
        F = BTDCholesky(Ls[m], Cs[m], N * bs)
        x = np.asarray(F.solve(b))
        A = BTD(diag[m], lower[m], N * bs)
        r = np.asarray(A.matvec(jnp.asarray(x))) - np.asarray(b)
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-10, m


def test_pipelined_factor_jit_under_mesh():
    """The pipeline compiles inside an outer jit (driver usage)."""
    M, N, bs, p = 4, 8, 8, 4
    diag, lower = _batch(M, N, bs, jax.random.PRNGKey(3))
    mesh = _mesh(p)

    f = jax.jit(
        lambda d, l: pipelined_batched_btd_cholesky(d, l, mesh)[0]
    )
    Ls = f(diag, lower)
    F0 = btd_cholesky(BTD(diag[0], lower[0], N * bs))
    assert np.allclose(
        np.tril(np.asarray(Ls[0])), np.tril(np.asarray(F0.Ls)), atol=1e-9
    )


def test_pipelined_srif_matches_sequential():
    """PP SRIF: pipelined windowed-QR factors match srif_packed_qr per
    instance (incl. col_scale + padded tail), 4-stage pipeline."""
    import scipy.sparse as sp
    from jax.sharding import Mesh
    from diffeqgmrfs_tpu.fem.operators import RowOp
    from diffeqgmrfs_tpu.ops.srif import (
        rowop_window_plan, srif_packed_qr, _fix_padding,
    )
    from diffeqgmrfs_tpu.ops.packed import PackedBTDRFactor
    from diffeqgmrfs_tpu.parallel.pipeline import pipelined_batched_srif_qr

    rng = np.random.default_rng(23)
    n, bs, M = 61, 8, 3  # N = 8 blocks -> Nw = 7... need Nw % 4 == 0
    n, bs = 68, 8  # N = 9 blocks, Nw = 8, pad = 4
    def banded(seed):
        r = np.random.default_rng(seed)
        rows, cols, vals = [], [], []
        for i in range(n):
            for j in range(max(0, i - 3), min(n, i + 4)):
                rows.append(i); cols.append(j); vals.append(r.normal())
        A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
        return A + 4.0 * sp.eye(n)

    ops0 = RowOp.from_csr(banded(0))
    plan = rowop_window_plan(ops0, n, bs)
    V = jnp.stack([
        RowOp.from_csr(banded(s)).vals for s in range(M)
    ])
    CS = jnp.stack([
        1.0 / jnp.sqrt(jnp.linspace(1.0, 2.0 + s, n)) for s in range(M)
    ])
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
    with mesh:
        P_out = pipelined_batched_srif_qr(
            plan, V, n, mesh, col_scale=CS, dtype=jnp.float64
        )
    for m in range(M):
        F_ref = srif_packed_qr(
            [(plan, V[m])], n, 9, bs, dtype=jnp.float64, col_scale=CS[m]
        )
        F_pp = _fix_padding(PackedBTDRFactor(P_out[m], n, bs))
        np.testing.assert_allclose(
            np.asarray(F_pp.P), np.asarray(F_ref.P), rtol=1e-10, atol=1e-12,
            err_msg=str(m),
        )
