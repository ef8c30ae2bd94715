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
