"""Parity of the batched small-front factor kernels vs jnp.linalg.

These kernels exist because XLA's cholesky/triangular_solve expanders do
not vectorize across a batch axis on TPU (probe_front_rates.py); math
must match the monolithic ops exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.batched_factor import (
    batched_cholesky,
    batched_tsolve_left,
    potrf_unrolled,
    trsm_left_unrolled,
    trsm_right_T_unrolled,
)


def _spd(rng, B, n):
    A = rng.normal(size=(B, n, n))
    return jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))


@pytest.mark.parametrize("n", [1, 3, 16, 24])
def test_potrf_unrolled_matches_dense(n):
    rng = np.random.default_rng(0)
    A = _spd(rng, 5, n)
    L = potrf_unrolled(A)
    Lref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref), rtol=1e-10)


@pytest.mark.parametrize("n,panel,base", [(48, 16, 8), (96, 32, 16), (130, 64, 16)])
def test_batched_cholesky_matches_dense(n, panel, base):
    rng = np.random.default_rng(1)
    A = _spd(rng, 4, n)
    L = batched_cholesky(A, panel=panel, base=base)
    Lref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref), rtol=1e-8)
    # strict upper must be exactly zero (packed-format contract)
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0


def test_trsm_unrolled_matches_triangular_solve():
    rng = np.random.default_rng(2)
    n, m = 16, 11
    L = np.asarray(jnp.linalg.cholesky(_spd(rng, 3, n)))
    B = rng.normal(size=(3, m, n))
    X = trsm_right_T_unrolled(jnp.asarray(L), jnp.asarray(B))
    np.testing.assert_allclose(
        np.asarray(X @ np.swapaxes(L, -1, -2)), B, rtol=1e-9, atol=1e-9
    )
    C = rng.normal(size=(3, n, m))
    Y = trsm_left_unrolled(jnp.asarray(L), jnp.asarray(C))
    np.testing.assert_allclose(np.asarray(L @ np.asarray(Y)), C, rtol=1e-9, atol=1e-9)
    Yt = trsm_left_unrolled(jnp.asarray(L), jnp.asarray(C), transpose=True)
    np.testing.assert_allclose(
        np.swapaxes(L, -1, -2) @ np.asarray(Yt), C, rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("transpose", [False, True])
def test_batched_tsolve_left_matches(transpose):
    rng = np.random.default_rng(3)
    n, k = 100, 7
    L = jnp.linalg.cholesky(_spd(rng, 2, n))
    B = jnp.asarray(rng.normal(size=(2, n, k)))
    X = batched_tsolve_left(L, B, panel=32, base=16, transpose=transpose)
    A = jnp.swapaxes(L, -1, -2) if transpose else L
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B), rtol=1e-8, atol=1e-8)


def test_batched_cholesky_vmaps_and_jits():
    rng = np.random.default_rng(4)
    A = _spd(rng, 6, 64)
    f = jax.jit(lambda A: batched_cholesky(A, panel=32, base=16))
    L = f(A)
    np.testing.assert_allclose(
        np.asarray(L @ jnp.swapaxes(L, -1, -2)), np.asarray(A), rtol=1e-8
    )
