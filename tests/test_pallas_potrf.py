"""Pallas panel-streamed POTRF kernel (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.pallas_potrf import (
    potrf_winv,
    tsolve_right_T_winv,
    _chol_micro,
    _inv_lower_micro,
    PANEL,
)


def _spd(rng, n):
    A = rng.normal(size=(n, n))
    return (A @ A.T + n * np.eye(n)).astype(np.float32)


def test_micro_pieces():
    rng = np.random.default_rng(0)
    A = _spd(rng, 32)
    L = np.asarray(_chol_micro(jnp.asarray(A)))
    assert np.abs(L @ L.T - A).max() / np.abs(A).max() < 1e-5
    W = np.asarray(_inv_lower_micro(jnp.asarray(L)))
    assert np.abs(W @ L - np.eye(32)).max() < 1e-5


def test_potrf_kernel_interpret():
    rng = np.random.default_rng(1)
    n = 2 * PANEL
    A = _spd(rng, n)
    L, W = potrf_winv(jnp.asarray(A), interpret=True)
    L = np.tril(np.asarray(L))
    L0 = np.linalg.cholesky(A.astype(np.float64))
    assert np.abs(L - L0).max() / np.abs(L0).max() < 1e-5
    for k in range(n // PANEL):
        Lkk = L[k * PANEL : (k + 1) * PANEL, k * PANEL : (k + 1) * PANEL]
        assert np.abs(np.asarray(W[k]) @ Lkk - np.eye(PANEL)).max() < 1e-5
    B = rng.normal(size=(100, n)).astype(np.float32)
    C = np.asarray(tsolve_right_T_winv(jnp.asarray(L), W, jnp.asarray(B)))
    C0 = np.linalg.solve(L0, B.T.astype(np.float64)).T
    assert np.abs(C - C0).max() / np.abs(C0).max() < 1e-5


def test_btd_cholesky_pallas_interpret():
    from diffeqgmrfs_tpu.ops import BTD
    from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky, btd_cholesky_pallas

    rng = np.random.default_rng(2)
    N, bs = 4, PANEL
    diag = np.stack([_spd(rng, bs) for _ in range(N)])
    lower = (rng.normal(size=(N - 1, bs, bs)) * 0.02).astype(np.float32)
    A = BTD(jnp.asarray(diag), jnp.asarray(lower), N * bs)
    F0 = btd_cholesky(A)
    F = btd_cholesky_pallas(A, interpret=True)
    assert np.allclose(np.asarray(F.Ls), np.asarray(F0.Ls), atol=2e-3)
    b = rng.normal(size=(A.n,)).astype(np.float32)
    x0 = np.asarray(F0.solve(jnp.asarray(b)))
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.linalg.norm(x - x0) / np.linalg.norm(x0) < 1e-4
