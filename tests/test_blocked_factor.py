"""Blocked-panel POTRF/TRSM kernels vs monolithic XLA ops."""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.blocked_factor import (
    blocked_cholesky,
    blocked_tsolve_right_T,
    blocked_tsolve_left,
)
from diffeqgmrfs_tpu.ops import btd_cholesky
from tests.test_btd import random_btd_spd


def _spd(key, n):
    A = jax.random.normal(key, (n, n), dtype=jnp.float64)
    return A @ A.T + n * jnp.eye(n)


def test_blocked_cholesky_matches():
    A = _spd(jax.random.PRNGKey(0), 300)
    L0 = np.asarray(jnp.linalg.cholesky(A))
    for panel in (64, 100, 256, 300, 512):
        L = np.asarray(blocked_cholesky(A, panel))
        assert np.allclose(np.tril(L), np.tril(L0), atol=1e-9), panel


def test_blocked_tsolves_match():
    key = jax.random.PRNGKey(1)
    A = _spd(key, 200)
    L = jnp.linalg.cholesky(A)
    B = jax.random.normal(jax.random.PRNGKey(2), (70, 200), dtype=jnp.float64)
    X0 = np.asarray(
        jax.lax.linalg.triangular_solve(
            L, B, left_side=False, lower=True, transpose_a=True
        )
    )
    for panel in (64, 128, 200):
        X = np.asarray(blocked_tsolve_right_T(L, B, panel))
        assert np.allclose(X, X0, atol=1e-10), panel
    C = jax.random.normal(jax.random.PRNGKey(3), (200, 30), dtype=jnp.float64)
    for transpose in (False, True):
        Y0 = np.asarray(
            jax.lax.linalg.triangular_solve(
                L, C, left_side=True, lower=True, transpose_a=transpose
            )
        )
        for panel in (64, 128):
            Y = np.asarray(blocked_tsolve_left(L, C, panel, transpose=transpose))
            assert np.allclose(Y, Y0, atol=1e-10), (panel, transpose)


def test_btd_cholesky_panel_matches():
    A = random_btd_spd(jax.random.PRNGKey(4), 6, 96, n=560)
    F0 = btd_cholesky(A)
    F = btd_cholesky(A, panel=32)
    assert np.allclose(np.asarray(F.Ls), np.asarray(F0.Ls), atol=1e-10)
    assert np.allclose(np.asarray(F.Cs), np.asarray(F0.Cs), atol=1e-10)
    b = jax.random.normal(jax.random.PRNGKey(5), (A.n,), dtype=jnp.float64)
    assert np.allclose(
        np.asarray(F.solve(b)), np.asarray(F0.solve(b)), atol=1e-9
    )


def test_blocked_cholesky_vmap():
    keys = jax.random.split(jax.random.PRNGKey(6), 3)
    As = jnp.stack([_spd(k, 128) for k in keys])
    L0 = jnp.linalg.cholesky(As)
    L = jax.vmap(lambda a: blocked_cholesky(a, 48))(As)
    assert np.allclose(
        np.tril(np.asarray(L)), np.tril(np.asarray(L0)), atol=1e-9
    )


def test_btd_cholesky_winv_and_combined_paths():
    """winv-TRSM GEMM chain and panel+winv combination are exact; non-divisor
    panel sizes shrink to the largest divisor (prime bs falls back clean)."""
    b = None
    for n_blocks, bs in ((5, 96), (4, 100), (3, 61)):  # 61 prime -> fallback
        A = random_btd_spd(jax.random.PRNGKey(7), n_blocks, bs, n=n_blocks * bs)
        F0 = btd_cholesky(A)
        b = jax.random.normal(jax.random.PRNGKey(8), (A.n,), dtype=jnp.float64)
        x0 = np.asarray(F0.solve(b))
        for opts in (
            dict(winv_trsm=32),
            dict(winv_trsm=64, panel=32),
        ):
            F = btd_cholesky(A, **opts)
            assert np.allclose(np.asarray(F.solve(b)), x0, atol=1e-9), (bs, opts)


def test_blueprint_factor_opts():
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
    from diffeqgmrfs_tpu.solvers.blueprints import GNCholeskySolverBlueprint

    assert CholeskySolverBlueprint().factor_opts() == {}
    bp = CholeskySolverBlueprint(
        factor_winv_trsm=128, factor_panel=128, factor_precision="bfloat16"
    )
    assert bp.factor_opts() == {
        "winv_trsm": 128, "panel": 128, "precision": "bfloat16"
    }
    gn = GNCholeskySolverBlueprint(factor_winv_trsm=64, damping=True)
    assert gn.factor_opts() == {"winv_trsm": 64}


def test_refined_factor_with_factor_opts():
    """Mixed-precision refinement converges identically through the
    winv/panel factor path."""
    from diffeqgmrfs_tpu.ops.refine import RefinedFactor

    A = random_btd_spd(jax.random.PRNGKey(9), 4, 64, n=256)
    b = jax.random.normal(jax.random.PRNGKey(10), (A.n,), dtype=jnp.float64)
    x0, rel0 = RefinedFactor(A).solve(b)
    x1, rel1 = RefinedFactor(
        A, factor_opts=dict(winv_trsm=32, panel=32,
                            precision="tensorfloat32")
    ).solve(b)
    assert float(rel1) < 1e-12
    assert np.allclose(np.asarray(x1), np.asarray(x0), rtol=1e-10)
