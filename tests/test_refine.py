"""Mixed-precision (f32 factor + f64 refinement) solve tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffeqgmrfs_tpu.ops import btd_cholesky
from diffeqgmrfs_tpu.ops.refine import RefinedFactor, equilibrate
from tests.test_btd import random_btd_spd


def test_equilibrate_unit_diagonal():
    A = random_btd_spd(jax.random.PRNGKey(0), 3, 6)
    As, d = equilibrate(A)
    np.testing.assert_allclose(np.asarray(As.diagonal()), 1.0, atol=1e-12)
    # D^{1/2} A~ D^{1/2} == A
    Ad = np.asarray(A.to_dense())
    Asd = np.asarray(As.to_dense())
    dd = np.asarray(d)
    np.testing.assert_allclose(dd[:, None] * Asd * dd[None, :], Ad, rtol=1e-12)


def test_refined_solve_ill_conditioned():
    """Posterior-like matrix Q + tau A^T A with tau = 1e10: raw f32 fails,
    refinement recovers ~f64 accuracy."""
    key = jax.random.PRNGKey(1)
    A = random_btd_spd(key, 4, 8)
    n = A.n
    # add huge-precision rank-ish updates on the diagonal (scale spread)
    rng = np.random.default_rng(0)
    spread = jnp.asarray(10.0 ** rng.uniform(0, 10, size=n))
    H = A.add_diagonal(spread)
    b = jnp.asarray(rng.normal(size=n))
    x64 = btd_cholesky(H).solve(b)
    x_ref, rel = RefinedFactor(H, refine_iters=4).solve(b)
    err = float(jnp.linalg.norm(x_ref - x64) / jnp.linalg.norm(x64))
    assert err < 1e-10, err
    assert float(rel) < 1e-12
    # raw f32 is meaningfully worse
    x_raw, _ = RefinedFactor(H, refine_iters=0).solve(b)
    err_raw = float(jnp.linalg.norm(x_raw - x64) / jnp.linalg.norm(x64))
    assert err_raw > 10 * err
