"""Level-batched multifrontal Cholesky vs dense/scipy on the production
Matérn precision structure (ops/multifrontal.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.multifrontal import (
    MultifrontalFactor,
    suggest_cut_width,
    symbolic_multifrontal,
)


@pytest.fixture(scope="module", params=[8, 16])
def problem(request):
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE
    from diffeqgmrfs_tpu.models.matern import matern_precision_host

    N_xy = request.param
    disc = uniform_unit_square_discretization(N_xy, element_order=2)
    spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
    Q = matern_precision_host(spde, disc).tocsr()
    n = Q.shape[0]
    H = (Q + 10.0 * sp.eye(n)).tocsr()
    H.sort_indices()
    coords = np.asarray(disc.mesh.coords)[:n]
    tree = symbolic_multifrontal(
        H, coords, suggest_cut_width(H, coords), leaf_target=48
    )
    return H, coords, tree


def test_tree_covers_all_dofs(problem):
    H, coords, tree = problem
    assert np.sort(tree.perm).tolist() == list(range(tree.n))
    # more than one level => dissection actually happened
    assert len(tree.levels) >= 2


def test_solve_matches_scipy(problem):
    H, coords, tree = problem
    fac = MultifrontalFactor.factorize(tree, H.data, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    b = rng.normal(size=(tree.n, 3))
    x = np.asarray(fac.solve(jnp.asarray(b)))
    xref = sp.linalg.spsolve(H.tocsc(), b)
    np.testing.assert_allclose(x, xref, rtol=1e-8, atol=1e-10)
    # single-vector path
    x1 = np.asarray(fac.solve(jnp.asarray(b[:, 0])))
    np.testing.assert_allclose(x1, xref[:, 0], rtol=1e-8, atol=1e-10)


def test_logdet_matches_dense(problem):
    H, coords, tree = problem
    fac = MultifrontalFactor.factorize(tree, H.data, dtype=jnp.float64)
    sign, ld = np.linalg.slogdet(H.toarray())
    assert sign > 0
    np.testing.assert_allclose(float(fac.log_det()), ld, rtol=1e-9)


def test_factorize_jits(problem):
    H, coords, tree = problem
    f = jax.jit(
        lambda d: MultifrontalFactor.factorize(tree, d).solve(
            jnp.ones((tree.n,), jnp.float64)
        )
    )
    x = np.asarray(f(jnp.asarray(H.data)))
    xref = sp.linalg.spsolve(H.tocsc(), np.ones(tree.n))
    np.testing.assert_allclose(x, xref, rtol=1e-8, atol=1e-10)


def test_factorize_with_threaded_plan_arrays(problem):
    # plan arrays passed through the jit SIGNATURE (relay 413-safe path)
    from diffeqgmrfs_tpu.ops.multifrontal import tree_device_arrays

    H, coords, tree = problem
    arrs = tree_device_arrays(tree, H.nnz)
    f = jax.jit(
        lambda d, a: MultifrontalFactor.factorize(tree, d, arrs=a).solve(
            jnp.ones((tree.n,), jnp.float64)
        )
    )
    x = np.asarray(f(jnp.asarray(H.data), arrs))
    xref = sp.linalg.spsolve(H.tocsc(), np.ones(tree.n))
    np.testing.assert_allclose(x, xref, rtol=1e-8, atol=1e-10)


def test_sampling_covariance_small():
    # tiny mesh: empirical sample covariance ~ H^{-1}
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE
    from diffeqgmrfs_tpu.models.matern import matern_precision_host

    disc = uniform_unit_square_discretization(4, element_order=1)
    spde = MaternSPDE(d=2, range=0.5, smoothness=2)
    Q = matern_precision_host(spde, disc).tocsr()
    n = Q.shape[0]
    H = (Q + 10.0 * sp.eye(n)).tocsr()
    H.sort_indices()
    coords = np.asarray(disc.mesh.coords)[:n]
    tree = symbolic_multifrontal(
        H, coords, suggest_cut_width(H, coords), leaf_target=8
    )
    fac = MultifrontalFactor.factorize(tree, H.data, dtype=jnp.float64)
    k = 4000
    z = np.asarray(fac.sample_zero_mean(jax.random.PRNGKey(1), k))
    emp = z @ z.T / k
    ref = np.linalg.inv(H.toarray())
    err = np.abs(emp - ref).max() / np.abs(ref).max()
    assert err < 0.15, err
