"""Shallow-water SPDE prior + CG solver tests."""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem import TriangleMesh, FEMDiscretization, Dirichlet
from diffeqgmrfs_tpu.models.shallow_water import (
    LinearShallowWaterSPDE,
    discretize_shallow_water,
)
from diffeqgmrfs_tpu.gmrf import ConstrainedGMRF
from diffeqgmrfs_tpu.ops import btd_cholesky
from diffeqgmrfs_tpu.ops.cg import cg_solve


def test_shallow_water_prior():
    mesh = TriangleMesh(0, 0, 1, 1, 4, 4, order=2)
    disc = FEMDiscretization(
        mesh, element_order=2, quad_degree=3, fields=("h", "u", "v")
    )
    spde = LinearShallowWaterSPDE(H=1.0, tau=1.0, k=0.1, f=0.5, g=9.81)
    ts = np.linspace(0, 1, 4)
    x = discretize_shallow_water(spde, disc, ts, kappa_matern=2.0)
    assert x.N_t == 4
    assert x.precision.bs == 3 * mesh.n_nodes
    F = btd_cholesky(x.precision)
    assert np.isfinite(float(F.log_det()))
    s = x.std()
    assert bool(jnp.all(jnp.isfinite(s)))


def test_shallow_water_constrained():
    mesh = TriangleMesh(0, 0, 1, 1, 3, 3, order=2)
    disc = FEMDiscretization(
        mesh,
        element_order=2,
        quad_degree=3,
        fields=("h", "u", "v"),
        bcs=[(Dirichlet("h", "boundary", 0.0), 1e-2)],
    )
    spde = LinearShallowWaterSPDE(H=lambda x: 1.0 + 0.2 * x[..., 0])
    x = discretize_shallow_water(spde, disc, np.linspace(0, 0.5, 3))
    assert isinstance(x, ConstrainedGMRF)
    m = x.mean()
    assert m.shape == (3 * disc.ndofs,)
    # prescribed h-dofs are exactly zero
    assert float(jnp.max(jnp.abs(m[x.prescribed_dofs]))) == 0.0


def test_cg_matches_cholesky():
    from tests.test_btd import random_btd_spd

    A = random_btd_spd(jax.random.PRNGKey(11), 4, 8, n=30)
    b = jnp.asarray(np.random.default_rng(0).normal(size=30))
    x_cg = cg_solve(A, b, tol=1e-12)
    x_ch = btd_cholesky(A).solve(b)
    np.testing.assert_allclose(np.asarray(x_cg), np.asarray(x_ch), atol=1e-8)


def test_pdebench_hdf5_loader(tmp_path):
    """PDEBench HDF5 layout (`scripts/solve_burger.jl:40-47`): `tensor`
    dataset [N, Nt, Nx] + visc attr round-trips through BurgersDataset."""
    import h5py
    from diffeqgmrfs_tpu.datasets.burgers import BurgersDataset

    rng = np.random.default_rng(0)
    data = rng.normal(size=(3, 5, 17))
    p = str(tmp_path / "pdebench.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("tensor", data=data)
        f.attrs["visc"] = 0.007
    ds = BurgersDataset(p)
    assert len(ds) == 3
    assert abs(ds.nu - 0.007) < 1e-12
    np.testing.assert_allclose(np.asarray(ds.get_solution(1)), data[1])
    np.testing.assert_allclose(np.asarray(ds.get_initial_condition(2)), data[2, 0])
