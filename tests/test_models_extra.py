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


# ---------------------------------------------------------------------------
# Non-uniform time grids + 2D/anisotropic ST priors (reference semantics:
# `src/spdes/shallow_water.jl:210-230` per-step G(dt)/beta(dt);
# `scripts/burgers/solve_burgers_gmrf-fem.jl:95-104` H tensor surface)
# ---------------------------------------------------------------------------


def test_joint_ssm_nonuniform():
    """joint_ssm on arbitrary ts vs brute-force dense accumulation of the
    chain's quadratic form sum_t (T_t x_{t+1} - M x_t)' P_t (...)."""
    from diffeqgmrfs_tpu.models.advection_diffusion import (
        ImplicitEulerSSM,
        joint_ssm,
    )
    from diffeqgmrfs_tpu.gmrf import GMRF
    from diffeqgmrfs_tpu.ops.btd import BTD
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint

    rng = np.random.default_rng(7)
    n = 3
    ts = np.array([0.0, 0.05, 0.2, 0.3, 0.65])
    N_t = len(ts)
    A0 = rng.normal(size=(n, n))
    Q0 = A0 @ A0.T + n * np.eye(n)
    m_diag = rng.uniform(1.0, 2.0, size=n)
    K = rng.normal(size=(n, n))

    def T_of(dt):
        return np.diag(m_diag) + dt * K

    def P_of(dt):
        return (1.0 / dt) * (np.diag(m_diag) @ np.diag(m_diag)) + np.eye(n)

    x0 = GMRF(
        jnp.zeros(n),
        BTD(jnp.asarray(Q0)[None], jnp.zeros((0, n, n)), n),
        None,
        CholeskySolverBlueprint(),
    )
    ssm = ImplicitEulerSSM(
        x0,
        lambda dt: jnp.asarray(T_of(dt)),
        lambda dt: jnp.asarray(m_diag),
        lambda dt: jnp.asarray(1.0 / m_diag),
        None,
        lambda dt: jnp.asarray(P_of(dt)),
        ts,
    )
    Q = joint_ssm(ssm)
    Qd = np.asarray(Q.to_dense())

    # independent accumulation: S_t = [0 .. -M | T_t .. 0], Q = Q0 + sum S'PS
    Qref = np.zeros((N_t * n, N_t * n))
    Qref[:n, :n] = Q0
    M = np.diag(m_diag)
    for t, dt in enumerate(np.diff(ts)):
        S = np.zeros((n, N_t * n))
        S[:, t * n : (t + 1) * n] = -M
        S[:, (t + 1) * n : (t + 2) * n] = T_of(dt)
        Qref += S.T @ P_of(dt) @ S
    assert np.allclose(Qd, Qref, rtol=1e-12, atol=1e-10)


def test_advection_diffusion_2d_anisotropic():
    """2D ST prior with anisotropic H and vector advection speed: the
    assembled operators satisfy exact identities on linear fields (P2
    interpolation of a.x is exact), and the joint precision is SPD."""
    from diffeqgmrfs_tpu.fem import unit_square_discretization
    from diffeqgmrfs_tpu.models import (
        MaternSPDE,
        AdvectionDiffusionSPDE,
        discretize_advection_diffusion,
    )
    from diffeqgmrfs_tpu.models.advection_diffusion import (
        host_advection_matrix,
        host_anisotropic_stiffness,
    )
    from diffeqgmrfs_tpu.ops import btd_cholesky

    disc = unit_square_discretization(3, element_order=2)
    n = disc.ndofs
    node_dofs = disc.dof_handler.node_dofs(
        "u", np.arange(disc.mesh.n_nodes)
    )
    coords = np.zeros((n, 2))
    coords[node_dofs] = np.asarray(disc.mesh.coords)
    H = np.array([[2.0, 0.3], [0.3, 1.0]])
    a = np.array([0.7, -0.4])
    u_lin = coords @ a  # linear field, exactly interpolated by P2

    # int phi_i dx from an independent per-cell loop
    g = disc.geometry
    cd = disc.dof_handler.cell_dofs_field("u")
    int_phi = np.zeros(n)
    int_grad = np.zeros((n, 2))
    for c in range(cd.shape[0]):
        for q in range(g.phi.shape[0]):
            for i in range(cd.shape[1]):
                int_phi[cd[c, i]] += g.w_detJ[c, q] * g.phi[q, i]
                int_grad[cd[c, i]] += g.w_detJ[c, q] * g.grad[c, q, i]

    B0 = host_advection_matrix(disc, 0).toarray()
    B1 = host_advection_matrix(disc, 1).toarray()
    # (B_d u)_i = int phi_i d_d(a.x) = a_d int phi_i
    assert np.allclose(B0 @ u_lin, a[0] * int_phi, atol=1e-12)
    assert np.allclose(B1 @ u_lin, a[1] * int_phi, atol=1e-12)
    G_H = host_anisotropic_stiffness(disc, H).toarray()
    assert np.allclose(G_H, G_H.T, atol=1e-12)
    # (G_H u)_i = int grad(phi_i) . H a
    assert np.allclose(G_H @ u_lin, int_grad @ (H @ a), atol=1e-12)

    spde = AdvectionDiffusionSPDE(
        d=2,
        kappa=0.5,
        alpha=1,
        H=H,
        gamma=jnp.asarray([0.4, -0.2]),
        c=2.0,
        tau=0.8,
        spatial_spde=MaternSPDE(d=2, range=0.4, smoothness=1),
        initial_spde=MaternSPDE(d=2, range=0.4, smoothness=1),
    )
    ts = np.linspace(0.0, 0.3, 4)
    x = discretize_advection_diffusion(spde, disc, ts)
    Q = x.precision
    Qd = np.asarray(Q.to_dense())
    assert np.allclose(Qd, Qd.T, rtol=1e-10)
    F = btd_cholesky(Q)
    assert np.isfinite(float(F.log_det()))
    s = x.std()
    assert bool(jnp.all(jnp.isfinite(s)))


def test_advection_diffusion_nonuniform_ts():
    """End-to-end ST prior on a non-uniform time grid (per-step blocks)."""
    from diffeqgmrfs_tpu.fem import periodic_unit_interval_discretization
    from diffeqgmrfs_tpu.models import (
        MaternSPDE,
        AdvectionDiffusionSPDE,
        discretize_advection_diffusion,
    )
    from diffeqgmrfs_tpu.ops import btd_cholesky

    disc = periodic_unit_interval_discretization(10, element_order=2)
    kappa = np.sqrt(8 * 1.5) * np.sqrt(10)
    spde = AdvectionDiffusionSPDE(
        d=1,
        kappa=0.1,
        alpha=1,
        gamma=jnp.asarray([-1.5]),
        c=10.0,
        tau=0.5,
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
    )
    ts = np.array([0.0, 0.01, 0.05, 0.1, 0.3, 0.35])
    x = discretize_advection_diffusion(spde, disc, ts)
    Q = x.inner_gmrf.precision
    # interior diagonal blocks differ across steps (non-Toeplitz)
    assert not np.allclose(np.asarray(Q.diag[1]), np.asarray(Q.diag[2]))
    F = btd_cholesky(Q)
    assert np.isfinite(float(F.log_det()))
    assert bool(jnp.all(jnp.isfinite(x.std())))
