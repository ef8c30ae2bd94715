"""Residual builders: Jacobian-vs-finite-difference consistency and
cross-form agreement (FEM vs collocation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffeqgmrfs_tpu.fem import (
    periodic_unit_interval_discretization,
    interval_discretization,
)
from diffeqgmrfs_tpu.problems import (
    BurgersFEMResidual,
    BurgersCollocationResidual,
)


def fd_jacobian(f_and_J, w, eps=1e-6):
    f0, _ = f_and_J(w)
    n = w.shape[0]
    cols = []
    for k in range(n):
        dw = np.zeros(n)
        dw[k] = eps
        f1, _ = f_and_J(w + jnp.asarray(dw))
        cols.append((np.asarray(f1) - np.asarray(f0)) / eps)
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("scheme", ["implicit_euler", "crank_nicolson"])
def test_burgers_fem_jacobian(scheme):
    disc = periodic_unit_interval_discretization(6, element_order=2)
    ts = np.linspace(0, 0.3, 4)
    res = BurgersFEMResidual(disc, ts, 0.05, scheme=scheme)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=4 * disc.ndofs))
    _, J = res.f_and_J(w)
    Jd = np.asarray(J.to_dense())
    Jfd = fd_jacobian(res.f_and_J, w)
    np.testing.assert_allclose(Jd, Jfd, atol=5e-7)


def test_burgers_collocation_jacobian():
    disc = interval_discretization(0.0, 1.0, 8, element_order=2, dirichlet=True)
    ts = np.linspace(0, 0.2, 4)
    coll = np.linspace(0.05, 0.95, 12)
    res = BurgersCollocationResidual(disc, ts, 0.05, coll)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=4 * disc.ndofs))
    _, J = res.f_and_J(w)
    Jd = np.asarray(J.to_dense())
    Jfd = fd_jacobian(res.f_and_J, w)
    np.testing.assert_allclose(Jd, Jfd, atol=5e-6)


def test_residuals_vanish_on_constant_field():
    """A space-time constant field is a steady Burgers solution for the
    periodic problem: u_t = 0, u u_x = 0, u_xx = 0 — both residual forms
    must vanish identically."""
    nu = 0.1
    disc = periodic_unit_interval_discretization(16, element_order=2)
    ts = np.linspace(0, 0.2, 5)
    w = jnp.full((5 * disc.ndofs,), 0.7)
    fem = BurgersFEMResidual(disc, ts, nu)
    coll = BurgersCollocationResidual(disc, ts, nu, np.linspace(0.02, 0.98, 20))
    f_fem, _ = fem.f_and_J(w)
    f_coll, _ = coll.f_and_J(w)
    assert float(jnp.max(jnp.abs(f_fem))) < 1e-12
    assert float(jnp.max(jnp.abs(f_coll))) < 1e-10


def test_gauss_newton_window_plan_matches_pattern():
    """GN with the scatter-free window-GEMM J^T J path matches the default."""
    import jax
    from diffeqgmrfs_tpu.fem import unit_square_discretization, evaluation_matrix
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import EllipticCubicResidual
    from diffeqgmrfs_tpu.solvers import gauss_newton_solve, StepNumberCriterion
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    N = 8
    disc = unit_square_discretization(N, element_order=2)
    coords = np.asarray(disc.mesh.coords)
    u_star = np.sin(np.pi * coords[:, 0]) * np.sin(np.pi * coords[:, 1])
    qc = disc.geometry.qcoords

    def f_u(p):
        return np.sin(np.pi * p[..., 0]) * np.sin(np.pi * p[..., 1])

    rhs_q = 2 * np.pi**2 * f_u(qc) + f_u(qc) ** 3
    x = discretize_matern(MaternSPDE(d=2, range=0.3, smoothness=1), disc)
    bpts = coords[disc.mesh.node_sets["boundary"]]
    A_b = evaluation_matrix(disc, bpts)
    x_bc = condition_on_observations(x, A_b, 1e10, jnp.zeros(A_b.n_rows))
    pres = disc.dof_handler.node_dofs("u", disc.mesh.node_sets["boundary"])
    res = EllipticCubicResidual(disc, rhs_q, pres)

    args = (x_bc.mean(), x_bc.precision, res.f_and_J, 1e12,
            jnp.zeros(res.n_rows), x_bc.mean())
    r_ref = gauss_newton_solve(*args, criterion=StepNumberCriterion(4))
    jcols, _, K = res.diff_cell.rowop_structure()
    plan = make_ata_window_plan(jcols, x_bc.precision.n, x_bc.precision.bs)
    r_win = gauss_newton_solve(
        *args, criterion=StepNumberCriterion(4), ata_window_plan=plan
    )
    np.testing.assert_allclose(
        np.asarray(r_win.x_k), np.asarray(r_ref.x_k), rtol=1e-9, atol=1e-10
    )


def test_burgers_fem_fold_rows_matches_dense():
    """fold_rows residual == hand-folded dense Galerkin residual
    (S^T r with periodic seam rows accumulated into masters)."""
    from diffeqgmrfs_tpu.fem.assembly import (
        assemble_mass,
        assemble_stiffness,
        assemble_advection_1d,
    )
    from diffeqgmrfs_tpu.problems.burgers import _test_row_fold

    disc = periodic_unit_interval_discretization(6, element_order=2)
    ts = np.linspace(0, 0.3, 4)
    nu = 0.05
    res = BurgersFEMResidual(disc, ts, nu)  # fold_rows default True
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=4 * disc.ndofs))
    f, J = res.f_and_J(w)
    n = disc.ndofs
    M = np.asarray(assemble_mass(disc).to_rowop().to_dense())
    G = np.asarray(assemble_stiffness(disc).to_rowop().to_dense())
    W = np.asarray(w).reshape(4, n)
    dt = ts[1] - ts[0]
    row_map, row_coef = _test_row_fold(disc)
    cell_dofs = np.asarray(disc.dof_handler.cell_dofs_field("u"))
    expected = []
    for t in range(1, 4):
        op = assemble_advection_1d(disc, jnp.asarray(W[t]))
        v_adv = np.zeros(n)
        np.add.at(v_adv, cell_dofs.reshape(-1), np.asarray(op.fe).reshape(-1))
        r = M @ (W[t] - W[t - 1]) + dt * nu * (G @ W[t]) + dt * v_adv
        out = np.zeros(n)
        np.add.at(out, row_map, row_coef * r)
        expected.append(out)
    np.testing.assert_allclose(
        np.asarray(f), np.concatenate(expected), atol=1e-12
    )
    # Jacobian of the folded residual still matches finite differences
    Jfd = fd_jacobian(res.f_and_J, w)
    np.testing.assert_allclose(np.asarray(J.to_dense()), Jfd, atol=5e-7)


def test_burgers_forward_march_solves_folded_residual():
    """The implicit-Euler march trajectory zeroes the folded FEM residual
    (f64 march on CPU -> machine-level residual)."""
    from diffeqgmrfs_tpu.problems.burgers import BurgersForwardMarch

    disc = periodic_unit_interval_discretization(12, element_order=2)
    ts = np.linspace(0, 0.2, 6)
    nu = 0.05
    res = BurgersFEMResidual(disc, ts, nu)
    march = BurgersForwardMarch(disc, ts, nu, n_newton=8)
    coords = np.linspace(0, 1, disc.ndofs, endpoint=False)
    u0 = jnp.asarray(0.3 + 0.2 * np.sin(2 * np.pi * coords), jnp.float64)
    W = march.trajectory(u0)
    f, _ = res.f_and_J(W.reshape(-1))
    assert float(jnp.max(jnp.abs(f))) < 1e-10


def test_dense_grid_lstsq_ic_fit_underdetermined_regime():
    """The warm-start march IC: a dense-grid (periodic-interp) lstsq fit
    of the observed IC stays accurate AND bounded when the FEM dofs
    outnumber the data points — the regime where (a) a bare coarse-grid
    lstsq is underdetermined (min-norm oscillation Burgers amplifies) and
    (b) slice 0 of the f32-conditioned ST posterior mean went to garbage
    at the flagship N_x=800 (RESULTS.md queue P). Mirrors the sweep
    driver's `--warm_src fit` construction."""
    from diffeqgmrfs_tpu.fem import evaluation_matrix

    disc = periodic_unit_interval_discretization(96, element_order=2)
    x_data = np.linspace(0.0, 1.0, 129)  # 129 obs < 192 free dofs
    ic = 0.4 + 0.3 * np.sin(2 * np.pi * x_data) + 0.1 * np.cos(
        6 * np.pi * x_data
    )
    x_fine = np.linspace(0.0, 1.0, 2049)
    E_fine = np.asarray(evaluation_matrix(disc, x_fine).to_dense())
    ic_fine = np.interp(x_fine, x_data, ic, period=1.0)
    u0, *_ = np.linalg.lstsq(E_fine, ic_fine, rcond=None)
    # reproduces the data
    E_data = np.asarray(evaluation_matrix(disc, x_data).to_dense())
    err = np.max(np.abs(E_data @ u0 - ic))
    assert err < 5e-4, err
    # bounded (no min-norm oscillation): coefficients stay near the
    # function range
    assert np.max(np.abs(u0)) < 1.0, np.max(np.abs(u0))
