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


def test_matfree_mixed_gauss_newton_matches_f64():
    """The matrix-free mixed-precision GN path matches f64 GN on a small
    Burgers CN system at obs precision 1e15."""
    import numpy as np
    from diffeqgmrfs_tpu.fem import (
        interval_discretization,
        evaluation_matrix,
        spatial_to_spatiotemporal,
    )
    from diffeqgmrfs_tpu.models import (
        MaternSPDE,
        AdvectionDiffusionSPDE,
        discretize_advection_diffusion,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import BurgersFEMResidual
    from diffeqgmrfs_tpu.solvers import gauss_newton_solve, StepNumberCriterion

    N_x, NU = 40, 0.01
    disc = interval_discretization(-1, 1, N_x, element_order=2, dirichlet=True)
    X = np.linspace(-0.98, 0.98, 50)
    ic = -np.sin(np.pi * X)
    ts = np.linspace(0, 0.3, 8)
    N_t = len(ts)
    bulk = float(np.mean(ic))
    c = 1 / NU
    spde = AdvectionDiffusionSPDE(
        d=1, kappa=0.0, alpha=1, gamma=jnp.asarray([-c * bulk]), c=c,
        tau=0.1 * np.sqrt(c),
        initial_spde=MaternSPDE(d=1, range=0.15, smoothness=2),
        spatial_spde=MaternSPDE(d=1, range=0.15, smoothness=1),
    )
    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=bulk)
    A_ic = spatial_to_spatiotemporal(evaluation_matrix(disc, X), 0, N_t)
    u_ic = condition_on_observations(x, A_ic, 1e10, jnp.asarray(ic))
    res = BurgersFEMResidual(disc, ts, NU, scheme="crank_nicolson")
    args = (
        u_ic.inner_gmrf.mean(), u_ic.inner_gmrf.precision, res.f_and_J,
        1e15, jnp.zeros(res.n_rows), u_ic.inner_gmrf.mean(),
    )
    kw = dict(criterion=StepNumberCriterion(6), affine=u_ic.affine)
    r64 = gauss_newton_solve(*args, **kw)
    rmp = gauss_newton_solve(*args, mixed_precision=True, **kw)
    d = float(
        jnp.linalg.norm(rmp.x_k - r64.x_k) / jnp.linalg.norm(r64.x_k)
    )
    # inexact-Newton regime: per-step refined solves are ~1e-5 accurate at
    # obs precision 1e15; GN re-linearization absorbs the rest
    assert d < 2e-5, d


def test_gauss_newton_ell_path_matches_btd():
    """GN with the prior as f64 ELL (EllMatFreeFactor: no f64 BTD in the
    loop) matches the BTD mixed-precision path on a small Burgers ST
    problem."""
    import numpy as np
    import jax.numpy as jnp
    from diffeqgmrfs_tpu.fem import (
        periodic_unit_interval_discretization,
        evaluation_matrix,
        spatial_to_spatiotemporal,
    )
    from diffeqgmrfs_tpu.fem.operators import RowOp
    from diffeqgmrfs_tpu.models import (
        MaternSPDE, AdvectionDiffusionSPDE, discretize_advection_diffusion,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import BurgersFEMResidual
    from diffeqgmrfs_tpu.solvers import gauss_newton_solve, StepNumberCriterion
    from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached
    from diffeqgmrfs_tpu.ops.btd import make_btd_pattern
    from diffeqgmrfs_tpu.ops.packed import ShapeOnly

    N_x, N_t, nu = 12, 6, 0.05
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.25, N_t)
    xs = np.linspace(0.0, 1.0, 2 * N_x + 1)
    ic = jnp.asarray(0.6 + 0.25 * np.sin(2 * np.pi * xs))
    A_ic = spatial_to_spatiotemporal(evaluation_matrix(disc, xs), 0, N_t)
    res = BurgersFEMResidual(disc, ts, nu)
    kappa = float(np.sqrt(8 * 1.5) / np.sqrt(1 / N_x))
    c = 1.0 / nu
    spde = AdvectionDiffusionSPDE(
        d=1, kappa=0.0, alpha=1, gamma=jnp.asarray([-c * 0.6]), c=c,
        tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
    )
    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=0.6)
    x_ic = condition_on_observations(x, A_ic, 1e8, ic)
    mu, Q = x_ic.inner_gmrf.mean(), x_ic.inner_gmrf.precision
    affine = x_ic.affine
    crit = StepNumberCriterion(4)
    kw = dict(criterion=crit, affine=affine, materialize_H=False)

    res_btd = gauss_newton_solve(
        mu, Q, res.f_and_J, 1e10, jnp.zeros(res.n_rows), mu,
        mixed_precision=True, **kw,
    )

    # ELL form of the same Q
    Q_csr = Q.to_csr_host()
    q_ell = RowOp.from_csr(Q_csr, dtype=jnp.float64)
    q_diag = jnp.asarray(Q_csr.diagonal())
    coo = Q_csr.tocoo()
    q_pattern = make_btd_pattern(coo.row, coo.col, Q.n, bs=Q.bs)
    # structural check: ELL reproduces the BTD matvec
    v = jnp.asarray(np.random.default_rng(0).normal(size=Q.n))
    np.testing.assert_allclose(
        np.asarray(q_ell.matvec(v)), np.asarray(Q.matvec(v)), rtol=1e-12, atol=1e-12
    )
    _, J0 = res.f_and_J(affine.free_to_full(mu))
    Jc0 = affine.condense_rowop(J0)
    pat = ata_pattern_cached(Jc0, Q.n, Q.bs)
    q_coo = (
        jnp.asarray(coo.row.astype(np.int32)),
        jnp.asarray(coo.col.astype(np.int32)),
        jnp.asarray(coo.data),
    )
    res_ell = gauss_newton_solve(
        mu, ShapeOnly(Q.n, Q.N, Q.bs), res.f_and_J, 1e10,
        jnp.zeros(res.n_rows), mu,
        mixed_precision=True, ata_pattern=pat,
        q_ell=q_ell, q_diag=q_diag, q_pattern=q_pattern, q_coo=q_coo, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(res_ell.x_k), np.asarray(res_btd.x_k), rtol=1e-6, atol=1e-8
    )


def test_gauss_newton_toeplitz_path_matches_btd():
    """GN with the ST prior in distinct-block (Toeplitz) form matches the
    BTD mixed-precision path — the production-memory route for large
    constant-mesh ST systems (Burgers N_x=800 x 100 steps)."""
    import numpy as np
    import jax.numpy as jnp
    from diffeqgmrfs_tpu.fem import (
        periodic_unit_interval_discretization,
        evaluation_matrix,
        spatial_to_spatiotemporal,
    )
    from diffeqgmrfs_tpu.models import (
        MaternSPDE, AdvectionDiffusionSPDE, discretize_advection_diffusion,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import BurgersFEMResidual
    from diffeqgmrfs_tpu.solvers import gauss_newton_solve, StepNumberCriterion
    from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD

    N_x, N_t, nu = 12, 6, 0.05
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.25, N_t)
    xs = np.linspace(0.0, 1.0, 2 * N_x + 1)
    ic = jnp.asarray(0.6 + 0.25 * np.sin(2 * np.pi * xs))
    A_ic = spatial_to_spatiotemporal(evaluation_matrix(disc, xs), 0, N_t)
    res = BurgersFEMResidual(disc, ts, nu)
    kappa = float(np.sqrt(8 * 1.5) / np.sqrt(1 / N_x))
    c = 1.0 / nu
    spde = AdvectionDiffusionSPDE(
        d=1, kappa=0.0, alpha=1, gamma=jnp.asarray([-c * 0.6]), c=c,
        tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
    )
    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=0.6)
    x_ic = condition_on_observations(x, A_ic, 1e8, ic)
    mu, Q = x_ic.inner_gmrf.mean(), x_ic.inner_gmrf.precision
    # structural precondition of the Toeplitz slicing: uniform interior
    np.testing.assert_allclose(
        np.asarray(Q.diag[2]), np.asarray(Q.diag[1]), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(Q.lower[2]), np.asarray(Q.lower[0]), rtol=0, atol=1e-12
    )
    q_top = ToeplitzBTD.from_btd(Q)
    # operator equivalence
    v = jnp.asarray(np.random.default_rng(0).normal(size=Q.n))
    np.testing.assert_allclose(
        np.asarray(q_top.matvec(v)), np.asarray(Q.matvec(v)),
        rtol=1e-12, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(q_top.diagonal()), np.asarray(Q.diagonal()), rtol=1e-13
    )
    d = jnp.asarray(np.random.default_rng(1).uniform(1.0, 2.0, Q.n))
    S1 = q_top.scaled_btd(1.0 / d, dtype=jnp.float64)
    db = Q.pad_vec(1.0 / d)
    np.testing.assert_allclose(
        np.asarray(S1.diag),
        np.asarray(Q.diag * db[:, :, None] * db[:, None, :]), rtol=1e-12,
    )

    args = (mu, Q, res.f_and_J, 1e10, jnp.zeros(res.n_rows), mu)
    kw = dict(criterion=StepNumberCriterion(4), affine=x_ic.affine,
              materialize_H=False)
    r_btd = gauss_newton_solve(*args, mixed_precision=True, **kw)
    r_top = gauss_newton_solve(
        *args, mixed_precision=True, q_toeplitz=q_top, **kw
    )
    diff = float(
        jnp.linalg.norm(r_top.x_k - r_btd.x_k) / jnp.linalg.norm(r_btd.x_k)
    )
    assert diff < 1e-8, diff
