"""GMRF layer tests: conditioning vs dense Gaussian identities, variance
strategies, constrained GMRFs, priors."""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops import BTD, btd_cholesky
from diffeqgmrfs_tpu.gmrf import (
    GMRF,
    ConstrainedGMRF,
    condition_on_observations,
)
from diffeqgmrfs_tpu.fem import (
    RowOp,
    interval_discretization,
    periodic_unit_interval_discretization,
    unit_square_discretization,
    uniform_unit_square_discretization,
    evaluation_matrix,
)
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.models import (
    MaternSPDE,
    discretize_matern,
    AdvectionDiffusionSPDE,
    discretize_advection_diffusion,
    product_matern,
)
from diffeqgmrfs_tpu.solvers import RBMCStrategy


def small_gmrf(key, N=3, bs=4):
    n = N * bs
    diag = jax.random.normal(key, (N, bs, bs), dtype=jnp.float64) * 0.1
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + 3 * jnp.eye(bs)
    lower = (
        jax.random.normal(jax.random.PRNGKey(9), (N - 1, bs, bs), dtype=jnp.float64)
        * 0.1
    )
    mu = jnp.asarray(np.random.default_rng(0).normal(size=n))
    return GMRF(mu, BTD(diag, lower, n))


def test_condition_on_observations_vs_dense():
    x = small_gmrf(jax.random.PRNGKey(0))
    n = x.n
    rng = np.random.default_rng(1)
    # 5 observation rows, each touching 3 dofs
    cols = np.stack([rng.choice(n, size=3, replace=False) for _ in range(5)])
    cols.sort(axis=1)
    # keep within block-tridiag reach: use contiguous dofs
    cols = np.stack([np.arange(i, i + 3) for i in [0, 2, 5, 7, 9]])
    vals = jnp.asarray(rng.normal(size=(5, 3)))
    A = RowOp(cols, vals, n)
    y = jnp.asarray(rng.normal(size=5))
    tau = 50.0
    post = condition_on_observations(x, A, tau, y)

    Ad = np.asarray(A.to_dense())
    Qd = np.asarray(x.precision.to_dense())
    Q_post = Qd + tau * Ad.T @ Ad
    mu_post = np.linalg.solve(
        Q_post, Qd @ np.asarray(x.mu) + tau * Ad.T @ np.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(post.mean()), mu_post, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(post.precision.to_dense()), Q_post, atol=1e-10
    )
    # variance via Takahashi matches dense inverse
    np.testing.assert_allclose(
        np.asarray(post.variance()), np.diag(np.linalg.inv(Q_post)), rtol=1e-9
    )
    # sqmahal
    v = rng.normal(size=n)
    d = v - mu_post
    np.testing.assert_allclose(
        float(post.sqmahal(jnp.asarray(v))), d @ Q_post @ d, rtol=1e-9
    )


def test_rbmc_variance_approximates_truth():
    x = small_gmrf(jax.random.PRNGKey(2))
    truth = np.diag(np.linalg.inv(np.asarray(x.precision.to_dense())))
    est = np.asarray(x.variance(RBMCStrategy(n_samples=4000, seed=1)))
    np.testing.assert_allclose(est, truth, rtol=0.15)


def test_conditioning_constrained_gmrf():
    # periodic 1D: observation on full dofs condensed onto free dofs
    disc = periodic_unit_interval_discretization(8, element_order=2)
    spde = MaternSPDE(d=1, range=0.3, smoothness=1)
    x = discretize_matern(spde, disc)
    assert isinstance(x, ConstrainedGMRF)
    pts = np.linspace(0.0, 1.0, 9)
    E = evaluation_matrix(disc, pts)
    y = jnp.asarray(np.sin(2 * np.pi * pts))
    post = condition_on_observations(x, E, 1e6, y)
    pred = np.asarray(E.matvec(post.mean()))
    np.testing.assert_allclose(pred, np.asarray(y), atol=1e-3)
    # periodicity: endpoint values equal
    m = np.asarray(post.mean())
    assert abs(m[0] - m[-1]) < 1e-12
    # std is finite and periodic-consistent
    s = np.asarray(post.std())
    assert np.all(np.isfinite(s))
    assert abs(s[0] - s[-1]) < 1e-12


def test_matern_prior_marginal_variance():
    # Unit-variance Matérn prior: interior marginal variances ~ sigma^2
    disc = unit_square_discretization(16, element_order=1)
    spde = MaternSPDE(d=2, range=0.2, smoothness=1, sigma_sq=1.0)
    x = discretize_matern(spde, disc)
    var = np.asarray(x.variance())
    coords = np.asarray(disc.mesh.coords)
    interior = (
        (coords[:, 0] > 0.3)
        & (coords[:, 0] < 0.7)
        & (coords[:, 1] > 0.3)
        & (coords[:, 1] < 0.7)
    )
    v_int = var[interior]
    # FEM + boundary effects allow a loose band around 1
    assert 0.5 < float(np.median(v_int)) < 2.0


def test_matern_1d_variance_calibration():
    # 1D, alpha=2 (nu=3/2): natural variance formula should calibrate to ~1
    disc = interval_discretization(0.0, 10.0, 200, element_order=1)
    spde = MaternSPDE(d=1, range=1.0, smoothness=1, sigma_sq=1.0)
    x = discretize_matern(spde, disc)
    var = np.asarray(x.variance())
    mid = var[80:120]
    np.testing.assert_allclose(np.median(mid), 1.0, rtol=0.15)


def test_advection_diffusion_prior_structure():
    disc = periodic_unit_interval_discretization(6, element_order=2)
    nu_b = 0.05
    ic = jnp.asarray(np.sin(2 * np.pi * np.linspace(0, 1, 13)))
    bulk = float(jnp.mean(ic))
    c = 1.0 / nu_b
    spde = AdvectionDiffusionSPDE(
        d=1,
        kappa=0.0,
        alpha=1,
        H=np.ones((1, 1)),
        gamma=jnp.asarray([-c * bulk]),
        c=c,
        tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=np.sqrt(8 * 1.5) / 0.4, nu=1.5),
        initial_spde=MaternSPDE(d=1, kappa=np.sqrt(8 * 1.5) / 0.4, nu=1.5),
    )
    ts = np.linspace(0, 1, 5)
    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=bulk)
    assert isinstance(x, ConstrainedGMRF)
    inner = x.inner_gmrf
    assert inner.N_t == 5
    n_free = disc.n_free
    assert inner.precision.bs == n_free
    # precision is SPD: factorization succeeds with finite logdet
    F = btd_cholesky(inner.precision)
    assert np.isfinite(float(F.log_det()))
    # mean is the bulk speed everywhere
    np.testing.assert_allclose(np.asarray(x.mean()), bulk, atol=1e-12)


def test_joint_ssm_matches_brute_force():
    """Joint precision == assembled from the chain density directly."""
    from diffeqgmrfs_tpu.models.advection_diffusion import ImplicitEulerSSM, joint_ssm

    rng = np.random.default_rng(7)
    n, N_t = 4, 4
    T = np.eye(n) + 0.1 * rng.normal(size=(n, n))
    M = np.diag(rng.uniform(1, 2, n))
    P = np.eye(n) * 2.0
    Q0 = np.eye(n) * 3.0

    x0 = GMRF(
        jnp.zeros(n), BTD(jnp.asarray(Q0)[None], jnp.zeros((0, n, n)), n)
    )
    ssm = ImplicitEulerSSM(
        x0,
        lambda dt: jnp.asarray(T),
        lambda dt: jnp.asarray(np.diag(M)),
        lambda dt: jnp.asarray(1 / np.diag(M)),
        None,
        lambda dt: jnp.asarray(P),
        np.linspace(0, 1, N_t),
    )
    Q = np.asarray(joint_ssm(ssm).to_dense())

    # brute force: -2 log density = x0' Q0 x0 + sum |P^(1/2)(T x_{t+1} - M x_t)|^2
    Qb = np.zeros((n * N_t, n * N_t))
    Qb[:n, :n] += Q0
    for t in range(N_t - 1):
        a, b = t * n, (t + 1) * n
        Qb[b : b + n, b : b + n] += T.T @ P @ T
        Qb[a : a + n, a : a + n] += M.T @ P @ M
        Qb[b : b + n, a : a + n] += -T.T @ P @ M
        Qb[a : a + n, b : b + n] += -(T.T @ P @ M).T
    np.testing.assert_allclose(Q, Qb, atol=1e-12)


def test_product_matern_kron():
    disc = interval_discretization(0.0, 1.0, 6, element_order=2)
    t_spde = MaternSPDE(d=1, range=3.0, smoothness=0, sigma_sq=0.1)
    s_spde = MaternSPDE(d=1, range=0.2, smoothness=1, sigma_sq=0.1)
    N_t = 5
    x = product_matern(t_spde, N_t, s_spde, disc)
    Q = np.asarray(x.precision.to_dense())
    from diffeqgmrfs_tpu.models.product_matern import temporal_matern_precision
    from diffeqgmrfs_tpu.models.matern import matern_precision_host

    Qt = temporal_matern_precision(t_spde, N_t).toarray()
    Qs = matern_precision_host(s_spde, disc, None).toarray()
    np.testing.assert_allclose(Q, np.kron(Qt, Qs), atol=1e-10)


def test_padded_st_prior_equivalent():
    """pad_block padding must not change posterior means/stds on real dofs."""
    from diffeqgmrfs_tpu.fem import (
        periodic_unit_interval_discretization,
        evaluation_matrix,
        spatial_to_spatiotemporal,
    )

    disc = periodic_unit_interval_discretization(7, element_order=2)  # 14 free
    ts = np.linspace(0, 0.4, 4)
    xs = np.linspace(0, 1, 15)
    ic = 0.4 + 0.3 * np.sin(2 * np.pi * xs)
    c = 20.0
    spde = AdvectionDiffusionSPDE(
        d=1, kappa=0.0, alpha=1, gamma=jnp.asarray([-c * float(np.mean(ic))]),
        c=c, tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, range=0.3, nu=1.5),
        initial_spde=MaternSPDE(d=1, range=0.3, nu=1.5),
    )
    A_ic = spatial_to_spatiotemporal(evaluation_matrix(disc, xs), 0, 4)
    x_ref = discretize_advection_diffusion(spde, disc, ts, mean_offset=0.4)
    x_pad = discretize_advection_diffusion(
        spde, disc, ts, mean_offset=0.4, pad_block=8
    )
    assert x_pad.inner_gmrf.precision.bs == 16  # 14 -> 16
    p_ref = condition_on_observations(x_ref, A_ic, 1e6, jnp.asarray(ic))
    p_pad = condition_on_observations(x_pad, A_ic, 1e6, jnp.asarray(ic))
    np.testing.assert_allclose(
        np.asarray(p_pad.mean()), np.asarray(p_ref.mean()), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(p_pad.std()), np.asarray(p_ref.std()), rtol=1e-8, atol=1e-11
    )


def test_gemm_solves_blueprint_matches_default():
    """gemm_solves=True factor (BTDInverseSolver) is a drop-in: same mean
    solve, Takahashi variance (shared inverses), log-det, and sample law."""
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint

    x = small_gmrf(jax.random.PRNGKey(21))
    xg = GMRF(
        x.mu, x.precision, blueprint=CholeskySolverBlueprint(gemm_solves=True)
    )
    b = jnp.asarray(np.random.default_rng(1).normal(size=x.n))
    np.testing.assert_allclose(
        np.asarray(xg.solve(b)), np.asarray(x.solve(b)), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(xg.variance()), np.asarray(x.variance()), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(xg.log_det_precision()), float(x.log_det_precision()), rtol=1e-12
    )
    # identical key -> identical sample (both apply L^{-T} to the same z)
    s_ref = x.sample(jax.random.PRNGKey(3), 4)
    s_gem = xg.sample(jax.random.PRNGKey(3), 4)
    np.testing.assert_allclose(np.asarray(s_gem), np.asarray(s_ref), atol=1e-9)


def test_gemm_solves_mixed_precision():
    """gemm_solves composes with the mixed-precision factor."""
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint

    x = small_gmrf(jax.random.PRNGKey(22))
    bp = CholeskySolverBlueprint(mixed_precision=True, gemm_solves=True)
    xm = GMRF(x.mu, x.precision, blueprint=bp)
    b = jnp.asarray(np.random.default_rng(2).normal(size=x.n))
    np.testing.assert_allclose(
        np.asarray(xm.solve(b)), np.asarray(x.solve(b)), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(xm.variance()), np.asarray(x.variance()), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(xm.log_det_precision()), float(x.log_det_precision()), rtol=1e-5
    )


def test_compact_gmrf_conditioning_matches_f64():
    """CompactGMRF (f32 BTD + f64 ELL, MatFreeConditionFactor) reproduces
    the f64 BTD conditioning path: mean to refinement accuracy, variance to
    f32, log-det, sqmahal; all inside jit with the prior as an argument."""
    from diffeqgmrfs_tpu.models import discretize_matern
    from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached

    disc = uniform_unit_square_discretization(8, element_order=2, use_dirichlet_bc=True)
    spde = MaternSPDE(d=2, range=0.35, smoothness=2)
    prior = discretize_matern(spde, disc)
    prior_c = discretize_matern(spde, disc, compact=True)

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(0.05, 0.95, size=(40, 2)))
    E = evaluation_matrix(disc, pts)
    yv = jnp.asarray(rng.normal(size=40))

    post = condition_on_observations(prior, E, 1e6, yv)
    inner_c = prior_c.inner_gmrf
    E_c = prior_c.affine.condense_rowop(E)
    pat = ata_pattern_cached(E_c, inner_c.precision.n, inner_c.precision.bs)

    def solve(prior_arg, pattern, y):
        return condition_on_observations(prior_arg, E, 1e6, y, pattern=pattern)

    post_c = jax.jit(solve)(prior_c, pat, yv)

    m_ref = np.asarray(post.mean())
    m_c = np.asarray(post_c.mean())
    np.testing.assert_allclose(m_c, m_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(post_c.std()), np.asarray(post.std()), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(post_c.inner_gmrf.log_det_precision()),
        float(post.inner_gmrf.log_det_precision()),
        rtol=1e-4,
    )
    v = jnp.asarray(rng.normal(size=len(m_ref)))
    np.testing.assert_allclose(
        float(post_c.sqmahal(v)), float(post.sqmahal(v)), rtol=1e-6
    )


def test_rowop_from_csr_and_batched_rmatvec():
    import scipy.sparse as sp

    rng = np.random.default_rng(7)
    M = sp.random(12, 9, density=0.3, random_state=5, format="csr")
    A = RowOp.from_csr(M)
    x = rng.normal(size=(3, 9))
    np.testing.assert_allclose(
        np.asarray(A.matvec(jnp.asarray(x))), x @ M.T.toarray(), atol=1e-12
    )
    y = rng.normal(size=(4, 12))
    np.testing.assert_allclose(
        np.asarray(A.rmatvec(jnp.asarray(y))), y @ M.toarray(), atol=1e-12
    )


def test_compact_conditioning_window_plan_matches_scatter():
    """ATAWindowPlan threaded as `pattern` gives the same posterior as the
    flat-scatter BTDPattern in the compact conditioning path."""
    from diffeqgmrfs_tpu.models import discretize_matern
    from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    disc = uniform_unit_square_discretization(8, element_order=2, use_dirichlet_bc=True)
    spde = MaternSPDE(d=2, range=0.35, smoothness=2)
    prior_c = discretize_matern(spde, disc, compact=True)
    inner = prior_c.inner_gmrf

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.uniform(0.05, 0.95, size=(40, 2)))
    E = evaluation_matrix(disc, pts)
    yv = jnp.asarray(rng.normal(size=40))
    E_c = prior_c.affine.condense_rowop(E)
    pat = ata_pattern_cached(E_c, inner.precision.n, inner.precision.bs)
    plan = make_ata_window_plan(E_c.cols, inner.precision.n, inner.precision.bs)

    post_s = condition_on_observations(prior_c, E, 1e6, yv, pattern=pat)
    post_w = condition_on_observations(prior_c, E, 1e6, yv, pattern=plan)
    # both assemble the f32 system with different summation orders; the f64
    # refinement brings them together to ~1e-8 rel, not bit-equality
    np.testing.assert_allclose(
        np.asarray(post_w.mean()), np.asarray(post_s.mean()), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(post_w.std()), np.asarray(post_s.std()), rtol=5e-3, atol=1e-12
    )
