"""ST-SRIF: sparse square root of the implicit-Euler joint precision.

Validates (1) the square-root identity S^T S = Q_joint against the dense
joint precision from `discretize_advection_diffusion` (with and without
MXU block padding), and (2) the full square-root Gauss-Newton path on a
mini Burgers problem against the exact-f64 path, including the final-factor
posterior surface (variance/log-det vs dense). Reference semantics:
`/root/reference/src/spdes/shallow_water.jl:210-231`,
`scripts/burgers/solve_burgers_gmrf-fem.jl:86-193`.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem import (
    periodic_unit_interval_discretization,
    evaluation_matrix,
    spatial_to_spatiotemporal,
)
from diffeqgmrfs_tpu.gmrf import condition_on_observations
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.models import (
    MaternSPDE,
    AdvectionDiffusionSPDE,
    discretize_advection_diffusion,
)
from diffeqgmrfs_tpu.models.advection_diffusion import st_sqrt_ops
from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan
from diffeqgmrfs_tpu.problems import BurgersFEMResidual
from diffeqgmrfs_tpu.solvers import (
    gauss_newton_solve,
    NewtonDecrementCriterion,
    StepNumberCriterion,
    OrCriterion,
)


def dense_from_op(plan, vals, n_total):
    """Materialize an SRIF operand (window plan + values) as a dense matrix."""
    vals = np.asarray(vals)
    A = np.zeros((vals.shape[0], n_total))
    rows = np.asarray(plan.rows)
    mask = np.asarray(plan.mask)
    lc = np.asarray(plan.local_cols)
    for b in range(plan.Nw):
        for r in range(rows.shape[1]):
            if mask[b, r]:
                i = rows[b, r]
                for k in range(lc.shape[2]):
                    A[i, b * plan.bs + lc[b, r, k]] += vals[i, k]
    return A


def _spde(N_x, nu=0.05, gamma=-3.0):
    nu_m = 1.5
    kappa = np.sqrt(8 * nu_m) / np.sqrt(1 / N_x)
    c = 1.0 / nu
    return AdvectionDiffusionSPDE(
        d=1,
        kappa=0.7,
        alpha=1,
        gamma=jnp.asarray([gamma]),
        c=c,
        tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
    )


def _check_sqrt_identity(pad_block):
    N_x, N_t = 14, 5
    gamma = -2.5
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.4, N_t)
    spde = _spde(N_x, gamma=gamma)
    x = discretize_advection_diffusion(spde, disc, ts, pad_block=pad_block)
    Q_dense = np.asarray(x.inner_gmrf.precision.to_dense())

    st = st_sqrt_ops(spde, disc, ts, pad_block=pad_block)
    ops = st.sqrt_ops(gamma)
    n_total = Q_dense.shape[0]
    S = np.concatenate(
        [dense_from_op(p, v, n_total) for p, v in ops], axis=0
    )
    QtQ = S.T @ S
    scale = np.abs(Q_dense).max()
    # f32 operand values -> ~1e-7 relative agreement
    assert np.max(np.abs(QtQ - Q_dense)) / scale < 5e-6, (
        np.max(np.abs(QtQ - Q_dense)) / scale
    )


def test_st_sqrt_identity():
    _check_sqrt_identity(pad_block=None)


def test_st_sqrt_identity_padded():
    _check_sqrt_identity(pad_block=8)


def test_st_srif_gauss_newton_matches_f64():
    """Mini Burgers sweep config: square-root GN (f32 windowed QR +
    refinement) vs exact f64 GN — final iterates and posterior stats."""
    N_x, N_t, nu = 24, 8, 0.05
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.5, N_t)
    xs = np.linspace(0, 1, 33)
    ic = 0.8 + 0.4 * np.sin(2 * np.pi * xs)
    bulk = float(np.mean(ic))
    c = 1.0 / nu
    gamma = -c * bulk
    spde = _spde(N_x, nu=nu, gamma=gamma)
    noise_ic, noise_fem = 1e8, 1e12

    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=bulk)
    A_ic = spatial_to_spatiotemporal(evaluation_matrix(disc, xs), 0, N_t)
    x_ic = condition_on_observations(x, A_ic, noise_ic, jnp.asarray(ic))
    res = BurgersFEMResidual(disc, ts, nu, scheme="implicit_euler")
    criterion = OrCriterion(
        [NewtonDecrementCriterion(1e-6), StepNumberCriterion(12)]
    )
    common = dict(
        criterion=criterion,
        affine=x_ic.affine,
    )
    args = (
        x_ic.inner_gmrf.mean(),
        x_ic.inner_gmrf.precision,
        res.f_and_J,
        noise_fem,
        jnp.zeros(res.n_rows),
        x_ic.inner_gmrf.mean(),
    )

    # exact f64 reference
    r64 = gauss_newton_solve(*args, **common)
    H64 = np.asarray(r64.H.to_dense())

    # square-root path: ST sqrt operands + IC observation operand
    st = st_sqrt_ops(spde, disc, ts)
    A_ic_c = x_ic.affine.condense_rowop(A_ic)
    n_free = x_ic.affine.n_free
    bs = x_ic.inner_gmrf.precision.bs
    from diffeqgmrfs_tpu.ops.srif import rowop_window_plan
    from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD

    ic_plan = rowop_window_plan(A_ic_c, n_free, bs)
    sqrt_ops = st.sqrt_ops(gamma) + [
        (ic_plan, A_ic_c.vals * np.sqrt(noise_ic))
    ]
    # structure of the condensed ST Jacobian for the SRIF row plan
    _, J0 = res.f_and_J(jnp.zeros(N_t * disc.ndofs))
    Jc0 = x_ic.affine.condense_rowop(J0)
    j_plan = make_ata_window_plan(np.asarray(Jc0.cols), n_free, bs)
    q_top = ToeplitzBTD.from_btd(x_ic.inner_gmrf.precision)

    r_sq = gauss_newton_solve(
        *args,
        **common,
        sqrt_ops=sqrt_ops,
        ata_window_plan=j_plan,
        q_ell=q_top,
        q_diag=q_top.diagonal(),
        materialize_H=False,
        final_factor=True,
    )
    assert int(r_sq.n_steps) == int(r64.n_steps)
    x64, xsq = np.asarray(r64.x_k), np.asarray(r_sq.x_k)
    rel = np.linalg.norm(xsq - x64) / np.linalg.norm(x64)
    assert rel < 1e-6, rel

    # posterior surface through the final SRIF factor
    post = r_sq.posterior(affine=x_ic.affine)
    var = np.asarray(post.inner_gmrf.variance())
    var_dense = np.diag(np.linalg.inv(H64))
    assert np.allclose(var, var_dense, rtol=5e-3), (
        np.max(np.abs(var - var_dense) / var_dense)
    )
    ld = float(post.inner_gmrf.log_det_precision())
    sign, ld_dense = np.linalg.slogdet(H64)
    assert sign > 0
    assert abs(ld - ld_dense) / abs(ld_dense) < 1e-5, (ld, ld_dense)
    # sampling runs and has the right shape
    smp = post.sample(jax.random.PRNGKey(0), 2)
    assert smp.shape == (2, N_t * disc.ndofs)
    assert np.all(np.isfinite(np.asarray(smp)))


def test_rfull_gemm_solver_matches():
    """GEMM-form (RFullInverseSolver) of the ST-SRIF factor: solves,
    sampling shape, variance, log-det match the TRSM form."""
    from diffeqgmrfs_tpu.ops.srif import srif_packed_qr, rowop_window_plan
    from diffeqgmrfs_tpu.ops.inverse_solver import RFullInverseSolver
    from diffeqgmrfs_tpu.ops.packed import PackedBTDRFullFactor
    from diffeqgmrfs_tpu.fem.operators import RowOp
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    N_b, bs = 5, 12
    n = N_b * bs
    # random banded + dense-coupling operator rows -> full-offdiag factor
    diag = sp.diags(rng.uniform(1, 2, n))
    ops = []
    S1 = RowOp.from_csr(sp.csr_matrix(diag), dtype=jnp.float32)
    ops.append((rowop_window_plan(S1, n, bs), S1.vals))
    # cross-block rows (span 2 blocks -> forces full offdiag)
    rows = []
    for b in range(N_b - 1):
        for r in range(bs):
            cols = [b * bs + r, (b + 1) * bs + (r + 3) % bs]
            rows.append((cols, rng.normal(size=2)))
    cols = np.array([c for c, _ in rows])
    vals = jnp.asarray(np.array([v for _, v in rows]), dtype=jnp.float32)
    S2 = RowOp(cols, vals, n)
    ops.append((rowop_window_plan(S2, n, bs, zero_slots=None), S2.vals))
    F = srif_packed_qr(ops, n, N_b, bs, dtype=jnp.float32)
    assert isinstance(F, PackedBTDRFullFactor)
    G = RFullInverseSolver.from_factor(F)
    b = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    assert np.allclose(np.asarray(G.solve(b)), np.asarray(F.solve(b)),
                       rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(G.variance_diag()),
                       np.asarray(F.variance_diag()), rtol=1e-4)
    assert abs(float(G.log_det()) - float(F.log_det())) < 1e-4
    s = G.sample_zero_mean(jax.random.PRNGKey(0), 3)
    assert s.shape == (3, n)


def test_condition_st_sqrt_matches_f64():
    """SRIF IC conditioning (Toeplitz prior, J := A_ic) vs the exact f64
    conditioning: mean, conditioned-precision action, information vector."""
    from diffeqgmrfs_tpu.models.advection_diffusion import st_prior_toeplitz
    from diffeqgmrfs_tpu.gmrf.conditioning import condition_st_sqrt

    N_x, N_t, nu = 20, 6, 0.05
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.4, N_t)
    xs = np.linspace(0, 1, 25)
    ic = 0.7 + 0.3 * np.sin(2 * np.pi * xs)
    gamma = -4.0
    spde = _spde(N_x, nu=nu, gamma=gamma)

    # exact f64 reference
    x = discretize_advection_diffusion(spde, disc, ts)
    A_ic = spatial_to_spatiotemporal(evaluation_matrix(disc, xs), 0, N_t)
    x_ic = condition_on_observations(x, A_ic, 1e8, jnp.asarray(ic))
    mu_ref = np.asarray(x_ic.inner_gmrf.mean())
    Q_ref = np.asarray(x_ic.inner_gmrf.precision.to_dense())

    # SRIF/Toeplitz path
    from diffeqgmrfs_tpu.ops.srif import rowop_window_plan

    mu_p, q_top, affine = st_prior_toeplitz(spde, disc, ts)
    st = st_sqrt_ops(spde, disc, ts)
    A_c = affine.condense_rowop(A_ic)
    ic_plan = rowop_window_plan(A_c, q_top.n, q_top.bs)
    mu_ic, q_ic, eta = condition_st_sqrt(
        mu_p, q_top, st.sqrt_ops(gamma), A_c, 1e8, jnp.asarray(ic), ic_plan,
        refine_iters=3,
    )
    # information vector is exact: eta = Q_ic mu_ref
    eta_ref = Q_ref @ mu_ref
    assert np.allclose(np.asarray(eta), eta_ref, rtol=1e-9, atol=1e-6)
    # conditioned Toeplitz action matches the f64 conditioned precision
    v = np.random.default_rng(0).normal(size=q_top.n)
    assert np.allclose(
        np.asarray(q_ic.matvec(jnp.asarray(v))), Q_ref @ v, rtol=1e-10
    )
    # mean agrees to refinement accuracy at this (well-conditioned) size
    rel = np.linalg.norm(np.asarray(mu_ic) - mu_ref) / np.linalg.norm(mu_ref)
    assert rel < 1e-6, rel


def test_st_srif_gn_qr_engines_agree():
    """The blocked QR engines (bhh, bcgs2) drive the square-root ST
    Gauss-Newton loop to the same iterates/posterior as the monolithic
    Householder (xla) engine — the guard for flipping `srif_qr_impl` on
    the stepwise/batched sweep drivers (solve_burgers_gmrf_fem --stepwise).
    Reference workload semantics: `scripts/burgers/solve_burgers_gmrf-fem.jl`.
    """
    import pytest

    N_x, N_t, nu = 24, 8, 0.05
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.5, N_t)
    xs = np.linspace(0, 1, 33)
    ic = 0.8 + 0.4 * np.sin(2 * np.pi * xs)
    bulk = float(np.mean(ic))
    gamma = -(1.0 / nu) * bulk
    spde = _spde(N_x, nu=nu, gamma=gamma)
    noise_ic, noise_fem = 1e8, 1e12

    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=bulk)
    A_ic = spatial_to_spatiotemporal(evaluation_matrix(disc, xs), 0, N_t)
    x_ic = condition_on_observations(x, A_ic, noise_ic, jnp.asarray(ic))
    res = BurgersFEMResidual(disc, ts, nu, scheme="implicit_euler")
    st = st_sqrt_ops(spde, disc, ts)
    A_ic_c = x_ic.affine.condense_rowop(A_ic)
    n_free = x_ic.affine.n_free
    bs = x_ic.inner_gmrf.precision.bs
    from diffeqgmrfs_tpu.ops.srif import rowop_window_plan
    from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD

    ic_plan = rowop_window_plan(A_ic_c, n_free, bs)
    sqrt_ops = st.sqrt_ops(gamma) + [
        (ic_plan, A_ic_c.vals * np.sqrt(noise_ic))
    ]
    _, J0 = res.f_and_J(jnp.zeros(N_t * disc.ndofs))
    Jc0 = x_ic.affine.condense_rowop(J0)
    j_plan = make_ata_window_plan(np.asarray(Jc0.cols), n_free, bs)
    q_top = ToeplitzBTD.from_btd(x_ic.inner_gmrf.precision)

    def run(engine):
        return gauss_newton_solve(
            x_ic.inner_gmrf.mean(),
            x_ic.inner_gmrf.precision,
            res.f_and_J,
            noise_fem,
            jnp.zeros(res.n_rows),
            x_ic.inner_gmrf.mean(),
            criterion=OrCriterion(
                [NewtonDecrementCriterion(1e-6), StepNumberCriterion(12)]
            ),
            affine=x_ic.affine,
            sqrt_ops=sqrt_ops,
            ata_window_plan=j_plan,
            q_ell=q_top,
            q_diag=q_top.diagonal(),
            materialize_H=False,
            final_factor=True,
            srif_qr_impl=engine,
        )

    r_ref = run("xla")
    x_ref = np.asarray(r_ref.x_k)
    post_ref = r_ref.posterior(affine=x_ic.affine)
    var_ref = np.asarray(post_ref.inner_gmrf.variance())
    for engine in ("bhh", "bcgs2"):
        r = run(engine)
        assert abs(int(r.n_steps) - int(r_ref.n_steps)) <= 1, (
            engine, int(r.n_steps), int(r_ref.n_steps)
        )
        xe = np.asarray(r.x_k)
        rel = np.linalg.norm(xe - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-5, (engine, rel)
        post = r.posterior(affine=x_ic.affine)
        var = np.asarray(post.inner_gmrf.variance())
        assert np.allclose(var, var_ref, rtol=1e-3), (
            engine, np.max(np.abs(var - var_ref) / var_ref)
        )


def test_srif_pcg_solve_beats_diverging_refinement():
    """solve_method="pcg" (preconditioned CG on the equilibrated Newton
    system) must converge where Richardson refinement is beyond the f32
    factor's validity — the regime of the flagship Burgers N800x100
    systems, where refinement diverges and the monotone safeguard pins the
    solve at first-sweep quality (RESULTS.md round 2).

    On this raw implicit-Euler ST Newton system (no IC conditioning, a
    random rhs) cond(H) ~ 7e10 already at N_x=24: the safeguarded
    refinement returns rel. error O(10) against the known solution, while
    PCG through the SAME f32 factor reaches ~3e-6 in <= 16 iterations —
    near the f64 dense-solve floor (1.6e-6 at this conditioning)."""
    N_x, N_t, nu = 24, 8, 0.05
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.5, N_t)
    bulk = 0.8
    c = 1.0 / nu
    gamma = -c * bulk
    spde = _spde(N_x, nu=nu, gamma=gamma)

    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=bulk)
    aff = AffineMap.from_constraint_handler(disc.constraint_handler).replicate(
        N_t
    )
    res = BurgersFEMResidual(disc, ts, nu, scheme="implicit_euler")
    mu = x.inner_gmrf.mean()
    _, J = res.f_and_J(aff.free_to_full(mu))
    Jc = aff.condense_rowop(J)

    from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD
    from diffeqgmrfs_tpu.ops.refine import SRIFNewtonFactor

    st = st_sqrt_ops(spde, disc, ts)
    sqrt_ops = st.sqrt_ops(gamma)
    n_free = aff.n_free
    q_btd = x.inner_gmrf.precision
    j_plan = make_ata_window_plan(np.asarray(Jc.cols), n_free, q_btd.bs)
    q_top = ToeplitzBTD.from_btd(q_btd)

    rng = np.random.default_rng(0)
    x_known = jnp.asarray(rng.standard_normal(n_free))
    xn = np.linalg.norm(np.asarray(x_known))

    for noise_fem, floor in ((1e4, 3e-5), (1e8, 1e-5)):
        tau = jnp.asarray(noise_fem, dtype=jnp.float64)

        def make_factor(**kw):
            return SRIFNewtonFactor(
                q_top, q_top.diagonal(), sqrt_ops, j_plan, Jc, tau,
                q_btd.n, q_btd.N, q_btd.bs, **kw,
            )

        # known-solution rhs: errors are measured against x_known directly
        F0 = make_factor()
        b = F0.matvec_H(x_known)

        def err(F):
            return np.linalg.norm(np.asarray(F.solve(b)) - x_known) / xn

        e_ref = err(F0)
        e_pcg = err(make_factor(solve_method="pcg", pcg_iters=16))
        assert np.isfinite(e_pcg)
        assert e_pcg < floor, (noise_fem, e_pcg)
        # refinement is pinned at first-sweep garbage here; PCG must be
        # orders of magnitude better
        assert e_pcg < e_ref / 1e4, (noise_fem, e_pcg, e_ref)
