"""SRIF windowed-QR factorization: exactness vs dense references, and the
f32 ill-conditioned regime where plain f32 Cholesky of H breaks down."""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
import pytest

from diffeqgmrfs_tpu.fem.operators import RowOp
from diffeqgmrfs_tpu.ops.srif import (
    srif_packed_qr,
    srif_packed_qr_chunked,
    rowop_window_plan,
)


def _banded_random(rng, n, lo, up, scale=1.0, m=None):
    """Random banded (m x n) matrix with lower/upper bandwidths lo/up."""
    m = n if m is None else m
    rows, cols, vals = [], [], []
    for r in range(m):
        c0, c1 = max(0, r - lo), min(n, r + up + 1)
        for c in range(c0, c1):
            rows.append(r)
            cols.append(c)
            vals.append(rng.normal() * scale)
    return sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()


def _setup(rng, n=50, bs=16, tau=2.0, diag_boost=3.0):
    Lam = _banded_random(rng, n, 3, 5) + diag_boost * sp.eye(n)
    A = _banded_random(rng, n, 4, 4, m=n)
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    N = -(-n // bs)
    Lam_op = RowOp.from_csr(Lam)
    A_op = RowOp.from_csr(A)
    ops = [
        (rowop_window_plan(Lam_op, n, bs), Lam_op.vals),
        (rowop_window_plan(A_op, n, bs), A_op.vals * np.sqrt(tau)),
    ]
    return ops, H, N


def test_srif_matches_dense_cholesky():
    rng = np.random.default_rng(0)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    b = rng.normal(size=n)
    x = np.asarray(F.solve(jnp.asarray(b)))
    x_ref = np.linalg.solve(H, b)
    assert np.allclose(x, x_ref, rtol=1e-10, atol=1e-10)
    ld = float(F.log_det())
    assert np.isclose(ld, np.linalg.slogdet(H)[1], rtol=1e-10)
    v = np.asarray(F.variance_diag())
    assert np.allclose(v, np.diag(np.linalg.inv(H)), rtol=1e-8)


def test_srif_single_block():
    rng = np.random.default_rng(1)
    n, bs = 12, 16
    Lam = _banded_random(rng, n, 3, 3) + 3.0 * sp.eye(n)
    H = (Lam.T @ Lam).toarray()
    Lam_op = RowOp.from_csr(Lam)
    ops = [(rowop_window_plan(Lam_op, n, bs), Lam_op.vals)]
    F = srif_packed_qr(ops, n, 1, bs, dtype=jnp.float64)
    b = rng.normal(size=n)
    assert np.allclose(np.asarray(F.solve(jnp.asarray(b))),
                       np.linalg.solve(H, b), rtol=1e-10)


def test_srif_col_scale_equilibration():
    rng = np.random.default_rng(2)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    d = np.sqrt(np.diag(H))
    Hs = H / d[:, None] / d[None, :]
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64,
                       col_scale=jnp.asarray(1.0 / d))
    b = rng.normal(size=n)
    assert np.allclose(np.asarray(F.solve(jnp.asarray(b))),
                       np.linalg.solve(Hs, b), rtol=1e-9, atol=1e-9)


def test_srif_f32_survives_where_cholesky_breaks():
    """cond(H) ~ 1e10 > 1/eps_f32: f32 Cholesky of H~ is garbage/NaN while
    the f32 SRIF factor + f64 refinement recovers ~f64 accuracy."""
    rng = np.random.default_rng(3)
    n, bs = 60, 16
    N = -(-n // bs)
    # squared-Laplacian-type operator: cond survives diagonal equilibration
    # (the Darcy failure mode — squared FEM stiffness inside A^T A)
    D2 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
    D1 = sp.diags([1.0, -1.0], [0, -1], shape=(n, n))
    Lam = (D2 @ D1).tocsr()  # cond(Lam) ~ n^3 ~ 1e5
    H = (Lam.T @ Lam).toarray()
    d = np.sqrt(np.diag(H))
    Hs = H / d[:, None] / d[None, :]
    assert np.linalg.cond(Hs) > 3e8

    # plain f32 cholesky of the equilibrated H fails (or is useless) —
    # the meaningful check is solve quality (scipy path below)
    b = rng.normal(size=n)
    bs_rhs = b / d
    try:
        import scipy.linalg as sla

        c32 = sla.cholesky(Hs.astype(np.float32), lower=True)
        y32 = sla.solve_triangular(
            c32.T, sla.solve_triangular(c32, bs_rhs.astype(np.float32),
                                        lower=True), lower=False)
        chol_rel = np.linalg.norm(y32 - np.linalg.solve(Hs, bs_rhs)) / \
            np.linalg.norm(np.linalg.solve(Hs, bs_rhs))
    except np.linalg.LinAlgError:
        chol_rel = np.inf
    except Exception:
        chol_rel = np.inf

    Lam_op = RowOp.from_csr(Lam)
    ops = [(rowop_window_plan(Lam_op, n, bs), Lam_op.vals)]
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float32,
                       col_scale=jnp.asarray(1.0 / d, dtype=jnp.float32))
    # f64 refinement against the exact operator
    y = np.asarray(F.solve(jnp.asarray(bs_rhs, dtype=jnp.float32)),
                   dtype=np.float64)
    for _ in range(4):
        r = bs_rhs - Hs @ y
        y = y + np.asarray(
            F.solve(jnp.asarray(r, dtype=jnp.float32)), dtype=np.float64
        )
    y_ref = np.linalg.solve(Hs, bs_rhs)
    srif_rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    # attainable limit ~ eps_f64 * cond(H) ~ 3e-7
    assert srif_rel < 1e-6
    assert srif_rel < chol_rel / 1e3 or not np.isfinite(chol_rel)


def test_srif_darcy_conditioning_matches_f64():
    """End-to-end Darcy conditioning through the SRIF path (sqrt prior +
    sqrt_factor blueprint + window-plan pattern) vs the full-f64 path."""
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    N_xy = 10
    disc = uniform_unit_square_discretization(N_xy, element_order=2)
    gx = np.linspace(0, 1, 21)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(np.where(rng.normal(size=(21, 21)) > 0, 12.0, 3.0))

    spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
    prior64 = discretize_matern(spde, disc)
    prior_s = discretize_matern(spde, disc, sqrt=True)
    obs = DarcyFEMObservations(
        disc, gx, gx, beta=1.0,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    A, ys = obs(coeff)
    post64 = condition_on_observations(prior64, A, 1e8, ys)

    inner = prior_s.inner_gmrf
    A_c = prior_s.affine.condense_rowop(A)
    zs = np.asarray(prior_s.affine.s_coef)[A.cols] == 0.0
    pat = make_ata_window_plan(
        A_c.cols, inner.precision.n, inner.precision.bs, zero_slots=zs
    )
    bp = CholeskySolverBlueprint(sqrt_factor=True)
    post_s = condition_on_observations(
        prior_s, A, 1e8, ys, solver_blueprint=bp, pattern=pat
    )
    m64 = np.asarray(post64.mean())
    ms = np.asarray(post_s.mean())
    assert np.linalg.norm(ms - m64) / np.linalg.norm(m64) < 1e-6
    # statistical quantities ride the f32 factor: agreement at f32 levels
    s64 = np.asarray(post64.std())
    ss = np.asarray(post_s.std())
    mask = s64 > 1e-8 * s64.max()
    assert np.max(np.abs(ss[mask] - s64[mask]) / s64[mask]) < 1e-2
    ld64 = float(post64.log_det_precision())
    lds = float(post_s.log_det_precision())
    assert abs(lds - ld64) / abs(ld64) < 1e-4


def test_srif_prior_prefactor_full_offdiag():
    """Measurement-update form with an ST-style prior (rows spanning >= bs
    columns -> full-offdiagonal factor): stage-1 pre-reduction of the
    time-coupled prior rows + per-instance [R_Λ; sqrt(tau) A] equals the
    one-shot stacked QR."""
    rng = np.random.default_rng(13)
    n, bs, tau = 48, 16, 3.0
    # time-coupling rows: entries at (i, i) and (i, i + bs) span bs+1 cols
    couple = sp.lil_matrix((n - bs, n))
    for i in range(n - bs):
        couple[i, i] = 2.0 + rng.normal() * 0.1
        couple[i, i + bs] = rng.normal()
    Lam = sp.vstack(
        [_banded_random(rng, n, 2, 3) + 3.0 * sp.eye(n), couple.tocsr()]
    ).tocsr()
    A = _banded_random(rng, n, 3, 3)
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    N = -(-n // bs)
    Lam_op, A_op = RowOp.from_csr(Lam), RowOp.from_csr(A)
    lam_plan = rowop_window_plan(Lam_op, n, bs)
    a_plan = rowop_window_plan(A_op, n, bs)
    assert lam_plan.max_span >= bs  # forces the full-offdiagonal form
    d = np.sqrt(np.diag(H))
    cs = 1.0 / d
    cs0 = 1.0 / np.sqrt((Lam.T @ Lam).diagonal())
    R0 = srif_packed_qr(
        [(lam_plan, Lam_op.vals)], n, N, bs, dtype=jnp.float64,
        col_scale=jnp.asarray(cs0),
    )
    from diffeqgmrfs_tpu.ops.packed import PackedBTDRFullFactor

    assert isinstance(R0, PackedBTDRFullFactor)
    F2 = srif_packed_qr(
        [(a_plan, A_op.vals * np.sqrt(tau))], n, N, bs,
        dtype=jnp.float64, col_scale=jnp.asarray(cs),
        prior_factor=R0, prior_rescale=jnp.asarray(cs / cs0),
    )
    F1 = srif_packed_qr(
        [(lam_plan, Lam_op.vals), (a_plan, A_op.vals * np.sqrt(tau))],
        n, N, bs, dtype=jnp.float64, col_scale=jnp.asarray(cs),
    )
    assert isinstance(F2, PackedBTDRFullFactor)
    np.testing.assert_allclose(np.asarray(F2.P), np.asarray(F1.P),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(F2.U), np.asarray(F1.U),
                               rtol=1e-9, atol=1e-9)
    b = rng.normal(size=n)
    Hs = H / d[:, None] / d[None, :]
    np.testing.assert_allclose(
        np.asarray(F2.solve(jnp.asarray(b))), np.linalg.solve(Hs, b),
        rtol=1e-9, atol=1e-9,
    )


def test_srif_conditioning_prefactor_matches():
    """Conditioning through the pre-reduced prior factor (sqrt_prefactor:
    stage-1 R_Λ built at discretization, per-instance QR stacks only
    [R_Λ·rescale; sqrt(tau) A]) gives the same posterior as the one-shot
    SRIF stack."""
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    N_xy = 10
    disc = uniform_unit_square_discretization(N_xy, element_order=2)
    gx = np.linspace(0, 1, 21)
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(np.where(rng.normal(size=(21, 21)) > 0, 12.0, 3.0))
    spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
    prior_s = discretize_matern(spde, disc, sqrt=True, sqrt_prefactor=False)
    prior_p = discretize_matern(spde, disc, sqrt=True, sqrt_prefactor=True)
    assert prior_p.inner_gmrf.sqrt_R32 is not None
    obs = DarcyFEMObservations(
        disc, gx, gx, beta=1.0,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    A, ys = obs(coeff)
    inner = prior_s.inner_gmrf
    A_c = prior_s.affine.condense_rowop(A)
    zs = np.asarray(prior_s.affine.s_coef)[A.cols] == 0.0
    pat = make_ata_window_plan(
        A_c.cols, inner.precision.n, inner.precision.bs, zero_slots=zs
    )
    bp = CholeskySolverBlueprint(sqrt_factor=True)
    post_s = condition_on_observations(
        prior_s, A, 1e8, ys, solver_blueprint=bp, pattern=pat
    )
    post_p = condition_on_observations(
        prior_p, A, 1e8, ys, solver_blueprint=bp, pattern=pat
    )
    # identical math up to the f32 rounding of R_Λ: factors agree at f32
    P_s = np.asarray(post_s.inner_gmrf.factor.F32.P)
    P_p = np.asarray(post_p.inner_gmrf.factor.F32.P)
    sc = np.abs(P_s).max()
    assert np.max(np.abs(P_p - P_s)) < 2e-5 * sc
    m_s = np.asarray(post_s.mean())
    m_p = np.asarray(post_p.mean())
    assert np.linalg.norm(m_p - m_s) / np.linalg.norm(m_s) < 1e-8
    s_s = np.asarray(post_s.std())
    s_p = np.asarray(post_p.std())
    mask = s_s > 1e-8 * s_s.max()
    assert np.max(np.abs(s_p[mask] - s_s[mask]) / s_s[mask]) < 1e-3


def test_srif_conditioning_pruned_operands_matches():
    """`CompactGMRF.drop_sqrt_operands()` (HBM pruning when the prefactor
    is active: the raw Λ rows + window plan + packed-Cholesky scatter plan
    are dead on the SRIF path — queue J's N300 RESOURCE_EXHAUSTED fix)
    conditions to the identical posterior."""
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    N_xy = 10
    disc = uniform_unit_square_discretization(N_xy, element_order=2)
    gx = np.linspace(0, 1, 21)
    rng = np.random.default_rng(7)
    coeff = jnp.asarray(np.where(rng.normal(size=(21, 21)) > 0, 12.0, 3.0))
    spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
    prior_p = discretize_matern(spde, disc, sqrt=True, sqrt_prefactor=True)
    pruned_inner = prior_p.inner_gmrf.drop_sqrt_operands()
    pruned_inner.q_pack_idx = None
    assert pruned_inner.sqrt32 is None and pruned_inner.sqrt_plan is None
    prior_pruned = type(prior_p)(pruned_inner, prior_p.affine)
    obs = DarcyFEMObservations(
        disc, gx, gx, beta=1.0,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    A, ys = obs(coeff)
    inner = prior_p.inner_gmrf
    A_c = prior_p.affine.condense_rowop(A)
    zs = np.asarray(prior_p.affine.s_coef)[A.cols] == 0.0
    pat = make_ata_window_plan(
        A_c.cols, inner.precision.n, inner.precision.bs, zero_slots=zs
    )
    bp = CholeskySolverBlueprint(sqrt_factor=True)
    post_ref = condition_on_observations(
        prior_p, A, 1e8, ys, solver_blueprint=bp, pattern=pat
    )
    post_pr = condition_on_observations(
        prior_pruned, A, 1e8, ys, solver_blueprint=bp, pattern=pat
    )
    m_ref = np.asarray(post_ref.mean())
    m_pr = np.asarray(post_pr.mean())
    assert np.linalg.norm(m_pr - m_ref) / np.linalg.norm(m_ref) < 1e-12
    s_ref = np.asarray(post_ref.std())
    s_pr = np.asarray(post_pr.std())
    np.testing.assert_allclose(s_pr, s_ref, rtol=1e-10, atol=1e-12)


def test_staged_shift_cholqr_panel_orthonormality():
    """bcgs4's staged-shift CholQR panels: full shifts on every pass cap
    orthonormality at ~s ~ 1e-2 (the measured 3-lost-digit bcgs2 failure,
    RESULTS.md); two full + two floor passes reach the f32 Gram-
    accumulation floor (~m*eps) at the production window condition ~1e5."""
    from diffeqgmrfs_tpu.ops.srif import _shifted_cholqr

    rng = np.random.default_rng(0)
    m, p = 2048, 128
    U, _ = np.linalg.qr(rng.normal(size=(m, p)))
    V, _ = np.linalg.qr(rng.normal(size=(p, p)))
    s = np.logspace(0, -5, p)  # cond 1e5
    P = jnp.asarray((U * s) @ V.T, dtype=jnp.float32)
    Q_all, _ = _shifted_cholqr(P, 3, None)
    Q_stg, R_stg = _shifted_cholqr(P, 4, 2)
    eye = np.eye(p)
    orth_all = np.linalg.norm(np.asarray(Q_all.T @ Q_all) - eye, 2)
    orth_stg = np.linalg.norm(np.asarray(Q_stg.T @ Q_stg) - eye, 2)
    assert orth_stg < 3 * m * np.finfo(np.float32).eps
    assert orth_stg < orth_all / 20
    rec = np.linalg.norm(np.asarray(Q_stg @ R_stg) - np.asarray(P))
    assert rec / np.linalg.norm(np.asarray(P)) < 1e-2


def test_srif_gauss_newton_matches_f64():
    """GN with SRIF square-root Newton systems (sqrt_ops path) matches the
    default f64 GN on a mini elliptic Chen24 problem — the regime the path
    exists for (`_research/elliptic_chen24.jl` at N=100 breaks f32 Cholesky)."""
    from diffeqgmrfs_tpu.fem import unit_square_discretization, evaluation_matrix
    from diffeqgmrfs_tpu.fem.operators import RowOp
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.models.matern import (
        matern_precision_host, matern_sqrt_host,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import EllipticCubicResidual
    from diffeqgmrfs_tpu.solvers import gauss_newton_solve, StepNumberCriterion
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    N = 10
    disc = unit_square_discretization(N, element_order=2)
    spde = MaternSPDE(d=2, range=0.3, smoothness=1)
    x = discretize_matern(spde, disc)
    line = np.linspace(0, 1, 41)
    zeros, ones = np.zeros_like(line), np.ones_like(line)
    Xb = np.concatenate([
        np.stack([line, zeros], -1), np.stack([ones, line], -1),
        np.stack([line, ones], -1), np.stack([zeros, line], -1),
    ])
    A_b = evaluation_matrix(disc, Xb)
    x_bc = condition_on_observations(x, A_b, 1e10, jnp.zeros(len(Xb)))
    rng = np.random.default_rng(0)
    rhs_q = rng.normal(size=disc.geometry.qcoords.shape[:2])
    prescribed = disc.dof_handler.node_dofs("u", disc.mesh.node_sets["boundary"])
    res = EllipticCubicResidual(disc, rhs_q, prescribed, alpha=1.0)
    tau = 1e12
    args = (x_bc.mean(), x_bc.precision, res.f_and_J, tau,
            jnp.zeros(res.n_rows), x_bc.mean())
    crit = StepNumberCriterion(5)
    r64 = gauss_newton_solve(*args, criterion=crit)

    n, bsz = disc.ndofs, x_bc.precision.bs
    lam32 = RowOp.from_csr(matern_sqrt_host(spde, disc), dtype=jnp.float32)
    from diffeqgmrfs_tpu.ops.srif import rowop_window_plan

    lam_plan = rowop_window_plan(lam32, n, bsz)
    ab_plan = rowop_window_plan(A_b, n, bsz)
    Ab_csr = A_b.to_csr_host()
    Q_bc = (matern_precision_host(spde, disc) + 1e10 * (Ab_csr.T @ Ab_csr)).tocsr()
    q_ell = RowOp.from_csr(Q_bc, dtype=jnp.float64)
    jcols, _, _ = res.diff_cell.rowop_structure()
    j_plan = make_ata_window_plan(np.asarray(jcols), n, bsz)
    rs = gauss_newton_solve(
        *args, criterion=crit,
        ata_window_plan=j_plan,
        sqrt_ops=[(lam_plan, lam32.vals), (ab_plan, A_b.vals * np.sqrt(1e10))],
        q_ell=q_ell, q_diag=jnp.asarray(Q_bc.diagonal()),
        materialize_H=False,
    )
    d = float(jnp.linalg.norm(rs.x_k - r64.x_k) / jnp.linalg.norm(r64.x_k))
    assert d < 1e-6, d


def test_srif_chunked_matches_unchunked():
    """Sequential row-block QR (chunk_rows) gives the identical factor."""
    rng = np.random.default_rng(7)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F1 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    F2 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64, chunk_rows=7)
    np.testing.assert_allclose(
        np.asarray(F2.P), np.asarray(F1.P), rtol=1e-12, atol=1e-12
    )
    b = rng.normal(size=n)
    assert np.allclose(np.asarray(F2.solve(jnp.asarray(b))),
                       np.linalg.solve(H, b), rtol=1e-10)


def test_srif_padding_identity():
    """Padded tail (n < N*bs) gets unit factor rows; solves stay finite."""
    rng = np.random.default_rng(4)
    n, bs = 20, 16  # N=2, 12 padded rows
    Lam = _banded_random(rng, n, 2, 2) + 3.0 * sp.eye(n)
    H = (Lam.T @ Lam).toarray()
    Lam_op = RowOp.from_csr(Lam)
    ops = [(rowop_window_plan(Lam_op, n, bs), Lam_op.vals)]
    F = srif_packed_qr(ops, n, 2, bs, dtype=jnp.float64)
    b = rng.normal(size=n)
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.all(np.isfinite(x))
    assert np.allclose(x, np.linalg.solve(H, b), rtol=1e-10)


def test_srif_bhh_engine_matches():
    """Blocked-Householder QR engine (panel QR + GEMM trailing updates)
    matches the monolithic XLA Householder factor."""
    rng = np.random.default_rng(21)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F0 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64, qr_impl="bhh",
                       panel=8)
    b = rng.normal(size=n)
    x0 = np.asarray(F0.solve(jnp.asarray(b)))
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.allclose(x, x0, rtol=1e-9, atol=1e-10)
    assert np.isclose(float(F.log_det()), float(F0.log_det()), rtol=1e-10)
    # f32: factor quality comparable to Householder (refinement-grade)
    F32 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float32, qr_impl="bhh",
                         panel=8)
    x32 = np.asarray(F32.solve(jnp.asarray(b).astype(jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, rel


def test_srif_bhh1_engine_matches():
    """bhh1 (blocked-Householder panels, single projection pass — the
    fastest Householder-grade engine on the v5e) matches the monolithic
    Householder factor in f64 and keeps refinement-grade f32 quality."""
    rng = np.random.default_rng(27)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F0 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64, qr_impl="bhh1",
                       panel=8)
    b = rng.normal(size=n)
    x0 = np.asarray(F0.solve(jnp.asarray(b)))
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.allclose(x, x0, rtol=1e-9, atol=1e-10)
    assert np.isclose(float(F.log_det()), float(F0.log_det()), rtol=1e-9)
    F32 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float32, qr_impl="bhh1",
                         panel=8)
    x32 = np.asarray(F32.solve(jnp.asarray(b).astype(jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, rel


def test_srif_bcgs2_engine_matches():
    """BCGS2 engine (shifted-CholQR3 panels + two-pass block projections,
    all-GEMM) matches the monolithic Householder factor in f64 and keeps
    refinement-grade quality in f32."""
    rng = np.random.default_rng(22)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F0 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64, qr_impl="bcgs2",
                       panel=8)
    b = rng.normal(size=n)
    x0 = np.asarray(F0.solve(jnp.asarray(b)))
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.allclose(x, x0, rtol=1e-9, atol=1e-10)
    assert np.isclose(float(F.log_det()), float(F0.log_det()), rtol=1e-9)
    F32 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float32, qr_impl="bcgs2",
                         panel=8)
    x32 = np.asarray(F32.solve(jnp.asarray(b).astype(jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, rel


def test_srif_bcgs4_engine_matches():
    """bcgs4 (staged-shift CholQR4 panels + BCGS2 projections) matches the
    monolithic Householder factor in f64 and keeps f32 quality — the
    engine that reaches the Householder floor with zero refinement at
    production conditions (RESULTS.md)."""
    rng = np.random.default_rng(23)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F0 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64, qr_impl="bcgs4",
                       panel=8)
    b = rng.normal(size=n)
    x0 = np.asarray(F0.solve(jnp.asarray(b)))
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.allclose(x, x0, rtol=1e-9, atol=1e-10)
    assert np.isclose(float(F.log_det()), float(F0.log_det()), rtol=1e-9)
    F32 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float32, qr_impl="bcgs4",
                         panel=8)
    x32 = np.asarray(F32.solve(jnp.asarray(b).astype(jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, rel


def test_srif_bcgs2_contraction_householder_grade():
    """On the cond ~ 1e10 squared-Laplacian system (the regime that makes
    single-pass bcgs need ~4x refinement iterations), the f32 BCGS2 factor
    refines to ~f64 accuracy in the SAME 4 iterations the Householder
    engines take — the second projection pass restores inter-panel
    orthogonality that single-pass block Gram-Schmidt loses at
    ~eps_mm * cond(T)."""
    rng = np.random.default_rng(5)
    n, bs = 60, 16
    N = -(-n // bs)
    D2 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
    D1 = sp.diags([1.0, -1.0], [0, -1], shape=(n, n))
    Lam = (D2 @ D1).tocsr()
    H = (Lam.T @ Lam).toarray()
    d = np.sqrt(np.diag(H))
    Hs = H / d[:, None] / d[None, :]
    Lam_op = RowOp.from_csr(Lam)
    ops = [(rowop_window_plan(Lam_op, n, bs), Lam_op.vals)]
    b = rng.normal(size=n)
    bs_rhs = b / d
    y_ref = np.linalg.solve(Hs, bs_rhs)

    def refined_rel(qr_impl, iters=4):
        F = srif_packed_qr(
            ops, n, N, bs, dtype=jnp.float32, qr_impl=qr_impl, panel=8,
            col_scale=jnp.asarray(1.0 / d, dtype=jnp.float32),
        )
        y = np.asarray(F.solve(jnp.asarray(bs_rhs, dtype=jnp.float32)),
                       dtype=np.float64)
        for _ in range(iters):
            r = bs_rhs - Hs @ y
            y = y + np.asarray(
                F.solve(jnp.asarray(r, dtype=jnp.float32)), dtype=np.float64
            )
        return np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)

    rel_hh = refined_rel("xla")
    rel_b2 = refined_rel("bcgs2")
    assert rel_b2 < 1e-6, rel_b2
    # within an order of magnitude of the Householder engine after the
    # same iteration count (both are at/near the f64-refinement floor)
    assert rel_b2 < max(10 * rel_hh, 1e-6), (rel_b2, rel_hh)


def test_packed_r_inverse_solver_matches_factor():
    """GEMM-form (in-place inverted triu) solves match the plain factor on
    every surface: solve, forward/backward, log_det, variance, sampling."""
    from diffeqgmrfs_tpu.ops.packed import PackedRInverseSolver

    rng = np.random.default_rng(3)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    W = PackedRInverseSolver.from_factor(F)
    b = rng.normal(size=n)
    assert np.allclose(
        np.asarray(W.solve(jnp.asarray(b))), np.asarray(F.solve(jnp.asarray(b))),
        rtol=1e-9, atol=1e-11,
    )
    assert np.allclose(
        np.asarray(W.forward_solve(jnp.asarray(b))),
        np.asarray(F.forward_solve(jnp.asarray(b))), rtol=1e-9, atol=1e-11,
    )
    assert np.isclose(float(W.log_det()), float(F.log_det()), rtol=1e-10)
    assert np.allclose(
        np.asarray(W.variance_diag()), np.diag(np.linalg.inv(H)), rtol=1e-8
    )
    # matrix rhs (sampling path) + rhs-dtype following
    Z = rng.normal(size=(4, n))
    assert np.allclose(
        np.asarray(W.backward_solve(jnp.asarray(Z))),
        np.asarray(F.backward_solve(jnp.asarray(Z))), rtol=1e-9, atol=1e-11,
    )
    x32 = W.solve(jnp.asarray(b, dtype=jnp.float32))
    assert x32.dtype == jnp.float32


def test_srif_condition_factor_gemm_solves():
    """SRIFConditionFactor(gemm_solves=True) converts to the inverse
    solver and reproduces the refined mean."""
    from diffeqgmrfs_tpu.ops.refine import SRIFConditionFactor, SymSumOp
    from diffeqgmrfs_tpu.ops.packed import PackedRInverseSolver

    rng = np.random.default_rng(5)
    n, bs, tau = 50, 16, 2.0
    Lam = _banded_random(rng, n, 3, 5) + 3.0 * sp.eye(n)
    A = _banded_random(rng, n, 4, 4, m=n)
    N = -(-n // bs)
    Lam_op = RowOp.from_csr(Lam)
    A_op = RowOp.from_csr(A)
    lam_plan = rowop_window_plan(Lam_op, n, bs)
    a_plan = rowop_window_plan(A_op, n, bs)
    Q_sp = (Lam.T @ Lam).tocsr()
    Q = Q_sp.toarray()
    H = Q + tau * (A.T @ A).toarray()
    Q_op = RowOp.from_csr(Q_sp)
    H_op = SymSumOp(Q_op, A_op, jnp.asarray(tau), diag_Q=jnp.asarray(np.diag(Q)))
    b = rng.normal(size=n)
    sols = {}
    for gs in (False, True):
        fac = SRIFConditionFactor(
            H_op, a_plan, Lam_op, lam_plan, n, N, bs, gemm_solves=gs
        )
        assert isinstance(fac.F32, PackedRInverseSolver) == gs
        sols[gs] = np.asarray(fac.solve(jnp.asarray(b)))
    x_ref = np.linalg.solve(H, b)
    assert np.allclose(sols[False], x_ref, rtol=1e-6, atol=1e-8)
    assert np.allclose(sols[True], x_ref, rtol=1e-6, atol=1e-8)


def test_window_plan_transpose_rmatvec():
    """plan.rmatvec (gather-only transpose ELL) == A^T r, with and without
    structurally-zero slots excluded."""
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    rng = np.random.default_rng(7)
    n, bs = 60, 16
    A = _banded_random(rng, n, 4, 4, m=70)
    A_op = RowOp.from_csr(A)
    # ragged rows are padded with (col 0, val 0) slots — they MUST be
    # declared structurally zero or the padded col-0 slots blow up both
    # the row span and column 0's transpose degree
    cols = np.asarray(A_op.cols)
    zs = np.asarray(A_op.vals == 0.0)
    plan = make_ata_window_plan(cols, n, bs, zero_slots=zs)
    r = rng.normal(size=70)
    ref = A.T @ r
    got = np.asarray(plan.rmatvec(jnp.asarray(A_op.vals), jnp.asarray(r)))
    assert np.allclose(got, ref, rtol=1e-12, atol=1e-12)
    # the transpose ELL excludes zero slots entirely: garbage there is inert
    vals2 = np.where(zs, 999.0, np.asarray(A_op.vals))
    got2 = np.asarray(plan.rmatvec(jnp.asarray(vals2), jnp.asarray(r)))
    assert np.allclose(got2, ref, rtol=1e-12, atol=1e-12)
    # square operator with exact K slots per row: no zero_slots needed
    A2 = _banded_random(rng, n, 4, 4)
    A2_op = RowOp.from_csr(A2)
    if not np.any(np.asarray(A2_op.vals) == 0.0):
        plan2 = make_ata_window_plan(np.asarray(A2_op.cols), n, bs,
                                     zero_slots=np.asarray(A2_op.vals) == 0)
        r2 = rng.normal(size=n)
        got3 = np.asarray(plan2.rmatvec(jnp.asarray(A2_op.vals), jnp.asarray(r2)))
        assert np.allclose(got3, A2.T @ r2, rtol=1e-12, atol=1e-12)


def test_srif_split_matches_split1():
    """Fine-granularity (split) windows compute the SAME packed R factor
    as the classic two-block windows — quadratically fewer QR flops."""
    rng = np.random.default_rng(5)
    n, bs, tau = 50, 16, 2.0
    Lam = _banded_random(rng, n, 3, 5) + 3.0 * sp.eye(n)
    A = _banded_random(rng, n, 4, 4)
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    N = -(-n // bs)
    Lam_op, A_op = RowOp.from_csr(Lam), RowOp.from_csr(A)

    def factor(split):
        ops = [
            (rowop_window_plan(Lam_op, n, bs, split=split), Lam_op.vals),
            (rowop_window_plan(A_op, n, bs, split=split),
             A_op.vals * np.sqrt(tau)),
        ]
        return srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)

    F1 = factor(1)
    b = rng.normal(size=n)
    x_ref = np.linalg.solve(H, b)
    for split in (2, 4):
        F = factor(split)
        # R is unique given positive diagonal: P matches entrywise
        assert np.allclose(np.asarray(F.P), np.asarray(F1.P),
                           rtol=1e-9, atol=1e-9)
        assert np.allclose(np.asarray(F.solve(jnp.asarray(b))), x_ref,
                           rtol=1e-9, atol=1e-9)
        assert np.isclose(float(F.log_det()), np.linalg.slogdet(H)[1],
                          rtol=1e-9)


def test_srif_split_chunked_and_colscale():
    rng = np.random.default_rng(6)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    d = np.sqrt(np.diag(H))
    Hs = H / d[:, None] / d[None, :]
    from diffeqgmrfs_tpu.fem.operators import RowOp as _RowOp  # noqa: F401
    # rebuild with split=2 plans
    rng2 = np.random.default_rng(2)
    Lam = _banded_random(rng2, n, 3, 5) + 3.0 * sp.eye(n)
    A = _banded_random(rng2, n, 4, 4, m=n)
    tau = 2.0
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    d = np.sqrt(np.diag(H))
    Hs = H / d[:, None] / d[None, :]
    Lam_op, A_op = RowOp.from_csr(Lam), RowOp.from_csr(A)
    ops = [
        (rowop_window_plan(Lam_op, n, bs, split=2), Lam_op.vals),
        (rowop_window_plan(A_op, n, bs, split=2), A_op.vals * np.sqrt(tau)),
    ]
    b = rng.normal(size=n)
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64,
                       col_scale=jnp.asarray(1.0 / d), chunk_rows=8)
    assert np.allclose(np.asarray(F.solve(jnp.asarray(b))),
                       np.linalg.solve(Hs, b), rtol=1e-9, atol=1e-9)


def test_ata_btd_windows_split():
    """Split-window Gram accumulation matches dense A^T A."""
    from diffeqgmrfs_tpu.ops.ata_windows import (
        make_ata_window_plan, ata_btd_windows,
    )

    rng = np.random.default_rng(7)
    n, bs, tau = 50, 16, 1.7
    A = _banded_random(rng, n, 5, 6, m=60)
    A_op = RowOp.from_csr(sp.csr_matrix(A))
    zs = np.asarray(A_op.vals) == 0.0  # ELL padding slots
    ref = tau * (A.T @ A).toarray()
    G1 = ata_btd_windows(
        make_ata_window_plan(np.asarray(A_op.cols), n, bs, zero_slots=zs),
        A_op.vals, tau=tau, dtype=jnp.float64,
    )
    for split in (2, 4):
        plan = make_ata_window_plan(
            np.asarray(A_op.cols), n, bs, zero_slots=zs, split=split
        )
        G = ata_btd_windows(plan, A_op.vals, tau=tau, dtype=jnp.float64)
        Gd = np.asarray(G.to_dense())[:n, :n]
        # BTD stores diag + lower; symmetrize for comparison
        Gd = np.tril(Gd) + np.tril(Gd, -1).T
        refs = np.tril(np.asarray(G1.to_dense())[:n, :n])
        assert np.allclose(np.tril(Gd), refs, rtol=1e-10, atol=1e-10)
        assert np.allclose(np.tril(Gd), np.tril(ref), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("split", [1, 2])
@pytest.mark.parametrize("chunk_windows", [1, 2])
def test_srif_chunked_dispatch_matches(split, chunk_windows):
    """Host-orchestrated chunked window sweep (donated state, traced chunk
    bounds — the v5e HBM fit for the N300 prefactor) produces the
    entrywise-identical factor to the fused one-shot sweep: banded,
    split-window, measurement-update-prefactor, and full-offdiagonal
    forms."""
    rng = np.random.default_rng(31)
    n, bs, tau = 50, 16, 2.0
    Lam = _banded_random(rng, n, 3, 5) + 3.0 * sp.eye(n)
    A = _banded_random(rng, n, 4, 4)
    N = -(-n // bs)
    Lam_op, A_op = RowOp.from_csr(Lam), RowOp.from_csr(A)
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    cs = 1.0 / np.sqrt(np.diag(H))
    lam_plan = rowop_window_plan(Lam_op, n, bs, split=split)
    a_plan = rowop_window_plan(A_op, n, bs, split=split)
    ops = [(lam_plan, Lam_op.vals), (a_plan, A_op.vals * np.sqrt(tau))]
    F1 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64,
                        col_scale=jnp.asarray(cs))
    Fc = srif_packed_qr_chunked(
        ops, n, N, bs, dtype=jnp.float64, col_scale=jnp.asarray(cs),
        chunk_windows=chunk_windows,
    )
    assert np.allclose(np.asarray(Fc.P), np.asarray(F1.P),
                       rtol=1e-12, atol=1e-12)
    # measurement-update prefactor through the chunked sweep
    cs0 = 1.0 / np.sqrt((Lam.T @ Lam).diagonal())
    R0 = srif_packed_qr([(lam_plan, Lam_op.vals)], n, N, bs,
                        dtype=jnp.float64, col_scale=jnp.asarray(cs0))
    F2 = srif_packed_qr(
        [(a_plan, A_op.vals * np.sqrt(tau))], n, N, bs, dtype=jnp.float64,
        col_scale=jnp.asarray(cs), prior_factor=R0,
        prior_rescale=jnp.asarray(cs / cs0),
    )
    F2c = srif_packed_qr_chunked(
        [(a_plan, A_op.vals * np.sqrt(tau))], n, N, bs, dtype=jnp.float64,
        col_scale=jnp.asarray(cs), prior_factor=R0,
        prior_rescale=jnp.asarray(cs / cs0), chunk_windows=chunk_windows,
    )
    assert np.allclose(np.asarray(F2c.P), np.asarray(F2.P),
                       rtol=1e-12, atol=1e-12)
    if split == 1:
        # full-offdiagonal packing (forced; banded operands -> U exercised)
        Ff = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64,
                            col_scale=jnp.asarray(cs), full_offdiag=True)
        Ffc = srif_packed_qr_chunked(
            ops, n, N, bs, dtype=jnp.float64, col_scale=jnp.asarray(cs),
            full_offdiag=True, chunk_windows=chunk_windows,
        )
        assert np.allclose(np.asarray(Ffc.P), np.asarray(Ff.P),
                           rtol=1e-12, atol=1e-12)
        assert np.allclose(np.asarray(Ffc.U), np.asarray(Ff.U),
                           rtol=1e-12, atol=1e-12)
    b = rng.normal(size=n)
    x = np.asarray(Fc.solve(jnp.asarray(b)))
    xs_ref = np.linalg.solve(H / (1 / cs)[:, None] / (1 / cs)[None, :], b)
    assert np.allclose(x, xs_ref, rtol=1e-9, atol=1e-9)


def test_srif_prior_prefactor_matches_oneshot():
    """SRIF measurement-update form: pre-reduce the instance-independent
    prior rows once (R_Lam = qr(Lam * cs0)), then per instance stack only
    [R_Lam * (cs/cs0); sqrt(tau) A] — same R as the one-shot stacked QR
    (TSQR associativity), ~2x fewer per-instance flops."""
    rng = np.random.default_rng(11)
    n, bs, tau = 50, 16, 2.0
    Lam = _banded_random(rng, n, 3, 5) + 3.0 * sp.eye(n)
    A = _banded_random(rng, n, 4, 4)
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    N = -(-n // bs)
    Lam_op, A_op = RowOp.from_csr(Lam), RowOp.from_csr(A)
    d = np.sqrt(np.diag(H))
    cs = 1.0 / d
    cs0 = 1.0 / np.sqrt((Lam.T @ Lam).diagonal())
    b = rng.normal(size=n)
    Hs = H / d[:, None] / d[None, :]
    x_ref = np.linalg.solve(Hs, b)
    for split in (1, 2):
        lam_plan = rowop_window_plan(Lam_op, n, bs, split=split)
        a_plan = rowop_window_plan(A_op, n, bs, split=split)
        # stage 1: prior-only factor at equilibration cs0
        R0 = srif_packed_qr(
            [(lam_plan, Lam_op.vals)], n, N, bs, dtype=jnp.float64,
            col_scale=jnp.asarray(cs0),
        )
        # stage 2: measurement update with rescale cs/cs0
        F2 = srif_packed_qr(
            [(a_plan, A_op.vals * np.sqrt(tau))], n, N, bs,
            dtype=jnp.float64, col_scale=jnp.asarray(cs),
            prior_factor=R0, prior_rescale=jnp.asarray(cs / cs0),
        )
        F1 = srif_packed_qr(
            [(lam_plan, Lam_op.vals), (a_plan, A_op.vals * np.sqrt(tau))],
            n, N, bs, dtype=jnp.float64, col_scale=jnp.asarray(cs),
        )
        assert np.allclose(np.asarray(F2.P), np.asarray(F1.P),
                           rtol=1e-9, atol=1e-9), f"split={split}"
        assert np.allclose(np.asarray(F2.solve(jnp.asarray(b))), x_ref,
                           rtol=1e-9, atol=1e-9)
        # chunked stage-2 agrees too
        F2c = srif_packed_qr(
            [(a_plan, A_op.vals * np.sqrt(tau))], n, N, bs,
            dtype=jnp.float64, col_scale=jnp.asarray(cs),
            prior_factor=R0, prior_rescale=jnp.asarray(cs / cs0),
            chunk_rows=8,
        )
        assert np.allclose(np.asarray(F2c.P), np.asarray(F1.P),
                           rtol=1e-9, atol=1e-9)


def test_srif_prefactor_vmapped_conditioning():
    """DP-batched conditioning (vmap over instance observation values)
    with the BROADCAST prior prefactor matches per-instance results —
    the batched Darcy sweep composition."""
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan
    from diffeqgmrfs_tpu.fem.operators import RowOp

    N_xy = 10
    disc = uniform_unit_square_discretization(N_xy, element_order=2)
    gx = np.linspace(0, 1, 21)
    rng = np.random.default_rng(5)
    spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
    prior = discretize_matern(spde, disc, sqrt=True, sqrt_prefactor=True)
    assert prior.inner_gmrf.sqrt_R32 is not None
    obs = DarcyFEMObservations(
        disc, gx, gx, beta=1.0,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    coeffs = [
        jnp.asarray(np.where(rng.normal(size=(21, 21)) > 0, 12.0, 3.0))
        for _ in range(2)
    ]
    A0, y0 = obs(coeffs[0])
    inner = prior.inner_gmrf
    A_c0 = prior.affine.condense_rowop(A0)
    zs = np.asarray(prior.affine.s_coef)[A0.cols] == 0.0
    pat = make_ata_window_plan(
        A_c0.cols, inner.precision.n, inner.precision.bs, zero_slots=zs
    )
    bp = CholeskySolverBlueprint(sqrt_factor=True)

    def solve_one(av, yv):
        A = RowOp(jnp.asarray(A0.cols), av, A0.n_cols)
        post = condition_on_observations(
            prior, A, 1e8, yv, solver_blueprint=bp, pattern=pat
        )
        return post.mean(), post.std()

    AV = jnp.stack([obs(c)[0].vals for c in coeffs])
    YV = jnp.stack([obs(c)[1] for c in coeffs])
    m_b, s_b = jax.jit(jax.vmap(solve_one))(AV, YV)
    for i, c in enumerate(coeffs):
        A, y = obs(c)
        post = condition_on_observations(
            prior, A, 1e8, y, solver_blueprint=bp, pattern=pat
        )
        assert np.allclose(np.asarray(m_b[i]), np.asarray(post.mean()),
                           rtol=1e-9, atol=1e-11), i
        assert np.allclose(np.asarray(s_b[i]), np.asarray(post.std()),
                           rtol=1e-6, atol=1e-10), i


def test_ata_window_plan_fused_matches_numpy():
    """The fused XLA-CPU plan builder is bit-identical to the NumPy
    reference on every field, across splits, zero_slots, padding, and the
    hot-column (no-transpose-ELL) fallback."""
    from diffeqgmrfs_tpu.ops.ata_windows import (
        make_ata_window_plan, _make_ata_window_plan_np,
    )

    rng = np.random.default_rng(17)

    def compare(cols, n, bs, zs, split):
        a = make_ata_window_plan(cols, n, bs, zero_slots=zs, split=split)
        b = _make_ata_window_plan_np(cols, n, bs, zero_slots=zs, split=split)
        for f in ("rows", "mask", "local_cols", "colsq_inv", "colsq_col",
                  "t_rows", "t_slot", "t_mask"):
            x, y = getattr(a, f), getattr(b, f)
            assert (x is None) == (y is None), f
            if x is not None:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                              err_msg=f)
        assert (a.n, a.N, a.bs, a.n_uniq, a.max_span, a.split) == (
            b.n, b.N, b.bs, b.n_uniq, b.max_span, b.split
        )

    # banded random structure (with duplicates), padding (n % bs != 0)
    for n, bs, span, split in [(61, 16, 5, 1), (64, 16, 7, 2),
                               (50, 16, 12, 1)]:
        n_rows, K = n + 13, 6
        lead = rng.integers(0, n - span, size=n_rows)
        cols = lead[:, None] + rng.integers(0, span + 1, size=(n_rows, K))
        cols = np.minimum(cols, n - 1).astype(np.int64)
        compare(cols, n, bs, None, split)
        # zero_slots variant: mark ~20% structurally zero; send some of
        # their columns out of band (must be ignored for span)
        zs = rng.random((n_rows, K)) < 0.2
        cols2 = np.where(zs, 0, cols)
        compare(cols2, n, bs, zs, split)
    # hot-column fallback: all rows share column 0 (K_T blows up)
    cols = np.zeros((40, 3), dtype=np.int64)
    cols[:, 1] = np.arange(40) % 8
    compare(cols, 32, 16, None, 1)


def test_tshh_qr_r_matches_householder():
    """TSQR-panel blocked Householder engine: R^T R == T^T T to eps-level
    and the triangle matches LAPACK up to row signs, at shapes that
    exercise multi-chunk panels, row padding, and the K=1 fallback."""
    from diffeqgmrfs_tpu.ops.srif import _tshh_qr_r

    rng = np.random.default_rng(7)
    for m, ncol, panel in [(500, 48, 16), (137, 24, 16), (40, 24, 16),
                           (513, 64, 32)]:
        T = jnp.asarray(rng.normal(size=(m, ncol)))
        R = np.asarray(_tshh_qr_r(T, panel=panel))
        assert np.allclose(np.triu(R), R)
        R0 = np.linalg.qr(np.asarray(T), mode="r")
        # sign-normalize both triangles
        s = np.sign(np.diag(R))
        s0 = np.sign(np.diag(R0))
        assert np.allclose(s[:, None] * R, s0[:, None] * R0,
                           rtol=1e-9, atol=1e-9)


def test_srif_tshh_engine_matches():
    """tshh engine through srif_packed_qr matches the XLA factor."""
    rng = np.random.default_rng(22)
    ops, H, N = _setup(rng)
    n, bs = 50, 16
    F0 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64)
    F = srif_packed_qr(ops, n, N, bs, dtype=jnp.float64, qr_impl="tshh",
                       panel=8)
    b = rng.normal(size=n)
    x0 = np.asarray(F0.solve(jnp.asarray(b)))
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.allclose(x, x0, rtol=1e-9, atol=1e-10)
    assert np.isclose(float(F.log_det()), float(F0.log_det()), rtol=1e-10)
    F32 = srif_packed_qr(ops, n, N, bs, dtype=jnp.float32, qr_impl="tshh",
                         panel=8)
    x32 = np.asarray(F32.solve(jnp.asarray(b).astype(jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, rel


def test_srif_phase_split_factor_crosses_jit_boundary():
    """Host-orchestrated full posterior (driver --phase_split): the SRIF
    condition factor pytree is RETURNED from one jitted program and
    CONSUMED by separate jitted std/sample/solve programs, with exact
    parity to the fused in-jit posterior. This is the HBM-limit execution
    mode at Darcy N_xy=300 where the fused mean+std+sample program
    exceeds 15.75 GiB (queue-L darcy_N300_full)."""
    import jax
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    N_xy = 8
    disc = uniform_unit_square_discretization(N_xy, element_order=2)
    gx = np.linspace(0, 1, 17)
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(np.where(rng.normal(size=(17, 17)) > 0, 12.0, 3.0))

    spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
    prior = discretize_matern(spde, disc, sqrt=True, sqrt_prefactor=False)
    obs = DarcyFEMObservations(
        disc, gx, gx, beta=1.0,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    A, ys = obs(coeff)
    inner = prior.inner_gmrf
    A_c = prior.affine.condense_rowop(A)
    zs = np.asarray(prior.affine.s_coef)[A.cols] == 0.0
    pat = make_ata_window_plan(
        A_c.cols, inner.precision.n, inner.precision.bs, zero_slots=zs
    )
    bp = CholeskySolverBlueprint(sqrt_factor=True)
    key = jax.random.PRNGKey(7)

    # fused reference: everything inside one jit
    def fused(pr, pt, A_, ys_, k):
        post = condition_on_observations(
            pr, A_, 1e8, ys_, solver_blueprint=bp, pattern=pt
        )
        return post.mean(), post.std(), post.sample(k, 1)

    mu_f, std_f, smp_f = jax.jit(fused)(prior, pat, A, ys, key)

    # phase-split: factor exported from the conditioning program, consumed
    # by separate std / sample programs (the driver's --phase_split wiring)
    def cond(pr, pt, A_, ys_):
        post = condition_on_observations(
            pr, A_, 1e8, ys_, solver_blueprint=bp, pattern=pt
        )
        return post.inner_gmrf.factor, post.inner_gmrf.mu, post.mean()

    factor, mu_free, mu_full = jax.jit(cond)(prior, pat, A, ys)
    std_free = jax.jit(lambda f: jnp.sqrt(f.variance_diag()))(factor)
    smp_free = jax.jit(
        lambda f, m, k: m[None, :] + f.sample_zero_mean(k, 1)
    )(factor, mu_free, key)

    def to_full(pr, sf, mf):
        var_full = jnp.asarray(pr.affine.s_coef) ** 2 * (
            (sf**2)[..., pr.affine.s_col]
        )
        return jnp.sqrt(var_full), pr.affine.free_to_full(mf)

    std_s, smp_s = jax.jit(to_full)(prior, std_free, smp_free)

    assert np.allclose(np.asarray(mu_full), np.asarray(mu_f), rtol=1e-12, atol=1e-12)
    assert np.allclose(np.asarray(std_s), np.asarray(std_f), rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(smp_s), np.asarray(smp_f), rtol=1e-10, atol=1e-10)
