"""Packed banded-block storage vs full-block BTD reference."""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops import BTD, btd_cholesky
from diffeqgmrfs_tpu.ops.packed import PackedBTD, PackedBTDCholesky, packed_cholesky
from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag


def banded_btd_spd(key, N=5, bs=16, shift=3, n=None):
    """SPD BTD whose coupling blocks are upper-shifted (bw = bs - shift)."""
    n = n or N * bs
    diag = jax.random.normal(key, (N, bs, bs), dtype=jnp.float64) * 0.1
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + 4.0 * jnp.eye(bs)
    lower = jax.random.normal(jax.random.PRNGKey(7), (N - 1, bs, bs), dtype=jnp.float64) * 0.1
    # enforce the banded structure: B[r, c] = 0 unless c >= r + shift
    r = np.arange(bs)
    mask = (r[None, :] >= r[:, None] + shift).astype(np.float64)
    lower = lower * jnp.asarray(mask)[None]
    return BTD(diag, lower, n)


def test_pack_roundtrip():
    A = banded_btd_spd(jax.random.PRNGKey(0))
    P = PackedBTD.from_btd(A)
    np.testing.assert_allclose(
        np.asarray(P.to_btd().to_dense()), np.asarray(A.to_dense()), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(P.diagonal()), np.asarray(A.diagonal()), atol=0
    )


def test_packed_cholesky_matches_full():
    A = banded_btd_spd(jax.random.PRNGKey(1))
    F = btd_cholesky(A)
    Fp = packed_cholesky(PackedBTD.from_btd(A))
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=(3, A.n)))
    np.testing.assert_allclose(
        np.asarray(Fp.solve(b)), np.asarray(F.solve(b)), rtol=1e-11, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(Fp.forward_solve(b)), np.asarray(F.forward_solve(b)),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(Fp.backward_solve(b)), np.asarray(F.backward_solve(b)),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(float(Fp.log_det()), float(F.log_det()), rtol=1e-13)
    # factor C blocks keep the upper shift (pack is lossless)
    Ld = np.asarray(F.Cs)
    r = np.arange(A.bs)
    assert np.abs(Ld * (r[None, None, :] < r[None, :, None] + 1)).max() < 1e-14


def test_packed_takahashi_and_sampling():
    A = banded_btd_spd(jax.random.PRNGKey(3), N=4, bs=12, shift=2, n=44)
    F = btd_cholesky(A)
    Fp = packed_cholesky(PackedBTD.from_btd(A))
    np.testing.assert_allclose(
        np.asarray(Fp.variance_diag()), np.asarray(takahashi_diag(F)), rtol=1e-11
    )
    s_ref = F.sample_zero_mean(jax.random.PRNGKey(5), 3)
    s_pck = Fp.sample_zero_mean(jax.random.PRNGKey(5), 3)
    np.testing.assert_allclose(np.asarray(s_pck), np.asarray(s_ref), atol=1e-11)


def test_packed_padding_and_single_block():
    # n < N*bs (padding) handled through add_identity_padding
    A = banded_btd_spd(jax.random.PRNGKey(4), N=3, bs=8, shift=2, n=21)
    # zero out padded rows/cols then identity-pad, mirroring production flow
    P = PackedBTD.from_btd(A)
    Fp = packed_cholesky(P)
    F = btd_cholesky(A)
    b = jnp.asarray(np.random.default_rng(6).normal(size=21))
    np.testing.assert_allclose(
        np.asarray(Fp.solve(b)), np.asarray(F.solve(b)), rtol=1e-11, atol=1e-12
    )
    # single block
    A1 = banded_btd_spd(jax.random.PRNGKey(8), N=1, bs=8, shift=1, n=8)
    F1 = packed_cholesky(PackedBTD.from_btd(A1))
    np.testing.assert_allclose(
        np.asarray(F1.solve(b[:8])), np.asarray(btd_cholesky(A1).solve(b[:8])),
        rtol=1e-11, atol=1e-12,
    )


def test_packed_scatter_matches_btd():
    import scipy.sparse as sp
    from diffeqgmrfs_tpu.ops.packed import make_packed_scatter_idx, packed_scatter

    rng = np.random.default_rng(9)
    n, bs, bw = 40, 8, 5
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in range(max(0, i - bw), min(n, i + bw + 1)):
            rows.append(i); cols.append(j)
            v = rng.normal()
            vals.append(v)
    M = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    M = 0.5 * (M + M.T) + 20 * sp.eye(n)
    Mc = M.tocoo()
    idx = make_packed_scatter_idx(Mc.row, Mc.col, n, bs)
    P = packed_scatter(idx, jnp.asarray(Mc.data), n, -(-n // bs), bs)
    np.testing.assert_allclose(
        np.asarray(P.to_btd().to_dense()), M.toarray(), atol=1e-13
    )


def test_ata_packed_windows_matches_full():
    from diffeqgmrfs_tpu.ops.packed import (
        PackedBTD, ata_packed_windows, packed_scatter, make_packed_scatter_idx,
    )
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan, ata_btd_windows
    from diffeqgmrfs_tpu.fem.operators import RowOp

    rng = np.random.default_rng(10)
    n, bs, K = 40, 8, 4
    cols = np.stack(
        [np.clip(np.sort(rng.choice(np.arange(max(0, r - 3), min(n, r + 4)), K, replace=True)), 0, n - 1) for r in range(n)]
    )
    vals = jnp.asarray(rng.normal(size=(n, K)))
    A = RowOp(cols, vals, n)
    plan = make_ata_window_plan(cols, n, bs)
    full = ata_btd_windows(plan, vals, tau=1.7)
    N = -(-n // bs)
    init = PackedBTD(jnp.zeros((N, bs, bs), jnp.float64), n)
    packed = ata_packed_windows(plan, vals, init, tau=1.7)
    np.testing.assert_allclose(
        np.asarray(packed.to_btd().to_dense()),
        np.asarray(full.to_dense()),
        atol=1e-12,
    )


def test_packed_conditioning_matches_compact():
    """packed=True prior (no device BTD of Q) conditions to the same
    posterior as the compact f32-BTD path, inside jit."""
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization, evaluation_matrix
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    disc = uniform_unit_square_discretization(8, element_order=2, use_dirichlet_bc=True)
    spde = MaternSPDE(d=2, range=0.35, smoothness=2)
    prior_c = discretize_matern(spde, disc, compact=True)
    prior_p = discretize_matern(spde, disc, packed=True)
    inner_c = prior_c.inner_gmrf
    inner_p = prior_p.inner_gmrf
    assert inner_p.q_pack_idx is not None
    assert inner_p.precision.bs == inner_c.precision.bs

    rng = np.random.default_rng(12)
    pts = jnp.asarray(rng.uniform(0.05, 0.95, size=(40, 2)))
    E = evaluation_matrix(disc, pts)
    yv = jnp.asarray(rng.normal(size=40))
    E_c = prior_c.affine.condense_rowop(E)
    plan = make_ata_window_plan(E_c.cols, inner_c.precision.n, inner_c.precision.bs)

    post_c = condition_on_observations(prior_c, E, 1e6, yv, pattern=plan)

    def solve(prior_arg, pattern, y):
        return condition_on_observations(prior_arg, E, 1e6, y, pattern=pattern)

    post_p = jax.jit(solve)(prior_p, plan, yv)
    np.testing.assert_allclose(
        np.asarray(post_p.mean()), np.asarray(post_c.mean()), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(post_p.std()), np.asarray(post_c.std()), rtol=5e-3, atol=1e-12
    )
    np.testing.assert_allclose(
        float(post_p.inner_gmrf.log_det_precision()),
        float(post_c.inner_gmrf.log_det_precision()),
        rtol=1e-4,
    )


def _clamped_regime_rfull(rng, bs=8, N=6):
    """A PackedBTDRFullFactor in the clamped beyond-f32-validity regime:
    unit-scale diagonals with a few floored at 2e-7 relative (what
    clamp_diag leaves on a factor whose f32 QR lost those directions) and
    O(1) dense couplings. N is kept short: floored directions CHAIN
    multiplicatively through the coupling blocks (~(0.5/2e-7)^2 variance
    gain per block), so a long chain overflows even f64 — the rescue
    targets the realistic regime where f32 (max 3.4e38) overflows but
    f64 (1.8e308) has ~270 orders of headroom."""
    from diffeqgmrfs_tpu.ops.packed import PackedBTDRFullFactor

    P = np.zeros((N, bs, bs), np.float32)
    U = np.zeros((N - 1, bs, bs), np.float32)
    for b in range(N):
        R = np.triu(rng.normal(size=(bs, bs)) * 0.3).astype(np.float32)
        d = np.ones(bs)
        d[::4] = 2e-7
        np.fill_diagonal(R, d)
        P[b] = R
        if b < N - 1:
            U[b] = (rng.normal(size=(bs, bs)) * 0.5).astype(np.float32)
    F = PackedBTDRFullFactor(
        jnp.asarray(P.reshape(N, -1)), jnp.asarray(U.reshape(N - 1, -1)),
        N * bs, bs,
    )
    Rd = np.zeros((N * bs, N * bs))
    for b in range(N):
        Rd[b * bs:(b + 1) * bs, b * bs:(b + 1) * bs] = np.triu(P[b])
        if b < N - 1:
            Rd[b * bs:(b + 1) * bs, (b + 1) * bs:(b + 2) * bs] = U[b]
    return F, Rd


def test_takahashi_f64_rescue_on_clamped_factor():
    """The f32 Takahashi recursion overflows to Inf/NaN on a clamped
    beyond-f32-validity factor (the flagship N800x100 std NaN) while the
    f64 recursion of the SAME factor matches the dense inverse diagonal."""
    rng = np.random.default_rng(0)
    F, Rd = _clamped_regime_rfull(rng)
    v32 = np.asarray(F.variance_diag())
    assert not np.isfinite(v32).all()  # the failure mode being fixed
    v64 = np.asarray(F.variance_diag(jnp.float64))
    # reference via the factor itself (inv(R^T R) in f64 loses all digits
    # at cond(H) ~ 1e14+): H^{-1} = R^{-1} R^{-T}
    import scipy.linalg as sla

    Rinv = sla.solve_triangular(Rd, np.eye(Rd.shape[0]))
    ref = np.sum(Rinv * Rinv, axis=1)
    assert np.isfinite(v64).all()
    assert np.allclose(v64, ref, rtol=5e-4), (
        np.max(np.abs(v64 - ref) / ref)
    )


def test_srif_newton_factor_cond_rescue_std_and_sample():
    """SRIFNewtonFactor's sub_dtype='cond' policy: variance_diag and
    sample_zero_mean re-run in f64 exactly when the f32 pass is
    non-finite; sub_dtype='f32' preserves the raw (overflowed) behavior
    for batched drivers."""
    from diffeqgmrfs_tpu.ops.refine import SRIFNewtonFactor

    rng = np.random.default_rng(1)
    F, Rd = _clamped_regime_rfull(rng)
    n = F.n
    fac = SRIFNewtonFactor.__new__(SRIFNewtonFactor)
    fac.F32 = F
    fac.d = jnp.ones(n, dtype=jnp.float64)
    fac.sub_dtype = "cond"
    fac.refine_iters = 0
    fac.solve_method = "refine"
    import scipy.linalg as sla

    v = np.asarray(fac.variance_diag())
    Rinv = sla.solve_triangular(Rd, np.eye(Rd.shape[0]))
    ref = np.sum(Rinv * Rinv, axis=1)
    assert np.isfinite(v).all()
    assert np.allclose(v, ref, rtol=5e-4)
    s = np.asarray(fac.sample_zero_mean(jax.random.PRNGKey(0), 2))
    assert s.shape == (2, n) and np.isfinite(s).all()
    fac.sub_dtype = "f32"
    v_raw = np.asarray(fac.variance_diag())
    assert not np.isfinite(v_raw).all()


def test_srif_newton_variance_rescue_unit_solves():
    """variance_diag_rescued: entries non-finite after the Takahashi
    recursion are repaired EXACTLY via batched f64 unit-vector solves
    through the same factor (VERDICT r2 #8 — flagship n_std_nonfinite).
    Simulated by poisoning variance_diag's output (even the f64 recursion
    overflows in the real failure, which small factors cannot reproduce);
    the rescue must restore the poisoned entries to diag(H^{-1}) and
    leave healthy entries untouched."""
    from diffeqgmrfs_tpu.ops.refine import SRIFNewtonFactor

    rng = np.random.default_rng(3)
    bs, N = 8, 6
    n = N * bs
    P = np.zeros((N, bs, bs), np.float32)
    U = np.zeros((N - 1, bs, bs), np.float32)
    for b in range(N):
        R = np.triu(rng.normal(size=(bs, bs)) * 0.2).astype(np.float32)
        np.fill_diagonal(R, 1.0 + rng.random(bs))
        P[b] = R
        if b < N - 1:
            U[b] = (rng.normal(size=(bs, bs)) * 0.2).astype(np.float32)
    from diffeqgmrfs_tpu.ops.packed import PackedBTDRFullFactor

    F = PackedBTDRFullFactor(
        jnp.asarray(P.reshape(N, -1)), jnp.asarray(U.reshape(N - 1, -1)),
        n, bs,
    )
    Rd = np.zeros((n, n))
    for b in range(N):
        Rd[b * bs:(b + 1) * bs, b * bs:(b + 1) * bs] = np.triu(P[b])
        if b < N - 1:
            Rd[b * bs:(b + 1) * bs, (b + 1) * bs:(b + 2) * bs] = U[b]

    poison = np.zeros(n, bool)
    poison[[3, 17, 40]] = True

    class Poisoned(SRIFNewtonFactor):
        def __init__(self):
            self.F32 = F
            self.d = jnp.full((n,), 2.0, dtype=jnp.float64)
            self.sub_dtype = "f32"
            self.refine_iters = 0
            self.solve_method = "refine"

        def variance_diag(self):
            v = super().variance_diag()
            return jnp.where(jnp.asarray(poison), jnp.inf, v)

    fac = Poisoned()
    v = np.asarray(fac.variance_diag_rescued(max_rescue=8))
    import scipy.linalg as sla

    Rinv = sla.solve_triangular(Rd, np.eye(n))
    ref = np.sum(Rinv * Rinv, axis=1) / 4.0  # / d^2
    assert np.isfinite(v).all()
    assert np.allclose(v, ref, rtol=5e-4), np.max(np.abs(v - ref) / ref)
    # healthy path: rescue is the identity
    fac2 = Poisoned()
    fac2.variance_diag = lambda: SRIFNewtonFactor.variance_diag(fac2)
    v2 = np.asarray(fac2.variance_diag_rescued(max_rescue=8))
    assert np.allclose(v2, ref, rtol=5e-4)

    # NEGATIVE-but-finite variances must be rescued too: the f64
    # Takahashi recursion on a clamped factor can cancel to a finite
    # negative entry, which passes isfinite but NaNs at sqrt — the
    # flagship N800x100 n_std_nonfinite=418-651 with the rescue "live"
    # (queue r5c flagship_rescue; fixed by the v<=0 bad-predicate)
    class PoisonedNeg(Poisoned):
        def variance_diag(self):
            v = SRIFNewtonFactor.variance_diag(self)
            return jnp.where(jnp.asarray(poison), -1.7e-3, v)

    fac3 = PoisonedNeg()
    v3 = np.asarray(fac3.variance_diag_rescued(max_rescue=8))
    assert np.isfinite(np.sqrt(v3)).all()
    assert np.allclose(v3, ref, rtol=5e-4), np.max(np.abs(v3 - ref) / ref)


def test_takahashi_compute_dtype_noop_on_healthy_factor():
    """compute_dtype=f64 equals the f32 recursion (at f32 accuracy) on a
    healthy factor — the rescue changes nothing in the valid regime."""
    from diffeqgmrfs_tpu.ops.packed import PackedBTDRFullFactor

    rng = np.random.default_rng(2)
    bs, N = 8, 6
    P = np.zeros((N, bs, bs), np.float32)
    U = np.zeros((N - 1, bs, bs), np.float32)
    for b in range(N):
        R = np.triu(rng.normal(size=(bs, bs)) * 0.2).astype(np.float32)
        np.fill_diagonal(R, 1.0 + rng.random(bs))
        P[b] = R
        if b < N - 1:
            U[b] = (rng.normal(size=(bs, bs)) * 0.2).astype(np.float32)
    F = PackedBTDRFullFactor(
        jnp.asarray(P.reshape(N, -1)), jnp.asarray(U.reshape(N - 1, -1)),
        N * bs, bs,
    )
    v32 = np.asarray(F.variance_diag())
    v64 = np.asarray(F.variance_diag(jnp.float64))
    assert np.isfinite(v32).all()
    assert np.allclose(v32, v64, rtol=2e-4)
