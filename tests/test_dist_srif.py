"""Parallel-in-time SRIF (nested-dissection windowed QR) tests.

The dist QR factor must reproduce the sequential SRIF solves/log-det
exactly (same H, permutation internal), survive padding, keep the
square-root f32 validity at conditions where f32 Cholesky breaks, and
run sharded on the 8-virtual-device CPU mesh (conftest.py).
"""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from diffeqgmrfs_tpu.fem.operators import RowOp
from diffeqgmrfs_tpu.ops.srif import rowop_window_plan, srif_packed_qr
from diffeqgmrfs_tpu.ops.dist_srif import dist_srif_qr


def _banded_random(rng, n, lo, hi):
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in range(max(0, i - lo), min(n, i + hi + 1)):
            rows.append(i)
            cols.append(j)
            vals.append(rng.normal())
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, n))


def _setup(rng, n, bs, tau=2.0):
    Lam = _banded_random(rng, n, 3, 4) + 3.0 * sp.eye(n)
    A = _banded_random(rng, n, 2, 2)
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    Lam_op, A_op = RowOp.from_csr(Lam), RowOp.from_csr(A)
    ops = [
        (rowop_window_plan(Lam_op, n, bs), Lam_op.vals),
        (rowop_window_plan(A_op, n, bs), A_op.vals * np.sqrt(tau)),
    ]
    return ops, H


def test_dist_srif_matches_dense():
    rng = np.random.default_rng(5)
    n, bs = 64, 8  # N = 8 blocks
    ops, H = _setup(rng, n, bs)
    b = rng.normal(size=n)
    x_ref = np.linalg.solve(H, b)
    ld_ref = float(np.linalg.slogdet(H)[1])
    for P in (1, 2, 4):
        F = dist_srif_qr(ops, n, 8, bs, P, dtype=jnp.float64)
        x = np.asarray(F.solve(jnp.asarray(b)))
        assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-10, P
        assert abs(float(F.log_det()) - ld_ref) < 1e-8, P
    import pytest
    with pytest.raises(ValueError):
        dist_srif_qr(ops, n, 8, bs, 3, dtype=jnp.float64)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        dist_srif_qr(ops, n, 8, bs, 8, dtype=jnp.float64)  # k = 1
        # multi-rhs
        B = rng.normal(size=(3, n))
        X = np.asarray(F.solve(jnp.asarray(B)))
        assert np.allclose(X, np.linalg.solve(H, B.T).T, rtol=1e-9,
                           atol=1e-9)


def test_dist_srif_padding_and_sampling():
    rng = np.random.default_rng(6)
    n, bs = 61, 8  # N = 8, 3 padding rows
    ops, H = _setup(rng, n, bs)
    F = dist_srif_qr(ops, n, 8, bs, 4, dtype=jnp.float64)
    b = rng.normal(size=n)
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.allclose(x, np.linalg.solve(H, b), rtol=1e-9, atol=1e-9)
    assert abs(float(F.log_det()) - float(np.linalg.slogdet(H)[1])) < 1e-8
    # sampling: empirical covariance of many samples ~ H^{-1} (loose)
    S = np.asarray(F.sample_zero_mean(jax.random.PRNGKey(0), 4000))
    assert S.shape == (4000, n)
    C = S.T @ S / S.shape[0]
    Hinv = np.linalg.inv(H)
    denom = np.linalg.norm(Hinv)
    assert np.linalg.norm(C - Hinv) / denom < 0.15


def test_dist_srif_matches_sequential_srif():
    """Same solve as the sequential packed SRIF factor (equilibrated)."""
    rng = np.random.default_rng(7)
    n, bs = 64, 8
    ops, H = _setup(rng, n, bs)
    d = np.sqrt(np.diag(H))
    cs = jnp.asarray(1.0 / d)
    Hs = H / d[:, None] / d[None, :]
    b = rng.normal(size=n)
    F_seq = srif_packed_qr(ops, n, 8, bs, dtype=jnp.float64, col_scale=cs)
    F_dist = dist_srif_qr(ops, n, 8, bs, 4, dtype=jnp.float64, col_scale=cs)
    x_seq = np.asarray(F_seq.solve(jnp.asarray(b)))
    x_dist = np.asarray(F_dist.solve(jnp.asarray(b)))
    assert np.allclose(x_dist, x_seq, rtol=1e-10, atol=1e-12)
    assert np.allclose(x_dist, np.linalg.solve(Hs, b), rtol=1e-9, atol=1e-9)


def test_dist_srif_f32_high_cond():
    """The ND-QR keeps the SRIF sqrt(cond) f32 validity: factor a system
    with cond(H~) ~ 1e10 (f32 Cholesky breaks past ~1e7) in f32 and check
    one refinement step contracts."""
    rng = np.random.default_rng(8)
    n, bs = 64, 8
    Lam = _banded_random(rng, n, 3, 4) + 3.0 * sp.eye(n)
    A = _banded_random(rng, n, 2, 2)
    tau = 1e10
    H = (Lam.T @ Lam + tau * A.T @ A).toarray()
    d = np.sqrt(np.diag(H))
    Hs = H / d[:, None] / d[None, :]
    assert np.linalg.cond(Hs) > 1e8
    Lam_op, A_op = RowOp.from_csr(Lam), RowOp.from_csr(A)
    ops = [
        (rowop_window_plan(Lam_op, n, bs), Lam_op.vals.astype(jnp.float32)),
        (
            rowop_window_plan(A_op, n, bs),
            (A_op.vals * np.sqrt(tau)).astype(jnp.float32),
        ),
    ]
    F = dist_srif_qr(
        ops, n, 8, bs, 4, dtype=jnp.float32,
        col_scale=jnp.asarray(1.0 / d, dtype=jnp.float32),
    )
    b = rng.normal(size=n)
    x_ref = np.linalg.solve(Hs, b)
    y = np.asarray(
        F.solve(jnp.asarray(b, dtype=jnp.float32)), dtype=np.float64
    )
    r0 = np.linalg.norm(b - Hs @ y)
    # refinement step through the f32 factor
    y1 = y + np.asarray(
        F.solve(jnp.asarray(b - Hs @ y, dtype=jnp.float32)),
        dtype=np.float64,
    )
    r1 = np.linalg.norm(b - Hs @ y1)
    assert np.isfinite(r0) and r1 < 0.1 * r0
    assert np.linalg.norm(y1 - x_ref) / np.linalg.norm(x_ref) < 1e-3


def test_dist_srif_sharded_mesh():
    """Factor + solve jitted under a ("dp", "time") mesh with the chunk
    axis sharded over "time"."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "time"))
    rng = np.random.default_rng(9)
    n, bs = 64, 8
    ops, H = _setup(rng, n, bs)
    b = rng.normal(size=n)

    vals = [v for _, v in ops]
    plans = [p for p, _ in ops]

    @jax.jit
    def run(v0, v1, bb):
        F = dist_srif_qr(
            [(plans[0], v0), (plans[1], v1)], n, 8, bs, 4,
            dtype=jnp.float64, mesh=mesh, time_axis="time",
        )
        return F.solve(bb), F.log_det()

    with mesh:
        x, ld = run(vals[0], vals[1], jnp.asarray(b))
    assert np.allclose(
        np.asarray(x), np.linalg.solve(H, b), rtol=1e-9, atol=1e-9
    )
    assert abs(float(ld) - float(np.linalg.slogdet(H)[1])) < 1e-8


def test_dist_variance_diag():
    """ND Takahashi selected inversion (parallel-in-time variance_diag)
    matches the dense inverse diagonal for BOTH dist factor builders
    (Cholesky nested dissection and the SRIF QR), incl. padding."""
    from diffeqgmrfs_tpu.ops.dist_btd import dist_btd_cholesky
    from diffeqgmrfs_tpu.ops.btd import BTD

    rng = np.random.default_rng(10)
    for n in (64, 61):
        bs = 8
        ops, H = _setup(rng, n, bs)
        ref = np.diag(np.linalg.inv(H))
        for P in (2, 4):
            F = dist_srif_qr(ops, n, 8, bs, P, dtype=jnp.float64)
            v = np.asarray(F.variance_diag())
            assert np.allclose(v, ref, rtol=1e-9, atol=1e-12), (n, P, "qr")
        # Cholesky-built dist factor over the same H (BTD form, padded)
        Npad = 8 * bs
        Hp = np.eye(Npad)
        Hp[:n, :n] = H
        diag = jnp.asarray(
            np.stack([Hp[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
                      for i in range(8)])
        )
        lower = jnp.asarray(
            np.stack([Hp[(i + 1) * bs:(i + 2) * bs, i * bs:(i + 1) * bs]
                      for i in range(7)])
        )
        A = BTD(diag, lower, n)
        Fc = dist_btd_cholesky(A, 4)
        vc = np.asarray(Fc.variance_diag())[:n]
        assert np.allclose(vc, ref, rtol=1e-9, atol=1e-12), (n, "chol")


def test_blueprint_dist_chunks_conditioning():
    """Blueprint-level parallel-in-time factorization: conditioning with
    CholeskySolverBlueprint(dist_chunks=2) matches the sequential-sweep
    posterior (mean, std, log-det, sample shape)."""
    from diffeqgmrfs_tpu.ops.btd import BTD
    from diffeqgmrfs_tpu.gmrf import GMRF, condition_on_observations
    from diffeqgmrfs_tpu.fem.operators import RowOp as ROp
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
    from diffeqgmrfs_tpu.ops.dist_btd import DistBTDCholesky

    key = jax.random.PRNGKey(3)
    N, bs = 4, 4
    n = N * bs
    diag = jax.random.normal(key, (N, bs, bs), dtype=jnp.float64) * 0.1
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + 3 * jnp.eye(bs)
    lower = jax.random.normal(
        jax.random.PRNGKey(9), (N - 1, bs, bs), dtype=jnp.float64
    ) * 0.1
    mu = jnp.asarray(np.random.default_rng(0).normal(size=n))
    rng = np.random.default_rng(1)
    cols = np.stack([np.arange(i, i + 3) for i in [0, 2, 5, 7, 9]])
    A = ROp(cols, jnp.asarray(rng.normal(size=(5, 3))), n)
    y = jnp.asarray(rng.normal(size=5))

    x0 = GMRF(mu, BTD(diag, lower, n))
    post_seq = condition_on_observations(x0, A, 50.0, y)
    bp = CholeskySolverBlueprint(dist_chunks=2)
    x1 = GMRF(mu, BTD(diag, lower, n), blueprint=bp)
    post_dist = condition_on_observations(x1, A, 50.0, y, solver_blueprint=bp)
    assert isinstance(post_dist.factor, DistBTDCholesky)
    assert np.allclose(
        np.asarray(post_dist.mean()), np.asarray(post_seq.mean()),
        rtol=1e-10, atol=1e-12,
    )
    assert np.allclose(
        np.asarray(post_dist.std()), np.asarray(post_seq.std()),
        rtol=1e-9, atol=1e-12,
    )
    assert abs(
        float(post_dist.log_det_precision())
        - float(post_seq.log_det_precision())
    ) < 1e-8
    s = post_dist.sample(jax.random.PRNGKey(0), 2)
    assert s.shape == (2, n) and bool(jnp.all(jnp.isfinite(s)))
