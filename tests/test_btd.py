"""BTD matrix + Cholesky + Takahashi tests vs dense references."""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops import (
    BTD,
    make_btd_pattern,
    btd_cholesky,
    takahashi_diag,
)


def random_btd_spd(key, N, bs, n=None):
    """Random SPD block-tridiagonal matrix."""
    n = n or N * bs
    k1, k2 = jax.random.split(key)
    diag = jax.random.normal(k1, (N, bs, bs), dtype=jnp.float64) * 0.1
    lower = jax.random.normal(k2, (max(N - 1, 0), bs, bs), dtype=jnp.float64) * 0.1
    diag = 0.5 * (diag + diag.transpose(0, 2, 1))
    r = jnp.arange(bs)
    diag = diag.at[:, r, r].add(float(bs))  # diagonal dominance -> SPD
    A = BTD(diag, lower, n)
    # zero the padding coupling and set identity diag on padding
    if n < N * bs:
        mask = (jnp.arange(N * bs) < n).reshape(N, bs)
        diag = A.diag * mask[:, :, None] * mask[:, None, :]
        lower = A.lower * mask[1:, :, None] * mask[:-1, None, :]
        A = BTD(diag, lower, n).add_identity_padding()
    return A


def test_btd_matvec_vs_dense():
    key = jax.random.PRNGKey(0)
    A = random_btd_spd(key, 4, 5, n=18)
    Ad = np.asarray(A.to_dense())
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (18,), dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(A.matvec(jnp.asarray(x))), Ad @ x, atol=1e-12)
    # batched
    X = np.random.default_rng(0).normal(size=(3, 18))
    np.testing.assert_allclose(
        np.asarray(A.matvec(jnp.asarray(X))), X @ Ad.T, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(A.diagonal()), np.diag(Ad), atol=1e-13)


def test_btd_pattern_scatter():
    rng = np.random.default_rng(5)
    n, bs = 13, 4
    # random banded symmetric COO (bandwidth < bs)
    i, j, v = [], [], []
    for a in range(n):
        for b in range(max(0, a - 3), min(n, a + 4)):
            i.append(a)
            j.append(b)
    i, j = np.array(i), np.array(j)
    vals = rng.normal(size=len(i))
    # symmetrize values
    dense = np.zeros((n, n))
    dense[i, j] = 0.0
    sym = {}
    for k in range(len(i)):
        a, b = min(i[k], j[k]), max(i[k], j[k])
        sym.setdefault((a, b), rng.normal())
    vv = np.array([sym[(min(a, b), max(a, b))] for a, b in zip(i, j)])
    dense[i, j] = vv
    pat = make_btd_pattern(i, j, n, bs=bs)
    A = pat.scatter(jnp.asarray(vv))
    np.testing.assert_allclose(np.asarray(A.to_dense()), dense, atol=1e-13)


def test_btd_cholesky_solve_logdet():
    key = jax.random.PRNGKey(2)
    A = random_btd_spd(key, 5, 6, n=27)
    Ad = np.asarray(A.to_dense())
    F = btd_cholesky(A)
    b = np.random.default_rng(1).normal(size=27)
    x = np.asarray(F.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(Ad, b), rtol=1e-10, atol=1e-10)
    sign, ld = np.linalg.slogdet(Ad)
    assert sign > 0
    np.testing.assert_allclose(float(F.log_det()), ld, rtol=1e-12)
    # batched solve
    B = np.random.default_rng(2).normal(size=(4, 27))
    X = np.asarray(F.solve(jnp.asarray(B)))
    np.testing.assert_allclose(X, np.linalg.solve(Ad, B.T).T, rtol=1e-9, atol=1e-9)


def test_btd_cholesky_single_block():
    key = jax.random.PRNGKey(3)
    A = random_btd_spd(key, 1, 7)
    Ad = np.asarray(A.to_dense())
    F = btd_cholesky(A)
    b = np.random.default_rng(3).normal(size=7)
    np.testing.assert_allclose(
        np.asarray(F.solve(jnp.asarray(b))), np.linalg.solve(Ad, b), atol=1e-11
    )


def test_forward_backward_consistency():
    key = jax.random.PRNGKey(4)
    A = random_btd_spd(key, 3, 4)
    F = btd_cholesky(A)
    # L from factor blocks, dense
    n = 12
    L = np.zeros((n, n))
    for idx in range(3):
        L[idx * 4 : (idx + 1) * 4, idx * 4 : (idx + 1) * 4] = np.asarray(F.Ls[idx])
        if idx < 2:
            L[(idx + 1) * 4 : (idx + 2) * 4, idx * 4 : (idx + 1) * 4] = np.asarray(
                F.Cs[idx]
            )
    np.testing.assert_allclose(L @ L.T, np.asarray(A.to_dense()), atol=1e-11)
    b = np.random.default_rng(4).normal(size=n)
    np.testing.assert_allclose(
        np.asarray(F.forward_solve(jnp.asarray(b))), np.linalg.solve(L, b), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(F.backward_solve(jnp.asarray(b))),
        np.linalg.solve(L.T, b),
        atol=1e-11,
    )


def test_takahashi_diag():
    key = jax.random.PRNGKey(5)
    A = random_btd_spd(key, 4, 5, n=17)
    F = btd_cholesky(A)
    d = np.asarray(takahashi_diag(F))
    truth = np.diag(np.linalg.inv(np.asarray(A.to_dense())))
    np.testing.assert_allclose(d, truth, rtol=1e-10, atol=1e-12)


def test_sampling_covariance():
    key = jax.random.PRNGKey(6)
    A = random_btd_spd(key, 2, 4)
    F = btd_cholesky(A)
    samples = np.asarray(F.sample_zero_mean(jax.random.PRNGKey(7), 20000))
    emp_cov = np.cov(samples.T)
    truth = np.linalg.inv(np.asarray(A.to_dense()))
    # MC error ~ sigma^2 / sqrt(n): tolerance scaled accordingly
    np.testing.assert_allclose(emp_cov, truth, atol=5 * np.max(np.abs(truth)) / np.sqrt(20000))


def test_add_diagonal_and_identity_padding():
    key = jax.random.PRNGKey(8)
    A = random_btd_spd(key, 3, 4, n=10)
    v = np.random.default_rng(6).uniform(1, 2, size=10)
    A2 = A.add_diagonal(jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(A2.to_dense()), np.asarray(A.to_dense()) + np.diag(v), atol=1e-13
    )


def test_inverse_solver_matches_cholesky():
    from diffeqgmrfs_tpu.ops.inverse_solver import BTDInverseSolver
    from diffeqgmrfs_tpu.ops import btd_cholesky

    A = random_btd_spd(jax.random.PRNGKey(12), 4, 6, n=22)
    F = btd_cholesky(A)
    S = BTDInverseSolver.from_factor(F)
    b = np.random.default_rng(5).normal(size=(3, 22))
    np.testing.assert_allclose(
        np.asarray(S.solve(jnp.asarray(b))),
        np.asarray(F.solve(jnp.asarray(b))),
        rtol=1e-10, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(S.forward_solve(jnp.asarray(b))),
        np.asarray(F.forward_solve(jnp.asarray(b))),
        rtol=1e-10, atol=1e-10,
    )


def test_ata_windows_matches_scatter():
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan, ata_btd_windows
    from diffeqgmrfs_tpu.fem.operators import RowOp

    rng = np.random.default_rng(9)
    n, bs, K = 40, 8, 4
    # banded rows: each row's cols within [r-3, r+3]
    cols = np.stack(
        [np.clip(np.sort(rng.choice(np.arange(max(0, r - 3), min(n, r + 4)), K, replace=True)), 0, n - 1) for r in range(n)]
    )
    vals = jnp.asarray(rng.normal(size=(n, K)))
    A = RowOp(cols, vals, n)
    pat = A.ata_pattern(bs=bs)
    ref = pat.scatter(A.ata_values() * 2.5)
    plan = make_ata_window_plan(cols, n, bs)
    out = ata_btd_windows(plan, vals, tau=2.5)
    np.testing.assert_allclose(
        np.asarray(out.to_dense()), np.asarray(ref.to_dense()), atol=1e-12
    )


def test_ata_windows_single_block():
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan, ata_btd_windows
    from diffeqgmrfs_tpu.fem.operators import RowOp

    rng = np.random.default_rng(10)
    n, K = 6, 3
    cols = np.stack([np.sort(rng.choice(n, K, replace=True)) for _ in range(10)])
    vals = jnp.asarray(rng.normal(size=(10, K)))
    A = RowOp(cols, vals, n)
    Ad = np.asarray(A.to_dense())
    plan = make_ata_window_plan(cols, n, bs=8)
    out = ata_btd_windows(plan, vals)
    np.testing.assert_allclose(np.asarray(out.to_dense()), Ad.T @ Ad, atol=1e-12)


def test_pallas_sweep_interpret():
    """Pallas fused substitution sweeps vs the factor solves (interpreter)."""
    from diffeqgmrfs_tpu.ops.inverse_solver import BTDInverseSolver
    from diffeqgmrfs_tpu.ops.pallas_btd import (
        pallas_forward_solve,
        pallas_backward_solve,
    )

    A = random_btd_spd(jax.random.PRNGKey(14), 4, 8)
    F = btd_cholesky(A)
    S = BTDInverseSolver.from_factor(F)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=(4, 8, 3)))
    bf = jnp.asarray(np.moveaxis(np.asarray(b), 2, 0).reshape(3, 32))
    out_f = np.asarray(pallas_forward_solve(S.Ws, S.Cs, b, interpret=True))
    np.testing.assert_allclose(
        np.moveaxis(out_f, 2, 0).reshape(3, 32),
        np.asarray(F.forward_solve(bf)),
        atol=1e-12,
    )
    out_b = np.asarray(pallas_backward_solve(S.Ws, S.Cs, b, interpret=True))
    np.testing.assert_allclose(
        np.moveaxis(out_b, 2, 0).reshape(3, 32),
        np.asarray(F.backward_solve(bf)),
        atol=1e-12,
    )


def test_cyclic_reduction_solve():
    from diffeqgmrfs_tpu.ops.cyclic_reduction import cr_solve

    for N, bs, n in [(1, 6, 6), (2, 5, 10), (5, 4, 18), (8, 4, 32), (13, 3, 37)]:
        A = random_btd_spd(jax.random.PRNGKey(N), N, bs, n=n)
        F = btd_cholesky(A)
        b = np.random.default_rng(N).normal(size=(2, n))
        x_cr = np.asarray(cr_solve(A, jnp.asarray(b)))
        x_ref = np.asarray(F.solve(jnp.asarray(b)))
        np.testing.assert_allclose(x_cr, x_ref, rtol=1e-9, atol=1e-10), (N, bs)
