"""Multifrontal sqrt-QR (ops/mf_qr) vs dense references on small 2D
grids — factor identity R^T R = S^T S via solves, log-det, sampling
moments, column equilibration, ill-conditioned (tau-scaled) stacks where
f32 Cholesky of H already fails."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.mf_qr import (
    MFQRFactor,
    mfqr_device_arrays,
    symbolic_mf_qr,
)


def _grid_problem(g=12, seed=0, tau=1.0):
    """Stacked operands on a g x g node grid: 'prior' rows per cell
    (4 corner dofs) + 'observation' rows on random cells, both with
    random element values — the structural shape of the Darcy SRIF stack.
    """
    rng = np.random.default_rng(seed)
    n = g * g
    ii, jj = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    coords = np.stack([ii.reshape(-1), jj.reshape(-1)], axis=1).astype(float)

    def cell_rows(n_per_cell):
        cols, vals = [], []
        for ci in range(g - 1):
            for cj in range(g - 1):
                c = [
                    ci * g + cj,
                    ci * g + cj + 1,
                    (ci + 1) * g + cj,
                    (ci + 1) * g + cj + 1,
                ]
                for _ in range(n_per_cell):
                    cols.append(c)
                    vals.append(rng.normal(size=4))
        return np.array(cols), np.array(vals)

    c1, v1 = cell_rows(2)
    # diagonal regularization rows keep S full column rank
    c2 = np.stack([np.arange(n)] * 4, axis=1)
    c2[:, 1:] = n  # padding slots (sentinel n)
    v2 = np.zeros((n, 4))
    v2[:, 0] = 0.5
    c3, v3 = cell_rows(1)
    v3 = v3 * np.sqrt(tau)
    ops_cols = [c1, c2, c3]
    ops_vals = np.concatenate([v1, v2, v3]).astype(np.float64)
    # dense S for reference
    S = np.zeros((ops_vals.shape[0], n))
    allc = np.concatenate([c1, c2, c3])
    for r in range(ops_vals.shape[0]):
        for k in range(4):
            c = allc[r, k]
            if c < n:
                S[r, c] += ops_vals[r, k]
    return ops_cols, ops_vals, coords, n, S


@pytest.mark.parametrize("leaf_target", [8, 24])
def test_mfqr_solve_logdet_vs_dense(leaf_target):
    ops_cols, ops_vals, coords, n, S = _grid_problem(g=11)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2,
                        leaf_target=leaf_target)
    F = MFQRFactor.factorize(qt, ops_vals, dtype=jnp.float64)
    b = np.sin(np.arange(n) * 0.7)
    x = np.asarray(F.solve(jnp.asarray(b)))
    x_ref = np.linalg.solve(H, b)
    assert np.max(np.abs(x - x_ref)) < 1e-8 * np.max(np.abs(x_ref))
    ld = float(F.log_det())
    ld_ref = np.linalg.slogdet(H)[1]
    assert abs(ld - ld_ref) < 1e-8 * abs(ld_ref)


def test_mfqr_multi_rhs_and_sample_moments():
    ops_cols, ops_vals, coords, n, S = _grid_problem(g=9, seed=3)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=10)
    F = MFQRFactor.factorize(qt, ops_vals, dtype=jnp.float64)
    B = np.stack([np.cos(np.arange(n) * w) for w in (0.3, 1.1, 2.7)], axis=1)
    X = np.asarray(F.solve(jnp.asarray(B)))
    assert np.allclose(X, np.linalg.solve(H, B), atol=1e-8)
    # sampling: cov(z) ~ H^{-1} (moment check, generous tolerance)
    z = np.asarray(F.sample_zero_mean(jax.random.PRNGKey(0), 4000))
    C = z @ z.T / z.shape[1]
    Hinv = np.linalg.inv(H)
    scale = np.sqrt(np.outer(np.diag(Hinv), np.diag(Hinv)))
    assert np.max(np.abs(C - Hinv) / (scale + 1e-12)) < 0.35
    var = np.asarray(F.variance_mc(jax.random.PRNGKey(1), 4000))
    assert np.max(np.abs(var - np.diag(Hinv)) / np.diag(Hinv)) < 0.25


def test_mfqr_f32_validity_at_large_tau():
    """tau = 1e8 stack: f32 Cholesky of H = S^T S is invalid (cond ~
    1e10+), the f32 QR factor still solves to sqrt(cond)-grade."""
    ops_cols, ops_vals, coords, n, S = _grid_problem(g=10, tau=1e8)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=12)
    # equilibrate columns (the production conditioning does the same)
    cs = 1.0 / np.sqrt(np.diag(H))
    cols_global = np.concatenate(
        [np.where((c < 0) | (c >= n), n, c) for c in ops_cols]
    )
    F = MFQRFactor.factorize(
        qt,
        ops_vals.astype(np.float32),
        cols_global=jnp.asarray(cols_global),
        col_scale=jnp.asarray(cs, jnp.float32),
        dtype=jnp.float32,
    )
    b = np.sin(np.arange(n) * 0.7)
    x = np.asarray(F.solve(jnp.asarray(b, dtype=jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 5e-3, rel
    # f32 cholesky of the UNequilibrated H (the path QR replaces) either
    # fails outright or loses the solution entirely (ADVICE r3: exercise
    # the claimed f32 contrast, not the f64 sanity case)
    try:
        Lf32 = np.linalg.cholesky(H.astype(np.float32))
        x32 = np.linalg.solve(
            Lf32.T.astype(np.float64),
            np.linalg.solve(Lf32.astype(np.float64), b),
        )
        rel32 = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
        assert rel32 > 10 * rel, (rel32, rel)
    except np.linalg.LinAlgError:
        pass  # not positive definite in f32 — the stronger failure
    ld = float(F.log_det())
    assert abs(ld - np.linalg.slogdet(H)[1]) < 1e-2 * abs(ld)


def test_mfqr_device_arrays_jit_path():
    ops_cols, ops_vals, coords, n, S = _grid_problem(g=8, seed=5)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=10)
    arrs = mfqr_device_arrays(qt)

    @jax.jit
    def run(vals, arrs, b):
        F = MFQRFactor.factorize(qt, vals, dtype=jnp.float64, arrs=arrs)
        return F.solve(b), F.log_det()

    b = jnp.asarray(np.cos(np.arange(n) * 0.9))
    x, ld = run(jnp.asarray(ops_vals), arrs, b)
    assert np.allclose(
        np.asarray(x), np.linalg.solve(H, np.asarray(b)), atol=1e-8
    )
    assert abs(float(ld) - np.linalg.slogdet(H)[1]) < 1e-8 * abs(float(ld))


def test_mfqr_chunked_matches_fused():
    """mfqr_factorize_chunked (front chunks + row-chunked TSQR at a tiny
    panel budget) produces the same factor as the fused path — verified
    through solve/log-det identity."""
    from diffeqgmrfs_tpu.ops.mf_qr import (
        mfqr_chunk_plans,
        mfqr_factorize_chunked,
    )

    ops_cols, ops_vals, coords, n, S = _grid_problem(g=10, seed=11)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=12)
    plans = mfqr_chunk_plans(qt, max_panel_bytes=4 << 10)  # 4 KB: forces
    # single-front chunks and row-chunked TSQR
    assert any(rc for (_, _, _, rc) in plans)
    assert any(nc > 1 for (_, nc, _, _) in plans)
    Fc = mfqr_factorize_chunked(
        qt, ops_vals, chunk_plans=plans, dtype=jnp.float64
    )
    Ff = MFQRFactor.factorize(qt, ops_vals, dtype=jnp.float64)
    b = np.cos(np.arange(n) * 0.61)
    xc = np.asarray(Fc.solve(jnp.asarray(b)))
    xf = np.asarray(Ff.solve(jnp.asarray(b)))
    assert np.allclose(xc, xf, atol=1e-9)
    assert np.allclose(xc, np.linalg.solve(H, b), atol=1e-8)
    assert abs(float(Fc.log_det()) - float(Ff.log_det())) < 1e-8


def test_mfqr_hosted_solve_matches():
    """Per-level dispatched solves == the fused solve method."""
    from diffeqgmrfs_tpu.ops.mf_qr import (
        mfqr_sample_hosted,
        mfqr_solve_hosted,
    )

    ops_cols, ops_vals, coords, n, S = _grid_problem(g=9, seed=13)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=10)
    F = MFQRFactor.factorize(qt, ops_vals, dtype=jnp.float64)
    b = np.sin(np.arange(n) * 0.37)
    xh = np.asarray(mfqr_solve_hosted(F, jnp.asarray(b)))
    assert np.allclose(xh, np.linalg.solve(H, b), atol=1e-8)
    z1 = np.asarray(F.sample_zero_mean(jax.random.PRNGKey(5), 3))
    z2 = np.asarray(mfqr_sample_hosted(F, jax.random.PRNGKey(5), 3))
    assert np.allclose(z1, z2.T if z2.shape != z1.shape else z2, atol=1e-10)


def test_mfqr_cholqr_engine():
    ops_cols, ops_vals, coords, n, S = _grid_problem(g=10, seed=7)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=12)
    F = MFQRFactor.factorize(
        qt, ops_vals.astype(np.float32), dtype=jnp.float32, qr_impl="cholqr"
    )
    b = np.sin(np.arange(n) * 1.3)
    x = np.asarray(F.solve(jnp.asarray(b, jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-4, rel


def test_mfqr_gram_engine_chunked_large_tau():
    """Round-4 all-GEMM Gram engine (`_qr_r_gram`) through the CHUNKED
    path (tiny panel budget forces front chunking + Gram row-chunk
    accumulation) on the equilibrated tau=1e8 stack — the f32-validity
    configuration the production Darcy conditioning runs at."""
    from diffeqgmrfs_tpu.ops.mf_qr import mfqr_chunk_plans, mfqr_factorize_chunked

    ops_cols, ops_vals, coords, n, S = _grid_problem(g=10, tau=1e8, seed=3)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=12)
    cs = 1.0 / np.sqrt(np.diag(H))
    cols_global = np.concatenate(
        [np.where((c < 0) | (c >= n), n, c) for c in ops_cols]
    )
    plans = mfqr_chunk_plans(qt, max_panel_bytes=4 << 10)
    F = mfqr_factorize_chunked(
        qt,
        ops_vals.astype(np.float32),
        chunk_plans=plans,
        cols_global=jnp.asarray(cols_global),
        col_scale=jnp.asarray(cs, jnp.float32),
        dtype=jnp.float32,
        qr_impl="gram",
    )
    b = np.sin(np.arange(n) * 0.7)
    x = np.asarray(F.solve(jnp.asarray(b, dtype=jnp.float32)))
    x_ref = np.linalg.solve(H, b)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 5e-3, rel
    ld = float(F.log_det())
    assert abs(ld - np.linalg.slogdet(H)[1]) < 1e-2 * abs(ld)


def test_mfqr_gram_engine_f64_floor():
    """f64 gram engine reaches the refinement-free accuracy of the xla
    QR engine on a well-conditioned stack (factor-quality parity)."""
    ops_cols, ops_vals, coords, n, S = _grid_problem(g=9, seed=13)
    H = S.T @ S
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=10)
    F = MFQRFactor.factorize(
        qt, ops_vals, dtype=jnp.float64, qr_impl="gram"
    )
    b = np.cos(np.arange(n) * 0.9)
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert np.allclose(x, np.linalg.solve(H, b), atol=1e-8)
    ld = float(F.log_det())
    assert abs(ld - np.linalg.slogdet(H)[1]) < 1e-10 * abs(ld)


def test_mfqr_variance_selected_vs_dense():
    """Selected inversion over the front tree ('Takahashi on the tree')
    == dense diag(H^{-1}) in f64; f32-equilibrated within solver-grade
    tolerance; and consistent with the MC estimator to sampling error."""
    from diffeqgmrfs_tpu.ops.mf_qr import mfqr_variance_selected

    ops_cols, ops_vals, coords, n, S = _grid_problem(g=11, seed=21)
    H = S.T @ S
    d_ref = np.diag(np.linalg.inv(H))
    qt = symbolic_mf_qr(ops_cols, n, coords, cut_width=2.2, leaf_target=10)
    F = MFQRFactor.factorize(qt, ops_vals, dtype=jnp.float64)
    v = np.asarray(mfqr_variance_selected(F))
    assert np.max(np.abs(v - d_ref) / d_ref) < 1e-8

    # f32 + equilibration at large tau (production configuration)
    ops_cols, ops_vals, coords, n, S = _grid_problem(g=10, tau=1e8, seed=2)
    H = S.T @ S
    cs = 1.0 / np.sqrt(np.diag(H))
    cols_global = np.concatenate(
        [np.where((c < 0) | (c >= n), n, c) for c in ops_cols]
    )
    F32 = MFQRFactor.factorize(
        qt if False else symbolic_mf_qr(
            ops_cols, n, coords, cut_width=2.2, leaf_target=12
        ),
        ops_vals.astype(np.float32),
        cols_global=jnp.asarray(cols_global),
        col_scale=jnp.asarray(cs, jnp.float32),
        dtype=jnp.float32,
    )
    v32 = np.asarray(mfqr_variance_selected(F32))
    d_ref = np.diag(np.linalg.inv(H))
    assert np.isfinite(v32).all()
    assert np.max(np.abs(v32 - d_ref) / d_ref) < 5e-2
    # MC consistency: the 4000-sample estimate agrees to sampling error
    vmc = np.asarray(F32.variance_mc(jax.random.PRNGKey(3), 4000))
    assert np.median(np.abs(vmc - v32) / v32) < 0.1
