"""Uniform factor contract: every factor class exposes the same surface
with the same semantics.

One parametrized test sweeps ALL factor implementations over one SPD
banded system H and enforces, against dense references:
  * solve(b) = H^{-1} b (to the class's accuracy tier),
  * backward solve consistency: x = Bwd(Fwd-ish(b)) via solve round trip,
  * sample_zero_mean covariance ~ H^{-1} (moment check),
  * variance_diag = diag(H^{-1}) where implemented,
  * log_det = log det H.

This pins the drop-in interchangeability the conditioning/GN paths rely
on (factor selection is a blueprint decision, not a call-site one).
"""

import numpy as np
import scipy.sparse as sp
import pytest
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.operators import RowOp
from diffeqgmrfs_tpu.ops.btd import BTD
from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky
from diffeqgmrfs_tpu.ops.srif import rowop_window_plan, srif_packed_qr


N, BS = 6, 8
N_DOF = 45  # padding: N*BS = 48


def _system():
    rng = np.random.default_rng(42)
    rows, cols, vals = [], [], []
    for i in range(N_DOF):
        for j in range(max(0, i - 3), min(N_DOF, i + 4)):
            rows.append(i)
            cols.append(j)
            vals.append(rng.normal())
    Lam = sp.csr_matrix((vals, (rows, cols)), shape=(N_DOF, N_DOF))
    Lam = Lam + 4.0 * sp.eye(N_DOF)
    H = (Lam.T @ Lam).toarray()
    return Lam, H


LAM, H_DENSE = _system()


def _btd(H):
    Hp = np.eye(N * BS)
    Hp[:N_DOF, :N_DOF] = H
    diag = np.stack(
        [Hp[i * BS:(i + 1) * BS, i * BS:(i + 1) * BS] for i in range(N)]
    )
    lower = np.stack(
        [Hp[(i + 1) * BS:(i + 2) * BS, i * BS:(i + 1) * BS]
         for i in range(N - 1)]
    )
    return BTD(jnp.asarray(diag), jnp.asarray(lower), N_DOF)


def _srif_factor(dtype=jnp.float64):
    op = RowOp.from_csr(LAM.tocsr())
    plan = rowop_window_plan(op, N_DOF, BS)
    return srif_packed_qr(
        [(plan, op.vals)], N_DOF, N, BS, dtype=dtype
    )


def make_btd_chol():
    return btd_cholesky(_btd(H_DENSE))


def make_btd_inverse():
    from diffeqgmrfs_tpu.ops.inverse_solver import BTDInverseSolver

    return BTDInverseSolver.from_factor(make_btd_chol())


def make_mixed():
    from diffeqgmrfs_tpu.ops.refine import MixedPrecisionFactor

    return MixedPrecisionFactor(_btd(H_DENSE))


def make_packed_chol():
    from diffeqgmrfs_tpu.ops.packed import PackedBTD, packed_cholesky

    A = PackedBTD.from_btd(_btd(H_DENSE)).add_identity_padding()
    return packed_cholesky(A)


def make_srif_r():
    return _srif_factor()


def make_srif_r_inverse():
    from diffeqgmrfs_tpu.ops.packed import PackedRInverseSolver

    return PackedRInverseSolver.from_factor(_srif_factor())


def make_dist_chol():
    from diffeqgmrfs_tpu.ops.dist_btd import dist_btd_cholesky

    return dist_btd_cholesky(_btd(H_DENSE), 2)


def make_dist_srif():
    from diffeqgmrfs_tpu.ops.dist_srif import dist_srif_qr

    op = RowOp.from_csr(LAM.tocsr())
    plan = rowop_window_plan(op, N_DOF, BS)
    return dist_srif_qr([(plan, op.vals)], N_DOF, N, BS, 2,
                        dtype=jnp.float64)


FACTORIES = {
    "btd_cholesky": make_btd_chol,
    "btd_inverse_solver": make_btd_inverse,
    "mixed_precision": make_mixed,
    "packed_cholesky": make_packed_chol,
    "srif_packed_r": make_srif_r,
    "packed_r_inverse": make_srif_r_inverse,
    "dist_cholesky": make_dist_chol,
    "dist_srif_qr": make_dist_srif,
}

# accuracy tiers: mixed-precision factors solve to ~f32 + refinement
TOL = {
    "mixed_precision": 2e-5,
}


@pytest.mark.parametrize("name", sorted(FACTORIES))
def test_factor_contract(name):
    F = FACTORIES[name]()
    tol = TOL.get(name, 1e-8)
    rng = np.random.default_rng(7)
    b = rng.normal(size=N_DOF)
    x_ref = np.linalg.solve(H_DENSE, b)

    # solve
    x = np.asarray(F.solve(jnp.asarray(b)))
    assert x.shape == (N_DOF,)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < tol, name

    # batched solve
    B = rng.normal(size=(3, N_DOF))
    X = np.asarray(F.solve(jnp.asarray(B)))
    assert X.shape == (3, N_DOF)
    assert np.allclose(X, np.linalg.solve(H_DENSE, B.T).T,
                       rtol=10 * tol, atol=10 * tol), name

    # log-det
    ld = float(F.log_det())
    ld_ref = float(np.linalg.slogdet(H_DENSE)[1])
    assert abs(ld - ld_ref) < 1e-3 * abs(ld_ref) + 1e-6, name

    # sampling: covariance moment check (loose)
    S = np.asarray(F.sample_zero_mean(jax.random.PRNGKey(0), 3000))
    assert S.shape == (3000, N_DOF) and np.isfinite(S).all(), name
    C = S.T @ S / S.shape[0]
    Hinv = np.linalg.inv(H_DENSE)
    assert np.linalg.norm(C - Hinv) / np.linalg.norm(Hinv) < 0.2, name

    # variance_diag where implemented
    if hasattr(F, "variance_diag"):
        v = np.asarray(F.variance_diag())
        assert np.allclose(v, np.diag(Hinv), rtol=1e-4, atol=1e-10), name

    # nnz is a positive int
    assert int(F.nnz()) > 0, name
