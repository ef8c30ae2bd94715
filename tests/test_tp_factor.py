"""Within-block tensor-parallel BTD Cholesky (parallel/tp_factor.py).

SURVEY.md §2.4 TP row: the [bs, bs] blocks themselves sharded over the
mesh. Parity is against the sequential `btd_cholesky` — same math, so
agreement to fp-reassociation level in f64.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from diffeqgmrfs_tpu.ops import BTD, btd_cholesky
from diffeqgmrfs_tpu.parallel.tp_factor import tp_btd_cholesky


def _random_btd(N, bs, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    diag = rng.normal(size=(N, bs, bs)) * 0.05
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + np.eye(bs) * bs
    lower = rng.normal(size=(max(N - 1, 0), bs, bs)) * 0.05
    return jnp.asarray(diag, dtype), jnp.asarray(lower, dtype)


def _mesh(P):
    devs = np.array(jax.devices()[:P])
    return Mesh(devs, ("tp",))


@pytest.mark.parametrize(
    "N,bs,P,panel",
    [
        (5, 32, 8, 4),   # one slot per device
        (4, 32, 4, 4),   # two slots per device (multi-slot trailing)
        (3, 48, 4, 6),   # non-power-of-two panel
        (1, 16, 4, 4),   # single block (no TRSM/SYRK path)
    ],
)
def test_tp_btd_cholesky_matches_sequential(N, bs, P, panel):
    diag, lower = _random_btd(N, bs)
    n = N * bs
    F_ref = btd_cholesky(BTD(diag, lower, n))
    F_tp = tp_btd_cholesky(diag, lower, n, _mesh(P), panel=panel)
    F_g = F_tp.to_btd_cholesky()
    # compare lower triangles (strict upper is zeroed in both)
    tril = np.tril(np.ones((bs, bs), bool))
    Ls_ref = np.asarray(F_ref.Ls) * tril
    Ls_tp = np.asarray(F_g.Ls) * tril
    assert np.allclose(Ls_tp, Ls_ref, rtol=1e-11, atol=1e-11)
    if N > 1:
        assert np.allclose(
            np.asarray(F_g.Cs), np.asarray(F_ref.Cs), rtol=1e-11, atol=1e-11
        )


def test_tp_btd_solve_and_logdet():
    N, bs, P, panel = 4, 32, 8, 4
    diag, lower = _random_btd(N, bs, seed=3)
    n = N * bs
    F_tp = tp_btd_cholesky(diag, lower, n, _mesh(P), panel=panel)
    F_ref = btd_cholesky(BTD(diag, lower, n))
    b = jnp.asarray(np.random.default_rng(1).normal(size=(n,)))
    x_tp = np.asarray(F_tp.solve(b))
    x_ref = np.asarray(F_ref.solve(b))
    assert np.allclose(x_tp, x_ref, rtol=1e-10, atol=1e-10)
    assert np.isclose(float(F_tp.log_det()), float(F_ref.log_det()),
                      rtol=1e-11)


def test_tp_factor_is_column_sharded():
    """The factor's HBM claim: each device holds only its column shard."""
    N, bs, P, panel = 3, 32, 8, 4
    diag, lower = _random_btd(N, bs, seed=5)
    F_tp = tp_btd_cholesky(diag, lower, N * bs, _mesh(P), panel=panel)
    addressable = F_tp.Ls.addressable_shards
    assert len(addressable) == P
    for sh in addressable:
        assert sh.data.shape == (N, bs, bs // P)


def test_tp_bcgs_qr_r_matches_reference():
    """Row-sharded distributed window QR (the TP SRIF kernel): R^T R must
    reproduce the Gram of the full stack, R upper-triangular with positive
    diagonal, identical on every device."""
    from jax.sharding import NamedSharding, PartitionSpec as PS
    from diffeqgmrfs_tpu.parallel.tp_factor import _shard_map, tp_bcgs_qr_r

    P_ax = 8
    mesh = _mesh(P_ax)
    rng = np.random.default_rng(11)
    m, n = 512, 96
    # ill-conditioned stack (the SRIF regime): scale columns over 5 decades
    T = rng.normal(size=(m, n)) * np.logspace(0, -5, n)[None, :]
    T = jnp.asarray(T)

    f = _shard_map(
        lambda t: tp_bcgs_qr_r(t, "tp", panel=16),
        mesh, in_specs=(PS("tp", None),), out_specs=PS(None, None),
    )
    R = np.asarray(f(T))
    assert np.allclose(R, np.triu(R))
    assert (np.diag(R) > 0).all()
    G_ref = np.asarray(T.T @ T)
    assert np.allclose(R.T @ R, G_ref, rtol=1e-9, atol=1e-12)
    # R matches a dense QR up to row signs
    R_ref = np.linalg.qr(np.asarray(T), mode="r")
    R_ref = R_ref * np.sign(np.diag(R_ref))[:, None]
    assert np.allclose(R, R_ref, rtol=1e-7, atol=1e-10)


def test_tp_rejects_misaligned_bs():
    diag, lower = _random_btd(2, 24, seed=7)
    with pytest.raises(ValueError):
        tp_btd_cholesky(diag, lower, 48, _mesh(8), panel=4)
