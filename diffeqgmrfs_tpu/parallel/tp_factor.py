"""Tensor-parallel (within-block) BTD Cholesky: column-sharded blocks.

SURVEY.md §2.4 TP row: "pjit-sharded blocked factorization ... within-block
sharding across ICI for >=1e6-DOF blocks". The DP/PP/SP axes shard
*instances* or the *time axis*; this module shards the [bs, bs] dense
blocks THEMSELVES, so a single factor whose block array exceeds one chip's
HBM (bs ~ 6*sqrt(n): 6144+ at 1e6 dofs -> 24 GB f32 factor) spreads over
the mesh: each device stores [N, bs, bs/P] column shards.

Algorithm (the TP form of `ops/blocked_factor.blocked_cholesky`, reference
per-block spec `/root/reference/src/tridiagonal_cholesky.jl:65-82`):

* Columns are sharded PANEL-CYCLICALLY: global panel g (of n_p = bs/panel)
  is owned by device g % P at local slot g // P — the round-robin keeps
  trailing-update work balanced as the factorization shrinks.
* POTRF sweep over panels: the owner contributes its (already-updated)
  panel column, a masked `psum` broadcasts it ([bs, panel] per step — the
  only communication), every device redundantly computes the tiny
  chol(diag)/TRSM ([panel, panel] + [bs-k, panel]), then updates ITS OWN
  trailing columns with one local GEMM. Replicated compute is O(bs^2 *
  panel) total vs O(bs^3 / P) local GEMMs.
* TRSM (C_i = B_i L^{-T}) runs the same panel chain: partial corrections
  Sum_q X[:, q] L[k, q]^T are computed per-device over OWNED panels and
  combined in the same psum that broadcasts the bracket.
* SYRK (S = D - C C^T) is one local [bs, bs] @ [bs, bs/P] GEMM per device
  (C replicated from the TRSM chain, rows selected at the local columns).

Per block: 2 bs^2 broadcast elements (POTRF + TRSM chains), ~(7/3) bs^3 / P
local GEMM flops — compute/comm ~ bs/P, so the layout wants large blocks
(exactly the >=1e6-dof regime TP exists for). Dead-region writes (rows
above the diagonal, already-factored local columns) are never read by
construction, so trailing updates stay full unsliced GEMMs on the local
shard tail.

Scope: factorization + solve + log-det. The factor STAYS column-sharded
([N, bs, bs/P] per device, panel-cyclic permuted order); `solve` gathers
one [bs, bs] block at a time (streamed all-gather inside the block scan,
memory-bounded), `to_btd_cholesky()` materializes the standard factor for
parity tests / single-chip use.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as _sm

        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def _cyclic_order(bs: int, panel: int, P_: int) -> np.ndarray:
    """Column permutation: device-contiguous layout of panel-cyclic slots.

    order[d * (bs//P) + t*panel + j] = global column (t*P + d)*panel + j —
    device d's shard holds its owned panels at consecutive local slots.
    """
    n_p = bs // panel
    n_loc = n_p // P_
    cols = np.arange(bs).reshape(n_p, panel)
    return np.concatenate(
        [cols[np.arange(n_loc) * P_ + d].reshape(-1) for d in range(P_)]
    )


def _local_gcols(dev, n_loc: int, panel: int, P_: int):
    """Global column indices of this device's local slots (traced by dev)."""
    gt = jnp.arange(n_loc) * P_ + dev
    return (
        gt[:, None] * panel + jnp.arange(panel)[None, :]
    ).reshape(-1)


def _f32mm(fn):
    """Pin true-f32 matmuls (TPU default f32 matmul = bf16 passes; the
    psum'd Gram/panel GEMMs here must be exact f32 on real meshes — see
    ops/mf_qr.py round-5 chip finding)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)

    return wrapped


@_f32mm
def _tp_potrf(A_loc, axis: str, bs: int, panel: int, P_: int):
    """Panel-cyclic column-sharded right-looking Cholesky of one block.

    A_loc [bs, bs/P] (this device's panel columns, lower triangle valid).
    Returns (L_rep [bs, bs] replicated in GLOBAL column order, zeroed
    strictly-upper; L_loc [bs, bs/P] the device's panels of L).
    """
    n_p = bs // panel
    dev = lax.axis_index(axis)
    dtype = A_loc.dtype
    L_rep = jnp.zeros((bs, bs), dtype)
    L_loc = jnp.zeros_like(A_loc)
    for g in range(n_p):
        k = g * panel
        owner = g % P_
        s = g // P_
        pan_local = lax.dynamic_slice(A_loc, (0, s * panel), (bs, panel))
        is_owner = jnp.equal(dev, owner)
        pan = lax.psum(
            jnp.where(is_owner, pan_local, jnp.zeros_like(pan_local)), axis
        )
        Lkk = jnp.linalg.cholesky(pan[k : k + panel, :])
        parts = [jnp.zeros((k, panel), dtype), Lkk]
        if k + panel < bs:
            parts.append(
                lax.linalg.triangular_solve(
                    Lkk, pan[k + panel :, :],
                    left_side=False, lower=True, transpose_a=True,
                )
            )
        Lpan = jnp.concatenate(parts, axis=0)  # [bs, panel]
        L_rep = lax.dynamic_update_slice(L_rep, Lpan, (0, k))
        L_loc = jnp.where(
            is_owner,
            lax.dynamic_update_slice(L_loc, Lpan, (0, s * panel)),
            L_loc,
        )
        if g < n_p - 1:
            # trailing update on local slots t >= g//P: slots already
            # factored (owner's slot s, earlier-device slots) read Lpan
            # rows < k which are exact zeros, so their columns receive
            # zero / dead writes — never read again by construction.
            t0 = g // P_
            n_tail = (bs // P_) // panel - t0
            gt = (t0 + jnp.arange(n_tail)) * P_ + dev
            gcols = (gt[:, None] * panel + jnp.arange(panel)).reshape(-1)
            W = jnp.take(Lpan, gcols, axis=0)  # [n_tail*panel, panel]
            upd = Lpan[k + panel :, :] @ W.T
            A_loc = A_loc.at[k + panel :, t0 * panel :].add(-upd)
    return L_rep, L_loc


@_f32mm
def _tp_tsolve_right_T(L_rep, B_loc, axis: str, bs: int, panel: int, P_: int):
    """Solve X L^T = B (the sweep's C_i = B_i L_{i-1}^{-T}); B column-
    sharded panel-cyclically, L_rep replicated in global order.

    Panel-chain recurrence X[:, k] = (B[:, k] - X[:, <k] L[k, <k]^T)
    Lkk^{-T}: per step, each device computes the partial correction over
    its OWNED previous panels (slots not yet written are zero, so no
    masking is needed), the psum that broadcasts the bracket also reduces
    the partials, and the [bs, panel] TRSM is replicated.
    Returns (X_rep [bs, bs] global order, X_loc [bs, bs/P]).
    """
    n_p = bs // panel
    dev = lax.axis_index(axis)
    dtype = B_loc.dtype
    X_rep = jnp.zeros((bs, bs), dtype)
    X_loc = jnp.zeros_like(B_loc)
    for g in range(n_p):
        k = g * panel
        owner = g % P_
        s = g // P_
        pan_B = lax.dynamic_slice(B_loc, (0, s * panel), (bs, panel))
        is_owner = jnp.equal(dev, owner)
        contrib = jnp.where(is_owner, pan_B, jnp.zeros_like(pan_B))
        if g:
            t_hi = -(-g // P_)  # ceil: local slots that may hold X[:, <k]
            gq = jnp.arange(t_hi) * P_ + dev
            qcols = (gq[:, None] * panel + jnp.arange(panel)).reshape(-1)
            Xq = X_loc[:, : t_hi * panel]
            Lrows = jnp.take(
                lax.dynamic_slice(L_rep, (k, 0), (panel, bs)), qcols, axis=1
            )  # [panel, t_hi*panel]
            contrib = contrib - Xq @ Lrows.T
        bracket = lax.psum(contrib, axis)
        Lkk = lax.dynamic_slice(L_rep, (k, k), (panel, panel))
        Xg = lax.linalg.triangular_solve(
            Lkk, bracket, left_side=False, lower=True, transpose_a=True
        )
        X_rep = lax.dynamic_update_slice(X_rep, Xg, (0, k))
        X_loc = jnp.where(
            is_owner,
            lax.dynamic_update_slice(X_loc, Xg, (0, s * panel)),
            X_loc,
        )
    return X_rep, X_loc


@jax.tree_util.register_pytree_node_class
@dataclass
class TPBTDCholesky:
    """Column-sharded BTD Cholesky factor (panel-cyclic permuted layout).

    Ls/Cs: [N, bs, bs] global views whose LAST axis is physically sharded
    over the mesh's `axis` in the device-contiguous permuted order
    (`_cyclic_order`); column j of the true factor sits at permuted
    position inv_order[j].
    """

    Ls: jax.Array  # [N, bs, bs] permuted columns, sharded on axis -1
    Cs: jax.Array  # [N-1, bs, bs] permuted columns (C_i = B_i L_i^{-T})
    n: int
    panel: int
    order: tuple  # host-side permutation (static, hashable for jit aux)

    def tree_flatten(self):
        return (self.Ls, self.Cs), (self.n, self.panel, self.order)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def N(self):
        return self.Ls.shape[0]

    @property
    def bs(self):
        return self.Ls.shape[1]

    def to_btd_cholesky(self) -> BTDCholesky:
        """Materialize the standard (gathered, unpermuted) factor."""
        inv = np.argsort(np.asarray(self.order))
        return BTDCholesky(self.Ls[:, :, inv], self.Cs[:, :, inv], self.n)

    def log_det(self):
        inv = np.argsort(np.asarray(self.order))
        d = self.Ls[:, jnp.arange(self.bs), inv]
        return 2.0 * jnp.sum(jnp.log(d))

    def solve(self, b):
        """A^{-1} b via the gathered factor, one block at a time.

        The permuted gather streams block by block inside the scan of
        BTDCholesky's solves only if XLA schedules it so; for the solve
        sizes that matter (rhs vectors) the simple gathered form is
        bandwidth-trivial next to the factorization itself.
        """
        return self.to_btd_cholesky().solve(b)


@_f32mm
def tp_bcgs_qr_r(
    T_loc,
    axis: str,
    panel: int = 512,
    passes: int = 4,
    shift_passes: int = 2,
):
    """R factor of a ROW-sharded tall matrix — the TP form of the SRIF
    window QR (`ops/srif.srif_packed_qr`'s per-window reduction, rows
    sharded over `axis`).

    The bcgs4 engine (staged-shift CholQR panels + BCGS2 two-pass block
    projections, `ops/srif._bcgs_qr_r`) is built ENTIRELY from GEMMs whose
    reduction dim is the ROW axis — so sharding rows turns every
    cross-device contraction into a psum: the panel Gram ([p, p] — tiny)
    and the two projection coefficient blocks ([p, n_trail]). Panel
    orthonormalization and trailing updates stay local. This is the
    classic distributed tall-skinny CholeskyQR; Householder-grade factor
    quality comes from the staged shifts exactly as in the single-device
    engine (RESULTS.md "bcgs4").

    T_loc [m_loc, n]: this device's row shard (any row partition — QR's R
    is row-permutation invariant). Returns R [n, n] upper-triangular with
    positive diagonal, REPLICATED on every device.

    Per panel: 1 psum [p, p] + `passes-1` more + 2 psums [p, n_trail];
    local flops ~ (4 m_loc p^2 + 8 m_loc p n_trail) — compute/comm
    ~ m_loc, so the layout wants the production-tall windows
    (m ~ 5.5 bs ~ 20k rows at Darcy N300).
    """
    m_loc, n = T_loc.shape
    P_ax = lax.psum(1, axis)
    m_tot = m_loc * P_ax
    eps = jnp.finfo(T_loc.dtype).eps
    A = T_loc
    R = jnp.zeros((n, n), T_loc.dtype)
    for j in range(0, n, panel):
        pj = min(panel, n - j)
        Pl = A[:, j : j + pj]
        R_acc = None
        eye = jnp.eye(pj, dtype=T_loc.dtype)
        for k in range(passes):
            G = lax.psum(Pl.T @ Pl, axis)
            s_full = 8.0 * m_tot * eps * jnp.max(jnp.diagonal(G))
            if k < shift_passes:
                Rp = jnp.linalg.cholesky(G + (s_full + 1e-30) * eye).T
            else:
                # floor-shift pass with full-shift fallback on indefinite
                # Gram (mirrors ops/srif._shifted_cholqr)
                s_fl = 8.0 * eps * jnp.max(jnp.diagonal(G))
                Rp = jnp.linalg.cholesky(G + (s_fl + 1e-30) * eye).T
                Rp = jnp.where(
                    jnp.isnan(Rp[pj - 1, pj - 1]),
                    jnp.linalg.cholesky(G + (s_full + 1e-30) * eye).T,
                    Rp,
                )
            Pl = lax.linalg.triangular_solve(
                Rp, Pl, left_side=False, lower=False
            )
            R_acc = Rp if R_acc is None else Rp @ R_acc
        R = R.at[j : j + pj, j : j + pj].set(R_acc)
        if j + pj < n:
            Tr = A[:, j + pj :]
            S = lax.psum(Pl.T @ Tr, axis)
            Tr = Tr - Pl @ S
            S2 = lax.psum(Pl.T @ Tr, axis)
            Tr = Tr - Pl @ S2
            R = R.at[j : j + pj, j + pj :].set(S + S2)
            A = A.at[:, j + pj :].set(Tr)
    return R


def tp_btd_cholesky(
    diag,
    lower,
    n: int,
    mesh,
    axis: str = "tp",
    panel: int = 128,
) -> TPBTDCholesky:
    """Factor a BTD system with every [bs, bs] block column-sharded over
    `mesh[axis]` (within-block tensor parallelism).

    diag [N, bs, bs] (symmetric blocks), lower [N-1, bs, bs] with
    lower[i] = A[i+1, i]. Requires bs % (P * panel) == 0 (pad blocks to a
    multiple — `models/advection_diffusion._pad_st_blocks` is the ST
    analog). Matches `ops.cholesky.btd_cholesky` exactly up to fp
    reassociation of the panel GEMMs.
    """
    N_, bs = diag.shape[0], diag.shape[1]
    P_ = mesh.shape[axis]
    if bs % (P_ * panel):
        raise ValueError(
            f"bs={bs} must be a multiple of P*panel={P_ * panel} "
            f"(pad the blocks)"
        )
    order = _cyclic_order(bs, panel, P_)
    diag_p = jnp.asarray(diag)[:, :, order]
    lower_p = (
        jnp.asarray(lower)[:, :, order]
        if N_ > 1
        else jnp.zeros((0, bs, bs), diag_p.dtype)
    )

    def body(D_loc, B_loc):
        L0_rep, L0_loc = _tp_potrf(D_loc[0], axis, bs, panel, P_)

        def step(L_prev_rep, inp):
            D_i, B_i = inp
            C_rep, C_loc = _tp_tsolve_right_T(
                L_prev_rep, B_i, axis, bs, panel, P_
            )
            dev = lax.axis_index(axis)
            gcols = _local_gcols(dev, (bs // P_) // panel, panel, P_)
            S_loc = D_i - C_rep @ jnp.take(C_rep, gcols, axis=0).T
            L_rep, L_loc = _tp_potrf(S_loc, axis, bs, panel, P_)
            return L_rep, (L_loc, C_loc)

        _, (Ls_loc, Cs_loc) = lax.scan(step, L0_rep, (D_loc[1:], B_loc))
        return jnp.concatenate([L0_loc[None], Ls_loc], axis=0), Cs_loc

    def body_single(D_loc):
        return _tp_potrf(D_loc[0], axis, bs, panel, P_)[1][None]

    if N_ > 1:
        f = _shard_map(
            body,
            mesh,
            in_specs=(P(None, None, axis), P(None, None, axis)),
            out_specs=(P(None, None, axis), P(None, None, axis)),
        )
        Ls, Cs = f(diag_p, lower_p)
    else:
        f = _shard_map(
            body_single,
            mesh,
            in_specs=(P(None, None, axis),),
            out_specs=P(None, None, axis),
        )
        Ls = f(diag_p)
        Cs = jnp.zeros((0, bs, bs), Ls.dtype)
    return TPBTDCholesky(Ls, Cs, n, panel, tuple(order.tolist()))
