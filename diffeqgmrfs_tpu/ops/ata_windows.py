"""A^T A accumulation via block-window GEMMs (scatter-free fast path).

The generic A^T A -> BTD path scatters n_rows * K^2 values through a flat
index (ops/btd.py BTDPattern) — ~1e8 scatter-adds for production Darcy
systems, a TPU anti-pattern (serialized scatter units) with an index array
as large as the data. This module exploits bandedness instead:

Every row of a bandwidth-limited operator fits inside a 2bs-wide window of
two adjacent BTD blocks. Grouping rows by window, each window's rows
materialize as a dense [R, 2bs] panel via a SMALL local scatter (n_rows * K
indices), and the window's A^T A contribution is one MXU GEMM

    G_b = M_b^T M_b   in [2bs, 2bs]

whose quadrants accumulate into diag[b], diag[b+1], lower[b]. Flops are
~4 N bs^2 R ~ 4 n bs^2 — the same order as the factorization itself — and
the scatter shrinks by a factor K.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.btd import BTD


def dense_rows_from_slots(v, lcols, width: int):
    """Dense [R, width] rows from per-row slot (values, local columns) —
    K compare-accumulate passes instead of one generic 2D scatter-add.
    TPU generic scatters serialize: slope-measured 3.3 ms (scatter) vs
    0.7 ms (this) per Darcy-N300 window panel [18560, 7424] at K=9.
    Duplicate columns within a row accumulate, matching scatter-add;
    masked slots carry v = 0 and are inert wherever they land."""
    c = lax.broadcasted_iota(lcols.dtype, (1, width), 1)
    M = jnp.zeros((v.shape[0], width), dtype=v.dtype)
    for k in range(v.shape[1]):
        M = M + jnp.where(
            c == lcols[:, k : k + 1],
            v[:, k : k + 1],
            jnp.zeros((), dtype=v.dtype),
        )
    return M


@jax.tree_util.register_pytree_node_class
@dataclass
class ATAWindowPlan:
    """Static row->window assignment for a fixed operator structure.

    Optionally carries a column-sum-square plan (`colsq_inv`, `colsq_col`,
    `n_uniq`): diag(A^T A) with per-(row, col) duplicate slots merged,
    host-precomputed so it works when A's columns are TRACED (threaded
    through a jit signature) — np.unique cannot run on tracers.
    """

    rows: np.ndarray  # [Nw, R] int32 row indices (padded with 0)
    mask: np.ndarray  # [Nw, R] {0,1} row validity
    local_cols: np.ndarray  # [Nw, R, K] int32 cols - window_start
    n: int
    N: int
    bs: int
    colsq_inv: np.ndarray | None = None  # [n_rows*K] slot -> merged entry
    colsq_col: np.ndarray | None = None  # [n_uniq] merged entry -> column
    n_uniq: int = 0
    max_span: int = -1  # max (cmax - cmin) over rows; the factor of S^T S is
    # strictly-lower-packable (PackedBTDRFactor) only while max_span < bs
    # for EVERY operand — else R[b, b+1] is not strictly-lower-shaped and
    # the SRIF sweep must emit the full off-diagonal block. -1 = unknown.
    # transpose (CSC-style) ELL: per COLUMN, the (row, k-slot) pairs that
    # touch it — A^T r as a pure gather (TPU scatter-add serializes:
    # slope-measured 430 ms scatter vs ~90 ms gather at Darcy N300)
    t_rows: np.ndarray | None = None  # [n, K_T] int32 source row ids
    t_slot: np.ndarray | None = None  # [n, K_T] int32 k index in the row
    t_mask: np.ndarray | None = None  # [n, K_T] {0,1} validity
    # `split`: windows at FINE granularity bs_f = bs/split, width
    # bs + bs_f (split*(N-1) windows instead of N-1). QR/Gram flops
    # scale with window width squared, so split=2 computes the same R /
    # A^T A with (1.5/2)^2 = 0.56x the flops of the classic two-block
    # (split=1) windows. Requires every row span <= bs (checked at
    # build; the same invariant as strictly-lower R packing).
    split: int = 1

    def tree_flatten(self):
        return (
            self.rows,
            self.mask,
            self.local_cols,
            self.colsq_inv,
            self.colsq_col,
            self.t_rows,
            self.t_slot,
            self.t_mask,
        ), (self.n, self.N, self.bs, self.n_uniq, self.max_span, self.split)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0], children[1], children[2],
            aux[0], aux[1], aux[2], children[3], children[4], aux[3],
            aux[4] if len(aux) > 4 else -1,
            children[5], children[6], children[7],
            aux[5] if len(aux) > 5 else 1,
        )

    @property
    def Nw(self):
        return self.rows.shape[0]

    @property
    def bs_f(self):
        """Fine block size (== bs when split == 1)."""
        return self.bs // self.split

    @property
    def width(self):
        """Window width in columns (2bs when split == 1)."""
        return self.bs + self.bs // self.split

    def to_device(self):
        return jax.device_put(self)

    def rmatvec(self, vals, r):
        """A^T r from traced values via the transpose ELL (gather-only)."""
        if self.t_rows is None:
            raise ValueError("plan built without a transpose ELL")
        tr = jnp.asarray(self.t_rows)
        v = jnp.asarray(vals)[tr, jnp.asarray(self.t_slot)]
        v = v * jnp.asarray(self.t_mask, dtype=v.dtype)
        return jnp.sum(v * r[tr], axis=1)

    def colsq(self, vals):
        """diag(A^T A) from traced values via the host-precomputed plan."""
        vals = jnp.asarray(vals).reshape(-1)
        merged = jnp.zeros(self.n_uniq, dtype=vals.dtype).at[
            jnp.asarray(self.colsq_inv)
        ].add(vals)
        return jnp.zeros(self.n, dtype=vals.dtype).at[
            jnp.asarray(self.colsq_col)
        ].add(merged**2)


def auto_split(bs: int, threshold: int = 512) -> int:
    """Default window split for banded operands (row span <= bs): 2 for
    MXU-size blocks — the fine sweep runs the same QR/Gram math at
    (1.5/2)^2 = 0.56x the flops — and 1 for small blocks where doubling
    the window count costs more in dispatch latency than it saves."""
    return 2 if bs >= threshold and bs % 2 == 0 else 1


def _make_ata_window_plan_np(
    cols: np.ndarray, n: int, bs: int, zero_slots: np.ndarray | None = None,
    split: int = 1,
) -> ATAWindowPlan:
    """NumPy reference implementation (fallback when no XLA cpu backend;
    also the parity oracle for the fused fast path below).

    Build the plan from a RowOp's static column structure [n_rows, K].

    zero_slots: optional bool mask of slots whose values are STRUCTURALLY
    zero (padding, constraint-condensation zeros with s_coef == 0). Those
    slots are excluded from the row-span computation — a padding col 0 on a
    row whose real cols sit in a far block would otherwise make the row
    span "more than two blocks". Their local columns are clipped into the
    window, which is harmless because their values are identically zero.

    split: fine-granularity windows (see ATAWindowPlan.split) — windows of
    width bs + bs/split at stride bs/split, quadratically cheaper QR/Gram
    sweeps. Valid only while every row span <= bs; split=1 reproduces the
    classic two-block windows exactly.
    """
    cols = np.asarray(cols)
    n_rows, K = cols.shape
    N = max((n + bs - 1) // bs, 1)
    if N == 1:
        split = 1
    if bs % split:
        raise ValueError(f"split={split} must divide bs={bs}")
    bs_f = bs // split
    W = bs + bs_f
    Nw = max(split * (N - 1), 1)
    if zero_slots is not None:
        zs = np.asarray(zero_slots, dtype=bool)
        big = np.iinfo(np.int64).max
        cmin = np.where(zs, big, cols.astype(np.int64)).min(axis=1)
        cmax = np.where(zs, -1, cols.astype(np.int64)).max(axis=1)
        all_zero = zs.all(axis=1)
        cmin = np.where(all_zero, 0, cmin)
        cmax = np.where(all_zero, 0, cmax)
    else:
        cmin = cols.min(axis=1)
        cmax = cols.max(axis=1)
    w = np.minimum(cmin // bs_f, Nw - 1).astype(np.int64)
    if np.any(cmax - w * bs_f >= W):
        bad = np.argmax(cmax - w * bs_f >= W)
        raise ValueError(
            f"row {bad} spans more than a window (cols {cmin[bad]}.."
            f"{cmax[bad]}, bs={bs}, split={split}); increase block size "
            f"or reduce split"
        )
    order = np.argsort(w, kind="stable")
    counts = np.bincount(w, minlength=Nw)
    R = int(counts.max())
    rows = np.zeros((Nw, R), dtype=np.int32)
    mask = np.zeros((Nw, R), dtype=np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(Nw):
        sel = order[starts[b] : starts[b + 1]]
        rows[b, : len(sel)] = sel
        mask[b, : len(sel)] = 1.0
    local = cols[rows] - (np.arange(Nw, dtype=np.int64) * bs_f)[:, None, None]
    local = np.clip(local, 0, W - 1).astype(np.int32)
    # column-sum-square plan: merge duplicate (row, col) slots host-side
    keys = (
        np.repeat(np.arange(n_rows, dtype=np.int64), K) * n
        + cols.reshape(-1).astype(np.int64)
    )
    uniq, inv = np.unique(keys, return_inverse=True)
    colsq_col = (uniq % n).astype(np.int32)
    max_span = int((cmax - cmin).max(initial=0))
    # transpose (CSC-style) ELL for gather-only A^T r. Structurally-zero
    # slots are EXCLUDED: padding slots all point at col 0 and would blow
    # up that column's degree (and with them gone, their values being 0
    # is irrelevant to correctness anyway).
    src_r = np.repeat(np.arange(n_rows, dtype=np.int64), K)
    src_k = np.tile(np.arange(K, dtype=np.int64), n_rows)
    src_c = cols.reshape(-1).astype(np.int64)
    if zero_slots is not None:
        keep = ~np.asarray(zero_slots, dtype=bool).reshape(-1)
        src_r, src_k, src_c = src_r[keep], src_k[keep], src_c[keep]
    corder = np.argsort(src_c, kind="stable")
    ccounts = np.bincount(src_c, minlength=n)
    K_T = int(ccounts.max(initial=0))
    if K_T > 8 * K + 8:
        # a hot column (usually undeclared padding slots all pointing at
        # col 0) would make the [n, K_T] transpose ELL mostly padding —
        # skip it; rmatvec falls back to the scatter path
        return ATAWindowPlan(
            rows, mask, local, n, N, bs,
            inv.astype(np.int32), colsq_col, len(uniq), max_span,
            split=split,
        )
    t_rows = np.zeros((n, K_T), dtype=np.int32)
    t_slot = np.zeros((n, K_T), dtype=np.int32)
    t_mask = np.zeros((n, K_T), dtype=np.float32)
    cstarts = np.concatenate([[0], np.cumsum(ccounts)])
    for_c = corder
    # vectorized fill: position within column = sorted index - column start
    within = np.arange(len(for_c)) - cstarts[src_c[for_c]]
    t_rows[src_c[for_c], within] = src_r[for_c]
    t_slot[src_c[for_c], within] = src_k[for_c]
    t_mask[src_c[for_c], within] = 1.0
    return ATAWindowPlan(
        rows, mask, local, n, N, bs,
        inv.astype(np.int32), colsq_col, len(uniq), max_span,
        t_rows, t_slot, t_mask, split=split,
    )


def make_ata_window_plan(
    cols: np.ndarray, n: int, bs: int, zero_slots: np.ndarray | None = None,
    split: int = 1,
) -> ATAWindowPlan:
    """Fused XLA-CPU plan builder — bit-identical to the NumPy reference
    (`_make_ata_window_plan_np`, which documents the semantics and remains
    the fallback). This host's numpy lacks SIMD (one 41M int64 sort/unique
    = ~30 s at Darcy N300); the sorts, uniques, gathers and scatters here
    run as a few jitted programs pinned to the host CPU backend instead.
    """
    from jax._src import core as _core

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is None or not _core.trace_state_clean():
        # no cpu backend, or running under an outer trace (the internal
        # jits would return tracers): pure-host numpy path
        return _make_ata_window_plan_np(
            cols, n, bs, zero_slots=zero_slots, split=split
        )
    cols = np.asarray(cols)
    n_rows, K = cols.shape
    N = max((n + bs - 1) // bs, 1)
    if N == 1:
        split = 1
    if bs % split:
        raise ValueError(f"split={split} must divide bs={bs}")
    bs_f = bs // split
    W = bs + bs_f
    Nw = max(split * (N - 1), 1)
    zs_np = (
        None if zero_slots is None else np.asarray(zero_slots, dtype=bool)
    )

    def stage1(cols, zs):
        c64 = cols.astype(jnp.int64)
        if zs is not None:
            big = jnp.iinfo(jnp.int64).max
            cmin = jnp.where(zs, big, c64).min(axis=1)
            cmax = jnp.where(zs, -1, c64).max(axis=1)
            all_zero = zs.all(axis=1)
            cmin = jnp.where(all_zero, 0, cmin)
            cmax = jnp.where(all_zero, 0, cmax)
        else:
            cmin = c64.min(axis=1)
            cmax = c64.max(axis=1)
        w = jnp.minimum(cmin // bs_f, Nw - 1)
        bad = jnp.any(cmax - w * bs_f >= W)
        order = jnp.argsort(w, stable=True)
        counts = jnp.bincount(w, length=Nw)
        max_span = (cmax - cmin).max(initial=0)
        return w, bad, order, counts, max_span, cmin, cmax

    with jax.default_device(cpu):
        w, bad, order, counts, max_span, cmin_d, cmax_d = jax.jit(stage1)(
            cols, zs_np
        )
        if bool(bad):
            cmin_h, cmax_h, w_h = (
                np.asarray(cmin_d), np.asarray(cmax_d), np.asarray(w)
            )
            b = int(np.argmax(cmax_h - w_h * bs_f >= W))
            raise ValueError(
                f"row {b} spans more than a window (cols {cmin_h[b]}.."
                f"{cmax_h[b]}, bs={bs}, split={split}); increase block "
                f"size or reduce split"
            )
        R = int(counts.max()) if n_rows else 0

        def stage2(cols, w, order, counts):
            starts = jnp.concatenate(
                [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
            )
            w_sorted = w[order]
            within = jnp.arange(n_rows) - starts[w_sorted]
            rows = (
                jnp.zeros((Nw, R), jnp.int32)
                .at[w_sorted, within]
                .set(order.astype(jnp.int32))
            )
            mask = (
                jnp.zeros((Nw, R), jnp.float32).at[w_sorted, within].set(1.0)
            )
            off = (jnp.arange(Nw, dtype=jnp.int64) * bs_f)[:, None, None]
            local = jnp.clip(
                cols.astype(jnp.int64)[rows] - off, 0, W - 1
            ).astype(jnp.int32)
            return rows, mask, local

        rows, mask, local = jax.jit(stage2)(cols, w, order, counts)

        def stage3(cols):
            r_ids = jnp.arange(n_rows * K, dtype=jnp.int64) // K
            keys = r_ids * n + cols.reshape(-1).astype(jnp.int64)
            so = jnp.argsort(keys, stable=True)
            sk = keys[so]
            flags = jnp.concatenate(
                [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
            ) if n_rows * K > 1 else jnp.ones((n_rows * K,), bool)
            ids = jnp.cumsum(flags) - 1
            inv = (
                jnp.zeros((n_rows * K,), jnp.int32)
                .at[so]
                .set(ids.astype(jnp.int32))
            )
            colsq_full = (
                jnp.zeros((n_rows * K,), jnp.int32)
                .at[ids]
                .set((sk % n).astype(jnp.int32))
            )
            return inv, colsq_full, ids[-1] + 1

        if n_rows * K:
            inv, colsq_full, n_uniq = jax.jit(stage3)(cols)
            n_uniq = int(n_uniq)
        else:
            inv = jnp.zeros((0,), jnp.int32)
            colsq_full = jnp.zeros((0,), jnp.int32)
            n_uniq = 0
        colsq_col = np.asarray(colsq_full)[:n_uniq]

        # transpose (CSC-style) ELL — see the reference implementation
        def stage4a(cols, zs):
            src_c = cols.reshape(-1).astype(jnp.int64)
            if zs is not None:
                src_c = jnp.where(zs.reshape(-1), n, src_c)  # sort to end
            ccounts = jnp.bincount(
                jnp.minimum(src_c, n), length=n + 1
            )[:n]
            return src_c, ccounts

        src_c, ccounts = jax.jit(stage4a)(cols, zs_np)
        K_T = int(ccounts.max()) if n else 0
        if K_T > 8 * K + 8:
            return ATAWindowPlan(
                np.asarray(rows), np.asarray(mask), np.asarray(local),
                n, N, bs,
                np.asarray(inv), colsq_col, n_uniq, int(max_span),
                split=split,
            )

        def stage4b(src_c, ccounts):
            corder = jnp.argsort(src_c, stable=True)
            key_sorted = src_c[corder]
            cstarts = jnp.concatenate(
                [jnp.zeros((1,), ccounts.dtype), jnp.cumsum(ccounts)]
            )
            within = (
                jnp.arange(n_rows * K)
                - cstarts[jnp.minimum(key_sorted, n)]
            )
            # sentinel rows (key n) drop via out-of-bounds indices on BOTH
            # axes (a negative `within` would wrap, not drop)
            sent = key_sorted >= n
            within = jnp.where(sent, K_T, within)
            ridx = jnp.where(sent, n, key_sorted)
            src_r = (corder // K).astype(jnp.int32)
            src_k = (corder % K).astype(jnp.int32)
            t_rows = (
                jnp.zeros((n, K_T), jnp.int32)
                .at[ridx, within]
                .set(src_r, mode="drop")
            )
            t_slot = (
                jnp.zeros((n, K_T), jnp.int32)
                .at[ridx, within]
                .set(src_k, mode="drop")
            )
            t_mask = (
                jnp.zeros((n, K_T), jnp.float32)
                .at[ridx, within]
                .set(1.0, mode="drop")
            )
            return t_rows, t_slot, t_mask

        t_rows, t_slot, t_mask = jax.jit(stage4b)(src_c, ccounts)

    return ATAWindowPlan(
        np.asarray(rows), np.asarray(mask), np.asarray(local), n, N, bs,
        np.asarray(inv), colsq_col, n_uniq, int(max_span),
        np.asarray(t_rows), np.asarray(t_slot), np.asarray(t_mask),
        split=split,
    )


def ata_btd_windows(
    plan: ATAWindowPlan, vals, tau=1.0, dtype=None, init: BTD | None = None
) -> BTD:
    """tau * A^T A in BTD form via window GEMMs. `vals`: [n_rows, K].

    `init`: optional BTD to accumulate into (init + tau A^T A) — avoids a
    second full-size BTD allocation when adding to a prior precision (XLA
    can alias the buffers); requires tau folding at the call site to match.
    """
    vals = jnp.asarray(vals)
    dtype = dtype or vals.dtype
    N, bs, Nw = plan.N, plan.bs, plan.Nw
    s, bs_f, W = plan.split, plan.bs_f, plan.width
    rows = jnp.asarray(plan.rows)
    mask = jnp.asarray(plan.mask, dtype=dtype)
    lcols = jnp.asarray(plan.local_cols)

    def window_G(b):
        v = (vals[rows[b]] * mask[b][:, None]).astype(dtype)  # [R, K]
        M = dense_rows_from_slots(v, lcols[b], W)
        with jax.default_matmul_precision("float32"):
            return (M.T @ M) * tau  # [W, W]

    if init is not None:
        diag, lower = init.diag, init.lower
    else:
        diag = jnp.zeros((N, bs, bs), dtype=dtype)
        lower = jnp.zeros((max(N - 1, 0), bs, bs), dtype=dtype)

    if N == 1:
        return BTD(diag + window_G(0)[:bs, :bs][None], lower, plan.n)

    # scan-accumulate one window Gram at a time: materializing all Nw
    # [W, W] panels first is ~Nw W^2 floats (~10 GB at Darcy N_xy=300)
    # and OOMs; the carry buffers alias in place. With split > 1 the scan
    # runs over BIG blocks with the s fine windows unrolled inside, so
    # every fine tile's (big block, offset) target is static modulo the
    # traced big index B.
    def step(carry, B):
        dg, lo = carry
        for t in range(s):
            b = s * B + t if s > 1 else B
            G = window_G(b)
            # fine tile (p, q) covers fine blocks (b+p, b+q); distance
            # <= s so the big-block distance is 0 (diag) or 1 (lower) —
            # static given (t, p, q)
            for p in range(s + 1):
                dBi, oi = (t + p) // s, ((t + p) % s) * bs_f
                for q in range(p + 1):
                    dBj, oj = (t + q) // s, ((t + q) % s) * bs_f
                    tile = G[
                        p * bs_f : (p + 1) * bs_f, q * bs_f : (q + 1) * bs_f
                    ][None]
                    if dBi == dBj:
                        tgt, Bt = dg, B + dBi
                        if p != q:  # mirror into the symmetric diag block
                            cur = lax.dynamic_slice(
                                tgt, (Bt, oj, oi), (1, bs_f, bs_f)
                            )
                            tgt = lax.dynamic_update_slice(
                                tgt,
                                cur + jnp.swapaxes(tile, 1, 2),
                                (Bt, oj, oi),
                            )
                    else:
                        tgt, Bt = lo, B + dBj
                    cur = lax.dynamic_slice(tgt, (Bt, oi, oj), (1, bs_f, bs_f))
                    tgt = lax.dynamic_update_slice(
                        tgt, cur + tile, (Bt, oi, oj)
                    )
                    if dBi == dBj:
                        dg = tgt
                    else:
                        lo = tgt
        return (dg, lo), None

    (diag, lower), _ = lax.scan(step, (diag, lower), jnp.arange(N - 1))
    return BTD(diag, lower, plan.n)
