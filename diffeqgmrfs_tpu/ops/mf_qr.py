"""Level-batched multifrontal sqrt-QR on geometric nested dissection.

The 1e6-dof path (BASELINE.md north-star). The banded SRIF sweep is
rate-saturated at ~88% of the f32 GEMM peak but costs O(n * bw^2) flops
with bw ~ 6 sqrt(n) AND stores an O(n * bw) packed factor — 16 GB at 1e6
dofs, past the v5e's HBM before wall-clock even enters. Nested dissection
cuts both: O(n^1.5)-class flops concentrated in MXU-sized top fronts and
an O(n log n) factor. The round-2 Cholesky form (`ops/multifrontal.py`)
proved the tree/level-batching machinery but is f32-INVALID at the
flagship condition numbers (Darcy obs precision 1e8 squares into the
normal equations — `/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:163`);
this module is its square-root sibling:

    S = [ Lambda ; sqrt(tau) A ],   S^T S = H,

factored by ORTHOGONAL transforms only (multifrontal QR, the sparse
analog of `ops/srif.py`): each tree node's front stacks

    [ operand rows whose deepest support dof is owned here ;
      both children's update-row trapezoids ;
      identity rows for padded pivots ]

over the front's columns (own pivots | boundary), one batched tall QR per
tree LEVEL. The R rows on own columns are final (R^T R = H exactly, so R
matches the Cholesky factor of H up to row signs — same downstream
semantics); the trailing trapezoid on boundary columns is the update
passed to the parent. Householder-grade error ~ eps * sqrt(cond H) keeps
f32 valid to cond ~ 1e14 (ops/srif.py header).

Symbolic structure (tree, fronts, boundaries) is shared with the
Cholesky form via `symbolic_multifrontal(..., with_h_pos=False)`; only
the operand-row -> front assignment and slot->front-position maps are new.

Replaces what the reference reaches through CHOLMOD/supernodal with a
fill-reducing permutation (`/root/reference/src/tridiagonal_cholesky.jl:20,39`)
— same math, MXU-shaped supernodes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .batched_factor import batched_tsolve_left
from .multifrontal import FrontTree, symbolic_multifrontal


# ---------------------------------------------------------------------------
# symbolic phase (host / numpy)
# ---------------------------------------------------------------------------


@dataclass(eq=False)
class MFQRLevel:
    """Row-plan extension of one LevelPlan for the QR numeric phase."""

    rows_src: np.ndarray    # [B, Rm] global operand-row index, -1 pad
    rows_pos: np.ndarray    # [B, Rm, K] front position of each slot,
                            # f -> dropped (padding / out-of-front)
    child_slot: np.ndarray  # [C] 0/1: which of the parent's two child
                            # row-blocks this child's update occupies


@dataclass(eq=False)
class MFQRTree:
    n: int
    K: int                   # slot width of the stacked operand rows
    n_rows: int              # total operand rows
    tree: FrontTree
    rlevels: list[MFQRLevel] = field(default_factory=list)

    @property
    def levels(self):
        return self.tree.levels


def stack_operand_cols(ops_cols, n):
    """Stack operand col arrays into one [Rtot, Kmax] int64 map with
    out-of-range/padding slots set to n (the scratch column).

    NOTE: structurally-dead slots (e.g. constraint condensation's
    s_coef == 0 slots, which alias free dof 0 — `AffineMap.condense_rowop`)
    MUST be pre-masked to n by the caller: a spurious col-0 alias couples
    every boundary-adjacent row to one dof and collapses the dissection
    geometry to a single front."""
    Kmax = max(c.shape[1] for c in ops_cols)
    parts = []
    for c in ops_cols:
        c = np.asarray(c, dtype=np.int64)
        bad = (c < 0) | (c >= n)
        c = np.where(bad, n, c)
        if c.shape[1] < Kmax:
            c = np.concatenate(
                [c, np.full((c.shape[0], Kmax - c.shape[1]), n, np.int64)],
                axis=1,
            )
        parts.append(c)
    return np.concatenate(parts, axis=0)


def structural_cols(cols, host_vals, n: int):
    """Mask structurally-dead slots (value exactly 0 in the host/builder
    values — ELL padding pads with col 0 + val 0, `RowOp.from_csr`) to the
    sentinel column n. A spurious col-0 alias in every padded row couples
    the whole domain to one dof and collapses the dissection tree to a
    single front (observed: Darcy N64 OOM, results/tpu_queue/mfqr_N64.log).
    The mask must be instance-INDEPENDENT (assembly padding is); callers
    should verify at runtime that no instance puts a nonzero value in a
    masked slot (drop-column leak check in the mfqr drivers)."""
    cols = np.asarray(cols)
    dead = np.asarray(host_vals) == 0.0
    return np.where(dead | (cols < 0) | (cols >= n), n, cols)


def transpose_ell(cols, n: int):
    """Host-built gather-form transpose of a RowOp structure:
    (t_rows [n, K_T], t_slot [n, K_T], t_mask [n, K_T]) such that

        (A^T r)[c] = sum_k mask[c,k] * vals[t_rows[c,k], t_slot[c,k]]
                              * r[t_rows[c,k]]

    — a pure GATHER. TPU scatter lowering expands the naive rmatvec
    scatter-add into copy cascades (the mfqr N300 post-mean refinement
    OOMed in exactly that op; same pathology as the round-2
    probe_resolve 430 ms scatter vs 89 ms gather finding)."""
    cols = np.asarray(cols)
    R, K = cols.shape
    flat = cols.reshape(-1).astype(np.int64)
    valid = (flat >= 0) & (flat < n)
    flat = np.where(valid, flat, n)
    order = np.argsort(flat, kind="stable")
    sorted_c = flat[order]
    counts = np.bincount(sorted_c, minlength=n + 1)[:n]
    K_T = int(counts.max()) if n else 0
    starts = np.concatenate(([0], np.cumsum(counts)))
    t_rows = np.zeros((n, K_T), np.int32)
    t_slot = np.zeros((n, K_T), np.int32)
    t_mask = np.zeros((n, K_T), np.float32)
    nz = starts[-1]
    within = np.arange(nz) - np.repeat(starts[:-1], counts)
    cc = sorted_c[:nz]
    t_rows[cc, within] = (order[:nz] // K).astype(np.int32)
    t_slot[cc, within] = (order[:nz] % K).astype(np.int32)
    t_mask[cc, within] = 1.0
    return t_rows, t_slot, t_mask


def rmatvec_gather(t_ell, vals, r):
    """A^T r via the transpose ELL of `transpose_ell` (gather-only)."""
    tr, ts, tm = t_ell
    tr = jnp.asarray(tr)
    v = jnp.asarray(vals)[tr, jnp.asarray(ts)]
    v = v * jnp.asarray(tm, dtype=v.dtype)
    return jnp.sum(v * r[tr], axis=1)


def stack_operand_vals(ops_vals, Kmax: int, dtype=None):
    """Stack traced operand value arrays to the [Rtot, Kmax] layout of
    `stack_operand_cols` (zero-padding extra slots)."""
    parts = []
    for v in ops_vals:
        v = jnp.asarray(v)
        if dtype is not None:
            v = v.astype(dtype)
        if v.shape[1] < Kmax:
            v = jnp.concatenate(
                [v, jnp.zeros((v.shape[0], Kmax - v.shape[1]), v.dtype)],
                axis=1,
            )
        parts.append(v)
    return jnp.concatenate(parts, axis=0)


_stack_cols = stack_operand_cols


def symbolic_mf_qr(
    ops_cols,
    n: int,
    coords,
    cut_width,
    leaf_target: int = 128,
) -> MFQRTree:
    """Symbolic multifrontal-QR analysis from operand row structures.

    ops_cols: list of [R_i, K_i] int col arrays (RowOp.cols; padding
    slots < 0 or == n allowed). The implied system is H = S^T S where S
    stacks all operands' rows; its graph drives the dissection tree
    exactly as in the Cholesky form.
    """
    import scipy.sparse as sp

    cols = _stack_cols(ops_cols, n)
    Rtot, K = cols.shape
    r_idx = np.repeat(np.arange(Rtot), K)
    c_idx = cols.reshape(-1)
    keep = c_idx < n
    S = sp.csr_matrix(
        (np.ones(keep.sum(), np.float64), (r_idx[keep], c_idx[keep])),
        shape=(Rtot, n),
    )
    # structural Gram; explicit duplicates merged by CSR construction
    H = (S.T @ S).tocsr()
    if cut_width is None:
        from .multifrontal import suggest_cut_width

        cut_width = suggest_cut_width(H, coords)
    tree = symbolic_multifrontal(
        H, coords, cut_width, leaf_target, with_h_pos=False
    )

    # owner (plan index, front index, position map) per dof
    P = len(tree.levels)
    owner_plan = np.full(n, -1, np.int64)
    owner_b = np.full(n, -1, np.int64)
    for p, plan in enumerate(tree.levels):
        for b in range(plan.own.shape[0]):
            o = plan.own[b]
            o = o[o >= 0]
            owner_plan[o] = p
            owner_b[o] = b
    if (owner_plan < 0).any():
        raise AssertionError("dof not owned by any front")

    # row -> deepest owner's front. Plans are deepest-FIRST, so the
    # assigned plan index is the MIN owner_plan over the row's support;
    # all support dofs achieving it lie in the SAME front (separated
    # subtrees cannot share a row — verified during tree construction).
    col_plan = np.where(cols < n, owner_plan[np.minimum(cols, n - 1)], P)
    row_plan = col_plan.min(axis=1)
    empty = row_plan == P  # all-padding rows: drop
    amin = col_plan.argmin(axis=1)
    row_b = owner_b[np.minimum(cols[np.arange(Rtot), amin], n - 1)]
    row_b[empty] = -1

    rlevels = []
    for p, plan in enumerate(tree.levels):
        s, f = plan.s, plan.f
        B = plan.own.shape[0]
        mine = np.nonzero(row_plan == p)[0]
        bs_of = row_b[mine]
        counts = np.bincount(bs_of, minlength=B)
        Rm = int(counts.max()) if counts.size else 0
        rows_src = np.full((B, Rm), -1, np.int64)
        rows_pos = np.full((B, Rm, K), f, np.int64)
        order = np.argsort(bs_of, kind="stable")
        mine, bs_of = mine[order], bs_of[order]
        offs = np.concatenate(([0], np.cumsum(counts)))
        for b in range(B):
            rs = mine[offs[b] : offs[b + 1]]
            if rs.size == 0:
                continue
            rows_src[b, : rs.size] = rs
            own_b = plan.own[b]
            own_b = own_b[own_b >= 0]
            bnd_b = plan.cols[b, s:]
            bnd_b = bnd_b[bnd_b >= 0]
            cc = cols[rs]  # [r, K]
            flat = cc.reshape(-1)
            jo = np.searchsorted(own_b, flat)
            joc = np.minimum(jo, max(len(own_b) - 1, 0))
            in_own = (
                (own_b[joc] == flat) if len(own_b) else np.zeros(flat.shape, bool)
            )
            jb = np.searchsorted(bnd_b, flat)
            jbc = np.minimum(jb, max(len(bnd_b) - 1, 0))
            in_bnd = (
                (bnd_b[jbc] == flat) if len(bnd_b) else np.zeros(flat.shape, bool)
            )
            ok = in_own | in_bnd | (flat >= n)
            if not ok.all():
                missing = flat[~ok]
                raise AssertionError(
                    f"row slot col {missing[:3].tolist()} outside its "
                    f"assigned front (level {p})"
                )
            pos = np.where(in_own, joc, np.where(in_bnd, s + jbc, f))
            rows_pos[b, : rs.size] = pos.reshape(cc.shape)
        # child slot (0/1) per extend entry: order of appearance per parent
        cp = plan.child_parent
        slot = np.zeros(cp.shape, np.int64)
        seen: dict[int, int] = {}
        for e, pb in enumerate(cp):
            slot[e] = seen.get(int(pb), 0)
            seen[int(pb)] = slot[e] + 1
        if slot.size and slot.max() > 1:
            raise AssertionError("more than two children in bisection tree")
        rlevels.append(
            MFQRLevel(rows_src=rows_src, rows_pos=rows_pos, child_slot=slot)
        )
    return MFQRTree(n=n, K=K, n_rows=Rtot, tree=tree, rlevels=rlevels)


def mfqr_device_arrays(qt: MFQRTree, device=None, solve_only: bool = False):
    """Plan arrays as device arrays for jit-signature threading (the
    relay rejects >~100 MB HLO constant payloads — see
    `multifrontal.tree_device_arrays`). Index arrays are narrowed to
    int32 (front widths and row counts are far below 2^31; the leaf-level
    rows_pos at 1e6 dofs is ~0.6 GB in i32 vs 1.3 GB in i64).

    solve_only: skip the factorization-side row/child maps (the chunked
    path carries its own per-chunk copies — duplicating rows_pos wastes
    hundreds of MB of HBM at production sizes); solves only read
    own_idx/bnd_idx."""
    put = (lambda a: jax.device_put(a, device)) if device else jnp.asarray
    arrs = []
    for p, plan in enumerate(qt.tree.levels):
        rl = qt.rlevels[p]
        d = dict(
            own_idx=put(
                np.where(plan.own < 0, qt.n, plan.own).astype(np.int32)
            ),
            bnd_idx=put(
                np.where(
                    plan.cols[:, plan.s :] < 0, qt.n, plan.cols[:, plan.s :]
                ).astype(np.int32)
            ),
        )
        if not solve_only:
            d.update(
                rows_src=put(
                    np.where(rl.rows_src < 0, qt.n_rows, rl.rows_src).astype(
                        np.int32
                    )
                ),
                rows_pos=put(rl.rows_pos.astype(np.int32)),
                pad=put(plan.own < 0),
                child_src=put(plan.child_src.astype(np.int32)),
                child_parent=put(plan.child_parent.astype(np.int32)),
                child_pos=put(plan.child_pos.astype(np.int32)),
                child_slot=put(rl.child_slot.astype(np.int32)),
            )
        arrs.append(d)
    return arrs


# ---------------------------------------------------------------------------
# numeric phase
# ---------------------------------------------------------------------------


def _f32mm(fn):
    """Trace-time matmul-precision pin. TPU's DEFAULT f32 matmul runs
    bf16 passes; every GEMM in this module — the one-hot extend-add
    selection matmuls, the gram engine's Gram/CholQR/trailing GEMMs,
    the triangular-solve chains, selected inversion — needs true f32.
    Round-5 chip finding: the unpinned chunked factorization produced
    mean residual |b-Hx|/|b| = 5.1e+03 at N300 (qr_impl=auto) while the
    identical CPU path — where f32 matmuls are exact — passed at
    1.7e-12; srif.py:534 / cholesky.py:92 already pin their sweeps."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)

    return wrapped


@_f32mm
def _qr_r_rowchunked(panel, qr_impl: str, row_chunk: int):
    """Sequential TSQR over row blocks: triangularize [B, r, f] through
    QRs of at most [B, f + row_chunk, f] — identical R (unique up to row
    signs), workspace bounded by the block instead of the full panel
    (the N300 level-5 one-shot QR wanted ~20 GB — queue r3a OOM)."""
    B, r, f = panel.shape
    if qr_impl in ("cholqr", "gram") and r >= f:
        # Gram accumulation over row blocks replaces the TSQR carry chain
        # entirely (no [B, f + rc, f] stack concats — those were a
        # layout-copy source); scratch is the [B, f, f] Gram.
        return _qr_r_gram(panel, gram_chunk=row_chunk)
    carry = None
    for i0 in range(0, r, row_chunk):
        blk = panel[:, i0 : i0 + row_chunk]
        T = blk if carry is None else jnp.concatenate([carry, blk], axis=1)
        Rq = _qr_r(T, qr_impl)
        if Rq.shape[1] < f:
            Rq = jnp.concatenate(
                [Rq, jnp.zeros((B, f - Rq.shape[1], f), panel.dtype)], axis=1
            )
        carry = Rq[:, :f]
    return carry


@_f32mm
def _qr_r_gram(
    panel,
    passes: int = 3,
    shift_passes: int = 2,
    chol_panel: int = 256,
    gram_chunk: int = 0,
):
    """R of a batched tall panel [B, r, f] by staged-shift CholeskyQR in
    PURE batched-GEMM form — the round-4 engine that lifts the mfqr
    level QR off XLA's 0.38 TF/s batched-QR floor (VERDICT r3 next #2).

    Why not vmap(_shifted_cholqr): the round-3 `cholqr` arm compile-OOMed
    on a 20.6 GB batch-minor layout copy (f32[3,8763,4586]{0,2,1} — the
    vmapped pass loop lane-pads the small batch dim 3 -> 128, 42x). This
    implementation uses only ops whose TPU layouts are standard:
    batched-GEMM einsums for Gram/apply/products and `blocked_cholesky`
    (panel POTRF + GEMM trailing, ops/blocked_factor.py) for the [B,f,f]
    factor, so ~95% of flops ride the MXU.

    Math (same staged-shift scheme as srif._shifted_cholqr, R-only):
    per pass G = P^T P (+ shift), R_k = chol(G)^T, P <- P R_k^{-1};
    R = R_n ... R_1. Reconstruction exactness gives R^T R = P0^T P0 to
    the f32 floor after one floor-shift pass; the initial full-shift
    passes keep the f32 Cholesky valid at panel cond up to ~1e5 (the
    equilibrated production range). NaN at the last floor-pass diagonal
    triggers the per-batch full-shift fallback (the bcgs4 elliptic
    lesson). Flops ~ passes * (2 r f^2 + f^3) per front vs QR's
    ~2 f^2 (r - f/3): ~4-6x more, at a ~30-40x better rate.

    gram_chunk: accumulate the first pass's Gram over row blocks of this
    size (bounds GEMM scratch at the top-level giant fronts — replaces
    the sequential TSQR carry chain, whose concats were another
    layout-copy source)."""
    from .blocked_factor import blocked_cholesky, blocked_tsolve_right_T

    B, r, f = panel.shape
    dtype = panel.dtype
    eps = jnp.finfo(dtype).eps
    eye = jnp.eye(f, dtype=dtype)

    def gram(P):
        if gram_chunk and r > gram_chunk:
            G = jnp.zeros((B, f, f), dtype)
            for i0 in range(0, r, gram_chunk):
                blk = P[:, i0 : i0 + gram_chunk]
                G = G + jnp.einsum("brf,brg->bfg", blk, blk)
            return G
        return jnp.einsum("brf,brg->bfg", P, P)

    P = panel
    R_acc = None
    for k in range(passes):
        G = gram(P)
        gmax = jnp.max(
            jnp.diagonal(G, axis1=-2, axis2=-1), axis=-1
        )[:, None, None]
        s_full = 8.0 * r * eps * gmax + 1e-30
        if k < shift_passes:
            L = blocked_cholesky(G + s_full * eye, panel=chol_panel)
        else:
            s_floor = 8.0 * eps * gmax + 1e-30
            L = blocked_cholesky(G + s_floor * eye, panel=chol_panel)
            # per-batch fallback: floor-shift Cholesky went indefinite
            # (NaN propagates to the last diagonal) -> full shift for
            # that front only
            bad = jnp.isnan(L[:, f - 1, f - 1])
            if f > 1:
                Lf = blocked_cholesky(G + s_full * eye, panel=chol_panel)
                L = jnp.where(bad[:, None, None], Lf, L)
        Rk = jnp.swapaxes(L, -1, -2)
        R_acc = Rk if R_acc is None else Rk @ R_acc
        if k + 1 < passes:
            P = blocked_tsolve_right_T(L, P, panel=chol_panel)
    return R_acc


@_f32mm
def _qr_r(panel, qr_impl: str):
    """R factor of batched tall panel [B, r, f] -> [B, min(r, f), f]."""
    B, r, f = panel.shape
    if qr_impl in ("cholqr", "gram") and r >= f:
        # all-GEMM staged CholeskyQR (R-only; see _qr_r_gram).
        # Rank-deficient panels are unsafe here -> caller guards r >= f.
        # "cholqr" is kept as an alias: the old vmapped engine is
        # superseded (it compile-OOMed on batch-minor layout copies).
        return _qr_r_gram(panel)
    return jnp.linalg.qr(panel, mode="r")


@jax.tree_util.register_pytree_node_class
class MFQRFactor:
    """Per-level R fronts: R11 [B, s, s] upper, R12 [B, s, f-s].

    R^T R = H on the original dof indexing (no explicit permutation: the
    solves gather/scatter by global ids exactly like `MultifrontalFactor`).
    With `col_scale` cs, the factored system is diag(cs) H diag(cs) and
    solve()/log_det()/sample undo the scaling.
    """

    def __init__(self, qt: MFQRTree, rfronts, dtype, col_scale=None, arrs=None):
        self.qt = qt
        self.rfronts = rfronts  # list of (R11, R12)
        self.dtype = dtype
        self.col_scale = col_scale
        self.arrs = arrs

    def tree_flatten(self):
        return (self.rfronts, self.col_scale, self.arrs), (self.qt, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            aux[0], children[0], aux[1], col_scale=children[1], arrs=children[2]
        )

    def _level(self, p: int):
        if self.arrs is not None:
            return self.arrs[p]
        plan = self.qt.tree.levels[p]
        return dict(
            own_idx=np.where(plan.own < 0, self.qt.n, plan.own),
            bnd_idx=np.where(
                plan.cols[:, plan.s :] < 0, self.qt.n, plan.cols[:, plan.s :]
            ),
        )

    # -- factor ------------------------------------------------------------

    @staticmethod
    def factorize(
        qt: MFQRTree,
        vals,
        cols_global=None,
        col_scale=None,
        dtype=jnp.float32,
        qr_impl: str = "xla",
        arrs=None,
    ) -> "MFQRFactor":
        """Factor from the stacked operand values [n_rows, K] (same row
        order/stacking as the `ops_cols` given to `symbolic_mf_qr`;
        scale factors like sqrt(tau) must already be folded in).

        col_scale: optional [n] column equilibration (applied to every
        slot via `cols_global`, the stacked [n_rows, K] global col map —
        required when col_scale is given).
        """
        if qr_impl == "auto":
            # the per-level gram/Householder hybrid lives in
            # mfqr_factorize_chunked; silently falling back to all-XLA
            # here would run a different engine than requested
            raise ValueError(
                "qr_impl='auto' requires the chunked path "
                "(mfqr_factorize_chunked); the fused factorize supports "
                "'xla'/'cholqr'/'gram' only"
            )
        vals = jnp.asarray(vals, dtype=dtype)
        if vals.ndim == 1:  # flat stacks (the chunked-path layout)
            vals = vals.reshape(-1, qt.K)
        if col_scale is not None:
            if cols_global is None:
                raise ValueError("col_scale requires cols_global")
            cg = jnp.asarray(cols_global)
            if cg.ndim == 1:
                cg = cg.reshape(-1, qt.K)
            cs = jnp.concatenate(
                [jnp.asarray(col_scale, dtype=dtype), jnp.ones((1,), dtype)]
            )
            vals = vals * cs[cg]
        # pad row (gathered by rows_src sentinel n_rows) is all zeros
        vpad = jnp.concatenate(
            [vals, jnp.zeros((1, vals.shape[1]), dtype)], axis=0
        )
        updates = None  # [B_prev, u, u] trapezoids from the level below
        rfronts = []
        for p, plan in enumerate(qt.tree.levels):
            la = (
                arrs[p]
                if arrs is not None
                else _host_qr_level(qt, p)
            )
            B, s, f = plan.own.shape[0], plan.s, plan.f
            Rm = qt.rlevels[p].rows_src.shape[1]
            u_prev = 0 if updates is None else updates.shape[1]
            rows_tot = Rm + 2 * u_prev + s
            panel = jnp.zeros((B, rows_tot, f + 1), dtype)
            if Rm:
                v = vpad[la["rows_src"]]  # [B, Rm, K]
                bb = jnp.arange(B)[:, None, None]
                rr = jnp.arange(Rm)[None, :, None]
                panel = panel.at[
                    jnp.broadcast_to(bb, v.shape),
                    jnp.broadcast_to(rr, v.shape),
                    la["rows_pos"],
                ].add(v)
            if updates is not None and plan.child_parent.shape[0]:
                U = updates[la["child_src"]]  # [C, u, u]
                pos = la["child_pos"]  # [C, u] -> 0..f (f = drop)
                base = Rm + la["child_slot"] * u_prev  # [C]
                cc_r = base[:, None, None] + jnp.arange(u_prev)[None, :, None]
                cc_c = jnp.broadcast_to(pos[:, None, :], U.shape)
                bb = jnp.broadcast_to(
                    la["child_parent"][:, None, None], U.shape
                )
                panel = panel.at[
                    bb, jnp.broadcast_to(cc_r, U.shape), cc_c
                ].add(U)
            # identity rows for padded pivots (keeps R11 nonsingular and
            # log-det clean: padded slots contribute log 1 = 0)
            prow = jnp.where(la["pad"], 1.0, 0.0).astype(dtype)  # [B, s]
            ii = jnp.arange(s)
            panel = panel.at[:, Rm + 2 * u_prev + ii, ii].set(prow)
            Rq = _qr_r(panel[:, :, :f], qr_impl)  # [B, min(rows,f), f]
            m = Rq.shape[1]
            if m < f:
                Rq = jnp.concatenate(
                    [Rq, jnp.zeros((B, f - m, f), dtype)], axis=1
                )
            u = f - s
            updates = Rq[:, s:, s:] if u else jnp.zeros((B, 0, 0), dtype)
            R11, R12 = Rq[:, :s, :s], Rq[:, :s, s:]
            # positive diagonal (QR is unique up to row signs; downstream
            # log-det and sampling want chol-convention signs)
            d = jnp.diagonal(R11, axis1=-2, axis2=-1)
            sgn = jnp.where(d < 0, -1.0, 1.0).astype(dtype)[:, :, None]
            rfronts.append((R11 * sgn, R12 * sgn))
        return MFQRFactor(qt, rfronts, dtype, col_scale=col_scale, arrs=arrs)

    # -- queries -----------------------------------------------------------

    def log_det(self):
        """log det H (undoing column equilibration)."""
        tot = 0.0
        for R11, _ in self.rfronts:
            d = jnp.diagonal(R11, axis1=-2, axis2=-1)
            tot = tot + 2.0 * jnp.sum(jnp.log(d))
        if self.col_scale is not None:
            tot = tot - 2.0 * jnp.sum(
                jnp.log(jnp.asarray(self.col_scale, self.dtype))
            )
        return tot

    def _fwd(self, y):
        """R^T z = y, bottom-up (z overwrites y; y is [n+1, k])."""
        for p, (R11, R12) in enumerate(self.rfronts):
            la = self._level(p)
            own = jnp.asarray(la["own_idx"])
            bnd = jnp.asarray(la["bnd_idx"])
            rhs = y[own]  # [B, s, k]
            Rl = jnp.swapaxes(R11, 1, 2)  # lower
            sol = batched_tsolve_left(Rl, rhs)  # R11^T sol = rhs
            y = y.at[own].set(sol, mode="drop")
            if R12.shape[2]:
                y = y.at[bnd].add(
                    -jnp.swapaxes(R12, 1, 2) @ sol, mode="drop"
                )
            y = y.at[self.qt.n].set(0.0)
        return y

    def _bwd(self, x):
        """R x' = x, top-down (x is [n+1, k])."""
        for p in range(len(self.rfronts) - 1, -1, -1):
            R11, R12 = self.rfronts[p]
            la = self._level(p)
            own = jnp.asarray(la["own_idx"])
            bnd = jnp.asarray(la["bnd_idx"])
            rhs = x[own]
            if R12.shape[2]:
                rhs = rhs - R12 @ x[bnd]
            Rl = jnp.swapaxes(R11, 1, 2)
            sol = batched_tsolve_left(Rl, rhs, transpose=True)  # R11 sol = rhs
            x = x.at[own].set(sol, mode="drop")
            x = x.at[self.qt.n].set(0.0)
        return x

    def solve(self, b):
        """H^{-1} b for b [n] or [n, k]."""
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        k = b.shape[1]
        b = b.astype(self.dtype)
        if self.col_scale is not None:
            b = b * jnp.asarray(self.col_scale, self.dtype)[:, None]
        y = jnp.concatenate([b, jnp.zeros((1, k), self.dtype)])
        x = self._bwd(self._fwd(y))[: self.qt.n]
        if self.col_scale is not None:
            x = x * jnp.asarray(self.col_scale, self.dtype)[:, None]
        return x[:, 0] if squeeze else x

    def sample_zero_mean(self, key, k: int = 1):
        """z with cov H^{-1}: solve R x = w, w ~ N(0, I)."""
        w = jax.random.normal(key, (self.qt.n + 1, k), self.dtype)
        w = w.at[self.qt.n].set(0.0)
        x = self._bwd(w)[: self.qt.n]
        if self.col_scale is not None:
            x = x * jnp.asarray(self.col_scale, self.dtype)[:, None]
        return x

    def variance_mc(self, key, n_samples: int = 50):
        """Monte-Carlo marginal variance estimate via ONE batched
        backsolve of n_samples white-noise vectors (the sample-based leg
        of the reference's RBMCStrategy(n),
        `scripts/darcy/solve_darcy_gmrf-fem.jl:100`; relative error
        ~ sqrt(2/n) per entry)."""
        z = self.sample_zero_mean(key, n_samples)
        return jnp.mean(z * z, axis=1)


# ---------------------------------------------------------------------------
# chunked (HBM-bounded) factorization: python loop over levels x front
# chunks, one jitted kernel per level shape — the mf analog of
# `srif_packed_qr_chunked` / the stepwise GN dispatch (the relay faults on
# very large fused programs, and the leaf-level panel tensor at 1e6 dofs
# is ~7 GB if materialized for the whole level at once).
# ---------------------------------------------------------------------------


def mfqr_chunk_plans(
    qt: MFQRTree, max_panel_bytes: int = 1 << 30, dtype=np.float32
):
    """Host-side per-level front chunking. Returns
    [(cB, nc, [chunk la dicts])] — all chunks of a level share one padded
    shape so one jitted kernel serves the level."""
    out = []
    itemsize = np.dtype(dtype).itemsize  # ADVICE r3: f64 panels are 2x
    for p, plan in enumerate(qt.tree.levels):
        rl = qt.rlevels[p]
        B, s, f = plan.own.shape[0], plan.s, plan.f
        u_prev = 0
        if p > 0:
            prev = qt.tree.levels[p - 1]
            u_prev = prev.f - prev.s
        Rm = rl.rows_src.shape[1]
        rows_tot = Rm + 2 * u_prev + s
        # ~3x for QR scratch
        per_front = max(rows_tot * (f + 1) * itemsize * 3, 1)
        cB = max(1, min(B, int(max_panel_bytes // per_front)))
        nc = -(-B // cB)
        # even a single front can exceed the budget at the top levels;
        # bound the per-QR workspace by sequential row-chunked TSQR
        row_chunk = 0
        if cB == 1 and per_front > max_panel_bytes:
            rc = int(
                max_panel_bytes // max((f + 1) * itemsize * 3, 1)
            ) - f
            row_chunk = max(rc, f, 256)
        order = np.argsort(plan.child_parent, kind="stable")
        cp_sorted = plan.child_parent[order]
        Cmax = 2 * cB  # bisection tree: <= 2 children per front
        chunks = []
        for ci in range(nc):
            b0, b1 = ci * cB, min(B, (ci + 1) * cB)
            nb = b1 - b0
            e0, e1 = np.searchsorted(cp_sorted, [b0, b1])
            ee = order[e0:e1]
            C = ee.shape[0]
            if C > Cmax:
                raise AssertionError("more than 2 children per front")
            rs = np.full((cB, Rm), qt.n_rows, np.int64)
            rs[:nb] = np.where(
                rl.rows_src[b0:b1] < 0, qt.n_rows, rl.rows_src[b0:b1]
            )
            rp = np.full((cB, Rm, qt.K), f, np.int64)
            rp[:nb] = rl.rows_pos[b0:b1]
            pad = np.ones((cB, s), bool)
            pad[:nb] = plan.own[b0:b1] < 0
            la = dict(
                rows_src=rs.astype(np.int32),
                # K-MAJOR layout [cB, K, Rm]: K rides the 8-sublane dim
                # (pad 34 -> 40, 1.2x) instead of the 128-lane dim
                # (pad 34 -> 128, 3.8x) — the leaf-level plan arrays
                # alone were ~1.8 GB at N500 in the lane-major layout
                # (mfqr_mem.py ledger, round-4 OOM root cause #1)
                rows_posT=np.ascontiguousarray(
                    rp.transpose(0, 2, 1)
                ).astype(np.int32),
                pad=pad,
            )
            if u_prev:
                # GATHER-form extend-add (TPU scatters lower to copy
                # cascades — the level-5 chunk program wanted 20.6 GB at
                # N300): children pre-placed by (parent, slot), and
                # inv_pos inverts child_pos so the kernel GATHERS each
                # child's update columns into front positions
                csrc2 = np.full((cB, 2), -1, np.int64)
                ipos = np.full((cB, 2, f + 1), u_prev, np.int64)
                for e in ee:
                    pb = int(plan.child_parent[e]) - b0
                    sl = int(rl.child_slot[e])
                    csrc2[pb, sl] = plan.child_src[e]
                    cp = plan.child_pos[e]
                    ipos[pb, sl, np.clip(cp, 0, f)] = np.arange(cp.shape[0])
                la["child_src2"] = csrc2.astype(np.int32)
                la["inv_pos"] = ipos.astype(np.int32)
            chunks.append(la)
        out.append((cB, nc, chunks, row_chunk))
    return out


def _mfqr_chunk_kernel(
    vpad, la, updates_pad2, shapes, dtype, qr_impl: str
):
    """One chunk's panel assembly + QR — SCATTER-FREE (TPU scatters lower
    to copy cascades; the scatter-form level-5 chunk program wanted
    20.6 GB at N300): operand rows via K-pass compare-accumulate
    (ops/ata_windows.dense_rows_from_slots rationale), child updates via
    inverse-position GATHER, pad pivots via one-hot, all concatenated.
    shapes = (cB, s, f, Rm, u_prev, row_chunk);
    updates_pad2: [B_prev + 1, u, u + 1] (zero front + zero col appended).
    """
    from jax import lax

    cB, s, f, Rm, u_prev, row_chunk = shapes
    segs = []
    if Rm:
        # vpad is FLAT [n_rows*K + K] (the [rows, K] device form pays a
        # 128-lane pad on K: 3.8x HBM at K=34 — round-4 OOM root cause);
        # per-slot values gather with computed flat indices, per-slot
        # local columns come from the K-major plan array
        rs = la["rows_src"]  # [cB, Rm], sentinel n_rows
        rpT = la["rows_posT"]  # [cB, K, Rm]
        K = rpT.shape[1]
        base = rs * K
        c_iota = lax.broadcasted_iota(jnp.int32, (1, 1, f + 1), 2)
        M = jnp.zeros((cB, Rm, f + 1), dtype)
        for k in range(K):
            vk = vpad[base + k]  # [cB, Rm] (sentinel row -> zeros)
            lk = rpT[:, k, :]  # [cB, Rm]
            M = M + jnp.where(
                c_iota == lk[:, :, None],
                vk[:, :, None],
                jnp.zeros((), dtype),
            )
        segs.append(M)
    if u_prev:
        src = jnp.where(
            la["child_src2"] < 0, updates_pad2.shape[0] - 1, la["child_src2"]
        )
        U = updates_pad2[src]  # [cB, 2, u, u+1]
        # column placement as a one-hot selection MATMUL, not
        # take_along_axis: XLA lowered the batched gather through a
        # batch-minor layout copy (lane-padding the small batch dim 8 ->
        # 128: 16x memory, "6.2% utilization ... 19.70G" compile OOM at
        # N400). S[b,c,k,jf] = (inv_pos[b,c,jf] == k); g = U @ S rides
        # the MXU with standard layouts.
        ip = la["inv_pos"]  # [cB, 2, f+1] in 0..u
        kk = lax.broadcasted_iota(jnp.int32, (1, 1, u_prev + 1, 1), 2)
        S = (ip[:, :, None, :] == kk).astype(dtype)  # [cB, 2, u+1, f+1]
        g = jnp.einsum("bcuk,bckf->bcuf", U, S)
        segs.append(g.reshape(cB, 2 * u_prev, f + 1).astype(dtype))
    prow = jnp.where(la["pad"], 1.0, 0.0).astype(dtype)  # [cB, s]
    one_hot = (
        lax.broadcasted_iota(jnp.int32, (1, s, f + 1), 2)
        == lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
    ).astype(dtype)
    segs.append(prow[:, :, None] * one_hot)
    panel = jnp.concatenate(segs, axis=1)
    if row_chunk and panel.shape[1] > row_chunk + f:
        Rq = _qr_r_rowchunked(panel[:, :, :f], qr_impl, row_chunk)
    else:
        Rq = _qr_r(panel[:, :, :f], qr_impl)
    m = Rq.shape[1]
    if m < f:
        Rq = jnp.concatenate([Rq, jnp.zeros((cB, f - m, f), dtype)], axis=1)
    R11, R12, U_out = Rq[:, :s, :s], Rq[:, :s, s:], Rq[:, s:, s:]
    d = jnp.diagonal(R11, axis1=-2, axis2=-1)
    sgn = jnp.where(d < 0, -1.0, 1.0).astype(dtype)[:, :, None]
    return R11 * sgn, R12 * sgn, U_out


_dus_jit = None


def _dus(buf, x, off):
    """Donated in-place block write buf[off:off+x.shape[0], :x1, :x2] = x
    (jit cached by shapes; donation keeps ONE buffer alive)."""
    global _dus_jit
    if _dus_jit is None:
        _dus_jit = jax.jit(
            lambda b, u, o: jax.lax.dynamic_update_slice(b, u, (o, 0, 0)),
            donate_argnums=0,
        )
    return _dus_jit(buf, x, off)


def _cat0(parts):
    """Concatenate [cB, a, b] chunks along axis 0 through a FLATTENED
    2-D concat + bitcast reshape. The direct 3-D concat lowers each input
    through a batch-minor layout copy (lane-padding the small leading
    dim 8 -> 128: 16x memory — the N400 'Unpadded 1.23G Padded 19.70G'
    compile OOM came from exactly this op over 16 update chunks)."""
    if len(parts) == 1:
        return parts[0]
    shp = parts[0].shape
    flat = jnp.concatenate([p.reshape(p.shape[0], -1) for p in parts], 0)
    return flat.reshape((flat.shape[0],) + shp[1:])


def mfqr_chunk_plans_device(chunk_plans, device=None):
    """Pre-upload chunk-plan arrays once (per-instance re-upload through
    the relay costs seconds per factorization)."""
    put = (lambda a: jax.device_put(a, device)) if device else jnp.asarray
    return [
        (cB, nc, [{k: put(v) for k, v in la.items()} for la in chunks], rc)
        for (cB, nc, chunks, rc) in chunk_plans
    ]


# jit once at module level: re-wrapping per factorize call would retrace
# every instance (the trace cache lives in the jit wrapper object)
_chunk_kernel_jit = None


def _get_chunk_kernel():
    global _chunk_kernel_jit
    if _chunk_kernel_jit is None:
        _chunk_kernel_jit = jax.jit(
            _f32mm(_mfqr_chunk_kernel),
            static_argnames=("shapes", "qr_impl", "dtype"),
        )
    return _chunk_kernel_jit


def mfqr_factorize_chunked(
    qt: MFQRTree,
    vals,
    chunk_plans=None,
    cols_global=None,
    col_scale=None,
    dtype=jnp.float32,
    qr_impl: str = "xla",
    max_panel_bytes: int = 1 << 30,
    arrs=None,
    offload_levels: int = 0,
    progress_cb=None,
    auto_top: int = 3,
) -> MFQRFactor:
    """HBM-bounded factorization: per-level python loop, per-chunk jitted
    QR kernels (one compile per level shape). Semantically identical to
    `MFQRFactor.factorize` — same fronts, same R.

    offload_levels: stream the first k levels' finished fronts to host
    RAM (solves re-upload per level) — required at 1e6 dofs where the
    factor + transients exceed HBM."""
    if chunk_plans is None:
        chunk_plans = mfqr_chunk_plans(qt, max_panel_bytes, dtype=dtype)
    # FLAT operand stack [n_rows*K] (+ K sentinel zeros): the [rows, K]
    # device layout lane-pads K -> 128 (3.8x HBM at K=34; ~4 GB of dead
    # padding across vals/vpad at N500 — mfqr_mem.py ledger). Accepts
    # either form; drivers should pass flat to avoid even the transient.
    vals = jnp.asarray(vals, dtype=dtype)
    if vals.ndim == 2:
        vals = vals.reshape(-1)
    if col_scale is not None:
        if cols_global is None:
            raise ValueError("col_scale requires cols_global")
        cg = jnp.asarray(cols_global)
        if cg.ndim == 2:
            cg = cg.reshape(-1)
        cs = jnp.concatenate(
            [jnp.asarray(col_scale, dtype=dtype), jnp.ones((1,), dtype)]
        )
        vals = vals * cs[cg]
    vpad = jnp.concatenate([vals, jnp.zeros((qt.K,), dtype)], 0)
    kern = _get_chunk_kernel()
    upad = None  # [nc*cB + 1, u, u+1]: chunk trapezoids + zero sentinel
    rfronts = []
    P_levels = len(qt.tree.levels)
    for p, plan in enumerate(qt.tree.levels):
        cB, nc, chunks, row_chunk = chunk_plans[p]
        if qr_impl == "auto":
            # Per-level hybrid (round-4 N300 lesson): the all-GEMM gram
            # engine factorized N300 9x faster but the TOP fronts carry
            # the tree-concentrated global conditioning — squaring it in
            # the Gram loses the factor entirely (rel_err 7+ vs 2e-3).
            # gram runs the batched lower/mid levels (the XLA batched-QR
            # rate floor lives there); Householder QR keeps the top
            # `auto_top` levels exact.
            level_impl = "gram" if p < P_levels - auto_top else "xla"
        else:
            level_impl = qr_impl
        B, s, f = plan.own.shape[0], plan.s, plan.f
        Rm = qt.rlevels[p].rows_src.shape[1]
        u_prev = 0 if upad is None else upad.shape[1]
        upad_in = upad if upad is not None else jnp.zeros((1, 1, 2), dtype)
        stream = p < offload_levels
        u_next = f - s
        # chunk outputs accumulate via DONATED dynamic_update_slice into
        # preallocated buffers: EVERY TPU concat variant (3-D and
        # flattened 2-D) lowered its inputs through a batch-minor layout
        # copy — lane-padding the small leading dim 8 -> 128, 16x memory
        # ("Unpadded 1.23G Padded 19.70G" compile OOMs at N400/N500).
        # The next level's upad ([nc*cB+1, u, u+1], zero sentinel front
        # + zero inv_pos column) is written directly, so no separate
        # padding pass exists either.
        upad_next = jnp.zeros((nc * cB + 1, u_next, u_next + 1), dtype)
        r11_buf = (
            None if stream else jnp.zeros((nc * cB, s, s), dtype)
        )
        r12_buf = (
            None if stream else jnp.zeros((nc * cB, s, f - s), dtype)
        )
        r11s, r12s = [], []
        for ci, la in enumerate(chunks):
            la_dev = (
                la
                if not isinstance(next(iter(la.values())), np.ndarray)
                else {k: jnp.asarray(v) for k, v in la.items()}
            )
            R11c, R12c, Uc = kern(
                vpad, la_dev, upad_in, (cB, s, f, Rm, u_prev, row_chunk),
                dtype, level_impl,
            )
            upad_next = _dus(upad_next, Uc, ci * cB)
            if stream:
                # stream finished fronts to HOST per chunk (the hosted
                # solves re-upload level by level); only the update
                # chain stays on device
                r11s.append(jax.device_get(R11c))
                r12s.append(jax.device_get(R12c))
            else:
                r11_buf = _dus(r11_buf, R11c, ci * cB)
                r12_buf = _dus(r12_buf, R12c, ci * cB)
        del upad_in
        upad = upad_next
        if stream:
            R11 = np.concatenate(r11s, 0)[:B]
            R12 = np.concatenate(r12s, 0)[:B]
        else:
            R11, R12 = r11_buf[:B], r12_buf[:B]
        rfronts.append((R11, R12))
        if progress_cb is not None:
            jax.block_until_ready(upad)
            progress_cb(p)
    return MFQRFactor(qt, rfronts, dtype, col_scale=col_scale, arrs=arrs)


# ---------------------------------------------------------------------------
# host-dispatched solves: one jitted kernel per LEVEL SHAPE (cached in the
# module-level jit wrappers), python loop over levels. The fully-fused
# solve program unrolls batched_tsolve's panel loops across every level
# and refinement iteration — at N300+ tree sizes its compile time
# explodes; ~2 dispatches/level at the ~26 ms relay floor is cheap.
# ---------------------------------------------------------------------------


def _fwd_level(R11, R12, own, bnd, y):
    rhs = y[own]
    Rl = jnp.swapaxes(R11, 1, 2)
    sol = batched_tsolve_left(Rl, rhs)
    y = y.at[own].set(sol, mode="drop")
    if R12.shape[2]:
        y = y.at[bnd].add(-jnp.swapaxes(R12, 1, 2) @ sol, mode="drop")
    return y.at[y.shape[0] - 1].set(0.0)


def _bwd_level(R11, R12, own, bnd, x):
    rhs = x[own]
    if R12.shape[2]:
        rhs = rhs - R12 @ x[bnd]
    Rl = jnp.swapaxes(R11, 1, 2)
    sol = batched_tsolve_left(Rl, rhs, transpose=True)
    x = x.at[own].set(sol, mode="drop")
    return x.at[x.shape[0] - 1].set(0.0)


_fwd_level_jit = jax.jit(_f32mm(_fwd_level))
_bwd_level_jit = jax.jit(_f32mm(_bwd_level))


def mfqr_solve_hosted(F: MFQRFactor, b):
    """H^{-1} b with per-level dispatch (see header note). Semantically
    identical to F.solve."""
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    k = b.shape[1]
    b = b.astype(F.dtype)
    if F.col_scale is not None:
        b = b * jnp.asarray(F.col_scale, F.dtype)[:, None]
    y = jnp.concatenate([b, jnp.zeros((1, k), F.dtype)])
    own_bnd = []
    for p in range(len(F.rfronts)):
        la = F._level(p)
        own_bnd.append(
            (jnp.asarray(la["own_idx"]), jnp.asarray(la["bnd_idx"]))
        )
    for p, (R11, R12) in enumerate(F.rfronts):
        y = _fwd_level_jit(R11, R12, own_bnd[p][0], own_bnd[p][1], y)
    for p in range(len(F.rfronts) - 1, -1, -1):
        R11, R12 = F.rfronts[p]
        y = _bwd_level_jit(R11, R12, own_bnd[p][0], own_bnd[p][1], y)
    x = y[: F.qt.n]
    if F.col_scale is not None:
        x = x * jnp.asarray(F.col_scale, F.dtype)[:, None]
    return x[:, 0] if squeeze else x


def mfqr_sample_hosted(F: MFQRFactor, key, k: int = 1):
    """R^{-1} z via per-level dispatch (cov H^{-1})."""
    w = jax.random.normal(key, (F.qt.n + 1, k), F.dtype)
    w = w.at[F.qt.n].set(0.0)
    for p in range(len(F.rfronts) - 1, -1, -1):
        R11, R12 = F.rfronts[p]
        la = F._level(p)
        w = _bwd_level_jit(
            R11, R12, jnp.asarray(la["own_idx"]), jnp.asarray(la["bnd_idx"]), w
        )
    x = w[: F.qt.n]
    if F.col_scale is not None:
        x = x * jnp.asarray(F.col_scale, F.dtype)[:, None]
    return x


def _host_qr_level(qt: MFQRTree, p: int):
    plan = qt.tree.levels[p]
    rl = qt.rlevels[p]
    return dict(
        rows_src=np.where(rl.rows_src < 0, qt.n_rows, rl.rows_src),
        rows_pos=rl.rows_pos,
        pad=plan.own < 0,
        child_src=plan.child_src,
        child_parent=plan.child_parent,
        child_pos=plan.child_pos,
        child_slot=rl.child_slot,
        own_idx=np.where(plan.own < 0, qt.n, plan.own),
        bnd_idx=np.where(
            plan.cols[:, plan.s :] < 0, qt.n, plan.cols[:, plan.s :]
        ),
    )


# ---------------------------------------------------------------------------
# selected inversion on the multifrontal tree ("Takahashi on the tree"):
# EXACT marginal variances from the R factor, replacing the 50-sample MC
# estimate (10% relative noise) — VERDICT r3 next #6. Top-down supernodal
# recursion: for each front with own/boundary split [o; b],
#   x_o = R11^{-1} (z_o - R12 x_b),  z_o independent of x_b
#   => Sigma_oo = A A^T + X Sigma_bb X^T,  Sigma_ob = -X Sigma_bb,
#      A = R11^{-1}, X = R11^{-1} R12,
# where Sigma_bb gathers from the parent front's full Sigma via the
# symbolic child_pos map (the extend-add map, reused in reverse). All
# dense work is batched GEMM + blocked TRSM (MXU path); per-level
# dispatch like the hosted solves. Flops ~ sum_B f^3 per level — a small
# multiple of the factorization's front work.
# ---------------------------------------------------------------------------


def _selinv_level(R11, R12, Sbb):
    """One level's Sigma blocks. R11 [B,s,s] upper, R12 [B,s,u],
    Sbb [B,u,u] (parent-gathered; u may be 0). Returns (Sf [B,f,f],
    diag_own [B,s])."""
    from .blocked_factor import blocked_tsolve_left

    B, s, _ = R11.shape
    u = R12.shape[2]
    f = s + u
    L = jnp.swapaxes(R11, -1, -2)  # lower
    eye = jnp.broadcast_to(jnp.eye(s, dtype=R11.dtype), (B, s, s))
    A = blocked_tsolve_left(L, eye, transpose=True)  # R11^{-1}
    Soo = A @ jnp.swapaxes(A, -1, -2)
    Sf = jnp.zeros((B, f, f), R11.dtype)
    if u:
        X = blocked_tsolve_left(L, R12, transpose=True)
        XS = X @ Sbb  # [B,s,u]
        Soo = Soo + XS @ jnp.swapaxes(X, -1, -2)
        Sf = Sf.at[:, :s, s:].set(-XS)
        Sf = Sf.at[:, s:, :s].set(-jnp.swapaxes(XS, -1, -2))
        Sf = Sf.at[:, s:, s:].set(Sbb)
    Sf = Sf.at[:, :s, :s].set(Soo)
    return Sf, jnp.diagonal(Soo, axis1=-2, axis2=-1)


def _selinv_level_diag(R11, R12, Sbb):
    """Leaf-level variant: only diag(Sigma_oo) is consumed (no child
    gathers from leaves), so skip the [B,f,f] Sf allocation —
    diag(Soo) = rowsum(A∘A) + rowsum((X Sbb)∘X). At the 1e6-dof target
    the leaf level is the largest batch; materializing leaf Sf there is
    multi-GB of HBM for values nothing reads (ADVICE r4)."""
    from .blocked_factor import blocked_tsolve_left

    B, s, _ = R11.shape
    u = R12.shape[2]
    L = jnp.swapaxes(R11, -1, -2)  # lower
    eye = jnp.broadcast_to(jnp.eye(s, dtype=R11.dtype), (B, s, s))
    A = blocked_tsolve_left(L, eye, transpose=True)  # R11^{-1}
    diag = jnp.sum(A * A, axis=-1)
    if u:
        X = blocked_tsolve_left(L, R12, transpose=True)
        diag = diag + jnp.sum((X @ Sbb) * X, axis=-1)
    return diag


def _selinv_gather(Sf_par, parent_of, pos):
    """Child boundary Sigma_bb [Bc,u,u] from the parent level's full
    fronts [Bp,fp,fp]; pos == fp marks padded slots (zeroed via the pad
    row/col)."""
    fp = Sf_par.shape[-1]
    Sp = jnp.pad(Sf_par, ((0, 0), (0, 1), (0, 1)))
    return Sp[
        parent_of[:, None, None], pos[:, :, None], pos[:, None, :]
    ]


def _selinv_scatter(out, own_idx, diag):
    return out.at[own_idx].set(diag, mode="drop")


_selinv_level_jit = jax.jit(_f32mm(_selinv_level))
_selinv_level_diag_jit = jax.jit(_f32mm(_selinv_level_diag))
_selinv_gather_jit = jax.jit(_f32mm(_selinv_gather))
_selinv_scatter_jit = jax.jit(_selinv_scatter)


def mfqr_variance_selected(F: MFQRFactor):
    """diag(H^{-1}) exactly, by selected inversion over the front tree
    (per-level dispatch; one jit per level shape). With col_scale cs the
    factored system is diag(cs) H diag(cs), so variances rescale by
    cs^2."""
    qt = F.qt
    P = len(F.rfronts)
    out = jnp.zeros((qt.n + 1,), F.dtype)
    Sf_par = None
    for p in range(P - 1, -1, -1):
        R11 = jnp.asarray(F.rfronts[p][0])
        R12 = jnp.asarray(F.rfronts[p][1])
        B, s, u = R11.shape[0], R11.shape[1], F.rfronts[p][1].shape[2]
        if u and p < P - 1:
            pplan = qt.tree.levels[p + 1]
            parent_of = np.zeros((B,), np.int64)
            pos = np.full((B, u), qt.tree.levels[p + 1].f, np.int64)
            cs_idx = np.asarray(pplan.child_src)
            parent_of[cs_idx] = np.asarray(pplan.child_parent)
            cp = np.asarray(pplan.child_pos)[:, :u]
            pos[cs_idx] = np.minimum(cp, pplan.f)
            Sbb = _selinv_gather_jit(
                Sf_par,
                jnp.asarray(parent_of, jnp.int32),
                jnp.asarray(pos, jnp.int32),
            )
        else:
            Sbb = jnp.zeros((B, u, u), F.dtype)
        if p == 0:
            diag = _selinv_level_diag_jit(R11, R12, Sbb)
        else:
            Sf_par, diag = _selinv_level_jit(R11, R12, Sbb)
        la = F._level(p)
        out = _selinv_scatter_jit(out, jnp.asarray(la["own_idx"]), diag)
    var = out[: qt.n]
    if F.col_scale is not None:
        cs = jnp.asarray(F.col_scale, F.dtype)
        var = var * cs * cs
    return var
