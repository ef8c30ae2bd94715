"""Level-batched multifrontal Cholesky on geometric nested dissection.

The banded/BTD sweep factors the 2D spatial precision in O(n * bw^2) with
bw ~ 6 sqrt(n); recursive nested dissection needs 5-8x fewer flops on the
production Q structure (experiments/analysis/nd_flops.py) but its many
small fronts run two orders of magnitude below MXU rate through XLA's
serial cholesky expander (experiments/probe_front_rates.py). This module
is the TPU-shaped answer (ROADMAP "Open" item 0, the BASELINE.md
<1 s @ 1e6-dof north-star direction):

- **symbolic phase (host, numpy)**: geometric recursive bisection of the
  dof coordinates into a balanced binary dissection tree (separator =
  coupling-width strip, exactness VERIFIED against the matrix graph —
  a leaked left-right edge raises), then per-node fronts
  (own pivots + boundary columns) padded to uniform shapes PER LEVEL;
- **numeric phase (jit)**: one batched kernel launch per tree level —
  gather H's arrowhead rows, extend-add both children's update matrices,
  factor the pivot block with `ops.batched_factor.batched_cholesky`
  (unrolled-Crout base + GEMM panels), batched GEMM Schur update. All
  O(front^3) work beyond 16x16 diagonal blocks rides the MXU, and every
  front of a level factors simultaneously.

Solves walk the same tree (bottom-up forward, top-down backward) with
batched gathers/scatters against the global vector; log-det falls out of
the pivot diagonals (padding pivots are identity => log 1 = 0).

Replaces (for the spatial/elliptic case) what the reference reaches
through CHOLMOD's supernodal factorization with a fill-reducing
permutation (`/root/reference/src/tridiagonal_cholesky.jl:20,39`,
`scripts/darcy/solve_darcy_fem.jl:93`): same math, but the supernodes
are level-batched dense fronts sized for the MXU instead of pointer-
chasing sparse kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .batched_factor import (
    batched_cholesky,
    batched_tsolve_left,
    batched_tsolve_right_T,
)
from .blocked_factor import (
    blocked_cholesky,
    blocked_tsolve_left,
    blocked_tsolve_right_T,
)

# Levels with few, large fronts (tree top) use the XLA-panel blocked
# kernels: their [panel, panel] monolithic chol/TRSM are fine at batch
# ~1-4 and avoid the unrolled-Crout kernels' trace-size blowup at
# front widths in the thousands. Levels with many small fronts (tree
# bottom) need the batch-parallel unrolled kernels — XLA's expanders
# do not vectorize over the batch (probe_front_rates.py).
_SMALL_BATCH = 4


def _chol(F11):
    if F11.shape[0] <= _SMALL_BATCH and F11.shape[-1] > 256:
        return blocked_cholesky(F11, panel=256)
    return batched_cholesky(F11)


def _tsolve_right_T(L, B):
    if L.shape[0] <= _SMALL_BATCH and L.shape[-1] > 256:
        return blocked_tsolve_right_T(L, B, panel=256)
    return batched_tsolve_right_T(L, B)


def _tsolve_left(L, B, transpose=False):
    if L.shape[0] <= _SMALL_BATCH and L.shape[-1] > 256:
        return blocked_tsolve_left(L, B, panel=256, transpose=transpose)
    return batched_tsolve_left(L, B, transpose=transpose)


# ---------------------------------------------------------------------------
# symbolic phase (host / numpy)
# ---------------------------------------------------------------------------


@dataclass(eq=False)
class _Node:
    dofs: np.ndarray          # own (pivot) dofs, eliminated at this node
    level: int                # tree depth (root = 0)
    parent: int               # node id of parent (-1 for root)
    bound: np.ndarray = field(default=None)  # boundary columns (global ids)


@dataclass(eq=False)
class LevelPlan:
    """Static index plan for one tree level (all fronts batched)."""

    node_ids: np.ndarray      # [B] symbolic node ids
    s: int                    # padded pivot count
    f: int                    # padded front width (>= s)
    own: np.ndarray           # [B, s] global dof ids, -1 padding
    cols: np.ndarray          # [B, f] global column ids, -1 padding;
                              # cols[:, :s] == own (with gaps), boundary
                              # columns start at position s exactly so the
                              # Schur update block F22 aligns with cols[s:]
    h_pos: np.ndarray         # [B, s, f] index into H.data, -1 -> 0.0
    # extend-add: children (from the plan below) scattering into this one
    child_src: np.ndarray     # [C] index of child within the plan below
    child_parent: np.ndarray  # [C] index of parent within this plan
    child_pos: np.ndarray     # [C, u] position of child update col in
                              # parent front (0..f), f -> dropped padding;
                              # u == (plan below).f - (plan below).s
    child_u: int              # padded child update width


@dataclass(eq=False)
class FrontTree:
    n: int
    levels: list[LevelPlan]   # deepest (leaves) first
    perm: np.ndarray          # elimination order (concatenated own dofs)


def _host_cpu():
    """XLA-CPU device for host-side symbolic computations (this VM's
    numpy lacks SIMD; compiled loops are 20-100x faster — see
    models/matern.host_mass_stiffness)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def suggest_cut_width(H, coords, margin: float = 1.10):
    """Physical coupling range of H along either axis (max |coord_i -
    coord_j| over nonzeros), times a safety margin — a separator strip of
    this width fully disconnects the two sides."""
    coo = H.tocoo()
    c = np.asarray(coords, dtype=np.float64)
    cpu = _host_cpu()
    # The jit path silently downcasts f64 coords when x64 is off, which
    # could shift an exactly-marginal cut width past the 1.10 margin;
    # only take it when f64 survives the trace.
    if cpu is not None and jax.config.jax_enable_x64:
        with jax.default_device(cpu):
            d = float(
                jax.jit(lambda c, r, l: jnp.abs(c[r] - c[l]).max())(
                    c, coo.row, coo.col
                )
            )
    else:
        d = np.abs(c[coo.row] - c[coo.col]).max()
    return float(d) * margin


def _full_m1(shape):
    """np.full(shape, -1, int64) via a byte fill — this host's int64
    scalar-store loop runs at ~20 MB/s (no SIMD); filling the same
    buffer with 0xff bytes (== -1 in two's complement) is ~80x faster."""
    a = np.empty(shape, np.int64)
    a.view(np.uint8).fill(255)
    return a


def _row_cat(indptr, indices, rows):
    """Concatenated column indices of CSR `rows` (vectorized gather)."""
    lens = indptr[rows + 1] - indptr[rows]
    tot = int(lens.sum())
    if tot == 0:
        return indices[:0]
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = np.repeat(indptr[rows] - offs, lens) + np.arange(tot)
    return indices[idx]


def _build_tree(coords, cut_width, leaf_target, indptr, indices):
    """Recursive geometric bisection; separators verified against the
    matrix graph (any left<->right edge raises ValueError)."""
    nodes: list[_Node] = []
    in_right = np.zeros(coords.shape[0], dtype=bool)  # reused scratch

    def rec(ids, axis, depth, parent):
        if len(ids) <= leaf_target:
            nodes.append(_Node(dofs=ids, level=depth, parent=parent))
            return
        c = coords[ids, axis]
        mid = np.median(c)
        half = cut_width / 2
        sep = ids[np.abs(c - mid) <= half]
        left = ids[c < mid - half]
        right = ids[c > mid + half]
        if len(sep) == 0 or len(left) == 0 or len(right) == 0:
            nodes.append(_Node(dofs=ids, level=depth, parent=parent))
            return
        # verify exact separation on the matrix graph (vectorized: any
        # nonzero of H[left, right] means the strip failed to separate)
        in_right[right] = True
        flat = _row_cat(indptr, indices, left)
        leak = in_right[flat]
        if leak.any():
            lens = indptr[left + 1] - indptr[left]
            bad = int(np.repeat(left, lens)[leak][0])
            in_right[right] = False
            raise ValueError(
                "geometric separator leaks: increase cut_width "
                f"(row {bad} couples across the cut)"
            )
        in_right[right] = False
        me = len(nodes)
        nodes.append(_Node(dofs=sep, level=depth, parent=parent))
        rec(left, 1 - axis, depth + 1, me)
        rec(right, 1 - axis, depth + 1, me)

    rec(np.arange(coords.shape[0]), 0, 0, -1)
    return nodes


def _f32mm(fn):
    """Pin true-f32 matmuls (TPU default f32 matmul = bf16 passes; see
    ops/mf_qr.py round-5 chip finding — unpinned GEMM kernels produced
    5.1e+03-class residuals on chip while exact-f32 CPU tests passed)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)

    return wrapped


def symbolic_multifrontal(
    H, coords, cut_width, leaf_target: int = 128, with_h_pos: bool = True
) -> FrontTree:
    """Symbolic analysis of SPD H (scipy CSR) with dof coordinates.

    cut_width: physical separator strip width — must cover H's coupling
    range (verified; raises if the strip fails to separate).

    with_h_pos: build the [B, s, f] H-gather index maps (needed by the
    Cholesky numeric phase). The QR form (`ops/mf_qr`) reads its values
    from operand rows instead and only needs the tree/front structure —
    passing False skips the dominant symbolic cost.
    """
    H = H.tocsr()
    H.sort_indices()
    n = H.shape[0]
    nodes = _build_tree(
        np.asarray(coords, dtype=np.float64),
        float(cut_width),
        int(leaf_target),
        H.indptr,
        H.indices,
    )

    # boundary columns: struct(H[own, :]) restricted to not-yet-eliminated
    # dofs = ancestors' own dofs, UNION the children's boundaries minus
    # own (update columns must live in the parent's front). Walk leaves
    # up so children are resolved first. Vectorized via an owner-node
    # labeling: c is an ancestor-own dof of node i iff owner[c] lies on
    # i's parent chain.
    order = sorted(range(len(nodes)), key=lambda i: -nodes[i].level)
    children: dict[int, list[int]] = {}
    for i, nd in enumerate(nodes):
        children.setdefault(nd.parent, []).append(i)
        if nd.dofs.size > 1 and not (np.diff(nd.dofs) > 0).all():
            raise AssertionError(
                f"node {i} own dofs not ascending — bisection subsets "
                "must preserve id order"
            )

    owner = np.empty(n, dtype=np.int64)
    for i, nd in enumerate(nodes):
        owner[nd.dofs] = i

    own_mask = np.zeros(n, dtype=bool)  # reused scratch
    for i in order:
        nd = nodes[i]
        is_anc = np.zeros(len(nodes), dtype=bool)
        p = nd.parent
        while p >= 0:
            is_anc[p] = True
            p = nodes[p].parent
        flat = _row_cat(H.indptr, H.indices, nd.dofs)
        parts = [flat[is_anc[owner[flat]]].astype(np.int64)]
        ch = children.get(i, [])
        if ch:
            own_mask[nd.dofs] = True
            for c_id in ch:
                cb = nodes[c_id].bound
                parts.append(cb[~own_mask[cb]])
            own_mask[nd.dofs] = False
        nd.bound = np.unique(np.concatenate(parts))

    # sanity: child boundary must be inside parent's own+boundary
    for i, nd in enumerate(nodes):
        if nd.parent >= 0:
            p = nodes[nd.parent]
            missing = np.setdiff1d(
                nd.bound, np.concatenate([p.dofs, p.bound])
            )
            if missing.size:
                raise AssertionError(
                    f"update column {missing[:3].tolist()} of node {i} "
                    "escapes its parent front — tree construction bug"
                )

    # level plans, deepest first. NOTE on the layout: a node with k own
    # dofs and m boundary columns in a level padded to (s, f) stores own
    # in positions [0, k) (positions [k, s) are identity padding pivots)
    # and boundary in positions [s, s+m) — boundary ALWAYS starts at s so
    # the Schur complement block F22 = F[s:, s:] lines up with cols[s:]
    # across the whole batch.
    max_level = max(nd.level for nd in nodes)
    levels = []
    for lev in range(max_level, -1, -1):
        ids = np.array(
            [i for i, nd in enumerate(nodes) if nd.level == lev], dtype=np.int64
        )
        s = max(len(nodes[i].dofs) for i in ids)
        f = s + max(len(nodes[i].bound) for i in ids)
        B = len(ids)
        own = _full_m1((B, s))
        cols = _full_m1((B, f))
        for b, i in enumerate(ids):
            nd = nodes[i]
            k, m = len(nd.dofs), len(nd.bound)
            own[b, :k] = nd.dofs
            cols[b, :k] = nd.dofs
            cols[b, s : s + m] = nd.bound
        # gather positions of H[own, front cols]. SPARSE formulation:
        # walk each node's nnz CSR entries once and scatter every entry
        # into its front slot (front position = searchsorted rank in the
        # ascending own/bound lists) — O(nnz) work per level instead of
        # the O(B s f) dense-front query grid.
        h_pos = _full_m1((B, s, f) if with_h_pos else (B, 0, 0))
        for b, i in enumerate(ids if with_h_pos else ()):
            nd = nodes[i]
            k = len(nd.dofs)
            lens = H.indptr[nd.dofs + 1] - H.indptr[nd.dofs]
            tot = int(lens.sum())
            if tot == 0:
                continue
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            csr_p = np.repeat(H.indptr[nd.dofs] - offs, lens) + np.arange(tot)
            fc = H.indices[csr_p]
            row_r = np.repeat(np.arange(k), lens)
            jo = np.searchsorted(nd.dofs, fc)
            joc = np.minimum(jo, k - 1)
            in_own = nd.dofs[joc] == fc
            nb = len(nd.bound)
            if nb:
                jb = np.searchsorted(nd.bound, fc)
                jbc = np.minimum(jb, nb - 1)
                in_bnd = nd.bound[jbc] == fc
            else:
                jbc = np.zeros(tot, dtype=np.int64)
                in_bnd = np.zeros(tot, dtype=bool)
            fpos = np.where(in_own, joc, np.where(in_bnd, s + jbc, -1))
            keep = fpos >= 0
            h_pos[b, row_r[keep], fpos[keep]] = csr_p[keep]
        levels.append(
            LevelPlan(
                node_ids=ids, s=s, f=f, own=own, cols=cols, h_pos=h_pos,
                child_src=np.zeros((0,), np.int64),
                child_parent=np.zeros((0,), np.int64),
                child_pos=np.zeros((0, 0), np.int64), child_u=0,
            )
        )

    # child -> parent extend-add maps. Plans are deepest-first, so plan
    # p's children sit in plan p-1; a child's update matrix U covers its
    # padded boundary positions cols[s_c:] (width u = f_c - s_c).
    for p in range(1, len(levels)):
        plan = levels[p]
        prev = levels[p - 1]
        id_to_b = {int(i): b for b, i in enumerate(plan.node_ids)}
        u = prev.f - prev.s
        entries = []
        for b_c, i in enumerate(prev.node_ids):
            nd = nodes[int(i)]
            if nd.parent < 0:
                continue
            pb = id_to_b[nd.parent]
            pnode = nodes[nd.parent]
            pos = np.full((u,), plan.f, dtype=np.int64)
            cb = nd.bound
            if cb.size:
                # own and bound are ascending, so the front position of
                # a column is its searchsorted rank (own first, then
                # boundary at offset s); membership was sanity-checked
                po, pbd = pnode.dofs, pnode.bound
                jo = np.searchsorted(po, cb)
                joc = np.clip(jo, 0, max(len(po) - 1, 0))
                in_own = (po[joc] == cb) if len(po) else np.zeros(cb.shape, bool)
                jb = np.searchsorted(pbd, cb)
                if len(pbd):
                    in_bound = pbd[np.clip(jb, 0, len(pbd) - 1)] == cb
                else:
                    in_bound = np.zeros(cb.shape, bool)
                # a column absent from both parent's own and bound would
                # silently land at a wrong front position; keep the old
                # dict-lookup KeyError behavior as an assertion
                assert bool((in_own | in_bound).all()), (
                    "child boundary column missing from parent front"
                )
                pos[: cb.size] = np.where(in_own, joc, plan.s + jb)
            entries.append((b_c, pb, pos))
        plan.child_src = np.array([x[0] for x in entries], dtype=np.int64)
        plan.child_parent = np.array([x[1] for x in entries], dtype=np.int64)
        plan.child_pos = (
            np.stack([x[2] for x in entries])
            if entries
            else np.zeros((0, u), np.int64)
        )
        plan.child_u = u

    perm = np.concatenate(
        [nodes[int(i)].dofs for plan in levels for i in plan.node_ids]
    )
    return FrontTree(n=n, levels=levels, perm=perm)


# ---------------------------------------------------------------------------
# numeric phase (jit-compatible; plans enter as static pytrees of arrays)
# ---------------------------------------------------------------------------


def tree_device_arrays(tree: FrontTree, nnz: int):
    """Per-level plan arrays as device arrays, to thread through jit
    SIGNATURES instead of baking them into the HLO as constants (the
    relay rejects >~100 MB compile requests — docs/RELAY_FAULT_REPORT;
    large trees put 100s of MB of h_pos gather indices in the program).

    All padding indices are pre-mapped to in-range sentinels (h_pos -1 ->
    nnz, the appended zero slot; dof -1 -> n, the scratch slot), because
    traced gathers must not rely on negative-index normalization.
    """
    arrs = []
    for p in tree.levels:
        arrs.append(
            dict(
                h_pos=jnp.asarray(np.where(p.h_pos < 0, nnz, p.h_pos)),
                pad=jnp.asarray(p.own < 0),
                child_src=jnp.asarray(p.child_src),
                child_parent=jnp.asarray(p.child_parent),
                child_pos=jnp.asarray(p.child_pos),
                own_idx=jnp.asarray(np.where(p.own < 0, tree.n, p.own)),
                bnd_idx=jnp.asarray(
                    np.where(p.cols[:, p.s :] < 0, tree.n, p.cols[:, p.s :])
                ),
            )
        )
    return arrs


def _host_level_arrays(tree: FrontTree, nnz: int, p: int):
    """Numpy equivalent of tree_device_arrays[p] (constant-folded path)."""
    plan = tree.levels[p]
    return dict(
        h_pos=np.where(plan.h_pos < 0, nnz, plan.h_pos),
        pad=plan.own < 0,
        child_src=plan.child_src,
        child_parent=plan.child_parent,
        child_pos=plan.child_pos,
        own_idx=np.where(plan.own < 0, tree.n, plan.own),
        bnd_idx=np.where(
            plan.cols[:, plan.s :] < 0, tree.n, plan.cols[:, plan.s :]
        ),
    )


@jax.tree_util.register_pytree_node_class
class MultifrontalFactor:
    """Per-level factored fronts: L11 [B,s,s], L21 [B,f-s,s] + plans."""

    def __init__(self, tree: FrontTree, lfronts, dtype, arrs=None):
        self.tree = tree
        self.lfronts = lfronts  # list of (L11, L21)
        self.dtype = dtype
        self.arrs = arrs  # optional device plan arrays (jit-threaded)

    def tree_flatten(self):
        return (self.lfronts, self.arrs), (self.tree, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1], arrs=children[1])

    def _level(self, p: int):
        if self.arrs is not None:
            return self.arrs[p]
        nnz = None  # h_pos unused on the query paths
        plan = self.tree.levels[p]
        return dict(
            own_idx=np.where(plan.own < 0, self.tree.n, plan.own),
            bnd_idx=np.where(
                plan.cols[:, plan.s :] < 0,
                self.tree.n,
                plan.cols[:, plan.s :],
            ),
        )

    # -- factor ------------------------------------------------------------

    @staticmethod
    @_f32mm
    def factorize(tree: FrontTree, h_data, dtype=None, arrs=None):
        """Numeric factorization from H's CSR value array (any instance
        with the symbolic structure).

        arrs: optional `tree_device_arrays(tree, len(h_data))` passed
        through the caller's jit signature — REQUIRED for large trees on
        the relay (plan constants otherwise inflate the HLO past the
        compile-request limit).
        """
        h_data = jnp.asarray(h_data)
        if dtype is not None:
            h_data = h_data.astype(dtype)
        dtype = h_data.dtype
        nnz = h_data.shape[0]
        hd = jnp.concatenate([h_data, jnp.zeros((1,), dtype)])  # pad -> 0
        updates = None  # (U [C, u, u]) from the level below
        lfronts = []
        for p, plan in enumerate(tree.levels):
            la = arrs[p] if arrs is not None else _host_level_arrays(tree, nnz, p)
            B, s, f = plan.own.shape[0], plan.s, plan.f
            arrow = hd[la["h_pos"]]  # [B, s, f]
            F = jnp.zeros((B, f, f), dtype)
            F = F.at[:, :s, :].set(arrow)
            F = F.at[:, s:, :s].set(jnp.swapaxes(arrow[:, :, s:], 1, 2))
            # identity padding pivots (own == -1)
            F = F.at[:, jnp.arange(s), jnp.arange(s)].add(
                jnp.where(la["pad"], 1.0, 0.0).astype(dtype)
            )
            if updates is not None and plan.child_parent.shape[0]:
                U = updates[la["child_src"]]  # [C, u, u]
                pos = jnp.asarray(la["child_pos"])  # [C, u] -> 0..f or f
                Fpad = jnp.zeros((B, f + 1, f + 1), dtype)
                ii = pos[:, :, None]
                jj = pos[:, None, :]
                bb = jnp.asarray(la["child_parent"])[:, None, None]
                Fpad = Fpad.at[
                    jnp.broadcast_to(bb, U.shape),
                    jnp.broadcast_to(ii, U.shape),
                    jnp.broadcast_to(jj, U.shape),
                ].add(U)
                F = F + Fpad[:, :f, :f]
            F11 = F[:, :s, :s]
            L11 = _chol(F11)
            if f > s:
                L21 = _tsolve_right_T(L11, F[:, s:, :s])
                # update matrix = F22 - L21 L21^T: F22 carries the
                # extend-added grandchildren contributions between THIS
                # node's boundary columns, which belong to higher
                # ancestors — dropping it loses their updates
                updates = F[:, s:, s:] - L21 @ jnp.swapaxes(L21, 1, 2)
            else:
                L21 = jnp.zeros((B, 0, s), dtype)
                updates = jnp.zeros((B, 0, 0), dtype)
            lfronts.append((L11, L21))
        return MultifrontalFactor(tree, lfronts, dtype, arrs=arrs)

    # -- queries -----------------------------------------------------------

    def log_det(self):
        """log det H (padding pivots contribute log 1 = 0)."""
        tot = 0.0
        for L11, _ in self.lfronts:
            d = jnp.diagonal(L11, axis1=-2, axis2=-1)
            tot = tot + 2.0 * jnp.sum(jnp.log(d))
        return tot

    @_f32mm
    def solve(self, b):
        """H^{-1} b for b [n] or [n, k] via the front tree."""
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        k = b.shape[1]
        dtype = self.dtype
        y = jnp.concatenate(
            [b.astype(dtype), jnp.zeros((1, k), dtype)]
        )  # slot n: padding accumulator
        # forward: L y' = b, bottom-up
        for p, (L11, L21) in enumerate(self.lfronts):
            la = self._level(p)
            own = jnp.asarray(la["own_idx"])
            cols_b = jnp.asarray(la["bnd_idx"])
            rhs = y[own]  # [B, s, k]
            sol = _tsolve_left(L11, rhs)  # [B, s, k]
            y = y.at[own].set(sol, mode="drop")
            if L21.shape[1]:
                upd = L21 @ sol  # [B, f-s, k]
                y = y.at[cols_b].add(-upd, mode="drop")
            y = y.at[self.tree.n].set(0.0)
        # backward: L^T x = y', top-down
        x = y
        for p in range(len(self.lfronts) - 1, -1, -1):
            L11, L21 = self.lfronts[p]
            la = self._level(p)
            own = jnp.asarray(la["own_idx"])
            cols_b = jnp.asarray(la["bnd_idx"])
            rhs = x[own]
            if L21.shape[1]:
                rhs = rhs - jnp.swapaxes(L21, 1, 2) @ x[cols_b]
            sol = _tsolve_left(L11, rhs, transpose=True)
            x = x.at[own].set(sol, mode="drop")
            x = x.at[self.tree.n].set(0.0)
        x = x[: self.tree.n]
        return x[:, 0] if squeeze else x

    @_f32mm
    def sample_zero_mean(self, key, k: int = 1):
        """Draw z with cov H^{-1}: solve L^T x = w, w ~ N(0, I) (padding
        pivots are identity and their slots are dropped)."""
        w = jax.random.normal(key, (self.tree.n + 1, k), self.dtype)
        x = w.at[self.tree.n].set(0.0)
        for p in range(len(self.lfronts) - 1, -1, -1):
            L11, L21 = self.lfronts[p]
            la = self._level(p)
            own = jnp.asarray(la["own_idx"])
            cols_b = jnp.asarray(la["bnd_idx"])
            rhs = x[own]
            if L21.shape[1]:
                rhs = rhs - jnp.swapaxes(L21, 1, 2) @ x[cols_b]
            sol = _tsolve_left(L11, rhs, transpose=True)
            x = x.at[own].set(sol, mode="drop")
            x = x.at[self.tree.n].set(0.0)
        return x[: self.tree.n]
