"""Structured sparse operators: static column structure, traced values.

`RowOp` is the framework's universal observation/evaluation operator format:
each row has a fixed (static, NumPy) set of at most K column indices and a
traced JAX value vector. This covers everything the reference builds with
sparse matrices on the observation side:

* `evaluation_matrix(disc, points)` — basis evaluation at arbitrary points
  (SURVEY.md §2.3; `/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:83`)
* `derivative_matrices` / `second_derivative_matrices` — collocation
  operators (`scripts/darcy/solve_darcy_gmrf-collocation.jl:107`)
* FEM system rows (Darcy G, Burgers Jacobians) via `CellOp.to_rowop()`
* `spatial_to_spatiotemporal` — block-column placement into the space-time
  dof vector (`scripts/burgers/solve_burgers_gmrf-fem.jl:115`)

Because structure is static, A^T A lands in the precision's block-tridiagonal
storage through one precomputed scatter (`BTDPattern`), and per-instance /
per-Newton-step value updates jit-compile with zero host work.

Padding convention: unused slots carry column 0 and value 0 (they contribute
nothing to matvec/scatter).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.btd import BTD, BTDPattern, make_btd_pattern
from diffeqgmrfs_tpu.fem.reference_elements import shape_at


@jax.tree_util.register_pytree_node_class
@dataclass
class RowOp:
    """Row-sparse operator: A[r, cols[r, k]] = vals[r, k].

    `cols` is host NumPy (int32) while the operator is being *built* —
    structure manipulations (stacking, space-time placement, A^T A patterns,
    constraint condensation) happen host-side. It is a pytree LEAF, so a
    RowOp passed through a jit signature carries its columns as a proper
    argument (production operators have 1e6-1e8 column indices; inlining
    them as closure constants bloats the HLO past remote-compile limits).
    Traced methods (matvec/rmatvec/scaling/ata_values) work either way.
    """

    cols: np.ndarray  # [n_rows, K] int32 (host) or traced array
    vals: jnp.ndarray  # [n_rows, K], traced
    n_cols: int

    def __post_init__(self):
        if isinstance(self.cols, np.ndarray) and self.cols.dtype != np.int32:
            self.cols = self.cols.astype(np.int32)

    def tree_flatten(self):
        return (self.cols, self.vals), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.cols, obj.vals, obj.n_cols = children[0], children[1], aux[0]
        return obj

    @property
    def n_rows(self):
        return self.cols.shape[0]

    @property
    def K(self):
        return self.cols.shape[1]

    def astype(self, dtype):
        return RowOp(self.cols, self.vals.astype(dtype), self.n_cols)

    # -- algebra -------------------------------------------------------------

    def matvec(self, x):
        """A @ x, x [..., n_cols] -> [..., n_rows]."""
        x = jnp.asarray(x)
        return jnp.einsum("rk,...rk->...r", self.vals, x[..., self.cols])

    def rmatvec(self, y):
        """A^T @ y, y [..., n_rows] -> [..., n_cols] (batched).

        Accumulates in the promoted dtype: an f64 y against f32 vals must
        NOT be downcast by the scatter-add buffer (the f64-Krylov PCG path
        applies H through this with f32 operator values)."""
        y = jnp.asarray(y)
        contrib = self.vals * y[..., :, None]  # [..., n_rows, K]
        out = jnp.zeros(y.shape[:-1] + (self.n_cols,), dtype=contrib.dtype)
        cols = jnp.asarray(self.cols).reshape(-1)
        return out.at[..., cols].add(
            contrib.reshape(*contrib.shape[:-2], -1)
        )

    @classmethod
    def from_csr(cls, M, dtype=None) -> "RowOp":
        """Symmetric/general scipy CSR -> padded-row (ELL) RowOp.

        The compact f64 representation of a sparse precision for OPERATOR
        application (refinement residuals, sqmahal, RBMC probes): ~nnz
        storage instead of the block-dense BTD (which at production Darcy
        sizes is the difference between ~0.5 GB and ~11 GB resident)."""
        M = M.tocsr()
        n_rows, n_cols = M.shape
        counts = np.diff(M.indptr)
        K = int(counts.max()) if n_rows else 0
        nnz = len(M.data)
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        from jax._src import core as _core

        if cpu is not None and _core.trace_state_clean() and 0 < nnz < 2**31:
            # fused XLA-CPU ELL fill — this host's numpy repeat/fancy
            # assignment are ~50x slower than the compiled loop at
            # production nnz (~35M at Darcy N300)
            def kernel(indices, data, indptr):
                marks = jnp.zeros((nnz,), jnp.int32).at[indptr[1:-1]].add(
                    1, mode="drop"
                )
                r = jnp.cumsum(marks)
                k = jnp.arange(nnz, dtype=jnp.int32) - indptr[r]
                cols = (
                    jnp.zeros((n_rows, K), jnp.int32)
                    .at[r, k]
                    .set(indices.astype(jnp.int32))
                )
                vals = jnp.zeros((n_rows, K), data.dtype).at[r, k].set(data)
                return cols, vals

            with jax.default_device(cpu):
                cols, vals = jax.jit(kernel)(
                    M.indices, M.data, M.indptr.astype(np.int32)
                )
            cols = np.asarray(cols)
            vals = np.asarray(vals)
        else:
            cols = np.zeros((n_rows, K), dtype=np.int32)
            vals = np.zeros((n_rows, K), dtype=np.asarray(M.data).dtype)
            r = np.repeat(np.arange(n_rows), counts)
            k = np.arange(nnz) - np.repeat(M.indptr[:-1], counts)
            cols[r, k] = M.indices
            vals[r, k] = M.data
        v = jnp.asarray(vals, dtype=dtype) if dtype else jnp.asarray(vals)
        return cls(cols, v, n_cols)

    def scale_rows(self, s):
        return RowOp(self.cols, self.vals * jnp.asarray(s)[:, None], self.n_cols)

    def scale(self, s):
        return RowOp(self.cols, self.vals * s, self.n_cols)

    def __add__(self, other: "RowOp") -> "RowOp":
        """Row-wise sum (operators must have equal row counts)."""
        assert self.n_rows == other.n_rows and self.n_cols == other.n_cols
        return RowOp(
            np.concatenate([self.cols, other.cols], axis=1),
            jnp.concatenate([self.vals, other.vals], axis=1),
            self.n_cols,
        )

    def __sub__(self, other: "RowOp") -> "RowOp":
        return self + other.scale(-1.0)

    def zero_rows(self, rows: np.ndarray) -> "RowOp":
        """Zero out the given rows (reference zeroes prescribed test rows,
        `src/problems/burgers.jl:54-57`)."""
        mask = np.ones(self.n_rows)
        mask[np.asarray(rows)] = 0.0
        return self.scale_rows(jnp.asarray(mask))

    def ata_structure(self):
        """Static COO structure of A^T A: (rows, cols) of size n_rows*K*K."""
        r = np.repeat(self.cols[:, :, None], self.K, axis=2)
        c = np.repeat(self.cols[:, None, :], self.K, axis=1)
        return r.reshape(-1), c.reshape(-1)

    def ata_values(self):
        """Traced COO values matching `ata_structure` (optionally weighted)."""
        v = self.vals[:, :, None] * self.vals[:, None, :]
        return v.reshape(-1)

    def ata_pattern(self, bs: int | None = None) -> BTDPattern:
        r, c = self.ata_structure()
        return make_btd_pattern(r, c, self.n_cols, bs=bs)

    def to_dense(self):
        A = jnp.zeros((self.n_rows, self.n_cols), dtype=self.vals.dtype)
        rows = np.repeat(np.arange(self.n_rows), self.K)
        return A.at[rows, self.cols.reshape(-1)].add(self.vals.reshape(-1))

    def to_csr_host(self):
        """Host scipy CSR (values must be concrete, not tracers)."""
        import scipy.sparse as _sp

        rows = np.repeat(np.arange(self.n_rows), self.K)
        M = _sp.coo_matrix(
            (np.asarray(self.vals).reshape(-1),
             (rows, np.asarray(self.cols).reshape(-1))),
            shape=(self.n_rows, self.n_cols),
        ).tocsr()
        M.sum_duplicates()
        return M

    # -- constraints ---------------------------------------------------------

    def condense(self, ch):
        """A -> A S (restrict columns to free dofs through the affine
        embedding x_full = S x_free + g). The matching target shift is
        `y - self.matvec(ch.g)` — the reference's `constrainify_linear_system`
        (`scripts/solve_burger.jl:120-123`)."""
        new_cols, fac = ch.condense_rows_structure(self.cols)
        return RowOp(new_cols, self.vals * jnp.asarray(fac), ch.n_free)


def vstack_rowops(ops: list[RowOp]) -> RowOp:
    """Stack operators vertically (reference `vcat` of observation blocks)."""
    n_cols = ops[0].n_cols
    K = max(op.K for op in ops)
    cols, vals = [], []
    for op in ops:
        assert op.n_cols == n_cols
        pad = K - op.K
        # pad with each row's first column (zero-valued) so padded A^T A
        # pairs stay inside the band
        c = np.concatenate(
            [op.cols, np.repeat(op.cols[:, :1], pad, axis=1)], axis=1
        )
        v = jnp.pad(op.vals, ((0, 0), (0, pad)))
        cols.append(c)
        vals.append(v)
    return RowOp(np.concatenate(cols, axis=0), jnp.concatenate(vals, axis=0), n_cols)


def spatial_to_spatiotemporal(A: RowOp, t_idx: int, N_t: int) -> RowOp:
    """Embed a spatial operator at time slot t_idx (0-based) of the
    space-time dof vector (dof layout: time-major, x[t*N_s + s]).

    Analog of the reference's `spatial_to_spatiotemporal(A, t, N_t)` (1-based
    there; `scripts/burgers/solve_burgers_gmrf-fem.jl:115`).
    """
    N_s = A.n_cols
    return RowOp(A.cols + t_idx * N_s, A.vals, N_s * N_t)


def replicate_over_time(A: RowOp, t_indices, N_t: int) -> RowOp:
    """vcat of `spatial_to_spatiotemporal(A, t)` for t in t_indices — shares
    one value buffer broadcast over time (the common reference idiom
    `vcat([spatial_to_spatiotemporal(E, t, N_t) for t in ...])`)."""
    t_indices = np.asarray(list(t_indices), dtype=np.int64)
    N_s = A.n_cols
    cols = (A.cols[None, :, :] + (t_indices * N_s)[:, None, None]).reshape(
        -1, A.K
    )
    vals = jnp.broadcast_to(A.vals, (len(t_indices), *A.vals.shape)).reshape(-1, A.K)
    return RowOp(cols.astype(np.int64), vals, N_s * N_t)


# ---------------------------------------------------------------------------
# Evaluation / derivative operators (point observation builders)
# ---------------------------------------------------------------------------


def _locate_shape(disc, points):
    mesh = disc.mesh
    cell, ref = mesh.locate(np.asarray(points, dtype=np.float64))
    phi, dphi, d2phi = shape_at(mesh.dim, disc.element_order, ref)
    # per-point shape data must be evaluated at each point's own ref coords
    # shape_at tabulates at all given points at once: phi [m, nd]
    return cell, phi, dphi, d2phi


def evaluation_matrix(disc, points, field: str = "u") -> RowOp:
    """Phi: dof values -> field values at arbitrary physical points.

    Analog of `evaluation_matrix(disc, pred_coords)`
    (`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:83`).
    """
    cell, phi, _, _ = _locate_shape(disc, points)
    cols = disc.dof_handler.cell_dofs_field(field)[cell]
    return RowOp(cols, jnp.asarray(phi), disc.ndofs)


def derivative_matrices(disc, points, derivative_idcs=(0,), field: str = "u"):
    """First-derivative point operators d/dx_i
    (`scripts/solve_burger.jl:111`)."""
    mesh = disc.mesh
    cell, _, dphi, _ = _locate_shape(disc, points)
    invJ = disc.geometry.invJ[cell]  # [m, dim, dim]
    grad = np.einsum("mnd,mde->mne", dphi, invJ)  # physical gradients
    cols = disc.dof_handler.cell_dofs_field(field)[cell]
    return [RowOp(cols, jnp.asarray(grad[:, :, i]), disc.ndofs) for i in derivative_idcs]


def second_derivative_matrices(disc, points, derivative_idcs=((0, 0),), field: str = "u"):
    """Second-derivative point operators d2/dx_i dx_j
    (`scripts/darcy/solve_darcy_gmrf-collocation.jl:107`)."""
    cell, _, _, d2phi = _locate_shape(disc, points)
    invJ = disc.geometry.invJ[cell]  # [m, dim, dim]
    # d2 phys[c,d] = sum_ab invJ[a,c] d2ref[a,b] invJ[b,d]
    d2 = np.einsum("mac,mnab,mbd->mncd", invJ, d2phi, invJ)
    cols = disc.dof_handler.cell_dofs_field(field)[cell]
    return [
        RowOp(cols, jnp.asarray(d2[:, :, i, j]), disc.ndofs)
        for (i, j) in derivative_idcs
    ]


def node_selection_matrix(disc, node_idcs, field: str = "u") -> RowOp:
    """Select dof values at mesh nodes (`scripts/solve_burger.jl:91`)."""
    dofs = disc.dof_handler.node_dofs(field, np.asarray(node_idcs))
    cols = dofs[:, None].astype(np.int64)
    vals = jnp.ones((len(dofs), 1))
    return RowOp(cols, vals, disc.ndofs)
