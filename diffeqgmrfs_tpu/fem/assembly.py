"""FEM assembly engine: vectorized element kernels + static scatter structure.

TPU-first re-design of the reference's cell-iterator assembly loops
(`/root/reference/src/problems/darcy.jl:27-60`, `src/problems/burgers.jl`,
GaussianMarkovRandomFields.jl's internal `assemble_mass_matrix` /
`assemble_diffusion_matrix`): instead of a scalar loop over cells x
quadrature points x basis pairs, every element matrix is one batched einsum
over all cells at once (MXU/VPU-friendly), and global scatter-add happens
through precomputed index structure (`segment`/`at[].add`), never through
dynamic sparsity.

`CellOp` holds the per-cell dense element matrices Ke [nc, nd, nd] (traced)
plus the static cell->dof map; `to_rowop()` converts to the row-sparse CSR
format once the sparsity union per row has been computed host-side (cached
per discretization).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from diffeqgmrfs_tpu.fem.operators import RowOp
from diffeqgmrfs_tpu.ops.btd import make_btd_pattern, BTDPattern


@jax.tree_util.register_pytree_node_class
@dataclass
class CellOp:
    """FEM-assembled square operator in unassembled (per-cell) form."""

    cell_dofs: np.ndarray  # [nc, nd] int32, static
    Ke: jnp.ndarray  # [nc, nd, nd], traced
    ndofs: int
    fe: jnp.ndarray | None = None  # [nc, nd] optional rhs contributions

    def tree_flatten(self):
        return (self.Ke, self.fe), (self.cell_dofs, self.ndofs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1], children[1])

    @property
    def nd(self):
        return self.cell_dofs.shape[1]

    def matvec(self, x):
        xg = jnp.asarray(x)[..., self.cell_dofs]  # [..., nc, nd]
        y_cell = jnp.einsum("cij,...cj->...ci", self.Ke, xg)
        out = jnp.zeros(x.shape[:-1] + (self.ndofs,), dtype=y_cell.dtype)
        return out.at[..., self.cell_dofs].add(y_cell)

    def rhs_vector(self):
        """Scatter fe into a global vector [ndofs]."""
        out = jnp.zeros(self.ndofs, dtype=self.Ke.dtype)
        if self.fe is None:
            return out
        return out.at[self.cell_dofs.reshape(-1)].add(self.fe.reshape(-1))

    def coo_structure(self):
        nd = self.nd
        r = np.repeat(self.cell_dofs[:, :, None], nd, axis=2)
        c = np.repeat(self.cell_dofs[:, None, :], nd, axis=1)
        return r.reshape(-1), c.reshape(-1)

    def coo_values(self):
        return self.Ke.reshape(-1)

    def __add__(self, other: "CellOp") -> "CellOp":
        assert self.ndofs == other.ndofs
        if self.cell_dofs is other.cell_dofs or np.array_equal(
            self.cell_dofs, other.cell_dofs
        ):
            fe = None
            if self.fe is not None or other.fe is not None:
                a = self.fe if self.fe is not None else 0.0
                b = other.fe if other.fe is not None else 0.0
                fe = a + b
            return CellOp(self.cell_dofs, self.Ke + other.Ke, self.ndofs, fe)
        raise ValueError("CellOp addition requires identical cell structure")

    def scale(self, s) -> "CellOp":
        return CellOp(
            self.cell_dofs,
            self.Ke * s,
            self.ndofs,
            None if self.fe is None else self.fe * s,
        )

    def lump(self) -> "CellOp":
        """Mass lumping (reference `lump_matrix`, `src/problems/burgers.jl:94`).

        HRZ (diagonal scaling) lumping: per cell, keep the diagonal and scale
        it to preserve the total cell mass. For linear elements this equals
        row-sum lumping; for quadratic elements row-sum lumping is singular
        (vertex shape functions integrate to ~0 on triangles), so HRZ is the
        numerically sound choice.
        """
        idx = jnp.arange(self.nd)
        diag = self.Ke[:, idx, idx]
        cell_mass = jnp.sum(self.Ke, axis=(-2, -1))
        scale = cell_mass / jnp.sum(diag, axis=-1)
        Ke = jnp.zeros_like(self.Ke)
        Ke = Ke.at[:, idx, idx].set(diag * scale[:, None])
        return CellOp(self.cell_dofs, Ke, self.ndofs, self.fe)

    def btd_pattern(self, bs: int | None = None) -> BTDPattern:
        r, c = self.coo_structure()
        return make_btd_pattern(r, c, self.ndofs, bs=bs)

    def to_btd(self, pattern: BTDPattern):
        return pattern.scatter(self.coo_values())

    def to_dense(self):
        A = jnp.zeros((self.ndofs, self.ndofs), dtype=self.Ke.dtype)
        r, c = self.coo_structure()
        return A.at[r, c].add(self.Ke.reshape(-1))

    def diagonal_vector(self):
        """Diagonal of the assembled matrix, [ndofs]."""
        out = jnp.zeros(self.ndofs, dtype=self.Ke.dtype)
        idx = jnp.arange(self.nd)
        return out.at[self.cell_dofs.reshape(-1)].add(
            self.Ke[:, idx, idx].reshape(-1)
        )

    # -- CSR conversion ------------------------------------------------------

    def rowop_structure(self):
        return _rowop_structure(
            self.cell_dofs.tobytes(), self.cell_dofs.shape, self.ndofs
        )

    def to_rowop(self) -> RowOp:
        """Assemble into row-sparse form (per-row column unions, padded)."""
        cols, slot_of_entry, K = self.rowop_structure()
        nd = self.nd
        rows_flat = np.repeat(self.cell_dofs[:, :, None], nd, axis=2).reshape(-1)
        vals = jnp.zeros((self.ndofs, K), dtype=self.Ke.dtype)
        vals = vals.at[rows_flat, slot_of_entry].add(self.Ke.reshape(-1))
        return RowOp(cols, vals, self.ndofs)


@lru_cache(maxsize=64)
def _rowop_structure(cell_dofs_bytes, shape, ndofs):
    """Host-side sparsity union per row; cached per (mesh, dof layout).

    Uses the native structure engine (native/structure.cpp) when available,
    falling back to scipy."""
    cell_dofs = np.frombuffer(cell_dofs_bytes, dtype=np.int32).reshape(shape)
    nd = shape[1]
    from diffeqgmrfs_tpu.utils.native import row_structure as _native_rows

    native = _native_rows(cell_dofs, ndofs)
    if native is not None:
        cols, slot, K = native
        return cols, slot, K
    r = np.repeat(cell_dofs[:, :, None], nd, axis=2).reshape(-1)
    c = np.repeat(cell_dofs[:, None, :], nd, axis=1).reshape(-1)
    M = sp.coo_matrix((np.ones(len(r)), (r, c)), shape=(ndofs, ndofs)).tocsr()
    M.sum_duplicates()
    counts = np.diff(M.indptr)
    K = int(counts.max())
    cols = np.zeros((ndofs, K), dtype=np.int64)
    for i in range(ndofs):
        ci = M.indices[M.indptr[i] : M.indptr[i + 1]]
        cols[i, : counts[i]] = ci
        # pad unused slots with the row's own first column so that padded
        # (zero-valued) A^T A pairs stay inside the band
        if counts[i] < K:
            cols[i, counts[i] :] = ci[0] if counts[i] else i
    # slot of each COO entry within its row's sorted column list
    slot = np.empty(len(r), dtype=np.int64)
    # indices are sorted within each row -> searchsorted per entry
    row_start = M.indptr[r]
    row_end = M.indptr[r + 1]
    # vectorized searchsorted over ragged rows: since all rows are short,
    # do it against the padded cols matrix
    slot = np.argmax(cols[r] == c[:, None], axis=1)
    del row_start, row_end
    return cols, slot, K


# ---------------------------------------------------------------------------
# Element kernels (single scalar field)
# ---------------------------------------------------------------------------


def _geom(disc):
    g = disc.geometry
    return (
        jnp.asarray(g.w_detJ),
        jnp.asarray(g.phi),
        jnp.asarray(g.grad),
    )


def assemble_mass(disc, field: str = "u", lumping: bool = False) -> CellOp:
    """Mass matrix M[i,j] = ∫ φ_i φ_j dΩ (reference `assemble_mass_matrix`)."""
    w, phi, _ = _geom(disc)
    Ke = jnp.einsum("cq,qi,qj->cij", w, phi, phi)
    op = CellOp(disc.dof_handler.cell_dofs_field(field), Ke, disc.ndofs)
    return op.lump() if lumping else op


def assemble_stiffness(disc, coeff_q=None, field: str = "u") -> CellOp:
    """Stiffness G[i,j] = ∫ a(x) ∇φ_i·∇φ_j dΩ (`assemble_diffusion_matrix`;
    with coeff_q it is the Darcy operator core,
    `/root/reference/src/problems/darcy.jl:50-52`).

    coeff_q: optional traced coefficient at quadrature points, [nc, nq].
    """
    w, _, grad = _geom(disc)
    if coeff_q is None:
        Ke = jnp.einsum("cq,cqid,cqjd->cij", w, grad, grad)
    else:
        Ke = jnp.einsum("cq,cq,cqid,cqjd->cij", w, jnp.asarray(coeff_q), grad, grad)
    return CellOp(disc.dof_handler.cell_dofs_field(field), Ke, disc.ndofs)


def assemble_load(disc, f_q, field: str = "u"):
    """Load vector f[i] = ∫ φ_i f(x) dΩ for f at quadrature points [nc, nq]."""
    w, phi, _ = _geom(disc)
    fe = jnp.einsum("cq,cq,qi->ci", w, jnp.asarray(f_q), phi)
    op = CellOp(
        disc.dof_handler.cell_dofs_field(field),
        jnp.zeros((fe.shape[0], fe.shape[1], fe.shape[1]), dtype=fe.dtype),
        disc.ndofs,
        fe=fe,
    )
    return op.rhs_vector()


def assemble_advection_1d(disc, weights, field: str = "u") -> CellOp:
    """Linearized 1D Burgers advection operator at the current iterate w.

    Ge[i,j] = ∫ φ_i (φ_j ∂ₓu + u ∂ₓφ_j) dΩ,  ve[i] = ∫ φ_i u ∂ₓu dΩ
    with u = Σ w_k φ_k — analog of `assemble_burgers_advection_matrix`
    (`/root/reference/src/problems/burgers.jl:5-59`), without the prescribed-
    row zeroing (apply `.zero_rows` downstream when constraints exist).
    """
    w_q, phi, grad = _geom(disc)
    cell_dofs = disc.dof_handler.cell_dofs_field(field)
    wc = jnp.asarray(weights)[..., cell_dofs]  # [..., nc, nd]
    u = jnp.einsum("qk,...ck->...cq", phi, wc)  # u at quad points
    ux = jnp.einsum("cqk,...ck->...cq", grad[..., 0], wc)  # du/dx at quad pts
    Ke = jnp.einsum("cq,qi,...cq,qj->...cij", w_q, phi, ux, phi) + jnp.einsum(
        "cq,qi,...cq,cqj->...cij", w_q, phi, u, grad[..., 0]
    )
    ve = jnp.einsum("cq,qi,...cq,...cq->...ci", w_q, phi, u, ux)
    return CellOp(cell_dofs, Ke, disc.ndofs, fe=ve)


def assemble_cube_term(disc, weights, field: str = "u") -> CellOp:
    """Linearized cubic reaction term for -Δu + α u³ = f.

    Je[i,j] = 3 ∫ φ_i u² φ_j dΩ,  ve[i] = ∫ φ_i u³ dΩ — analog of
    `assemble_J_cube` (`/root/reference/_research/elliptic_chen24.jl:231-278`).
    """
    w_q, phi, _ = _geom(disc)
    cell_dofs = disc.dof_handler.cell_dofs_field(field)
    wc = jnp.asarray(weights)[..., cell_dofs]
    u = jnp.einsum("qk,...ck->...cq", phi, wc)
    Ke = 3.0 * jnp.einsum("cq,qi,...cq,qj->...cij", w_q, phi, u * u, phi)
    ve = jnp.einsum("cq,qi,...cq->...ci", w_q, phi, u * u * u)
    return CellOp(cell_dofs, Ke, disc.ndofs, fe=ve)


def assemble_darcy(disc, coeff_q, beta: float = 1.0, field: str = "u", geom=None):
    """Darcy operator G[i,j] = ∫ a(x) ∇φ_i·∇φ_j dΩ and rhs f[i] = β ∫ φ_i dΩ.

    coeff_q: coefficient sampled at quadrature points [nc, nq] (traced; the
    nearest-grid lookup of `src/problems/darcy.jl:39` happens in the dataset
    layer with static indices). Analog of `assemble_darcy_diff_matrix`
    (`/root/reference/src/problems/darcy.jl:5-63`).

    geom: optional (w_detJ, phi, grad) device arrays threaded through the
    jit signature — closed-over geometry becomes an HLO literal (~1 GB f64
    at Darcy N_xy=300), which blows executable memory through the relay.
    """
    w_q, phi, grad = geom if geom is not None else _geom(disc)
    cell_dofs = disc.dof_handler.cell_dofs_field(field)
    Ke = jnp.einsum("cq,...cq,cqid,cqjd->...cij", w_q, jnp.asarray(coeff_q), grad, grad)
    fe = beta * jnp.einsum("cq,qi->ci", w_q, phi)
    fe = jnp.broadcast_to(fe, Ke.shape[:-3] + fe.shape)
    return CellOp(cell_dofs, Ke, disc.ndofs, fe=fe)
