"""Darcy flow problem operators.

Analog of `/root/reference/src/problems/darcy.jl` and the observation
builders in `scripts/darcy/solve_darcy_gmrf-fem.jl:113-151` /
`solve_darcy_gmrf-collocation.jl:102-141`.

The PDE -div(a grad u) = beta is enforced either as FEM residual rows
(G w = f with G the coefficient-weighted stiffness) or at collocation points
(1e-5 * a(x) * (-Laplacian) u = 1e-5 * beta). Per-instance work is only a
coefficient gather + einsum + scatter — the quadrature/collocation lookup
indices into the coefficient grid are static, so a whole dataset sweep jits
and vmaps.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.assembly import assemble_darcy
from diffeqgmrfs_tpu.fem.operators import (
    RowOp,
    evaluation_matrix,
    second_derivative_matrices,
    vstack_rowops,
)


def nearest_grid_indices(points, x_coords, y_coords):
    """Static nearest-gridpoint lookup (analog of `get_xy_idcs`,
    `/root/reference/src/datasets/darcy.jl:30-34`)."""
    pts = np.asarray(points).reshape(-1, 2)
    xi = np.abs(np.asarray(x_coords)[None, :] - pts[:, 0:1]).argmin(axis=1)
    yi = np.abs(np.asarray(y_coords)[None, :] - pts[:, 1:2]).argmin(axis=1)
    return xi, yi


class DarcyFEMObservations:
    """Precomputed structure for per-instance Darcy FEM observation systems.

    Per instance: A = assembled Darcy operator rows, ys = load vector
    (`form_observations`, `solve_darcy_gmrf-fem.jl:113-151`). With an
    inflated boundary, rows whose cell sticks outside the unit square are
    dropped and boundary-point evaluations are appended.
    """

    def __init__(
        self,
        disc,
        x_coords,
        y_coords,
        beta: float = 1.0,
        inflated_boundary: bool = False,
        N_xy: int = 300,
        prescribed_dofs=None,
    ):
        self.disc = disc
        self.beta = beta
        self.inflated = inflated_boundary
        g = disc.geometry
        # static: quadrature-point -> coefficient-grid indices
        qc = g.qcoords.reshape(-1, 2)
        self.qx, self.qy = nearest_grid_indices(qc, x_coords, y_coords)
        self.q_shape = g.qcoords.shape[:2]
        # row mask: with inflation, keep only dofs whose cells stay inside
        if inflated_boundary:
            # a cell is kept iff all its quadrature points lie in [0,1]^2
            # (`src/problems/darcy.jl:36-38,56-58`)
            inside = (
                (qc[:, 0] >= 0.0) & (qc[:, 0] <= 1.0)
                & (qc[:, 1] >= 0.0) & (qc[:, 1] <= 1.0)
            ).reshape(self.q_shape).all(axis=1)
            cd = disc.dof_handler.cell_dofs_field("u")
            keep = np.zeros(disc.ndofs, dtype=bool)
            keep[np.unique(cd[inside])] = True
            drop = np.where(~keep)[0]
            self.row_mask = np.where(keep, 1.0, 0.0)
            # boundary observation points on the unit-square edge
            step = 1.0 / N_xy
            line = np.arange(0.0, 1.0 + step / 2, step)
            zeros = np.zeros_like(line)
            ones = np.ones_like(line)
            bpts = np.concatenate(
                [
                    np.stack([line, zeros], -1),
                    np.stack([line, ones], -1),
                    np.stack([zeros, line], -1),
                    np.stack([ones, line], -1),
                ]
            )
            self.A_boundary = evaluation_matrix(disc, bpts)
        else:
            self.row_mask = None
            self.A_boundary = None
        if prescribed_dofs is not None and len(prescribed_dofs):
            m = np.ones(disc.ndofs)
            m[np.asarray(prescribed_dofs)] = 0.0
            self.prescribed_mask = m
        else:
            self.prescribed_mask = None

    def coeff_at_quad(self, coeff_mat):
        """Gather the coefficient field at quadrature points, [nc, nq]."""
        return jnp.asarray(coeff_mat)[self.qx, self.qy].reshape(self.q_shape)

    def geom_arrays(self):
        """(w_detJ, phi, grad) as arrays — device_put once and pass to
        __call__ via the jit signature (avoids giant HLO literals)."""
        g = self.disc.geometry
        return (jnp.asarray(g.w_detJ), jnp.asarray(g.phi), jnp.asarray(g.grad))

    def structure_arrays(self):
        """ALL static index/mask arrays of the per-instance assembly as one
        pytree — device_put once and thread through the jit signature.

        Traced-closure arrays are embedded into the program as MLIR
        literals (`_array_mlir_constant_handler`); at Darcy N_xy=300 the
        gather/scatter index sets total ~150 MB, which overflows the remote
        compiler's request limit (HTTP 413) and duplicates into every
        executable. As signature arguments they are ordinary device
        buffers.
        """
        op0 = assemble_darcy(
            self.disc, jnp.zeros(self.q_shape), beta=self.beta
        )
        cols, slot, K = op0.rowop_structure()
        nd = op0.nd
        nc = op0.cell_dofs.shape[0]
        # scatter index arrays permuted to (i, j, c) entry order — the
        # unrolled assembly emits Ke as [nd*nd, c] (big dim LAST everywhere:
        # TPU tiles the trailing two dims to (8, 128), so [c, 6, 6] temps
        # pad 28x and OOM at production sizes)
        rows_cij = np.repeat(op0.cell_dofs[:, :, None], nd, axis=2)  # [c,i,j]
        rows_ijc = rows_cij.transpose(1, 2, 0).reshape(-1)
        slot_ijc = (
            np.asarray(slot).reshape(nc, nd, nd).transpose(1, 2, 0).reshape(-1)
        )
        g = self.disc.geometry
        st = dict(
            qxT=jnp.asarray(self.qx.reshape(self.q_shape).T, dtype=jnp.int32),
            qyT=jnp.asarray(self.qy.reshape(self.q_shape).T, dtype=jnp.int32),
            cell_dofsT=jnp.asarray(op0.cell_dofs.T, dtype=jnp.int32),
            rows_flat=jnp.asarray(rows_ijc, dtype=jnp.int32),
            slot=jnp.asarray(slot_ijc, dtype=jnp.int32),
            cols=jnp.asarray(np.asarray(cols), dtype=jnp.int32),
            # geometry with the cell axis LAST (tile-friendly): [i, d, q, c]
            gradT=jnp.asarray(np.ascontiguousarray(np.asarray(g.grad).transpose(2, 3, 1, 0))),
            wT=jnp.asarray(np.ascontiguousarray(np.asarray(g.w_detJ).T)),
            prescribed_mask=(
                None
                if self.prescribed_mask is None
                else jnp.asarray(self.prescribed_mask)
            ),
            row_mask=(
                None if self.row_mask is None else jnp.asarray(self.row_mask)
            ),
        )
        self._K = int(K)
        self._nd = nd
        self._phi = np.asarray(g.phi)  # [q, nd], tiny static
        return st

    def __call__(self, coeff_mat, geom=None, structure=None):
        """-> (A: RowOp, ys) for one instance's coefficient field.

        With `structure` (from structure_arrays, threaded through the jit
        signature) the assembly runs entirely on argument arrays — no
        static index constants reach the HLO."""
        if structure is not None:
            st = structure
            gradT, wT = st["gradT"], st["wT"]  # [nd, dim, q, c], [q, c]
            nd, dim = gradT.shape[0], gradT.shape[1]
            coeff_q = jnp.asarray(coeff_mat)[st["qxT"], st["qyT"]]  # [q, c]
            wc = wT * coeff_q
            # unrolled tiny-dim contraction: every array is [q, c] or [c] —
            # dot_general here produces [c, nd, nd] temps whose (8, 128)
            # trailing-tile padding expands 28x (observed 3 x 5.5 GB at
            # N_xy=300); 21 symmetric elementwise reductions are free
            vecs = {}
            for i in range(nd):
                for j in range(i + 1):
                    acc = gradT[i, 0] * gradT[j, 0]
                    for d in range(1, dim):
                        acc = acc + gradT[i, d] * gradT[j, d]
                    vecs[(i, j)] = jnp.sum(wc * acc, axis=0)  # [c]
            Ke36 = jnp.stack(
                [vecs[(i, j)] if j <= i else vecs[(j, i)]
                 for i in range(nd) for j in range(nd)]
            )  # [nd*nd, c]
            phi = self._phi  # [q, nd] static tiny
            feT = self.beta * jnp.stack(
                [jnp.sum(wT * phi[:, i][:, None], axis=0) for i in range(nd)]
            )  # [nd, c]
            ndofs = self.disc.ndofs
            vals = jnp.zeros((ndofs, self._K), dtype=Ke36.dtype)
            vals = vals.at[st["rows_flat"], st["slot"]].add(Ke36.reshape(-1))
            A = RowOp(st["cols"], vals, ndofs)
            ys = jnp.zeros(ndofs, dtype=Ke36.dtype)
            ys = ys.at[st["cell_dofsT"].reshape(-1)].add(feT.reshape(-1))
            if st["prescribed_mask"] is not None:
                A = A.scale_rows(st["prescribed_mask"])
                ys = ys * st["prescribed_mask"]
            if st["row_mask"] is not None:
                A = A.scale_rows(st["row_mask"])
                ys = ys * st["row_mask"]
            if self.A_boundary is not None:
                A = vstack_rowops([A, self.A_boundary])
                ys = jnp.concatenate(
                    [ys, jnp.zeros(self.A_boundary.n_rows, dtype=ys.dtype)]
                )
            return A, ys
        coeff_q = self.coeff_at_quad(coeff_mat)
        op = assemble_darcy(self.disc, coeff_q, beta=self.beta, geom=geom)
        A = op.to_rowop()
        ys = op.rhs_vector()
        if self.prescribed_mask is not None:
            # reference apply!(G, f, ch): prescribed test rows removed
            A = A.scale_rows(jnp.asarray(self.prescribed_mask))
            ys = ys * jnp.asarray(self.prescribed_mask)
        if self.row_mask is not None:
            A = A.scale_rows(jnp.asarray(self.row_mask))
            ys = ys * jnp.asarray(self.row_mask)
        if self.A_boundary is not None:
            A = vstack_rowops([A, self.A_boundary])
            ys = jnp.concatenate(
                [ys, jnp.zeros(self.A_boundary.n_rows, dtype=ys.dtype)]
            )
        return A, ys


class DarcyCollocationObservations:
    """Collocation-form Darcy observations
    (`solve_darcy_gmrf-collocation.jl:102-141`): A = 1e-5 * diag(a) * D with
    D = -(d2/dx2 + d2/dy2) at a 2*N_xy collocation grid, y = 1e-5 * beta."""

    def __init__(self, disc, x_coords, y_coords, beta=1.0, N_xy=300, scale=1e-5):
        step = 1.0 / (2 * N_xy)
        rng = np.arange(step, 1.0 - step / 2, step)
        pts = np.stack(np.meshgrid(rng, rng, indexing="ij"), -1).reshape(-1, 2)
        Dxx, Dyy = second_derivative_matrices(
            disc, pts, derivative_idcs=((0, 0), (1, 1))
        )
        self.D = (Dxx + Dyy).scale(-1.0)
        self.scale = scale
        self.beta = beta
        self.cx, self.cy = nearest_grid_indices(pts, x_coords, y_coords)
        self.n_pts = pts.shape[0]

    def __call__(self, coeff_mat):
        coeff = jnp.asarray(coeff_mat)[self.cx, self.cy]
        A = self.D.scale_rows(self.scale * coeff)
        ys = jnp.full((self.n_pts,), self.scale * self.beta, dtype=A.vals.dtype)
        return A, ys
