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
        rows_flat = np.repeat(op0.cell_dofs[:, :, None], nd, axis=2).reshape(-1)
        st = dict(
            qx=jnp.asarray(self.qx, dtype=jnp.int32),
            qy=jnp.asarray(self.qy, dtype=jnp.int32),
            cell_dofs=jnp.asarray(op0.cell_dofs, dtype=jnp.int32),
            rows_flat=jnp.asarray(rows_flat, dtype=jnp.int32),
            slot=jnp.asarray(np.asarray(slot), dtype=jnp.int32),
            cols=jnp.asarray(np.asarray(cols), dtype=jnp.int32),
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
        return st

    def __call__(self, coeff_mat, geom=None, structure=None):
        """-> (A: RowOp, ys) for one instance's coefficient field.

        With `structure` (from structure_arrays, threaded through the jit
        signature) the assembly runs entirely on argument arrays — no
        static index constants reach the HLO."""
        if structure is not None:
            st = structure
            w_q, phi, grad = geom
            coeff_q = jnp.asarray(coeff_mat)[st["qx"], st["qy"]].reshape(
                self.q_shape
            )
            Ke = jnp.einsum("cq,...cq,cqid,cqjd->...cij", w_q, coeff_q, grad, grad)
            fe = self.beta * jnp.einsum("cq,qi->ci", w_q, phi)
            ndofs = self.disc.ndofs
            vals = jnp.zeros((ndofs, self._K), dtype=Ke.dtype)
            vals = vals.at[st["rows_flat"], st["slot"]].add(Ke.reshape(-1))
            A = RowOp(st["cols"], vals, ndofs)
            ys = jnp.zeros(ndofs, dtype=Ke.dtype)
            ys = ys.at[st["cell_dofs"].reshape(-1)].add(fe.reshape(-1))
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
