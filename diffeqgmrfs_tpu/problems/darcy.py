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

    def __call__(self, coeff_mat, geom=None):
        """-> (A: RowOp, ys) for one instance's coefficient field."""
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
