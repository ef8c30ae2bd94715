"""Nonlinear elliptic problem -Delta u + alpha u^3 = f.

Analog of the in-file assemblers of the Chen24 elliptic benchmark
(`/root/reference/_research/elliptic_chen24.jl:179-285`): a static diffusion
Jacobian + load vector, plus a per-iterate cubic term, with boundary (test)
rows skipped — the boundary condition itself is enforced by conditioning the
GMRF on boundary observations, not by hard constraints.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.assembly import (
    assemble_stiffness,
    assemble_cube_term,
    assemble_load,
    CellOp,
)
from diffeqgmrfs_tpu.fem.operators import RowOp


class EllipticCubicResidual:
    """f_and_J for -Delta u + alpha u^3 = f with prescribed test rows zeroed.

    `rhs_q`: the right-hand side f evaluated at quadrature points [nc, nq]
    (static NumPy — the analytic series of `elliptic_chen24.jl:88-91`).
    """

    def __init__(self, disc, rhs_q, prescribed_dofs, alpha: float = 1.0):
        self.disc = disc
        self.alpha = float(alpha)
        mask = np.ones(disc.ndofs)
        if prescribed_dofs is not None and len(prescribed_dofs):
            mask[np.asarray(prescribed_dofs)] = 0.0
        self.mask = jnp.asarray(mask)
        self.diff_cell = assemble_stiffness(disc)  # static values
        self.f_static = assemble_load(disc, rhs_q) * self.mask
        self.cell_dofs = disc.dof_handler.cell_dofs_field("u")
        self.n_rows = disc.ndofs

    def f_and_J(self, w):
        cube = assemble_cube_term(self.disc, w)
        # f = J_diff w + alpha * cube_vec - f_static   (elliptic_chen24.jl:280-285)
        f = (
            self.diff_cell.matvec(w)
            + self.alpha * cube.rhs_vector()
        ) * self.mask - self.f_static
        J_cell = CellOp(
            self.cell_dofs,
            self.diff_cell.Ke + self.alpha * cube.Ke,
            self.disc.ndofs,
        )
        J = J_cell.to_rowop().scale_rows(self.mask)
        return f, J
