"""FEMDiscretization: mesh + element + quadrature + fields + constraints.

TPU-native analog of the reference's `FEMDiscretization(grid, ip, qr, fields,
bcs)` (SURVEY.md §2.3; call sites `/root/reference/src/utils.jl:39,48`,
`_research/elliptic_chen24.jl:124`). Bundles everything assembly and operator
construction need, and precomputes the static per-cell geometry tables
(Jacobians, physical shape gradients at quadrature points) once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

from diffeqgmrfs_tpu.fem.mesh import Mesh, IntervalMesh, TriangleMesh, create_inflated_rectangle
from diffeqgmrfs_tpu.fem.reference_elements import (
    ReferenceElement,
    line_element,
    triangle_element,
)
from diffeqgmrfs_tpu.fem.dofs import DofHandler
from diffeqgmrfs_tpu.fem.constraints import (
    ConstraintHandler,
    Dirichlet,
    AffineConstraint,
)


@dataclass(frozen=True)
class CellGeometry:
    """Static per-cell affine geometry + tabulated physical shape data."""

    detJ: np.ndarray  # [nc]
    invJ: np.ndarray  # [nc, dim, dim]  (d ref / d phys)
    w_detJ: np.ndarray  # [nc, nq]   quadrature weight * |detJ|
    phi: np.ndarray  # [nq, nd]
    grad: np.ndarray  # [nc, nq, nd, dim]  physical gradients
    qcoords: np.ndarray  # [nc, nq, dim]  quadrature point physical coords


class FEMDiscretization:
    """Discretization bundle; `ndofs`, `.dof_handler`, `.constraint_handler`
    mirror the reference surface."""

    def __init__(
        self,
        mesh: Mesh,
        element_order: int | None = None,
        quad_degree: int | None = None,
        fields=("u",),
        bcs=(),
    ):
        self.mesh = mesh
        self.element_order = element_order or mesh.order
        if self.element_order != mesh.order:
            raise ValueError("element order must match mesh order")
        self.quad_degree = quad_degree or (self.element_order + 1)
        if mesh.dim == 1:
            self.element: ReferenceElement = line_element(
                self.element_order, self.quad_degree
            )
        else:
            self.element = triangle_element(self.element_order, self.quad_degree)
        field_names = tuple(f if isinstance(f, str) else f[0] for f in fields)
        self.dof_handler = DofHandler(mesh, field_names)
        # bcs: list of constraint or (constraint, noise) pairs, like the
        # reference's FEMDiscretization(..., [(bc_u, boundary_noise)])
        constraints, noises = [], []
        for bc in bcs:
            if isinstance(bc, tuple):
                c, noise = bc
            else:
                c, noise = bc, 1e-2
            constraints.append(c)
            noises.append(float(noise))
        self.constraint_handler = ConstraintHandler(
            self.dof_handler, constraints
        ).close()
        self.boundary_noises = noises

    @property
    def ndofs(self) -> int:
        return self.dof_handler.ndofs

    @property
    def n_free(self) -> int:
        return self.constraint_handler.n_free

    @property
    def has_constraints(self) -> bool:
        return len(self.constraint_handler.prescribed_dofs) > 0

    @cached_property
    def geometry(self) -> CellGeometry:
        mesh, el = self.mesh, self.element
        verts = mesh.cell_vertex_coords()  # [nc, dim+1, dim]
        v0 = verts[:, 0]
        # Jacobian columns: edge vectors v_k - v0
        J = np.stack([verts[:, k + 1] - v0 for k in range(mesh.dim)], axis=-1)
        if mesh.dim == 1:
            detJ = J[:, 0, 0]
            invJ = 1.0 / J
        else:
            detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
            invJ = (
                np.stack(
                    [
                        np.stack([J[:, 1, 1], -J[:, 0, 1]], axis=-1),
                        np.stack([-J[:, 1, 0], J[:, 0, 0]], axis=-1),
                    ],
                    axis=-2,
                )
                / detJ[:, None, None]
            )
        absdetJ = np.abs(detJ)
        w_detJ = el.q_weights[None, :] * absdetJ[:, None]
        # physical gradient: grad_phys = dphi_ref @ invJ  (invJ = d xi / d x)
        grad = np.einsum("qnd,cde->cqne", el.dphi, invJ)
        # quadrature physical coords (affine map)
        qc = v0[:, None, :] + np.einsum("qd,cde->cqe", el.q_points, J.swapaxes(-1, -2))
        return CellGeometry(detJ, invJ, w_detJ, el.phi, grad, qc)


# ---------------------------------------------------------------------------
# Discretization factory helpers (reference src/utils.jl)
# ---------------------------------------------------------------------------


def get_periodic_constraint(mesh: IntervalMesh, dofh: DofHandler | None = None):
    """Left-boundary dof := right-boundary dof on a 1D mesh.

    Analog of `/root/reference/src/utils.jl:5-18`.
    """
    left = int(mesh.node_sets["left"][0])
    right = int(mesh.node_sets["right"][0])
    return AffineConstraint(constrained_dof=left, master_dof=right, coef=1.0, offset=0.0)


def uniform_unit_square_discretization(
    N_xy: int,
    boundary_width: float = 0.0,
    use_dirichlet_bc: bool = True,
    element_order: int = 2,
    boundary_noise: float = 1e-2,
) -> FEMDiscretization:
    """Triangulated unit square (optionally inflated), order-2 Lagrange.

    Analog of `/root/reference/src/utils.jl:20-40`.
    """
    mesh = create_inflated_rectangle(
        0.0, 0.0, 1.0, 1.0, boundary_width, 1.0 / N_xy, element_order=element_order
    )
    bcs = []
    if use_dirichlet_bc:
        bcs.append((Dirichlet("u", "Interior boundary", 0.0), boundary_noise))
    return FEMDiscretization(
        mesh,
        element_order=element_order,
        quad_degree=element_order + 1,
        fields=("u",),
        bcs=bcs,
    )


def periodic_unit_interval_discretization(
    N_x: int, element_order: int = 2, boundary_noise: float = 1e-2
) -> FEMDiscretization:
    """Periodic 1D unit interval (analog of `/root/reference/src/utils.jl:42-49`)."""
    mesh = IntervalMesh(0.0, 1.0, N_x, order=element_order)
    bcs = [(get_periodic_constraint(mesh), boundary_noise)]
    return FEMDiscretization(
        mesh,
        element_order=element_order,
        quad_degree=element_order + 1,
        fields=("u",),
        bcs=bcs,
    )


def interval_discretization(
    x0: float,
    x1: float,
    N_x: int,
    element_order: int = 2,
    dirichlet: bool = False,
    boundary_noise: float = 1e-2,
) -> FEMDiscretization:
    """1D interval with optional homogeneous Dirichlet BCs (chen24 Burgers,
    `/root/reference/_research/burgers_chen24.jl:103-108`)."""
    mesh = IntervalMesh(x0, x1, N_x, order=element_order)
    bcs = []
    if dirichlet:
        bcs.append((Dirichlet("u", "boundary", 0.0), boundary_noise))
    return FEMDiscretization(
        mesh,
        element_order=element_order,
        quad_degree=element_order + 1,
        fields=("u",),
        bcs=bcs,
    )


def unit_square_discretization(
    N_xy: int,
    element_order: int = 2,
    dirichlet_fn=None,
    boundary_noise: float = 1e-2,
) -> FEMDiscretization:
    """Plain unit square without constraints (chen24 elliptic,
    `/root/reference/_research/elliptic_chen24.jl:120-124`)."""
    mesh = TriangleMesh(0.0, 0.0, 1.0, 1.0, N_xy, N_xy, order=element_order)
    bcs = []
    if dirichlet_fn is not None:
        bcs.append(
            (Dirichlet("u", "boundary", None, value_fn=dirichlet_fn), boundary_noise)
        )
    return FEMDiscretization(
        mesh,
        element_order=element_order,
        quad_degree=element_order + 1,
        fields=("u",),
        bcs=bcs,
    )
