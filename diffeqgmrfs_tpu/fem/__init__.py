from diffeqgmrfs_tpu.fem.mesh import (
    Mesh,
    IntervalMesh,
    TriangleMesh,
    UnstructuredTriangleMesh,
    create_inflated_rectangle,
)
from diffeqgmrfs_tpu.fem.reference_elements import (
    line_element,
    triangle_element,
    shape_at,
)
from diffeqgmrfs_tpu.fem.dofs import DofHandler
from diffeqgmrfs_tpu.fem.constraints import (
    ConstraintHandler,
    Dirichlet,
    AffineConstraint,
)
from diffeqgmrfs_tpu.fem.discretization import (
    FEMDiscretization,
    get_periodic_constraint,
    uniform_unit_square_discretization,
    periodic_unit_interval_discretization,
    interval_discretization,
    unit_square_discretization,
)
from diffeqgmrfs_tpu.fem.operators import (
    RowOp,
    vstack_rowops,
    spatial_to_spatiotemporal,
    replicate_over_time,
    evaluation_matrix,
    derivative_matrices,
    second_derivative_matrices,
    node_selection_matrix,
)
from diffeqgmrfs_tpu.fem.assembly import (
    CellOp,
    assemble_mass,
    assemble_stiffness,
    assemble_load,
    assemble_advection_1d,
    assemble_cube_term,
    assemble_darcy,
)
from diffeqgmrfs_tpu.fem.gmsh import read_gmsh  # noqa: E402,F401
