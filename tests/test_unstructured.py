"""Unstructured (externally supplied) triangulations through the pipeline.

The reference inherits arbitrary-triangulation generality from Ferrite
(`/root/reference/src/utils.jl:20-40`); here topology is data:
`UnstructuredTriangleMesh(coords, cells)` takes any triangulation, RCM-
reorders it for bandedness, and everything downstream (assembly, Matérn
priors, conditioning, evaluation operators) works unchanged. Validated on
a randomly perturbed (non-structured) triangulation against exact FEM
identities and a dense scipy posterior solve.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem import (
    TriangleMesh,
    UnstructuredTriangleMesh,
    FEMDiscretization,
    evaluation_matrix,
)
from diffeqgmrfs_tpu.gmrf import condition_on_observations
from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
from diffeqgmrfs_tpu.models.matern import (
    host_mass_stiffness,
    matern_precision_host,
)


def _perturbed_mesh(nx=6, seed=0, order=2):
    """Structured P1 triangulation with interior vertices randomly moved —
    a genuinely non-structured geometry with the same topology."""
    base = TriangleMesh(0, 0, 1, 1, nx, nx, order=1)
    coords = np.array(base.coords)
    rng = np.random.default_rng(seed)
    h = 1.0 / nx
    interior = np.setdiff1d(
        np.arange(base.n_nodes), base.node_sets["boundary"]
    )
    coords[interior] += rng.uniform(-0.25 * h, 0.25 * h, (len(interior), 2))
    return UnstructuredTriangleMesh(coords, np.array(base.cells), order=order)


def test_unstructured_mesh_construction():
    mesh = _perturbed_mesh()
    assert mesh.order == 2
    assert mesh.cells.shape[1] == 6
    # boundary set: all 4 sides at order-2 resolution (4*2*6 edge nodes)
    bc = mesh.coords[mesh.node_sets["boundary"]]
    on_edge = (
        (np.abs(bc[:, 0]) < 1e-12) | (np.abs(bc[:, 0] - 1) < 1e-12)
        | (np.abs(bc[:, 1]) < 1e-12) | (np.abs(bc[:, 1] - 1) < 1e-12)
    )
    assert on_edge.all()
    assert len(mesh.node_sets["boundary"]) == 4 * 2 * 6


def test_unstructured_assembly_identities():
    mesh = _perturbed_mesh()
    disc = FEMDiscretization(mesh, element_order=2, quad_degree=3)
    m, G = host_mass_stiffness(disc)
    # lumped mass sums to the domain area (boundary unperturbed)
    assert abs(m.sum() - 1.0) < 1e-12
    # stiffness annihilates constants
    assert np.max(np.abs(G @ np.ones(disc.ndofs))) < 1e-12
    # linear fields: (G u)_i = int grad(phi_i) . a  (affine P2 exactness)
    a = np.array([0.3, -0.8])
    node_dofs = disc.dof_handler.node_dofs("u", np.arange(mesh.n_nodes))
    coords = np.zeros((disc.ndofs, 2))
    coords[node_dofs] = mesh.coords
    u_lin = coords @ a
    g = disc.geometry
    cd = disc.dof_handler.cell_dofs_field("u")
    int_grad = np.zeros((disc.ndofs, 2))
    for c in range(cd.shape[0]):
        for q in range(g.phi.shape[0]):
            for i in range(cd.shape[1]):
                int_grad[cd[c, i]] += g.w_detJ[c, q] * g.grad[c, q, i]
    assert np.allclose(G @ u_lin, int_grad @ a, atol=1e-12)


def test_unstructured_locate_and_evaluation():
    mesh = _perturbed_mesh()
    disc = FEMDiscretization(mesh, element_order=2, quad_degree=3)

    def quad(p):
        return 1.0 + 2 * p[..., 0] - p[..., 1] + 0.5 * p[..., 0] * p[..., 1]

    node_dofs = disc.dof_handler.node_dofs("u", np.arange(mesh.n_nodes))
    coords = np.zeros((disc.ndofs, 2))
    coords[node_dofs] = mesh.coords
    u = quad(coords)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.05, 0.95, (40, 2))
    E = evaluation_matrix(disc, pts)
    pred = np.asarray(E.matvec(jnp.asarray(u)))
    # P2 on affine (straight-edged) triangles reproduces quadratics exactly
    assert np.allclose(pred, quad(pts), atol=1e-10)


def test_unstructured_darcy_pipeline_vs_dense():
    """Matérn prior + point conditioning on the perturbed mesh: posterior
    mean through the BTD machinery vs a dense scipy solve."""
    mesh = _perturbed_mesh(nx=5, seed=1)
    disc = FEMDiscretization(mesh, element_order=2, quad_degree=3)
    spde = MaternSPDE(d=2, range=0.4, smoothness=1)
    x = discretize_matern(spde, disc)

    rng = np.random.default_rng(5)
    pts = rng.uniform(0.1, 0.9, (30, 2))
    A = evaluation_matrix(disc, pts)
    y = np.sin(2 * np.pi * pts[:, 0]) * np.cos(np.pi * pts[:, 1])
    tau = 1e6
    post = condition_on_observations(x, A, tau, jnp.asarray(y))
    mu = np.asarray(post.mean())

    Q = matern_precision_host(spde, disc).toarray()
    Ad = np.asarray(A.to_dense())
    H = Q + tau * Ad.T @ Ad
    mu_ref = np.linalg.solve(H, tau * Ad.T @ y)
    assert np.linalg.norm(mu - mu_ref) / np.linalg.norm(mu_ref) < 1e-9
    # posterior variance against the dense inverse
    var = np.asarray(post.variance())
    var_ref = np.diag(np.linalg.inv(H))
    assert np.allclose(var, var_ref, rtol=1e-8)


_MSH_V2 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
2
1 1 "left"
1 2 "right"
$EndPhysicalNames
$Nodes
5
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
5 0.5 0.5 0
$EndNodes
$Elements
6
1 1 2 1 10 4 1
2 1 2 2 20 2 3
3 2 2 0 30 1 2 5
4 2 2 0 30 2 3 5
5 2 2 0 30 3 4 5
6 2 2 0 30 4 1 5
$EndElements
"""

_MSH_V4 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
2
1 1 "left"
1 2 "right"
$EndPhysicalNames
$Entities
0 2 1 0
1 0 0 0 0 1 0 1 1 2 1 -4
2 1 0 0 1 1 0 1 2 2 2 -3
1 0 0 0 1 1 0 0 4 1 2 3 4
$EndEntities
$Nodes
2 5 1 5
1 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
2 1 0 1
5
0.5 0.5 0
$EndNodes
$Elements
3 6 1 6
1 1 1 1
1 4 1
1 2 1 1
2 2 3
2 1 2 4
3 1 2 5
4 2 3 5
5 3 4 5
6 4 1 5
$EndElements
"""


def _check_gmsh_mesh(mesh):
    assert mesh.order == 2
    assert mesh.cells.shape == (4, 6)
    assert mesh.n_nodes == 13  # 5 vertices + 8 edge midpoints
    # physical curve sets incl. P2 midpoint closure: 3 nodes each at x=0/1
    left = mesh.coords[mesh.node_sets["left"]]
    right = mesh.coords[mesh.node_sets["right"]]
    assert len(left) == 3 and np.allclose(left[:, 0], 0.0)
    assert len(right) == 3 and np.allclose(right[:, 0], 1.0)
    # derived boundary: 4 corners + 4 outer midpoints
    b = mesh.coords[mesh.node_sets["boundary"]]
    assert len(b) == 8
    on_edge = (
        (np.abs(b[:, 0]) < 1e-12) | (np.abs(b[:, 0] - 1) < 1e-12)
        | (np.abs(b[:, 1]) < 1e-12) | (np.abs(b[:, 1] - 1) < 1e-12)
    )
    assert on_edge.all()


def test_gmsh_reader_v2_and_v4(tmp_path):
    from diffeqgmrfs_tpu.fem.gmsh import read_gmsh

    for name, text in [("v2.msh", _MSH_V2), ("v4.msh", _MSH_V4)]:
        p = tmp_path / name
        p.write_text(text)
        mesh = read_gmsh(str(p))
        _check_gmsh_mesh(mesh)


def test_gmsh_mesh_through_pipeline(tmp_path):
    """Gmsh input through assembly + Matérn prior: lumped mass integrates
    the unit-square area exactly; the prior factors and samples."""
    from diffeqgmrfs_tpu.fem.gmsh import read_gmsh

    p = tmp_path / "m.msh"
    p.write_text(_MSH_V2)
    mesh = read_gmsh(str(p))
    disc = FEMDiscretization(mesh, element_order=2, quad_degree=3)
    m, G = host_mass_stiffness(disc)
    assert abs(m.sum() - 1.0) < 1e-12  # total mass = area
    # stiffness annihilates constants
    assert np.abs(G @ np.ones(disc.ndofs)).max() < 1e-12
    x = discretize_matern(MaternSPDE(d=2, range=0.5, smoothness=1), disc)
    s = x.sample(jax.random.PRNGKey(0), 2)
    assert s.shape == (2, disc.ndofs) and bool(jnp.all(jnp.isfinite(s)))
