"""FEM core tests: quadrature exactness, assembly vs analytic element
matrices, evaluation/derivative operators, constraints.

This is the bottom layer of the test pyramid the reference lacks
(SURVEY.md §4): kernel-level checks against closed-form references.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from diffeqgmrfs_tpu.fem import (
    IntervalMesh,
    TriangleMesh,
    create_inflated_rectangle,
    FEMDiscretization,
    interval_discretization,
    periodic_unit_interval_discretization,
    unit_square_discretization,
    assemble_mass,
    assemble_stiffness,
    assemble_load,
    evaluation_matrix,
    derivative_matrices,
    second_derivative_matrices,
)
from diffeqgmrfs_tpu.fem.reference_elements import (
    line_element,
    triangle_element,
    line_shape,
    triangle_shape,
)


def test_line_shape_partition_of_unity():
    xi = np.linspace(0, 1, 7)
    for order in (1, 2):
        phi, dphi, _ = line_shape(order, xi)
        np.testing.assert_allclose(phi.sum(-1), 1.0, atol=1e-14)
        np.testing.assert_allclose(dphi.sum(1)[:, 0], 0.0, atol=1e-13)


def test_triangle_shape_partition_of_unity():
    pts = np.array([[0.2, 0.3], [0.1, 0.1], [0.5, 0.25]])
    for order in (1, 2):
        phi, dphi, _ = triangle_shape(order, pts)
        np.testing.assert_allclose(phi.sum(-1), 1.0, atol=1e-14)
        np.testing.assert_allclose(dphi.sum(1), 0.0, atol=1e-13)


def test_quadrature_exactness_line():
    el = line_element(2, 3)
    # integrate x^3 over [0,1] = 1/4
    val = np.sum(el.q_weights * el.q_points[:, 0] ** 3)
    assert abs(val - 0.25) < 1e-14


def test_quadrature_exactness_triangle():
    el = triangle_element(2, 3)
    # integrate x^2 y over reference triangle = 1/60
    x, y = el.q_points[:, 0], el.q_points[:, 1]
    val = np.sum(el.q_weights * x**2 * y)
    assert abs(val - 1 / 60) < 1e-14
    # area
    assert abs(np.sum(el.q_weights) - 0.5) < 1e-14


def test_mass_matrix_total_integral_1d():
    disc = interval_discretization(0.0, 2.0, 10, element_order=2)
    M = assemble_mass(disc).to_dense()
    # sum_ij M_ij = integral of 1 over domain = 2
    assert abs(float(jnp.sum(M)) - 2.0) < 1e-12
    # M symmetric
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-14)


def test_mass_matrix_total_integral_2d():
    disc = unit_square_discretization(4, element_order=2)
    M = assemble_mass(disc).to_dense()
    assert abs(float(jnp.sum(M)) - 1.0) < 1e-12


def test_stiffness_nullspace_and_patch_1d():
    disc = interval_discretization(0.0, 1.0, 8, element_order=2)
    G = assemble_stiffness(disc).to_dense()
    ones = np.ones(disc.ndofs)
    np.testing.assert_allclose(np.asarray(G) @ ones, 0.0, atol=1e-12)
    # energy of u(x)=x: integral |u'|^2 = 1
    x = np.asarray(disc.mesh.coords[:, 0])
    assert abs(float(x @ np.asarray(G) @ x) - 1.0) < 1e-12


def test_stiffness_patch_2d():
    disc = unit_square_discretization(3, element_order=2)
    G = assemble_stiffness(disc).to_dense()
    coords = np.asarray(disc.mesh.coords)
    # u = 2x + 3y: integral |grad|^2 = 13 over unit square
    u = 2 * coords[:, 0] + 3 * coords[:, 1]
    assert abs(float(u @ np.asarray(G) @ u) - 13.0) < 1e-11
    np.testing.assert_allclose(np.asarray(G) @ np.ones(disc.ndofs), 0.0, atol=1e-11)


def test_load_vector_against_integral():
    disc = unit_square_discretization(5, element_order=2)
    qc = disc.geometry.qcoords
    f_q = qc[..., 0]  # f(x,y) = x
    f = assemble_load(disc, f_q)
    # sum of load vector = integral of f = 1/2
    assert abs(float(jnp.sum(f)) - 0.5) < 1e-12


def test_evaluation_matrix_reproduces_polynomials():
    disc = unit_square_discretization(4, element_order=2)
    coords = np.asarray(disc.mesh.coords)
    # quadratic field is exactly representable with P2
    u = coords[:, 0] ** 2 + 2 * coords[:, 0] * coords[:, 1] - coords[:, 1]
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, size=(40, 2))
    E = evaluation_matrix(disc, pts)
    pred = np.asarray(E.matvec(jnp.asarray(u)))
    truth = pts[:, 0] ** 2 + 2 * pts[:, 0] * pts[:, 1] - pts[:, 1]
    np.testing.assert_allclose(pred, truth, atol=1e-12)


def test_derivative_matrices_2d():
    disc = unit_square_discretization(4, element_order=2)
    coords = np.asarray(disc.mesh.coords)
    u = coords[:, 0] ** 2 + 3 * coords[:, 1] ** 2 + coords[:, 0] * coords[:, 1]
    rng = np.random.default_rng(1)
    pts = rng.uniform(0.05, 0.95, size=(30, 2))
    Dx, Dy = derivative_matrices(disc, pts, derivative_idcs=(0, 1))
    np.testing.assert_allclose(
        np.asarray(Dx.matvec(jnp.asarray(u))), 2 * pts[:, 0] + pts[:, 1], atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(Dy.matvec(jnp.asarray(u))), 6 * pts[:, 1] + pts[:, 0], atol=1e-11
    )
    Dxx, Dyy, Dxy = second_derivative_matrices(
        disc, pts, derivative_idcs=((0, 0), (1, 1), (0, 1))
    )
    np.testing.assert_allclose(np.asarray(Dxx.matvec(jnp.asarray(u))), 2.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Dyy.matvec(jnp.asarray(u))), 6.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Dxy.matvec(jnp.asarray(u))), 1.0, atol=1e-10)


def test_periodic_constraint_embedding():
    disc = periodic_unit_interval_discretization(6, element_order=2)
    ch = disc.constraint_handler
    assert ch.n_free == disc.ndofs - 1
    z = jnp.arange(ch.n_free, dtype=jnp.float64) + 1.0
    full = ch.free_to_full(z)
    assert full.shape == (disc.ndofs,)
    # left dof equals right dof
    left = int(disc.mesh.node_sets["left"][0])
    right = int(disc.mesh.node_sets["right"][0])
    assert float(full[left]) == float(full[right])


def test_dirichlet_constraints():
    disc = interval_discretization(0.0, 1.0, 5, element_order=2, dirichlet=True)
    ch = disc.constraint_handler
    assert len(ch.prescribed_dofs) == 2
    z = jnp.ones(ch.n_free)
    full = ch.free_to_full(z)
    assert float(full[0]) == 0.0 and float(full[-1]) == 0.0


def test_inflated_rectangle_interior_boundary():
    mesh = create_inflated_rectangle(0, 0, 1, 1, width=0.2, h=0.25, element_order=2)
    ib = mesh.node_sets["Interior boundary"]
    pts = mesh.coords[ib]
    on_edge = (
        np.isclose(pts[:, 0], 0)
        | np.isclose(pts[:, 0], 1)
        | np.isclose(pts[:, 1], 0)
        | np.isclose(pts[:, 1], 1)
    )
    assert np.all(on_edge)
    assert len(ib) > 0
    # mesh extends beyond the unit square
    assert mesh.coords[:, 0].min() < -0.1


def test_locate_roundtrip_2d():
    mesh = TriangleMesh(0, 0, 1, 1, 5, 7, order=2)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, size=(100, 2))
    cell, ref = mesh.locate(pts)
    # map back: x = v0 + J @ ref
    verts = mesh.cell_vertex_coords()[cell]
    v0 = verts[:, 0]
    J = np.stack([verts[:, 1] - verts[:, 0], verts[:, 2] - verts[:, 0]], axis=-1)
    back = v0 + np.einsum("mde,me->md", J, ref)
    np.testing.assert_allclose(back, pts, atol=1e-12)
