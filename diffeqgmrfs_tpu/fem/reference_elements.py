"""Reference elements: Lagrange shape functions and quadrature tables.

Covers the element zoo the reference consumes (SURVEY.md §2.3 "Ferrite.jl
surface"): Lagrange{RefLine, 1|2} and Lagrange{RefTriangle, 1|2} with Gauss
(line) / Dunavant (triangle) quadrature, cf. `QuadratureRule{RefLine}(order)`
at `/root/reference/src/utils.jl:31,45`.

Everything here is *static* NumPy: shape values/gradients are tabulated at the
quadrature points once, and assembly consumes the tables as constants inside
jit — there is no per-cell shape-function evaluation at run time.

Conventions
-----------
* Reference line: xi in [0, 1]. Node order (Ferrite-like): vertices first,
  then the edge midpoint -> P1: [0, 1]; P2: [0, 1, 1/2].
* Reference triangle: vertices (0,0), (1,0), (0,1), barycentric
  lambda = (1-xi-eta, xi, eta). Node order: 3 vertices, then edge midpoints
  of edges (v0,v1), (v1,v2), (v2,v0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class ReferenceElement:
    """Tabulated shape data for one (element, quadrature) pairing."""

    dim: int
    order: int
    n_nodes: int
    # Local node coordinates on the reference element, [n_nodes, dim]
    node_coords: np.ndarray
    # Quadrature points/weights on the reference element
    q_points: np.ndarray  # [nq, dim]
    q_weights: np.ndarray  # [nq]
    # Tabulated shape functions at quadrature points
    phi: np.ndarray  # [nq, n_nodes]
    dphi: np.ndarray  # [nq, n_nodes, dim]   (reference-coordinate gradients)
    d2phi: np.ndarray  # [nq, n_nodes, dim, dim]  (reference second derivatives)

    def eval_shape(self, pts: np.ndarray):
        """Shape values/derivatives at arbitrary reference points [m, dim]."""
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Line elements on [0, 1]
# ---------------------------------------------------------------------------


def line_shape(order: int, xi: np.ndarray):
    """Shape fns + first/second derivatives on the [0,1] reference line.

    Returns (phi [m,n], dphi [m,n,1], d2phi [m,n,1,1]).
    """
    xi = np.asarray(xi, dtype=np.float64).reshape(-1)
    m = xi.shape[0]
    if order == 1:
        phi = np.stack([1.0 - xi, xi], axis=-1)
        dphi = np.broadcast_to(np.array([[-1.0, 1.0]]), (m, 2)).copy()
        d2phi = np.zeros((m, 2))
    elif order == 2:
        # nodes at 0, 1, 1/2
        phi = np.stack(
            [(2 * xi - 1) * (xi - 1), xi * (2 * xi - 1), 4 * xi * (1 - xi)],
            axis=-1,
        )
        dphi = np.stack([4 * xi - 3, 4 * xi - 1, 4 - 8 * xi], axis=-1)
        d2phi = np.broadcast_to(np.array([[4.0, 4.0, -8.0]]), (m, 3)).copy()
    else:
        raise ValueError(f"unsupported line order {order}")
    return phi, dphi[..., None], d2phi[..., None, None]


def gauss_legendre_01(n: int):
    """n-point Gauss-Legendre rule mapped to [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return ((x + 1.0) / 2.0)[:, None], w / 2.0


def line_element(order: int, quad_order: int) -> ReferenceElement:
    """Lagrange line element with a rule exact for polys of degree quad_order.

    Mirrors `QuadratureRule{RefLine}(order+1)` in the reference
    (`/root/reference/src/utils.jl:45`): quad_order is the target polynomial
    degree; an n-point Gauss rule is exact to degree 2n-1.
    """
    nq = max(1, (quad_order + 2) // 2)
    qp, qw = gauss_legendre_01(nq)
    phi, dphi, d2phi = line_shape(order, qp[:, 0])
    if order == 1:
        nodes = np.array([[0.0], [1.0]])
    else:
        nodes = np.array([[0.0], [1.0], [0.5]])
    return ReferenceElement(
        dim=1,
        order=order,
        n_nodes=order + 1,
        node_coords=nodes,
        q_points=qp,
        q_weights=qw,
        phi=phi,
        dphi=dphi,
        d2phi=d2phi,
    )


# ---------------------------------------------------------------------------
# Triangle elements on the unit reference triangle
# ---------------------------------------------------------------------------


def triangle_shape(order: int, pts: np.ndarray):
    """Shape fns + derivatives on the reference triangle.

    pts: [m, 2] reference coordinates (xi, eta).
    Returns (phi [m,n], dphi [m,n,2], d2phi [m,n,2,2]).
    """
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    xi, eta = pts[:, 0], pts[:, 1]
    lam = np.stack([1.0 - xi - eta, xi, eta], axis=-1)  # [m, 3]
    # gradients of barycentric coords wrt (xi, eta)
    dlam = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # [3, 2]
    m = pts.shape[0]
    if order == 1:
        phi = lam
        dphi = np.broadcast_to(dlam[None], (m, 3, 2)).copy()
        d2phi = np.zeros((m, 3, 2, 2))
    elif order == 2:
        # vertices: N_i = lam_i (2 lam_i - 1); edges (a,b): N = 4 lam_a lam_b
        edges = [(0, 1), (1, 2), (2, 0)]
        phi = np.empty((m, 6))
        dphi = np.empty((m, 6, 2))
        d2phi = np.empty((m, 6, 2, 2))
        for i in range(3):
            phi[:, i] = lam[:, i] * (2 * lam[:, i] - 1)
            dphi[:, i, :] = (4 * lam[:, i, None] - 1) * dlam[i][None, :]
            d2phi[:, i] = 4 * np.outer(dlam[i], dlam[i])[None]
        for k, (a, b) in enumerate(edges):
            i = 3 + k
            phi[:, i] = 4 * lam[:, a] * lam[:, b]
            dphi[:, i, :] = 4 * (
                lam[:, a, None] * dlam[b][None, :] + lam[:, b, None] * dlam[a][None, :]
            )
            d2phi[:, i] = 4 * (
                np.outer(dlam[a], dlam[b]) + np.outer(dlam[b], dlam[a])
            )[None]
    else:
        raise ValueError(f"unsupported triangle order {order}")
    return phi, dphi, d2phi


# Symmetric quadrature rules on the reference triangle (weights sum to 1/2).
_TRI_RULES: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _tri_rule(degree: int):
    """Dunavant-style rules exact to the given polynomial degree."""
    if degree <= 1:
        pts = np.array([[1 / 3, 1 / 3]])
        w = np.array([0.5])
    elif degree == 2:
        pts = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
        w = np.full(3, 1 / 6)
    elif degree == 3:
        # 6-point degree-4 rule (avoids the negative-weight 4-pt rule)
        return _tri_rule(4)
    elif degree == 4:
        a1, b1 = 0.445948490915965, 0.111690794839005
        a2, b2 = 0.091576213509771, 0.054975871827661
        pts = np.array(
            [
                [a1, a1], [1 - 2 * a1, a1], [a1, 1 - 2 * a1],
                [a2, a2], [1 - 2 * a2, a2], [a2, 1 - 2 * a2],
            ]
        )
        w = np.array([b1, b1, b1, b2, b2, b2])
    elif degree == 5:
        a1, b1 = 0.470142064105115, 0.066197076394253
        a2, b2 = 0.101286507323456, 0.062969590272414
        pts = np.array(
            [
                [1 / 3, 1 / 3],
                [a1, a1], [1 - 2 * a1, a1], [a1, 1 - 2 * a1],
                [a2, a2], [1 - 2 * a2, a2], [a2, 1 - 2 * a2],
            ]
        )
        w = np.array([0.1125, b1, b1, b1, b2, b2, b2])
    else:
        raise ValueError(f"unsupported triangle quadrature degree {degree}")
    return pts, w


def triangle_element(order: int, quad_degree: int) -> ReferenceElement:
    qp, qw = _tri_rule(quad_degree)
    phi, dphi, d2phi = triangle_shape(order, qp)
    if order == 1:
        nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    else:
        nodes = np.array(
            [
                [0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                [0.5, 0.0], [0.5, 0.5], [0.0, 0.5],
            ]
        )
    return ReferenceElement(
        dim=2,
        order=order,
        n_nodes=3 * order,
        node_coords=nodes,
        q_points=qp,
        q_weights=qw,
        phi=phi,
        dphi=dphi,
        d2phi=d2phi,
    )


def shape_at(dim: int, order: int, pts: np.ndarray):
    """Shape values/derivatives at arbitrary reference points."""
    if dim == 1:
        return line_shape(order, pts)
    return triangle_shape(order, pts)
