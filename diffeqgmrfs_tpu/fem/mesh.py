"""Structured meshes with static (NumPy) topology and closed-form point location.

Replaces the Ferrite.jl mesh surface the reference consumes
(`generate_grid(QuadraticLine|Line|Triangle|QuadraticTriangle, ...)`,
`create_inflated_rectangle`, facet sets — SURVEY.md §2.3). TPU-first
consequences of going structured:

* node numbering is lexicographic, so assembled operators are *banded* with a
  known half-bandwidth -> block-tridiagonal precision matrices without any
  fill-reducing permutation (the reference leans on CHOLMOD's AMD ordering,
  `scripts/darcy/solve_darcy_gmrf-fem.jl:169`);
* point location (for evaluation/derivative/collocation operators,
  `evaluation_matrix` et al.) is closed-form arithmetic, not a search tree;
* cell -> node index arrays are static int32 NumPy, so assembly jit-compiles
  with fixed shapes.

Unstructured meshes remain possible by constructing `Mesh` directly from
arrays (topology is data, not code); only the structured generators and
`locate` are grid-specific.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Mesh:
    """A simplicial mesh: coordinates, cells, and named node sets."""

    dim: int
    order: int  # geometric/Lagrange order of the cells (1 or 2)
    coords: np.ndarray  # [n_nodes, dim] float64
    cells: np.ndarray  # [n_cells, nodes_per_cell] int32
    node_sets: dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def n_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def nodes_per_cell(self) -> int:
        return self.cells.shape[1]

    def cell_vertex_coords(self) -> np.ndarray:
        """Coordinates of the dim+1 vertex nodes of each cell [nc, dim+1, dim]."""
        return self.coords[self.cells[:, : self.dim + 1]]

    def locate(self, points: np.ndarray):
        """Map physical points to (cell index, reference coords).

        Implemented by structured subclasses; required by evaluation /
        derivative operator construction.
        """
        raise NotImplementedError


# ---------------------------------------------------------------------------
# 1D interval mesh
# ---------------------------------------------------------------------------


class IntervalMesh(Mesh):
    """Uniform interval mesh on [x0, x1] with `n_cells` Lagrange cells.

    Mirrors `generate_grid(QuadraticLine, (N_x,), Vec(x0), Vec(x1))`
    (`/root/reference/scripts/solve_burger.jl:50`,
    `_research/burgers_chen24.jl:103`). Node order: position-sorted (vertices
    and midpoints interleaved), which makes 1D operators tridiagonal /
    pentadiagonal. Cell-local node order follows the reference elements:
    [left vertex, right vertex, midpoint].
    """

    def __init__(self, x0: float, x1: float, n_cells: int, order: int = 2):
        o = order
        n_fine = o * n_cells + 1
        coords = np.linspace(x0, x1, n_fine)[:, None]
        ci = np.arange(n_cells, dtype=np.int32)
        if o == 1:
            cells = np.stack([ci, ci + 1], axis=-1)
        elif o == 2:
            cells = np.stack([2 * ci, 2 * ci + 2, 2 * ci + 1], axis=-1)
        else:
            raise ValueError("order must be 1 or 2")
        node_sets = {
            "left": np.array([0], dtype=np.int32),
            "right": np.array([n_fine - 1], dtype=np.int32),
            "boundary": np.array([0, n_fine - 1], dtype=np.int32),
        }
        super().__init__(1, o, coords, cells.astype(np.int32), node_sets)
        self.x0, self.x1, self.h = float(x0), float(x1), (x1 - x0) / n_cells
        self._n_cells_struct = n_cells

    def locate(self, points: np.ndarray):
        pts = np.asarray(points, dtype=np.float64).reshape(-1)
        cell = np.clip(
            np.floor((pts - self.x0) / self.h).astype(np.int64),
            0,
            self._n_cells_struct - 1,
        )
        xi = (pts - self.x0 - cell * self.h) / self.h
        return cell.astype(np.int32), np.clip(xi, 0.0, 1.0)[:, None]


# ---------------------------------------------------------------------------
# 2D structured triangle mesh (rectangle, optionally inflated)
# ---------------------------------------------------------------------------


class TriangleMesh(Mesh):
    """Structured triangulation of a rectangle [ax,bx] x [ay,by].

    Each of the nx*ny grid quads is split along its (b, d) diagonal into two
    triangles (a,b,d) and (b,c,d) where a=(i,j), b=(i+1,j), c=(i+1,j+1),
    d=(i,j+1) — matching Ferrite's `generate_grid(Triangle, ...)` topology
    (`/root/reference/_research/elliptic_chen24.jl:120`). Fine nodes are
    numbered lexicographically (x fastest), so the half-bandwidth of any
    element-local operator is O(order * nx).
    """

    def __init__(
        self,
        ax: float,
        ay: float,
        bx: float,
        by: float,
        nx: int,
        ny: int,
        order: int = 2,
    ):
        o = order
        onx, ony = o * nx + 1, o * ny + 1
        xs = np.linspace(ax, bx, onx)
        ys = np.linspace(ay, by, ony)
        X, Y = np.meshgrid(xs, ys, indexing="xy")  # [ony, onx]
        coords = np.stack([X.ravel(), Y.ravel()], axis=-1)

        def nid(ix, iy):
            return (iy * onx + ix).astype(np.int32)

        I, J = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        I, J = I.ravel(), J.ravel()  # quad indices
        a = nid(o * I, o * J)
        b = nid(o * (I + 1), o * J)
        c = nid(o * (I + 1), o * (J + 1))
        d = nid(o * I, o * (J + 1))
        if o == 1:
            t1 = np.stack([a, b, d], axis=-1)
            t2 = np.stack([b, c, d], axis=-1)
        else:
            # midpoints on the fine grid
            ab = nid(2 * I + 1, 2 * J)
            bd = nid(2 * I + 1, 2 * J + 1)  # diagonal midpoint (cell center)
            da = nid(2 * I, 2 * J + 1)
            bc = nid(2 * (I + 1), 2 * J + 1)
            cd = nid(2 * I + 1, 2 * (J + 1))
            t1 = np.stack([a, b, d, ab, bd, da], axis=-1)
            t2 = np.stack([b, c, d, bc, cd, bd], axis=-1)
        cells = np.concatenate([t1, t2], axis=0).astype(np.int32)

        IX, IY = np.meshgrid(np.arange(onx), np.arange(ony), indexing="xy")
        IX, IY = IX.ravel(), IY.ravel()
        node_sets = {
            "left": np.where(IX == 0)[0].astype(np.int32),
            "right": np.where(IX == onx - 1)[0].astype(np.int32),
            "bottom": np.where(IY == 0)[0].astype(np.int32),
            "top": np.where(IY == ony - 1)[0].astype(np.int32),
        }
        node_sets["boundary"] = np.unique(
            np.concatenate([node_sets[k] for k in ("left", "right", "bottom", "top")])
        ).astype(np.int32)
        super().__init__(2, o, coords, cells, node_sets)
        self.ax, self.ay = float(ax), float(ay)
        self.hx = (bx - ax) / nx
        self.hy = (by - ay) / ny
        self.nx, self.ny = nx, ny
        self.onx, self.ony = onx, ony

    def add_rect_node_set(self, name: str, x0, y0, x1, y1, tol=1e-9):
        """Tag fine nodes lying on the boundary of [x0,x1] x [y0,y1]."""
        x, y = self.coords[:, 0], self.coords[:, 1]
        inside = (x >= x0 - tol) & (x <= x1 + tol) & (y >= y0 - tol) & (y <= y1 + tol)
        on_edge = (
            (np.abs(x - x0) < tol)
            | (np.abs(x - x1) < tol)
            | (np.abs(y - y0) < tol)
            | (np.abs(y - y1) < tol)
        )
        self.node_sets[name] = np.where(inside & on_edge)[0].astype(np.int32)
        return self.node_sets[name]

    def locate(self, points: np.ndarray):
        pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
        i = np.clip(
            np.floor((pts[:, 0] - self.ax) / self.hx).astype(np.int64), 0, self.nx - 1
        )
        j = np.clip(
            np.floor((pts[:, 1] - self.ay) / self.hy).astype(np.int64), 0, self.ny - 1
        )
        u = (pts[:, 0] - self.ax - i * self.hx) / self.hx
        v = (pts[:, 1] - self.ay - j * self.hy) / self.hy
        u, v = np.clip(u, 0.0, 1.0), np.clip(v, 0.0, 1.0)
        lower = u + v <= 1.0 + 1e-12
        quad = i * self.ny + j  # cells were built with I fastest over J? see below
        # cells array: first all t1 (lower) in (I,J) raveled order, then all t2.
        # I, J raveled with indexing="ij" -> index = i * ny + j.
        cell = np.where(lower, quad, quad + self.nx * self.ny)
        xi = np.where(lower, u, u + v - 1.0)
        eta = np.where(lower, v, 1.0 - u)
        return cell.astype(np.int32), np.stack([xi, eta], axis=-1)


def create_inflated_rectangle(
    x0: float,
    y0: float,
    x1: float,
    y1: float,
    width: float,
    h: float,
    element_order: int = 2,
) -> TriangleMesh:
    """Rectangle mesh with an optional inflated margin of `width`.

    TPU-native analog of the reference's `create_inflated_rectangle`
    (`/root/reference/src/utils.jl:21-29`): triangulates
    [x0-w', x1+w'] x [y0-w', y1+w'] with spacing ~h (w' = ceil(width/h)*h so
    the inner rectangle boundary lies on grid lines) and tags the node set
    "Interior boundary" on the boundary of the inner [x0,x1] x [y0,y1].
    """
    n_in_x = max(1, int(round((x1 - x0) / h)))
    n_in_y = max(1, int(round((y1 - y0) / h)))
    hx = (x1 - x0) / n_in_x
    hy = (y1 - y0) / n_in_y
    n_ext_x = int(np.ceil(width / hx - 1e-12)) if width > 0 else 0
    n_ext_y = int(np.ceil(width / hy - 1e-12)) if width > 0 else 0
    mesh = TriangleMesh(
        x0 - n_ext_x * hx,
        y0 - n_ext_y * hy,
        x1 + n_ext_x * hx,
        y1 + n_ext_y * hy,
        n_in_x + 2 * n_ext_x,
        n_in_y + 2 * n_ext_y,
        order=element_order,
    )
    mesh.add_rect_node_set("Interior boundary", x0, y0, x1, y1, tol=1e-9 + 1e-9 * max(abs(x1), abs(y1)))
    return mesh
