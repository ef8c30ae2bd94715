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


class UnstructuredTriangleMesh(Mesh):
    """Arbitrary triangulation from externally supplied arrays — the
    Ferrite-generality parity path (the reference inherits any Gmsh/
    triangulation through Ferrite, `/root/reference/src/utils.jl:20-40`):
    here topology is DATA, not code.

    Accepts P1 vertex cells [nc, 3] (midpoint nodes are generated when
    `order=2`, local order [v0, v1, v2, m01, m12, m20] matching the
    structured reference elements) or ready P2 cells [nc, 6]. The
    "boundary" node set is derived from edges incident to one cell when
    not supplied. Node numbering is RCM-reordered by default so assembled
    operators stay banded — the BTD solver's structural analog of the
    reference's fill-reducing CHOLMOD ordering
    (`scripts/darcy/solve_darcy_gmrf-fem.jl:169`). Point location uses a
    centroid KD-tree + barycentric membership test (host-side NumPy,
    like every other structure computation)."""

    def __init__(
        self,
        coords: np.ndarray,
        cells: np.ndarray,
        order: int = 2,
        node_sets: dict | None = None,
        reorder: bool = True,
    ):
        coords = np.asarray(coords, dtype=np.float64)
        cells = np.asarray(cells, dtype=np.int64)
        if coords.ndim != 2 or coords.shape[1] != 2:
            raise ValueError("coords must be [n_nodes, 2]")
        ns = {k: np.asarray(v, dtype=np.int64) for k, v in (node_sets or {}).items()}
        edge_mid = None
        if order == 2:
            if cells.shape[1] == 3:
                coords, cells, edge_mid = _p2_from_p1(coords, cells)
            elif cells.shape[1] != 6:
                raise ValueError("order-2 cells must have 3 or 6 nodes")
        elif order == 1:
            if cells.shape[1] != 3:
                raise ValueError("order-1 cells must have 3 nodes")
        else:
            raise ValueError("order must be 1 or 2")
        if edge_mid is not None and ns:
            # midpoint closure: vertex-only node sets (e.g. Gmsh physical
            # curves on P1 input) gain the midpoint of every edge whose
            # both endpoints are in the set — the standard P2 convention
            for k, v in ns.items():
                vset = set(int(x) for x in v)
                mids = [
                    m for (a, b), m in edge_mid.items()
                    if a in vset and b in vset
                ]
                if mids:
                    ns[k] = np.unique(
                        np.concatenate([v, np.asarray(mids, dtype=np.int64)])
                    )
        if "boundary" not in ns:
            ns["boundary"] = _boundary_nodes(cells, order, edge_mid)
        if reorder:
            perm = _rcm_node_order(coords.shape[0], cells)
            iperm = np.empty_like(perm)
            iperm[perm] = np.arange(len(perm))
            coords = coords[perm]
            cells = iperm[cells]
            ns = {k: np.sort(iperm[v]) for k, v in ns.items()}
        super().__init__(
            2, order, coords, cells.astype(np.int32),
            {k: v.astype(np.int32) for k, v in ns.items()},
        )
        verts = self.cell_vertex_coords()  # [nc, 3, 2]
        self._centroids = verts.mean(axis=1)
        self._tree = None

    def locate(self, points: np.ndarray):
        from scipy.spatial import cKDTree

        if self._tree is None:
            self._tree = cKDTree(self._centroids)
        pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
        verts = self.cell_vertex_coords()
        A = verts[:, 0]
        E = np.stack([verts[:, 1] - A, verts[:, 2] - A], axis=-1)  # [nc,2,2]
        Einv = np.linalg.inv(E)
        k = min(16, self.n_cells)
        _, cand = self._tree.query(pts, k=k)
        cand = cand.reshape(len(pts), -1)
        tol = 1e-10
        cell = np.full(len(pts), -1, dtype=np.int64)
        ref = np.zeros((len(pts), 2))
        best_viol = np.full(len(pts), np.inf)
        for j in range(cand.shape[1]):
            c = cand[:, j]
            xi = np.einsum("ped,pd->pe", Einv[c], pts - A[c])
            viol = np.maximum(
                np.maximum(-xi[:, 0], -xi[:, 1]), xi.sum(axis=1) - 1.0
            )
            take = (cell < 0) & (viol <= tol)
            cell[take] = c[take]
            ref[take] = xi[take]
            better = viol < best_viol
            best_viol = np.where(better, viol, best_viol)
            # remember the least-violating candidate as fallback
            fb = better & (cell < 0)
            ref[fb] = xi[fb]
            cell = np.where(fb, -c - 2, cell)
        miss = cell < 0
        if miss.any():
            # accept the nearest cell with clipped reference coords
            cell[miss] = -cell[miss] - 2
            r = np.clip(ref[miss], 0.0, 1.0)
            s = r.sum(axis=1)
            over = s > 1.0
            r[over] /= s[over][:, None]
            ref[miss] = r
        return cell.astype(np.int32), ref


def _p2_from_p1(coords, cells):
    """Insert edge-midpoint nodes; returns (coords, p2_cells, edge->mid)."""
    edges = {}
    n = coords.shape[0]
    new_pts = []
    mids = np.zeros((cells.shape[0], 3), dtype=np.int64)
    pairs = [(0, 1), (1, 2), (2, 0)]
    for c in range(cells.shape[0]):
        for e, (i, j) in enumerate(pairs):
            key = (min(cells[c, i], cells[c, j]), max(cells[c, i], cells[c, j]))
            m = edges.get(key)
            if m is None:
                m = n + len(new_pts)
                edges[key] = m
                new_pts.append(0.5 * (coords[key[0]] + coords[key[1]]))
            mids[c, e] = m
    coords = np.concatenate([coords, np.asarray(new_pts)], axis=0)
    return coords, np.concatenate([cells, mids], axis=1), edges


def _boundary_nodes(cells, order, edge_mid=None):
    """Vertex (+midpoint) nodes of edges incident to exactly one cell."""
    pairs = [(0, 1), (1, 2), (2, 0)]
    count = {}
    for c in range(cells.shape[0]):
        for e, (i, j) in enumerate(pairs):
            key = (min(cells[c, i], cells[c, j]), max(cells[c, i], cells[c, j]))
            count[key] = count.get(key, 0) + 1
    bnodes = set()
    for c in range(cells.shape[0]):
        for e, (i, j) in enumerate(pairs):
            key = (min(cells[c, i], cells[c, j]), max(cells[c, i], cells[c, j]))
            if count[key] == 1:
                bnodes.add(int(cells[c, i]))
                bnodes.add(int(cells[c, j]))
                if order == 2:
                    if edge_mid is not None:
                        bnodes.add(int(edge_mid[key]))
                    else:
                        bnodes.add(int(cells[c, 3 + e]))
    return np.array(sorted(bnodes), dtype=np.int64)


def _rcm_node_order(n_nodes, cells):
    """RCM permutation of the node-node adjacency induced by the cells."""
    import scipy.sparse as sp
    from diffeqgmrfs_tpu.utils.native import rcm_ordering

    nd = cells.shape[1]
    r = np.repeat(cells[:, :, None], nd, axis=2).reshape(-1)
    c = np.repeat(cells[:, None, :], nd, axis=1).reshape(-1)
    A = sp.coo_matrix(
        (np.ones(len(r)), (r, c)), shape=(n_nodes, n_nodes)
    ).tocsr()
    A.sum_duplicates()
    return rcm_ordering(A.indptr.astype(np.int64), A.indices.astype(np.int64))


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
