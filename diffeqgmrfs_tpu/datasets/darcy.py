"""Darcy flow dataset (FNO-style .mat) loader + synthetic generator.

Analog of `/root/reference/src/datasets/darcy.jl`: `.mat` files with
variables `sol` [N, ny, nx] and `coeff` [N, ny, nx] on a uniform unit-square
grid (`piececonst_r241_N1024_smooth1`, see
`data/input_data/Darcy_241/source.txt`). The reference data itself is not
committed (gitignored), so `DarcyDataset.synthetic` regenerates statistically
matching instances: piecewise-constant coefficients from thresholded Gaussian
random fields (the FNO recipe) with classical-FEM reference solutions.
"""

from __future__ import annotations

import os

import numpy as np


def get_xy_idcs(point, x_coords, y_coords):
    """Nearest-gridpoint lookup (`src/datasets/darcy.jl:30-34`)."""
    x_idx = int(np.abs(np.asarray(x_coords) - point[0]).argmin())
    y_idx = int(np.abs(np.asarray(y_coords) - point[1]).argmin())
    return x_idx, y_idx


class DarcyDataset:
    """Darcy dataset with per-instance (solution, coefficient) pairs."""

    def __init__(self, path=None, sol=None, coeff=None):
        if path is not None:
            sol, coeff = _load_mat(path)
        self.sol = np.asarray(sol)
        self.coeff = np.asarray(coeff)
        self.x_coords = np.linspace(0.0, 1.0, self.sol.shape[1])
        self.y_coords = np.linspace(0.0, 1.0, self.sol.shape[2])

    def __len__(self):
        return self.sol.shape[0]

    def __repr__(self):
        return (
            f"DarcyDataset with {len(self)} samples of size "
            f"{self.sol.shape[1]}x{self.sol.shape[2]}"
        )

    def get_problem(self, idx):
        """-> (solution [ny, nx], coeff [ny, nx]) (`darcy.jl:26-28`)."""
        return self.sol[idx], self.coeff[idx]

    @classmethod
    def synthetic(
        cls,
        n_instances: int = 8,
        grid: int = 61,
        n_xy_fem: int = 40,
        seed: int = 0,
        contrast=(12.0, 3.0),
        beta: float = 1.0,
        smoothness: float = 2.5,
        cache: str | None = None,
    ) -> "DarcyDataset":
        """FNO-recipe synthetic instances: coeff = thresholded GRF, solution
        from a classical FEM solve (independent of the GMRF pipeline)."""
        if cache and os.path.exists(cache):
            z = np.load(cache)
            return cls(sol=z["sol"], coeff=z["coeff"])
        rng = np.random.default_rng(seed)
        coeffs = np.stack(
            [
                _threshold_grf(rng, grid, contrast, smoothness)
                for _ in range(n_instances)
            ]
        )
        solver = _DarcyTruthSolver(n_xy_fem, beta, grid)
        # truth solves at production fidelity take minutes/instance on a
        # slow host: shard per instance so a killed generation resumes
        # instead of restarting (the shards are deterministic in seed)
        shard_dir = (cache + ".shards") if cache else None
        if shard_dir:
            os.makedirs(shard_dir, exist_ok=True)
        sols = []
        for i, c in enumerate(coeffs):
            sp = os.path.join(shard_dir, f"{i}.npy") if shard_dir else None
            if sp and os.path.exists(sp):
                sols.append(np.load(sp))
                continue
            s = solver.solve(c)
            if sp:
                np.save(sp, s)
            sols.append(s)
        sols = np.stack(sols)
        ds = cls(sol=sols, coeff=coeffs)
        if cache:
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            np.savez_compressed(cache, sol=sols, coeff=coeffs)
            import shutil

            shutil.rmtree(shard_dir, ignore_errors=True)
        return ds


def _load_mat(path):
    """Load `sol`/`coeff` from v5 or v7.3 .mat files."""
    try:
        from scipy.io import loadmat

        d = loadmat(path)
        return d["sol"], d["coeff"]
    except (NotImplementedError, ValueError):
        # v7.3 .mat files are HDF5 (scipy raises NotImplementedError);
        # header-less HDF5 with .mat suffix raises ValueError
        import h5py

        with h5py.File(path, "r") as f:
            # MATLAB v7.3 stores transposed
            sol = np.array(f["sol"]).T
            coeff = np.array(f["coeff"]).T
        return sol, coeff


def _threshold_grf(rng, grid, contrast, smoothness):
    """Thresholded Gaussian random field on a grid x grid lattice (spectral
    synthesis with power-law decay, the FNO 'piececonst' recipe)."""
    k = np.fft.fftfreq(grid) * grid
    KX, KY = np.meshgrid(k, k, indexing="ij")
    spec = (1.0 + KX**2 + KY**2) ** (-smoothness)
    noise = rng.normal(size=(grid, grid)) + 1j * rng.normal(size=(grid, grid))
    field = np.real(np.fft.ifft2(np.sqrt(spec) * noise))
    field = (field - field.mean()) / (field.std() + 1e-12)
    hi, lo = contrast
    return np.where(field >= 0, hi, lo).astype(np.float64)


class _DarcyTruthSolver:
    """Classical FEM solver for -div(a grad u) = beta, u=0 on the boundary
    (host NumPy/scipy — this is the *data generator*, deliberately
    independent of the JAX solve path).

    Everything coefficient-independent (mesh, quadrature products, scatter
    indices, grid-evaluation operator) is built ONCE and reused across
    instances: on this class of host a per-instance rebuild dominated the
    1024-instance dataset generation.
    """

    def __init__(self, n_xy, beta, grid):
        from diffeqgmrfs_tpu.fem import (
            evaluation_matrix,
            uniform_unit_square_discretization,
        )

        disc = uniform_unit_square_discretization(n_xy, element_order=2)
        g = disc.geometry
        gx = np.linspace(0, 1, grid)
        qc = g.qcoords.reshape(-1, 2)
        self.xi = np.abs(gx[None, :] - qc[:, 0:1]).argmin(axis=1)
        self.yi = np.abs(gx[None, :] - qc[:, 1:2]).argmin(axis=1)
        self.qshape = g.qcoords.shape[:2]
        # weighted gradient outer products: Ke = einsum('cqij,cq', G2w, a_q)
        self.G2w = np.einsum(
            "cq,cqid,cqjd->cqij", g.w_detJ, g.grad, g.grad, optimize=True
        )
        fe = beta * np.einsum("cq,qi->ci", g.w_detJ, g.phi)
        cd = disc.dof_handler.cell_dofs_field("u")
        self.n = disc.ndofs
        nd = cd.shape[1]
        self.r = np.repeat(cd[:, :, None], nd, axis=2).reshape(-1)
        self.c = np.repeat(cd[:, None, :], nd, axis=1).reshape(-1)
        self.free = disc.constraint_handler.free_dofs
        f = np.zeros(self.n)
        np.add.at(f, cd.reshape(-1), fe.reshape(-1))
        self.f_free = f[self.free]
        pts = np.stack(np.meshgrid(gx, gx, indexing="xy"), -1).reshape(-1, 2)
        E = evaluation_matrix(disc, pts)
        # pure-numpy ELL evaluation (no device round-trip per instance)
        self.E_cols = np.asarray(E.cols)
        self.E_vals = np.asarray(E.vals)
        self.grid = grid

    def solve(self, coeff):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        coeff_q = coeff[self.xi, self.yi].reshape(self.qshape)
        Ke = np.einsum("cqij,cq->cij", self.G2w, coeff_q, optimize=True)
        K = sp.coo_matrix(
            (Ke.reshape(-1), (self.r, self.c)), shape=(self.n, self.n)
        ).tocsr()
        u = np.zeros(self.n)
        # two-step slicing: np.ix_ on csr materializes a (n_free x n_free)
        # index temp and overflows scipy's int32 nnz math beyond ~45k free
        u[self.free] = spla.spsolve(
            K[self.free][:, self.free].tocsc(), self.f_free
        )
        # evaluate on the grid: sol[iy, ix] = u(x_ix, y_iy)
        vals = (self.E_vals * u[self.E_cols]).sum(axis=1)
        return vals.reshape(self.grid, self.grid)


def _darcy_fem_solution(coeff, n_xy, beta, grid):
    """One-shot wrapper around _DarcyTruthSolver (kept for tests)."""
    return _DarcyTruthSolver(n_xy, beta, grid).solve(coeff)
