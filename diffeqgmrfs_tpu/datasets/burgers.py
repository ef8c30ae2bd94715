"""Burgers dataset (FNO-style .mat / PDEBench HDF5) loader + synthetic
generator.

Analog of `/root/reference/src/datasets/burgers.jl`: `.mat` variables
`input` [N, Nx] (initial conditions), `output` [N, Nt, Nx] (trajectories),
scalar `visc`; plus the PDEBench HDF5 layout consumed by
`scripts/solve_burger.jl:40-47`. Real data is gitignored in the reference, so
`BurgersDataset.synthetic` regenerates matching instances: random-Fourier
initial conditions evolved by an independent periodic FD solver.
"""

from __future__ import annotations

import os

import numpy as np


class BurgersDataset:
    def __init__(self, path=None, input=None, output=None, visc=None):
        if path is not None:
            input, output, visc = _load(path)
        self.input = np.asarray(input)
        self.output = np.asarray(output)
        self.nu = float(np.asarray(visc).reshape(-1)[0])
        self.x_coords = np.linspace(0.0, 1.0, self.input.shape[1])
        self.ts = np.linspace(0.0, 1.0, self.output.shape[1])

    def __len__(self):
        return self.output.shape[0]

    def __repr__(self):
        return (
            f"BurgersDataset with {len(self)} samples of size "
            f"{self.output.shape[1]}x{self.output.shape[2]}"
        )

    def get_initial_condition(self, idx):
        return self.input[idx]

    def get_solution(self, idx):
        """[Nt, Nx] trajectory."""
        return self.output[idx]

    @classmethod
    def synthetic(
        cls,
        n_instances: int = 8,
        n_x: int = 129,
        n_t: int = 51,
        visc: float = 0.01,
        seed: int = 0,
        n_modes: int = 6,
        amplitude: float = 0.5,
        offset_scale: float = 0.6,
        cache: str | None = None,
    ) -> "BurgersDataset":
        if cache and os.path.exists(cache):
            z = np.load(cache)
            return cls(input=z["input"], output=z["output"], visc=z["visc"])
        rng = np.random.default_rng(seed)
        xs = np.linspace(0.0, 1.0, n_x)
        ics = []
        for _ in range(n_instances):
            u = rng.normal() * offset_scale * np.ones_like(xs)
            for k in range(1, n_modes + 1):
                a, b = rng.normal(size=2) * amplitude / k
                u = u + a * np.sin(2 * np.pi * k * xs) + b * np.cos(2 * np.pi * k * xs)
            ics.append(u)
        ics = np.stack(ics)
        ts = np.linspace(0.0, 1.0, n_t)
        out = np.stack(
            [periodic_burgers_fd(ic, visc, ts, n_fd=512) for ic in ics]
        )
        ds = cls(input=ics, output=out, visc=visc)
        if cache:
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            np.savez_compressed(cache, input=ics, output=out, visc=visc)
        return ds


def periodic_burgers_fd(ic, nu, ts, n_fd=512):
    """Independent FD reference solver: semi-implicit (diffusion implicit,
    advection explicit sub-stepped under CFL) on a periodic grid, evaluated
    back on the ic grid. Plays the role of the reference's
    DifferentialEquations.jl check (`scripts/plots/burger_priors.jl:127-159`).
    """
    n = n_fd
    x = np.linspace(0.0, 1.0, n, endpoint=False)
    dx = 1.0 / n
    xs_ic = np.linspace(0.0, 1.0, len(ic))
    u = np.interp(x, xs_ic, ic, period=1.0)
    dt_out = ts[1] - ts[0]
    umax = max(1e-6, np.abs(u).max() * 2.0)
    sub = max(1, int(np.ceil(dt_out / (0.5 * dx / umax))))
    dt = dt_out / sub
    # dense periodic operators sized n: use spectral-free banded solves
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    main = -2.0 * np.ones(n)
    off = np.ones(n - 1)
    L = sp.diags([off, main, off], [-1, 0, 1], format="lil")
    L[0, -1] = 1.0
    L[-1, 0] = 1.0
    L = (nu / dx**2) * L.tocsc()
    A = (sp.eye(n, format="csc") - dt * L).tocsc()
    solve = spla.factorized(A)
    out = [np.interp(xs_ic, x, u, period=1.0)]
    for _ in range(len(ts) - 1):
        for _ in range(sub):
            ux = (np.roll(u, -1) - np.roll(u, 1)) / (2 * dx)
            u = solve(u - dt * u * ux)
        out.append(np.interp(xs_ic, x, u, period=1.0))
    res = np.stack(out)
    res[0] = ic
    return res


def _load(path):
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:
            # PDEBench layout (`scripts/solve_burger.jl:40-47`)
            tensor = np.array(f["tensor"]) if "tensor" in f else None
            if tensor is not None:
                output = tensor
                input = tensor[:, 0, :]
                visc = float(f.attrs.get("visc", f.attrs.get("nu", 0.01)))
                return input, output, visc
            return np.array(f["input"]), np.array(f["output"]), float(
                np.array(f["visc"]).reshape(-1)[0]
            )
    try:
        from scipy.io import loadmat

        d = loadmat(path)
        return d["input"], d["output"], d["visc"]
    except (NotImplementedError, ValueError):
        # v7.3 .mat files are HDF5 (scipy raises NotImplementedError);
        # header-less HDF5 with .mat suffix raises ValueError
        import h5py

        with h5py.File(path, "r") as f:
            return (
                np.array(f["input"]).T,
                np.array(f["output"]).T,
                float(np.array(f["visc"]).reshape(-1)[0]),
            )
