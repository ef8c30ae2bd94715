"""Real-format dataset fixtures: the .mat / HDF5 loader paths.

The reference's headline runs load FNO .mat files
(`/root/reference/src/datasets/{darcy,burgers}.jl`; data gitignored
upstream). These fixtures exercise the exact on-disk formats: scipy v5
.mat, MATLAB v7.3 (HDF5) .mat, and PDEBench HDF5.
"""

import os
import numpy as np
import pytest

from diffeqgmrfs_tpu.datasets import DarcyDataset, BurgersDataset


def test_darcy_mat_v5_fixture(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(0)
    sol = rng.normal(size=(3, 9, 9))
    coeff = rng.choice([3.0, 12.0], size=(3, 9, 9))
    p = tmp_path / "piececonst_tiny.mat"
    savemat(p, {"sol": sol, "coeff": coeff})
    ds = DarcyDataset(str(p))
    assert len(ds) == 3
    s, c = ds.get_problem(1)
    assert np.allclose(s, sol[1]) and np.allclose(c, coeff[1])
    assert np.allclose(ds.x_coords, np.linspace(0, 1, 9))


def test_darcy_mat_v73_fixture(tmp_path):
    """MATLAB v7.3 files are HDF5 underneath (the real FNO files' format —
    scipy raises NotImplementedError and the loader falls back to h5py)."""
    import h5py

    rng = np.random.default_rng(1)
    sol = rng.normal(size=(2, 7, 7))
    coeff = rng.normal(size=(2, 7, 7))
    p = tmp_path / "darcy_v73.mat"
    # v7.3 = HDF5 with MATLAB's column-major layout (transposed dims)
    with h5py.File(p, "w") as f:
        f["sol"] = sol.T
        f["coeff"] = coeff.T
    # scipy sees an HDF5 signature -> NotImplementedError -> h5py path
    ds = DarcyDataset(str(p))
    assert len(ds) == 2
    s, c = ds.get_problem(0)
    assert np.allclose(s, sol[0]) and np.allclose(c, coeff[0])


def test_burgers_mat_v5_fixture(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(2)
    inp = rng.normal(size=(4, 17))
    out = rng.normal(size=(4, 6, 17))
    p = tmp_path / "burgers_tiny.mat"
    savemat(p, {"input": inp, "output": out, "visc": 0.01})
    ds = BurgersDataset(str(p))
    assert len(ds) == 4
    assert ds.nu == 0.01
    assert np.allclose(ds.get_initial_condition(2), inp[2])
    assert np.allclose(ds.get_solution(3), out[3])
    assert len(ds.ts) == 6


def test_burgers_pdebench_hdf5_fixture(tmp_path):
    import h5py

    rng = np.random.default_rng(3)
    tensor = rng.normal(size=(2, 5, 11))
    p = tmp_path / "1D_Burgers_Sols_Nu0.001.hdf5"
    with h5py.File(p, "w") as f:
        f["tensor"] = tensor
        f.attrs["visc"] = 0.001
    ds = BurgersDataset(str(p))
    assert len(ds) == 2
    assert ds.nu == 0.001
    assert np.allclose(ds.get_solution(1), tensor[1])
    assert np.allclose(ds.get_initial_condition(0), tensor[0, 0])


def test_incremental_saver(tmp_path):
    from diffeqgmrfs_tpu.utils.results import IncrementalSaver

    base = str(tmp_path / "run.json")
    s = IncrementalSaver(base)
    s.record(0, rel_err=0.1)
    s.record(2, rel_err=0.3)
    # restart picks up completed instances
    s2 = IncrementalSaver(base)
    assert s2.has(0) and s2.has(2) and not s2.has(1)
    assert s2.get(2)["rel_err"] == 0.3
    s2.record(1, rel_err=0.2)
    assert [r["i"] for r in s2.rows()] == [0, 1, 2]
    s2.finalize()
    import os as _os

    assert not _os.path.exists(base + ".partial.jsonl")


def test_darcy_synthetic_generation_resumes_from_shards(tmp_path):
    """Truth generation shards per instance: a killed generation (the
    production-fidelity solves take minutes each on a slow host) resumes
    from the per-instance .npy shards instead of restarting."""
    import numpy as np
    from diffeqgmrfs_tpu.datasets import DarcyDataset

    c = str(tmp_path / "t.npz")
    ds = DarcyDataset.synthetic(n_instances=2, grid=13, n_xy_fem=8, cache=c)
    assert os.path.exists(c) and not os.path.exists(c + ".shards")
    # simulate a kill after instance 0: shard present, cache absent —
    # regeneration must reuse the shard (we poison it to prove reuse)
    os.remove(c)
    os.makedirs(c + ".shards", exist_ok=True)
    marker = np.full_like(np.asarray(ds.sol[0]), 7.25)
    np.save(os.path.join(c + ".shards", "0.npy"), marker)
    ds2 = DarcyDataset.synthetic(n_instances=2, grid=13, n_xy_fem=8, cache=c)
    assert np.allclose(np.asarray(ds2.sol[0]), marker)  # shard was reused
    assert np.allclose(np.asarray(ds2.sol[1]), np.asarray(ds.sol[1]))
    assert not os.path.exists(c + ".shards")  # cleaned after cache write
