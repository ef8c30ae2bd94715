"""Pre-generate the 1024-instance synthetic Darcy dataset cache.

Writes the exact cache file `solve_darcy_gmrf_fem.py --N_instances 1024
--grid 241 --truth_N_xy 64` expects, so the TPU sweep starts instantly.
Resumable: instances accumulate in a .part.npz every --chunk solves (this
one-core host takes hours for the full set; a kill loses at most one
chunk).

Run niced: `nice -n 19 python experiments/gen_darcy_1024.py`.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--grid", type=int, default=241)
    ap.add_argument("--truth_N_xy", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from diffeqgmrfs_tpu.datasets.darcy import _DarcyTruthSolver, _threshold_grf
    from diffeqgmrfs_tpu.utils.results import datadir

    cache = datadir(
        "input_data", "synthetic",
        f"darcy_g{args.grid}_n{args.n}_t{args.truth_N_xy}.npz",
    )
    if os.path.exists(cache):
        print("cache already complete:", cache)
        return
    part = cache + ".part.npz"
    os.makedirs(os.path.dirname(cache), exist_ok=True)

    # coefficient fields are cheap and deterministic from the seed: always
    # regenerate all of them, resume only the expensive FEM solves
    rng = np.random.default_rng(0)
    coeffs = np.stack(
        [_threshold_grf(rng, args.grid, (12.0, 3.0), 2.5) for _ in range(args.n)]
    )
    done = 0
    sols = []
    if os.path.exists(part):
        z = np.load(part)
        prev = z["sol"]
        done = prev.shape[0]
        sols = [prev]
        print(f"resuming at instance {done}")

    solver = _DarcyTruthSolver(args.truth_N_xy, 1.0, args.grid)
    import time

    buf = []
    t0 = time.time()
    for i in range(done, args.n):
        buf.append(solver.solve(coeffs[i]))
        if len(buf) >= args.chunk or i == args.n - 1:
            sols.append(np.stack(buf))
            buf = []
            merged = np.concatenate(sols)
            sols = [merged]
            np.savez(part, sol=merged)
            rate = (i + 1 - done) / (time.time() - t0)
            print(f"{i + 1}/{args.n}  ({rate:.2f} inst/s)", flush=True)
    final = sols[0]
    np.savez_compressed(cache, sol=final, coeff=coeffs)
    os.remove(part)
    print("wrote", cache)


if __name__ == "__main__":
    main()
