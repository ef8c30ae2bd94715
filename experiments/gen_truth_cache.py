"""Regenerate a small synthetic Darcy truth cache (CPU).

The VM restart wiped the gitignored data/input_data/synthetic/ caches;
datasets are deterministic from seed 0, so regeneration reproduces the
exact arrays the committed results were measured against (same
generator path as `DarcyDataset.synthetic`, reference analog
`/root/reference/src/datasets/darcy.jl:11`).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--grid", type=int, default=241)
    ap.add_argument("--truth", type=int, required=True)
    ap.add_argument("--tag", action="store_true",
                    help="include _t<truth> in the cache name (mfqr "
                         "driver always tags; the main driver tags only "
                         "when --truth_N_xy is explicit)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from diffeqgmrfs_tpu.datasets.darcy import DarcyDataset
    from diffeqgmrfs_tpu.utils.results import datadir

    name = f"darcy_g{args.grid}_n{args.n}"
    if args.tag:
        name += f"_t{args.truth}"
    cache = datadir("input_data", "synthetic", name + ".npz")
    if os.path.exists(cache):
        print("exists:", cache)
        return
    DarcyDataset.synthetic(
        n_instances=args.n, grid=args.grid, n_xy_fem=args.truth,
        cache=cache,
    )
    print("wrote:", cache)


if __name__ == "__main__":
    main()
