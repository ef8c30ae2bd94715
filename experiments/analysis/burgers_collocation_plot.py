"""Collocation-count sweep analysis: rel. error % +- std per N_collocation.

Analog of `/root/reference/_research/burgers_collocation_plot.jl`: collect
the `burgers/gmrf-collocation` sims, group by prior type and collocation
count, print "rel err % +- std" lines and plot error vs N_collocation.

Usage:
  python experiments/analysis/burgers_collocation_plot.py [--plot]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from diffeqgmrfs_tpu.utils.results import collect_results, datadir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()

    rows = collect_results(datadir("sims", "burgers", "gmrf-collocation"))
    if not rows:
        print("no results found")
        return
    by_prior = {}
    for r in rows:
        by_prior.setdefault(r.get("prior_type", "?"), []).append(r)
    series = {}
    for prior, rs in sorted(by_prior.items()):
        rs.sort(key=lambda r: r.get("N_collocation", 0))
        print(f"\n== prior: {prior} ==")
        xs, ys, es = [], [], []
        for r in rs:
            errs = 100 * np.asarray(r["rel_errs"])
            print(
                f"N_collocation={r['N_collocation']:>5}: "
                f"rel err {errs.mean():.2f}% ± {errs.std():.2f}%"
            )
            xs.append(r["N_collocation"]); ys.append(errs.mean()); es.append(errs.std())
        series[prior] = (xs, ys, es)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(4.2, 3.2))
        for prior, (xs, ys, es) in series.items():
            ax.errorbar(xs, ys, yerr=es, marker="o", label=prior)
        ax.set_xlabel("N collocation points")
        ax.set_ylabel("rel. error (%)")
        ax.set_yscale("log")
        ax.legend()
        fig.tight_layout()
        os.makedirs("plots", exist_ok=True)
        out = os.path.join("plots", "burgers_collocation.pdf")
        fig.savefig(out)
        print(f"\nsaved {out}")


if __name__ == "__main__":
    main()
