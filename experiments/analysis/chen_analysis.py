"""Chen24 analysis: collect benchmark results, print tables, plot
error-vs-N and time-vs-N curves.

Analog of `/root/reference/_research/chen_elliptic_analysis.jl` and
`chen_burgers_analysis.jl`: DrWatson `collect_results` over the sims
directories, split by element order, log-scale L2-error and solve-time
plots.

Usage:
  python experiments/analysis/chen_analysis.py [--which elliptic|burgers]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from diffeqgmrfs_tpu.utils.results import collect_results, datadir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", choices=["elliptic", "burgers", "both"], default="both")
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()

    jobs = []
    if args.which in ("elliptic", "both"):
        jobs.append(("elliptic-chen", "N_el_xy"))
    if args.which in ("burgers", "both"):
        jobs.append(("burgers-chen", "N_x"))

    for name, n_key in jobs:
        rows = collect_results(datadir("sims", name))
        if not rows:
            print(f"[{name}] no results found under {datadir('sims', name)}")
            continue
        rows.sort(key=lambda r: (r.get("el_order", 0), r.get(n_key, 0)))
        print(f"\n== {name} ==")
        print(f"{'order':>5} {n_key:>8} {'err_L2':>12} {'err_MAE':>12} "
              f"{'err_rel':>12} {'time_s':>9}")
        for r in rows:
            t = r.get("solve_time_ns", 0) / 1e9
            print(
                f"{r.get('el_order', '?'):>5} {r.get(n_key, '?'):>8} "
                f"{r['err_L2']:>12.4e} {r['err_MAE']:>12.4e} "
                f"{r['err_rel']:>12.4e} {t:>9.2f}"
            )
        if args.plot:
            _plot(name, n_key, rows)


def _plot(name, n_key, rows):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 3.2))
    for order in sorted({r.get("el_order", 1) for r in rows}):
        rs = [r for r in rows if r.get("el_order") == order]
        Ns = [r[n_key] for r in rs]
        ax1.loglog(Ns, [r["err_L2"] for r in rs], "o-", label=f"order {order}")
        ax2.loglog(
            Ns, [r.get("solve_time_ns", 0) / 1e9 for r in rs], "o-",
            label=f"order {order}",
        )
    ax1.set_xlabel(n_key); ax1.set_ylabel("L2 error"); ax1.legend()
    ax2.set_xlabel(n_key); ax2.set_ylabel("Solve time (s)"); ax2.legend()
    fig.tight_layout()
    out = os.path.join("plots", f"{name}_analysis.pdf")
    os.makedirs("plots", exist_ok=True)
    fig.savefig(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
