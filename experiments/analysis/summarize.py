"""One-table summary of every committed result artifact.

Walks results/ and data/sims/ (params-keyed JSONs from the drivers,
`utils/results.tagsave`) and prints a markdown table of headline metrics
— the quick-look companion to RESULTS.md.

Usage: python experiments/analysis/summarize.py [--write docs/SUMMARY.md]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def _mean(d, key):
    v = d.get(key)
    if isinstance(v, list) and v:
        v = [x for x in v if x is not None]
        return float(np.mean(v)) if v else None
    return None


def row_for(path, d):
    name = os.path.relpath(path).replace("data/sims/", "").replace(
        "results/", ""
    )
    rel = _mean(d, "rel_errs")
    extras = []
    if d.get("throughput_inst_per_s"):
        extras.append(f"{d['throughput_inst_per_s']:.2f} inst/s")
    for k in ("err_L2", "err_rel"):
        if isinstance(d.get(k), (int, float)):
            extras.append(f"{k}={d[k]:.3e}")
    if _mean(d, "nlls") is not None:
        extras.append(f"nll={_mean(d, 'nlls'):.3e}")
    if _mean(d, "dynamics_rel_errs") is not None:
        extras.append(f"dyn={_mean(d, 'dynamics_rel_errs'):.2e}")
    n = len(d.get("rel_errs", []) or [])
    return (
        name,
        f"{rel:.3e}" if rel is not None else "—",
        str(n) if n else "—",
        ", ".join(extras) if extras else "—",
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--write", type=str, default=None)
    args = p.parse_args()
    rows = []
    for pat in ("results/**/*.json", "data/sims/**/*.json"):
        for path in sorted(glob.glob(pat, recursive=True)):
            try:
                with open(path) as f:
                    d = json.load(f)
            except (OSError, ValueError):
                continue
            if not isinstance(d, dict):
                continue
            if not any(k in d for k in (
                "rel_errs", "err_L2", "throughput_inst_per_s",
                "dynamics_rel_errs",
            )):
                continue
            rows.append(row_for(path, d))
    lines = [
        "| result | mean rel_err | n | extras |",
        "|---|---|---|---|",
    ]
    lines += [f"| {a} | {b} | {c} | {d} |" for a, b, c, d in rows]
    out = "\n".join(lines)
    print(out)
    if args.write:
        with open(args.write, "w") as f:
            f.write("# Result summary (auto-generated)\n\n" + out + "\n")


if __name__ == "__main__":
    main()
