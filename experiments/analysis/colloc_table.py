"""Digest the Burgers collocation production table (round 4) into the
markdown table RESULTS.md commits — the analog of the reference's
`_research/burgers_collocation_plot.jl:25,41-45` (mean rel_err and mean
NLL vs N_collocation for both priors, with filled sqmahal/NLL arrays).

Usage: python experiments/analysis/colloc_table.py
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

NCS = [0, 5, 10, 25, 100, 250, 500, 1000]
PRIORS = ["adv_diff", "product_matern"]


def main():
    rows = {}
    for f in glob.glob(
        "data/sims/burgers/gmrf-collocation/*N_basis=384*.json"
    ):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        key = (d.get("prior_type"), int(d.get("N_collocation", -1)))
        rows[key] = d

    def fmt(d, field):
        v = [x for x in d.get(field, []) if x is not None]
        if not v:
            return "-"
        m = sum(v) / len(v)
        return f"{m:.3g} (n={len(v)})"

    print("| N_colloc | adv_diff rel_err | adv_diff NLL | "
          "product_matern rel_err | product_matern NLL |")
    print("|---|---|---|---|---|")
    for nc in NCS:
        cells = []
        for prior in PRIORS:
            d = rows.get((prior, nc))
            if d is None:
                cells += ["(pending)", ""]
            else:
                cells += [fmt(d, "rel_errs"), fmt(d, "nlls")]
        print(f"| {nc} | {cells[0]} | {cells[1]} | {cells[2]} | {cells[3]} |")
    done = sum(1 for nc in NCS for p in PRIORS if (p, nc) in rows)
    print(f"\n{done}/16 arms complete")


if __name__ == "__main__":
    main()
