"""Digest the TPU measurement-queue logs into one summary block.

Scans results/tpu_queue/status.tsv for job outcomes and pulls the
bottom-line metric lines (mean rel_err / err_L2 / phase_probe / std) from
each job log — one place to harvest an overnight schedule from.

Usage: python experiments/analysis/queue_digest.py [--since <job>]
"""

import os
import re
import sys

OUT = os.path.join(os.path.dirname(__file__), "..", "..", "results", "tpu_queue")

KEY = re.compile(
    r"mean rel_err|err_L2|phase_probe pass 2|throughput|"
    r"rel_err=|std_norm|n_std_nonfinite|TFLOP|\"value\""
)


def main():
    since = None
    if "--since" in sys.argv:
        since = sys.argv[sys.argv.index("--since") + 1]
    status = os.path.join(OUT, "status.tsv")
    lines = open(status).read().splitlines() if os.path.exists(status) else []
    if since is not None:
        for i, line in enumerate(lines):
            if line.startswith(since):
                lines = lines[i:]
                break
    for line in lines:
        parts = line.split("\t")
        name = parts[0]
        print(f"\n== {line}")
        log = os.path.join(OUT, f"{name}.log")
        if not os.path.exists(log):
            continue
        hits = [l for l in open(log, errors="replace") if KEY.search(l)]
        # last few per job: the bottom lines carry the verdicts
        for l in hits[-6:]:
            print("   ", l.rstrip()[:160])


if __name__ == "__main__":
    main()
