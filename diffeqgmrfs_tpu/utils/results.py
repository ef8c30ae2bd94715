"""Result persistence: parameter-addressed JSON files with git tagging.

The TPU analog of the reference's DrWatson usage
(`@tagsave(datadir("sims", ..., savename(params, "jld2")), out_dict)`,
`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:229`): results are
saved as JSON keyed by a `savename` derived from the parameter dict, with the
current git commit recorded, and collected back into tables by
`collect_results`.
"""

from __future__ import annotations

import json
import os
import subprocess

import numpy as np


def savename(params: dict, ext: str = "json") -> str:
    """DrWatson-style parameter-addressed file name (sorted keys)."""
    parts = []
    for k in sorted(params):
        v = params[k]
        if isinstance(v, float):
            v = f"{v:g}"
        parts.append(f"{k}={v}")
    return "_".join(parts) + f".{ext}"


def datadir(*parts) -> str:
    root = os.environ.get("DIFFEQGMRFS_DATA", "data")
    return os.path.join(root, *parts)


def _to_jsonable(x):
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    if hasattr(x, "tolist"):  # jax arrays
        return np.asarray(x).tolist()
    return x


def git_commit() -> str | None:
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return None


def tagsave(path: str, out: dict) -> str:
    """Save a result dict as JSON with git-commit provenance."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = _to_jsonable(out)
    payload["gitcommit"] = git_commit()
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return path


def collect_results(directory: str) -> list[dict]:
    """Load all result JSONs in a directory (DrWatson `collect_results`)."""
    out = []
    if not os.path.isdir(directory):
        return out
    for name in sorted(os.listdir(directory)):
        if name.endswith(".json"):
            with open(os.path.join(directory, name)) as f:
                d = json.load(f)
            d["path"] = os.path.join(directory, name)
            out.append(d)
    return out


class IncrementalSaver:
    """Per-instance JSONL checkpointing for long sweeps.

    The reference saves results only at the very end (`@tagsave`,
    SURVEY.md §5.4) — a crash loses the run. Here the relay environment
    demonstrably kills workers mid-sweep (RESULTS.md kernel faults), so
    drivers append each instance's metrics to `<savename>.partial.jsonl`
    as they complete and SKIP already-recorded instances on restart;
    `finalize()` folds the rows into the usual tagsave dict and removes
    the partial file.
    """

    def __init__(self, path_base: str):
        self.path = path_base + ".partial.jsonl"
        d = os.path.dirname(self.path)
        if d:
            os.makedirs(d, exist_ok=True)
        self.done: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        row = json.loads(line)
                        self.done[int(row["i"])] = row

    def has(self, i: int) -> bool:
        return int(i) in self.done

    def get(self, i: int) -> dict:
        return self.done[int(i)]

    def record(self, i: int, **metrics):
        row = {"i": int(i), **metrics}
        self.done[int(i)] = row
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        return row

    def rows(self):
        return [self.done[i] for i in sorted(self.done)]

    def finalize(self, keep: bool = False):
        if not keep and os.path.exists(self.path):
            os.remove(self.path)
