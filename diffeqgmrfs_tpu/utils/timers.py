"""Phase timers — the TPU analog of the reference's TimerOutputs usage.

The reference wraps every phase in `@timeit to "Phase"` and saves per-phase
nanosecond times (`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:67,
176-197`). On TPU, meaningful wall-clock requires `block_until_ready` on the
phase outputs (XLA dispatch is async) and an explicit warm-up call so that jit
compilation is excluded — the analog of the reference's "Trigger
precompilation" calls (`solve_darcy_gmrf-fem.jl:78,97,165`).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import numpy as np


def _block(x):
    """Force completion of a computation.

    `block_until_ready` is not reliable through remote-dispatch backends
    (observed with the axon TPU relay: it returns before execution
    completes), so we additionally read one scalar element back to the host,
    which cannot complete before the producing computation has.
    """
    x = jax.block_until_ready(x)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[0:1])
            break
    return x


class Timer:
    """Accumulating named timer (nanoseconds, like TimerOutputs)."""

    def __init__(self) -> None:
        self.times_ns: dict[str, int] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter_ns()
        yield
        dt = time.perf_counter_ns() - t0
        self.times_ns[name] = self.times_ns.get(name, 0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def time(self, name: str) -> int:
        """Accumulated time in ns for a phase (TimerOutputs.time analog);
        0 for phases that never completed (e.g. a failed timing re-run)."""
        return self.times_ns.get(name, 0)

    def seconds(self, name: str) -> float:
        return self.times_ns[name] / 1e9

    def as_dict(self) -> dict[str, int]:
        return dict(self.times_ns)

    def __repr__(self) -> str:
        rows = [
            f"  {k}: {v / 1e9:.4f} s (n={self.counts[k]})"
            for k, v in sorted(self.times_ns.items(), key=lambda kv: -kv[1])
        ]
        return "Timer(\n" + "\n".join(rows) + "\n)"


class PhaseTimers(Timer):
    """Timer whose context manager blocks on device results.

    Usage::

        to = PhaseTimers()
        with to("Conditioning"):
            x_cond = condition_on_observations(...)
            to.sync(x_cond.mean)
    """

    def sync(self, *xs):
        for x in xs:
            _block(x)
        return xs[0] if len(xs) == 1 else xs
