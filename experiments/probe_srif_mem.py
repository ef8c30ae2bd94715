"""Memory bisection probe for the SRIF windowed QR at production shapes.

Compiles srif_packed_qr (or ablations) at Darcy N_xy=300-like shapes on the
TPU relay and reports either success timings or the relay's exact
"Used X of 15.75G" OOM numbers. Usage:

  python experiments/probe_srif_mem.py --mode full|noqr|qronly [--N 97]
      [--bs 3712] [--rl 15000] [--ra 3800] [--K 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

p = argparse.ArgumentParser()
p.add_argument("--mode", default="full")
p.add_argument("--N", type=int, default=97)
p.add_argument("--bs", type=int, default=3712)
p.add_argument("--rl", type=int, default=15000, help="rows/window, Lambda")
p.add_argument("--ra", type=int, default=3800, help="rows/window, A")
p.add_argument("--K", type=int, default=40)
p.add_argument("--backend", default=None)
args = p.parse_args()

import numpy as np
import jax

if args.backend:
    jax.config.update("jax_platforms", args.backend)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.ata_windows import ATAWindowPlan
from diffeqgmrfs_tpu.ops.srif import srif_packed_qr, _window_panel

N, bs, K = args.N, args.bs, args.K
n = N * bs - bs // 2
Nw = N - 1
rng = np.random.default_rng(0)


def fake_plan(rows_per_window):
    R = rows_per_window
    n_rows = Nw * R
    rows = np.arange(n_rows, dtype=np.int32).reshape(Nw, R)
    mask = np.ones((Nw, R), dtype=np.float32)
    lcols = rng.integers(0, 2 * bs, size=(Nw, R, K)).astype(np.int32)
    return ATAWindowPlan(rows, mask, lcols, n, N, bs), n_rows


plan_l, nl = fake_plan(args.rl)
plan_a, na = fake_plan(args.ra)
vals_l = jnp.asarray(rng.normal(size=(nl, K)).astype(np.float32))
vals_a = jnp.asarray(rng.normal(size=(na, K)).astype(np.float32))


def run_full(pl, pa, vl, va):
    F = srif_packed_qr([(pl, vl), (pa, va)], n, N, bs)
    return jnp.sum(jnp.abs(jnp.diagonal(F.P, axis1=-2, axis2=-1)))


def run_noqr(pl, pa, vl, va):
    """Same loop/panel/update structure, QR replaced by a cheap reduction
    (isolates panel+P-buffer memory from QR-internal memory)."""
    P0 = jnp.zeros((N, bs, bs), dtype=jnp.float32)
    carry0 = jnp.zeros((bs, 2 * bs), dtype=jnp.float32)

    def body(b, state):
        P, carry = state
        T = jnp.concatenate(
            [carry,
             _window_panel(pl, vl, b, bs, jnp.float32),
             _window_panel(pa, va, b, bs, jnp.float32)],
            axis=0,
        )
        R_T = T[: 2 * bs] + T[-2 * bs:]  # stand-in, same shape as qr output
        Pb = lax.dynamic_slice(P, (b, 0, 0), (1, bs, bs))
        P = lax.dynamic_update_slice(
            P, Pb + jnp.tril(R_T[:bs, :bs].T)[None], (b, 0, 0))
        Pb1 = lax.dynamic_slice(P, (b + 1, 0, 0), (1, bs, bs))
        P = lax.dynamic_update_slice(
            P, Pb1 + jnp.triu(R_T[:bs, bs:].T, 1)[None], (b + 1, 0, 0))
        return P, jnp.pad(R_T[bs:, bs:], ((0, 0), (0, bs)))

    P, carry = lax.fori_loop(0, Nw, body, (P0, carry0))
    return jnp.sum(jnp.abs(jnp.diagonal(P, axis1=-2, axis2=-1)))


def run_qronly(pl, pa, vl, va):
    """One QR of a T-sized panel inside a fori_loop (QR-internal memory)."""
    m = bs + args.rl + args.ra
    T0 = jnp.zeros((m, 2 * bs), dtype=jnp.float32)

    def body(b, acc):
        T = T0.at[0, 0].set(acc)
        R_T = jnp.linalg.qr(T, mode="r")[: 2 * bs]
        return acc + jnp.sum(jnp.abs(jnp.diagonal(R_T)))

    return lax.fori_loop(0, Nw, body, jnp.float32(0.0))


fn = {"full": run_full, "noqr": run_noqr, "qronly": run_qronly}[args.mode]
f = jax.jit(fn)
pl_d, pa_d = jax.device_put(plan_l), jax.device_put(plan_a)
t0 = time.perf_counter()
out = float(f(pl_d, pa_d, vals_l, vals_a))
t1 = time.perf_counter()
print(f"mode={args.mode} compile+run {t1 - t0:.1f}s out={out:.3e}", flush=True)
t0 = time.perf_counter()
out = float(f(pl_d, pa_d, vals_l + 1e-6, vals_a))
print(f"second run {time.perf_counter() - t0:.2f}s", flush=True)
