"""Probe: blocked-panel vs monolithic factor kernels on the TPU.

Measures, at the bench shape (N=64 time blocks, bs=2048 f32):
  - raw GEMM peak (the MXU ceiling)
  - monolithic btd_cholesky (XLA chol + TRSM per block)
  - blocked-panel btd_cholesky for several panel sizes
  - standalone chol/TRSM/GEMM per-op costs at [bs, bs]

Timing is scalar-readback (relay-safe). Usage:
  python experiments/probe_factor_perf.py [--N 64] [--bs 2048]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--bs", type=int, default=2048)
    p.add_argument("--backend", type=str, default=None)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.ops import BTD, btd_cholesky

    N, bs = args.N, args.bs
    key = jax.random.PRNGKey(0)
    diag = jax.random.normal(key, (N, bs, bs), dtype=jnp.float32) * 0.01
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + jnp.eye(
        bs, dtype=jnp.float32
    ) * bs
    lower = jax.random.normal(key, (N - 1, bs, bs), dtype=jnp.float32) * 0.01

    def timed(name, f, *xs, flops=None):
        g = jax.jit(f)
        t0 = time.perf_counter()
        float(g(*xs))
        print(f"{name}: compile {time.perf_counter() - t0:.1f}s", flush=True)
        ts = []
        for i in range(args.reps):
            x0 = xs[0] + np.float32((i + 1) * 1e-6)
            float(jnp.sum(x0))
            t0 = time.perf_counter()
            float(g(x0, *xs[1:]))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        msg = f"{name}: {dt * 1e3:.2f} ms"
        if flops:
            msg += f" = {flops / dt / 1e12:.2f} TF/s"
        print(msg, flush=True)
        return dt

    # MXU ceiling
    A = jax.random.normal(key, (bs, bs), dtype=jnp.float32)
    timed(
        "gemm [bs,bs]@[bs,bs] x16",
        lambda a: jnp.sum(sum(jnp.linalg.matrix_power(a, 2) for _ in range(1))
                          ) + jnp.sum((a @ a) @ (a @ a)),
        A,
        flops=3 * 2 * bs**3,
    )

    # standalone per-op costs
    spd = np.asarray(diag[0])
    spd_j = jnp.asarray(spd)
    timed("chol [bs,bs]", lambda d: jnp.sum(jnp.linalg.cholesky(d)), spd_j,
          flops=bs**3 / 3)
    L = jnp.linalg.cholesky(spd_j)
    B = jax.random.normal(key, (bs, bs), dtype=jnp.float32)
    timed(
        "trsm [bs,bs]",
        lambda b, l: jnp.sum(
            jax.lax.linalg.triangular_solve(
                l, b, left_side=False, lower=True, transpose_a=True
            )
        ),
        B, L,
        flops=bs**3,
    )
    from diffeqgmrfs_tpu.ops.blocked_factor import (
        blocked_cholesky,
        blocked_tsolve_right_T,
    )

    for panel in (256, 512):
        timed(
            f"blocked chol p={panel}",
            lambda d, p_=panel: jnp.sum(blocked_cholesky(d, p_)),
            spd_j,
            flops=bs**3 / 3,
        )
        timed(
            f"blocked trsm p={panel}",
            lambda b, l, p_=panel: jnp.sum(blocked_tsolve_right_T(l, b, p_)),
            B, L,
            flops=bs**3,
        )

    flops = N * (bs**3 / 3 + 2 * bs**3)

    def sweep(panel):
        def f(d, l):
            F = btd_cholesky(BTD(d, l, N * bs), panel=panel)
            return jnp.sum(
                jnp.log(jnp.diagonal(F.Ls, axis1=-2, axis2=-1))
            )

        return f

    timed("btd_cholesky monolithic", sweep(None), diag, lower, flops=flops)
    for panel in (256, 512):
        timed(f"btd_cholesky panel={panel}", sweep(panel), diag, lower,
              flops=flops)


if __name__ == "__main__":
    main()
