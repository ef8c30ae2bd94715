"""Slope-timed probe: what costs 9.25 s in the N300 SRIF refined mean?

Components at n=358801, K~12, N=97, bs=3712 f32 factor / f64 operators:
  - RowOp-style ELL matvec + rmatvec (f64 gathers)
  - packed R factor solve (TRSV form) vs PackedRInverseSolver (GEMM form)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=358801)
    p.add_argument("--K", type=int, default=12)
    p.add_argument("--N", type=int, default=97)
    p.add_argument("--bs", type=int, default=3712)
    p.add_argument("--backend", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import diffeqgmrfs_tpu  # noqa: F401

    n, K, N, bs = args.n, args.K, args.N, args.bs
    rng = np.random.default_rng(0)
    cols = jnp.asarray(
        np.minimum(
            rng.integers(0, 9, size=(n, K)).cumsum(1)
            + rng.integers(0, n - 9 * K, size=(n, 1)),
            n - 1,
        ).astype(np.int32)
    )
    vals64 = jnp.asarray(rng.normal(size=(n, K)))
    x64 = jnp.asarray(rng.normal(size=n))

    def slope(name, f, *xs, K_=8):
        def loop(reps, *xs):
            def body(i, acc):
                return acc + f(xs[0] + i.astype(xs[0].dtype) * 1e-7, *xs[1:])

            return lax.fori_loop(0, reps, body, jnp.zeros((), xs[0].dtype))

        g = jax.jit(loop, static_argnums=0)
        t0 = time.perf_counter()
        float(g(1, *xs))
        comp = time.perf_counter() - t0
        float(g(K_, *xs))
        t1, tK = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(1, *xs))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(g(K_, *xs))
            tK.append(time.perf_counter() - t0)
        dt = (min(tK) - min(t1)) / (K_ - 1)
        print(f"{name}: {dt * 1e3:.1f} ms (compile {comp:.0f}s)", flush=True)
        return dt

    def ell_matvec(x, v):
        return jnp.sum(jnp.sum(v * x[cols], axis=1))

    def ell_rmatvec(x, v):
        # A^T r: scatter-add of v * r[row] into columns
        r = x[:n]
        contrib = v * r[:, None]
        return jnp.sum(
            jnp.zeros(n, v.dtype).at[cols.reshape(-1)].add(contrib.reshape(-1))
        )

    slope("ell matvec f64", ell_matvec, x64, vals64)
    slope("ell matvec f32", lambda x, v: ell_matvec(x, v),
          x64.astype(jnp.float32), vals64.astype(jnp.float32))
    slope("ell rmatvec f64 (scatter)", ell_rmatvec, x64, vals64)

    # packed factor solves: plain (TRSV) vs inverse (GEMM)
    from diffeqgmrfs_tpu.ops.packed import (
        PackedBTDRFactor,
        PackedRInverseSolver,
    )

    jax.config.update("jax_enable_x64", False)
    key = jax.random.PRNGKey(0)
    didx = jnp.arange(bs) * (bs + 1)
    # free the ELL-section device buffers BEFORE allocating the 5.3 GB
    # production-shape factor (queue-R run OOMed here with them resident)
    del x64, vals64, cols

    @jax.jit
    def _make_P(k):
        # single fused program: one 5.3 GB buffer, no eager .at[].set copy
        P0 = jax.random.normal(k, (N, bs * bs), dtype=jnp.float32) * 0.01
        return P0.at[:, didx].set(
            3.0 + 0.1 * jax.random.normal(k, (N, bs), dtype=jnp.float32)
        )

    P = _make_P(key)
    F = PackedBTDRFactor(P, n, bs)
    b32 = jax.random.normal(key, (n,), dtype=jnp.float32)
    slope("packed solve TRSV f32", lambda b: jnp.sum(F.solve(b)), b32, K_=4)
    # donate the factor into the inverse conversion (same-size buffers)
    W = jax.jit(PackedRInverseSolver.from_factor, donate_argnums=0)(F)
    del F, P
    W.P.block_until_ready()
    slope("packed solve GEMM f32", lambda b: jnp.sum(W.solve(b)), b32, K_=4)


if __name__ == "__main__":
    main()
