"""Slope-timed probe: window-panel construction at Darcy N300 shapes.

srif._window_panel builds each window's dense [R, 2bs] stack by a generic
2D scatter-add — suspected to serialize on TPU (~23 s of the 40 s
N300 instance). Compares:
  - scatter: M.at[arange(R)[:,None], lcols].add(v)   (current)
  - compare: sum_k where(iota == lcols[:,k:k+1], v[:,k:k+1], 0)
  - onehot_gemm: v [R,K] @ onehot(lcols) — K-slot one-hot matmul per row
    block is wrong shape; skipped
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--R", type=int, default=18560)
    p.add_argument("--bs", type=int, default=3712)
    p.add_argument("--K", type=int, default=9)
    p.add_argument("--backend", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import diffeqgmrfs_tpu  # noqa: F401

    jax.config.update("jax_enable_x64", False)
    R, bs, K = args.R, args.bs, args.K
    rng = np.random.default_rng(0)
    # banded rows: K slots within a small span at a per-row offset
    off = rng.integers(0, 2 * bs - 16, size=(R,))
    lcols = jnp.asarray(
        (off[:, None] + rng.integers(0, 16, size=(R, K))).astype(np.int32)
    )
    v = jnp.asarray(rng.normal(size=(R, K)).astype(np.float32))

    def slope(name, f, *xs, K_=4):
        def loop(reps, *xs):
            def body(i, acc):
                return acc + f(xs[0] + i.astype(jnp.float32) * 1e-7, *xs[1:])

            return lax.fori_loop(0, reps, body, jnp.float32(0.0))

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

    def build_scatter(v_):
        M = jnp.zeros((R, 2 * bs), dtype=jnp.float32)
        return jnp.sum(
            M.at[jnp.arange(R)[:, None], lcols].add(v_) ** 2
        )

    def build_compare(v_):
        c = lax.broadcasted_iota(jnp.int32, (1, 2 * bs), 1)
        M = jnp.zeros((R, 2 * bs), dtype=jnp.float32)
        for k in range(K):
            M = M + jnp.where(c == lcols[:, k : k + 1], v_[:, k : k + 1], 0.0)
        return jnp.sum(M**2)

    slope("scatter", build_scatter, v)
    slope("compare", build_compare, v)


if __name__ == "__main__":
    main()
