"""Multifrontal vs banded/BTD factor+solve rates on the production
Matérn precision structure — the ROUND-3 DECISION MEASUREMENT for
ROADMAP "Open" item 0 (the <1 s @ 1e6-dof north-star).

Per mesh size: builds H = Q_matern + 10 I, times
  (a) the production banded path: make_btd_pattern scatter +
      btd_cholesky(panel) + solve,
  (b) the level-batched multifrontal (ops/multifrontal.py) with plan
      arrays threaded through the jit signature (relay 413-safe),
and reports wall-clock, true-flop rates, the padded-flop overhead of
level batching, and cross-path solution parity.

Run on the TPU with no flags; --backend cpu smoke-tests the machinery.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", type=str, default=None)
    ap.add_argument("--sizes", type=int, nargs="*", default=[32, 64, 128])
    ap.add_argument("--dtype", type=str, default="f32",
                    choices=["f32", "f64"])
    ap.add_argument("--leaf_target", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401 (x64 enable)

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE
    from diffeqgmrfs_tpu.models.matern import matern_precision_host
    from diffeqgmrfs_tpu.ops import make_btd_pattern
    from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky
    from diffeqgmrfs_tpu.ops.multifrontal import (
        MultifrontalFactor,
        suggest_cut_width,
        symbolic_multifrontal,
        tree_device_arrays,
    )

    dt = jnp.float32 if args.dtype == "f32" else jnp.float64
    print(f"devices: {jax.devices()}  dtype: {args.dtype}", flush=True)

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return out, best

    for N_xy in args.sizes:
        disc = uniform_unit_square_discretization(N_xy, element_order=2)
        spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
        Q = matern_precision_host(spde, disc).tocsr()
        n = Q.shape[0]
        H = (Q + 10.0 * sp.eye(n)).tocsr()
        H.sort_indices()
        coords = np.asarray(disc.mesh.coords)[:n]

        # ---- banded/BTD path -------------------------------------------
        coo = H.tocoo()
        pat = make_btd_pattern(coo.row, coo.col, n)
        vals = jnp.asarray(coo.data, dt)
        A = pat.scatter(vals).add_identity_padding()
        bs, Nb = pat.bs, pat.N
        banded_flops = Nb * (bs**3 / 3 + 2 * bs**3)

        fac_b = jax.jit(lambda A: btd_cholesky(A, panel=256))
        Lb, t_bf = timed(fac_b, A)
        b = jnp.asarray(np.random.default_rng(0).normal(size=n), dt)
        bp = Lb.pad_vec(b) if hasattr(Lb, "pad_vec") else b

        solve_b = jax.jit(lambda L, v: L.solve(v))
        xb, t_bs = timed(solve_b, Lb, b)

        # ---- multifrontal path -----------------------------------------
        t0 = time.perf_counter()
        tree = symbolic_multifrontal(
            H, coords, suggest_cut_width(H, coords),
            leaf_target=args.leaf_target,
        )
        t_sym = time.perf_counter() - t0
        arrs = tree_device_arrays(tree, H.nnz)
        hvals = jnp.asarray(H.data, dt)

        # true + padded flop counts from the tree
        true_fl = pad_fl = 0.0
        for plan in tree.levels:
            B = plan.own.shape[0]
            for bnode in range(B):
                k = int((plan.own[bnode] >= 0).sum())
                m = int((plan.cols[bnode, plan.s:] >= 0).sum())
                true_fl += k**3 / 3 + k * k * m + k * m * m
            pad_fl += B * (
                plan.s**3 / 3
                + plan.s * plan.s * (plan.f - plan.s)
                + plan.s * (plan.f - plan.s) ** 2
            )

        fac_m = jax.jit(
            lambda d, a: MultifrontalFactor.factorize(tree, d, arrs=a)
        )
        Lm, t_mf = timed(fac_m, hvals, arrs)
        solve_m = jax.jit(lambda L, v: L.solve(v))
        xm, t_ms = timed(solve_m, Lm, b)

        rel = float(
            jnp.linalg.norm(xm - xb[:n] if xb.shape[0] > n else xm - xb)
            / jnp.linalg.norm(xm)
        )
        print(
            f"N={N_xy:4d} n={n:7d} | banded bs={bs} fac {t_bf*1e3:9.1f} ms"
            f" ({banded_flops/t_bf/1e12:5.2f} TF/s) solve {t_bs*1e3:8.1f} ms"
            f" | mf levels={len(tree.levels)} fac {t_mf*1e3:9.1f} ms"
            f" (true {true_fl/t_mf/1e12:5.2f} / pad {pad_fl/t_mf/1e12:5.2f}"
            f" TF/s, pad x{pad_fl/max(true_fl,1):.2f}) solve {t_ms*1e3:8.1f} ms"
            f" | sym {t_sym:5.1f} s  xdiff {rel:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
