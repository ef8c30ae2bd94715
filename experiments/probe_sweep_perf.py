"""Slope-timed probe: where does the BTD factor sweep's time go on TPU?

The relay's ~26 ms per-call floor hides every sub-30ms op from host-side
timing (probe_factor_perf.py round-2 run: ALL per-op rows pinned at
~27 ms). This probe runs K repetitions of each op inside ONE jitted
fori_loop (input perturbed per iteration to defeat CSE) and divides, so
per-op costs down to ~10 us resolve.

Measures, at the bench shape (N=64 blocks, bs=2048 f32):
  - GEMM peak at HIGHEST (6-pass) and HIGH (3-pass) matmul precision
  - monolithic chol / TRSM, blocked-panel variants, Pallas potrf_winv
  - full sweeps: monolithic, panel=256/512, pallas (+ precision variants)

Usage: python experiments/probe_sweep_perf.py [--bs 2048] [--N 64]
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
    p.add_argument("--ops", action="store_true", help="per-op probes too")
    p.add_argument("--pallas_ops", action="store_true",
                   help="pallas per-op probes only")
    p.add_argument("--batched_ops", action="store_true",
                   help="batched chol/trsm probes (dist-path budget)")
    p.add_argument("--quality", action="store_true",
                   help="solve-residual quality check per sweep kind")
    p.add_argument("--sweeps", type=str, default="mono,pallas",
                   help="comma list: mono,panel256,panel512,pallas")
    p.add_argument("--prec", type=str, default="highest,high")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import diffeqgmrfs_tpu  # noqa: F401
    # everything here is f32; tracing with x64 off keeps i32 loop indices
    # (Mosaic kernels traced under x64 fail the relay AOT-compile helper,
    # and the x64 fori_loop index trips an MLIR lowering-cache KeyError
    # around the enable_x64(False) scope inside potrf_winv)
    jax.config.update("jax_enable_x64", False)
    from diffeqgmrfs_tpu.ops import BTD, btd_cholesky
    from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky_pallas

    N, bs = args.N, args.bs
    key = jax.random.PRNGKey(0)
    diag = jax.random.normal(key, (N, bs, bs), dtype=jnp.float32) * 0.01
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + jnp.eye(
        bs, dtype=jnp.float32
    ) * bs
    lower = jax.random.normal(key, (N - 1, bs, bs), dtype=jnp.float32) * 0.01

    def slope_timed(name, f, *xs, flops=None, K=8):
        """time K-rep loop and 1-rep loop inside jit; slope removes call
        floor AND the one-time input transfer."""

        def loop(reps, *xs):
            def body(i, acc):
                out = f(xs[0] + i.astype(jnp.float32) * 1e-7, *xs[1:])
                return acc + out

            return lax.fori_loop(0, reps, body, jnp.float32(0.0))

        g = jax.jit(loop, static_argnums=0)
        t0 = time.perf_counter()
        float(g(1, *xs))
        comp = time.perf_counter() - t0
        float(g(K, *xs))
        t1 = []
        tK = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(1, *xs))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(g(K, *xs))
            tK.append(time.perf_counter() - t0)
        dt = (min(tK) - min(t1)) / (K - 1)
        msg = f"{name}: {dt * 1e3:.3f} ms (compile {comp:.0f}s)"
        if flops:
            msg += f" = {flops / dt / 1e12:.2f} TF/s"
        print(msg, flush=True)
        return dt

    prec_list = args.prec.split(",")

    # ---- GEMM peak ----
    A = jax.random.normal(key, (bs, bs), dtype=jnp.float32)
    for prec in prec_list:
        slope_timed(
            f"gemm[{bs}] prec={prec}",
            lambda a, p_=prec: jnp.sum(
                jnp.dot(a, a, precision=jax.lax.Precision(
                    "highest" if p_ == "highest" else "high"))
            ),
            A,
            flops=2 * bs**3,
            K=32,
        )

    spd_j = diag[0]
    if args.ops:
        slope_timed("chol monolithic", lambda d: jnp.sum(jnp.linalg.cholesky(d)),
                    spd_j, flops=bs**3 / 3, K=16)
        L = jnp.linalg.cholesky(spd_j)
        B = jax.random.normal(key, (bs, bs), dtype=jnp.float32)
        slope_timed(
            "trsm monolithic",
            lambda b, l: jnp.sum(lax.linalg.triangular_solve(
                l, b, left_side=False, lower=True, transpose_a=True)),
            B, L, flops=bs**3, K=16)
        from diffeqgmrfs_tpu.ops.blocked_factor import (
            blocked_cholesky,
            blocked_tsolve_right_T,
        )
        for panel in (256, 512):
            slope_timed(f"chol panel={panel}",
                        lambda d, p_=panel: jnp.sum(blocked_cholesky(d, p_)),
                        spd_j, flops=bs**3 / 3, K=16)
            slope_timed(
                f"trsm panel={panel}",
                lambda b, l, p_=panel: jnp.sum(
                    blocked_tsolve_right_T(l, b, p_)),
                B, L, flops=bs**3, K=16)

    if args.batched_ops:
        for B_ in (4, 8, 16):
            dB = diag[:B_]
            slope_timed(
                f"chol batched B={B_}",
                lambda d: jnp.sum(jnp.linalg.cholesky(d)),
                dB, flops=B_ * bs**3 / 3, K=8)
        Lb_ = jnp.linalg.cholesky(diag[:8])
        Bb_ = jax.random.normal(key, (8, bs, bs), dtype=jnp.float32)
        slope_timed(
            "trsm batched B=8",
            lambda b, l: jnp.sum(lax.linalg.triangular_solve(
                l, b, left_side=False, lower=True, transpose_a=True)),
            Bb_, Lb_, flops=8 * bs**3, K=8)

    if args.ops or args.pallas_ops:
        from diffeqgmrfs_tpu.ops.pallas_potrf import (
            potrf_winv,
            tsolve_right_T_winv,
        )

        slope_timed("pallas potrf_winv",
                    lambda d: jnp.sum(jnp.tril(potrf_winv(d)[0])),
                    spd_j, flops=bs**3 / 3, K=16)
        Lp, Wp = potrf_winv(spd_j)
        Lp = jnp.tril(Lp)
        Bx = jax.random.normal(key, (bs, bs), dtype=jnp.float32)
        slope_timed(
            "tsolve winv (GEMM chain)",
            lambda b, l, w: jnp.sum(tsolve_right_T_winv(l, w, b)),
            Bx, Lp, Wp, flops=bs**3, K=16)

    # ---- full sweeps ----
    flops = N * (bs**3 / 3 + 2 * bs**3)

    def mk_sweep(kind):
        prec = "float32"
        unroll = 1
        parts = kind.split("@")
        kind = parts[0]
        for p_ in parts[1:]:
            if p_.startswith("u"):
                unroll = int(p_[1:])
            else:
                prec = {"high": "tensorfloat32", "highest": "float32",
                        "bf16": "bfloat16"}[p_]

        def f(d, l):
            if kind == "mono":
                F = btd_cholesky(BTD(d, l, N * bs), precision=prec,
                                 unroll=unroll)
            elif kind.startswith("panel"):
                F = btd_cholesky(
                    BTD(d, l, N * bs), panel=int(kind[5:]), precision=prec
                )
            elif kind == "pallas":
                F = btd_cholesky_pallas(BTD(d, l, N * bs), precision=prec)
            elif kind == "syrk_scan":
                # diagnostic: scan whose body is ONLY the SYRK-shaped GEMM
                # (isolates scan/stacking overhead from chol/trsm cost)
                def step(c, inp):
                    d_i, b_i = inp
                    s = d_i - jnp.dot(
                        c, c.T, precision=jax.lax.Precision(
                            "highest" if prec == "float32" else "high")
                    )
                    return s, s

                _, Ss = lax.scan(step, d[0], (d[1:], l))
                return jnp.sum(jnp.diagonal(Ss, axis1=-2, axis2=-1))
            elif kind == "choltrsm_scan":
                # diagnostic: scan with chol+trsm only, no SYRK
                def step(c, inp):
                    d_i, b_i = inp
                    C = lax.linalg.triangular_solve(
                        c, b_i, left_side=False, lower=True, transpose_a=True
                    )
                    L_i = jnp.linalg.cholesky(d_i)
                    return L_i, C

                L0 = jnp.linalg.cholesky(d[0])
                _, Cs = lax.scan(step, L0, (d[1:], l))
                return jnp.sum(jnp.diagonal(Cs, axis1=-2, axis2=-1))
            elif kind == "chol_scan":
                # diagnostic: chol only (carry unused by chol — pure map)
                def step(c, d_i):
                    L_i = jnp.linalg.cholesky(d_i)
                    return L_i, L_i

                _, Ls_ = lax.scan(step, d[0], d)
                return jnp.sum(jnp.diagonal(Ls_, axis1=-2, axis2=-1))
            elif kind == "chol_scan_nostack":
                # diagnostic: sliced input, scalar output (no stacking)
                def step(c, d_i):
                    L_i = jnp.linalg.cholesky(d_i)
                    return c, jnp.sum(jnp.diagonal(L_i))

                _, ss = lax.scan(step, jnp.float32(0.0), d)
                return jnp.sum(ss)
            elif kind == "chol_scan_noslice":
                # diagnostic: carry-only input (no slicing), stacked output
                def step(c, _):
                    L_i = jnp.linalg.cholesky(c)
                    return c + 1e-7, L_i

                _, Ls_ = lax.scan(step, d[0], jnp.arange(N))
                return jnp.sum(jnp.diagonal(Ls_, axis1=-2, axis2=-1))
            elif kind == "chol_scan_pure":
                # diagnostic: carry-only input, scalar output
                def step(c, _):
                    L_i = jnp.linalg.cholesky(c)
                    return c + 1e-7, jnp.sum(jnp.diagonal(L_i))

                _, ss = lax.scan(step, d[0], jnp.arange(N))
                return jnp.sum(ss)
            elif kind == "trsm_scan":
                # diagnostic: trsm against the carry only
                def step(c, b_i):
                    C = lax.linalg.triangular_solve(
                        c, b_i, left_side=False, lower=True, transpose_a=True
                    )
                    return c, C

                L0 = jnp.linalg.cholesky(d[0])
                _, Cs = lax.scan(step, L0, l)
                return jnp.sum(jnp.diagonal(Cs, axis1=-2, axis2=-1))
            elif kind.startswith("winv"):
                F = btd_cholesky(
                    BTD(d, l, N * bs), winv_trsm=int(kind[4:]),
                    precision=prec, unroll=unroll,
                )
            elif kind.startswith("pw"):
                # blocked-panel chol + winv GEMM-chain trsm, same size
                F = btd_cholesky(
                    BTD(d, l, N * bs), panel=int(kind[2:]),
                    winv_trsm=int(kind[2:]), precision=prec, unroll=unroll,
                )
            elif kind.startswith("dist"):
                from diffeqgmrfs_tpu.ops.dist_btd import dist_btd_cholesky

                F = dist_btd_cholesky(
                    BTD(d, l, N * bs), int(kind[4:]), precision=prec
                )
                return F.log_det()
            else:
                raise ValueError(kind)
            return jnp.sum(jnp.log(jnp.diagonal(F.Ls, axis1=-2, axis2=-1)))

        return f

    def mk_factor(kind, d, l):
        prec = "float32"
        parts = kind.split("@")
        kind = parts[0]
        for p_ in parts[1:]:
            if not p_.startswith("u"):
                prec = {"high": "tensorfloat32", "highest": "float32",
                        "bf16": "bfloat16"}[p_]
        A_ = BTD(d, l, N * bs)
        if kind == "mono":
            return btd_cholesky(A_, precision=prec)
        if kind.startswith("panel"):
            return btd_cholesky(A_, panel=int(kind[5:]), precision=prec)
        if kind == "pallas":
            return btd_cholesky_pallas(A_, precision=prec)
        if kind.startswith("winv"):
            return btd_cholesky(A_, winv_trsm=int(kind[4:]), precision=prec)
        if kind.startswith("pw"):
            return btd_cholesky(A_, panel=int(kind[2:]),
                                winv_trsm=int(kind[2:]), precision=prec)
        if kind.startswith("dist"):
            from diffeqgmrfs_tpu.ops.dist_btd import dist_btd_cholesky

            return dist_btd_cholesky(A_, int(kind[4:]), precision=prec)
        raise ValueError(kind)

    if args.quality:
        # solve residual through each factor vs the BTD matvec (f32 on
        # device; the factor error dominates at these conditions); the
        # operands are jit ARGUMENTS (the relay rejects/stalls on GB-size
        # captured literal constants)
        bvec = jax.random.normal(key, (N * bs,), dtype=jnp.float32)
        for kind in args.sweeps.split(","):
            if "scan" in kind:  # diagnostic kinds are not factors
                continue

            def qual(d, l, b, k_=kind):
                F = mk_factor(k_, d, l)
                x = F.solve(b)
                r = BTD(d, l, N * bs).matvec(x) - b
                return jnp.linalg.norm(r) / jnp.linalg.norm(b)

            rel = float(jax.jit(qual)(diag, lower, bvec))
            print(f"quality {kind}: solve-residual rel {rel:.3e}", flush=True)

    for kind in args.sweeps.split(","):
        slope_timed(f"sweep {kind}", mk_sweep(kind), diag, lower,
                    flops=flops, K=4)


if __name__ == "__main__":
    main()
