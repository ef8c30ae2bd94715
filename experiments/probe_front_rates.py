"""Slope-timed batched small-factorization rates: the data for the
round-3 multifrontal decision (ROADMAP "Open" item 0).

Nested dissection trades the banded sweep's few BIG MXU-perfect blocks
for MANY small fronts (level-batched: all fronts of a level share a
padded shape). Whether that wins on a TPU depends entirely on the
achievable rate of batched dense POTRF / QR at front sizes 64..2048:

    effective_TFLOPs(front) * ND_flop_ratio  vs  banded rate (16+ TF/s)

This probe slope-times jax.vmap'ed cholesky / qr over batches sized to a
constant total work, printing achieved TFLOP/s per (front, batch). Run on
the TPU (no flags); --backend cpu smoke-tests the machinery.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", type=str, default=None)
    p.add_argument("--work", type=float, default=2e11,
                   help="target flops per timing rep")
    p.add_argument("--fronts", type=int, nargs="*",
                   default=[64, 128, 256, 512, 1024, 2048])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import diffeqgmrfs_tpu  # noqa: F401

    jax.config.update("jax_enable_x64", False)
    key = jax.random.PRNGKey(0)

    def slope(f, xs, K=4, n_it=3):
        g = jax.jit(lambda reps, *a: lax.fori_loop(
            0, reps,
            lambda i, acc: acc + f(*[x + i.astype(x.dtype) * 1e-7
                                     for x in a]),
            jnp.float32(0.0),
        ), static_argnums=0)
        float(g(1, *xs))
        float(g(K, *xs))
        t1 = min(_t(lambda: float(g(1, *xs))) for _ in range(n_it))
        tK = min(_t(lambda: float(g(K, *xs))) for _ in range(n_it))
        return (tK - t1) / (K - 1)

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    from diffeqgmrfs_tpu.ops.batched_factor import batched_cholesky
    from diffeqgmrfs_tpu.ops.srif import _bcgs_qr_r

    print(
        f"{'front':>6} {'batch':>6} {'chol TF/s':>10} {'qr TF/s':>10}"
        f" {'bchol TF/s':>11} {'bqr TF/s':>10}",
        flush=True,
    )
    # memory budget: ~2 GB of batched operands per timed program. The jit
    # holds input + output + the perturbed loop copy (~4 buffers of the
    # operand size) — without this cap the constant-work rule puts 20+ GB
    # on a 16 GB chip at front=64 (observed HBM OOM in the round-2 queue).
    mem_budget = 2e9

    for m in args.fronts:
        chol_fl = m**3 / 3
        qr_fl = 4 * m**3 / 3  # [2m, m] Householder QR
        B = max(1, int(args.work / (chol_fl * 8)))
        B_c = max(1, min(B, int(mem_budget / (4 * m * m * 4))))
        B_q = max(1, min(B, int(mem_budget / (4 * 2 * m * m * 4))))

        def chol(a):
            L = jnp.linalg.cholesky(a)
            return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

        def qr(t):
            R = jax.vmap(lambda x: jnp.linalg.qr(x, mode="r"))(t)
            return jnp.sum(jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1)))

        def bchol(a):
            # level-batched blocked POTRF: unrolled-Crout base + GEMM
            # panels (ops/batched_factor.py)
            L = batched_cholesky(a, panel=min(64, m), base=min(16, m))
            return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

        def bqr(t):
            # all-GEMM bcgs4 engine vmapped over the fronts
            R = jax.vmap(
                lambda x: _bcgs_qr_r(
                    x, panel=min(64, m), passes=4, reorth=True,
                    shift_passes=2,
                )
            )(t)
            return jnp.sum(jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1)))

        A = jax.random.normal(key, (B_c, m, m), dtype=jnp.float32) * 0.01
        A = 0.5 * (A + A.transpose(0, 2, 1)) + 2.0 * jnp.eye(
            m, dtype=jnp.float32
        )
        dt_c = slope(chol, (A,))
        dt_bc = slope(bchol, (A,))
        del A  # free before the QR operand lands (both live would OOM)
        T = jax.random.normal(key, (B_q, 2 * m, m), dtype=jnp.float32)
        dt_q = slope(qr, (T,))
        dt_bq = slope(bqr, (T,))
        del T
        print(
            f"{m:6d} {B_c:6d}/{B_q:<6d} {B_c * chol_fl / dt_c / 1e12:10.2f} "
            f"{B_q * qr_fl / dt_q / 1e12:10.2f} "
            f"{B_c * chol_fl / dt_bc / 1e12:11.2f} "
            f"{B_q * qr_fl / dt_bq / 1e12:10.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
