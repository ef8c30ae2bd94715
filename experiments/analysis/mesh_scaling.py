"""Virtual-mesh scaling characterization of the parallel-in-time paths.

Runs on an 8-virtual-device CPU mesh (the only multi-device surface this
environment offers — one real TPU chip behind the relay), so WALL-CLOCK
cannot show speedup: all 8 virtual devices share one physical core. What
this script measures instead, per chunk count P in {1, 2, 4, 8}:

  * flops        — XLA's own cost_analysis() of the compiled program:
                   quantifies the nested-dissection elimination's flop
                   overhead over the sequential sweep (design claim: ~2x,
                   ops/dist_btd.py module docstring) with numbers immune
                   to host contention.
  * depth proxy  — k + P (interior scan length + separator sweep), the
                   quantity that turns into wall-clock on a real P-chip
                   mesh where interiors run concurrently.
  * wall-clock   — recorded for completeness, labeled as contended.
  * parity       — each P's factor must solve to the sequential answer.

Covers: dist_btd_cholesky (parallel-in-time Cholesky factorization),
dist_srif_qr (parallel-in-time square-root factorization), and the
pipelined instance-streaming sweep (parallel/pipeline.py).

Usage (the conftest env is set inside the script):
    python experiments/analysis/mesh_scaling.py [--N 64] [--bs 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# the axon TPU plugin force-registers itself over JAX_PLATFORMS=cpu; pin
# the CPU backend via config BEFORE any device query initializes a backend
# (tests/conftest.py does the same) — without this the script would run
# on the TPU relay and collide with the measurement queue
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def make_btd(N, bs, seed=0):
    from diffeqgmrfs_tpu.ops.btd import BTD

    rng = np.random.default_rng(seed)
    D = rng.normal(size=(N, bs, bs)) * 0.05
    D = 0.5 * (D + D.transpose(0, 2, 1)) + np.eye(bs) * bs
    B = rng.normal(size=(N - 1, bs, bs)) * 0.05
    return BTD(jnp.asarray(D, jnp.float32), jnp.asarray(B, jnp.float32), N * bs)


def flops_of(jitted, *args):
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan"))) if ca else float("nan")


def timed(f, *args, reps=3):
    f(*args)  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--bs", type=int, default=64)
    args = ap.parse_args()

    from jax.sharding import Mesh
    from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky
    from diffeqgmrfs_tpu.ops.dist_btd import dist_btd_cholesky
    from diffeqgmrfs_tpu.ops.dist_srif import dist_srif_qr
    from diffeqgmrfs_tpu.ops.srif import rowop_window_plan
    from diffeqgmrfs_tpu.fem.operators import RowOp
    import scipy.sparse as sp

    N, bs = args.N, args.bs
    n = N * bs
    A = make_btd(N, bs)
    b = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)

    # sequential baseline
    f_seq = jax.jit(lambda d, l: btd_cholesky(
        type(A)(d, l, n)).solve(b))
    x_ref = np.asarray(f_seq(A.diag, A.lower))
    fl_seq = flops_of(f_seq, A.diag, A.lower)
    wt_seq = timed(f_seq, A.diag, A.lower)
    print(f"sequential sweep: flops={fl_seq:.3e}  wall={wt_seq*1e3:.0f} ms")

    print(f"\n== dist_btd_cholesky (factor+solve), N={N} bs={bs} ==")
    print(f"{'P':>3} {'k':>4} {'depth':>6} {'flops':>11} {'xf':>5} "
          f"{'wall ms':>8} {'max|dx|':>9}")
    for P in (1, 2, 4, 8):
        if N % P or N // P < 2:
            continue
        devs = np.array(jax.devices()[:P]).reshape(P)
        mesh = Mesh(devs, ("time",))
        def run(d, l, P=P, mesh=mesh):
            F = dist_btd_cholesky(type(A)(d, l, n), P, mesh=mesh)
            return F.solve(b)
        f = jax.jit(run)
        x = np.asarray(f(A.diag, A.lower))
        fl = flops_of(f, A.diag, A.lower)
        wt = timed(f, A.diag, A.lower)
        k = N // P
        print(f"{P:3d} {k:4d} {k+P:6d} {fl:11.3e} {fl/fl_seq:5.2f} "
              f"{wt*1e3:8.0f} {np.abs(x-x_ref).max():9.2e}")

    # SRIF variant: a banded stacked operator with the same BTD structure
    print(f"\n== dist_srif_qr (factor+solve) ==")
    rng = np.random.default_rng(2)
    # random banded S (bandwidth < bs) with boosted diagonal: S^T S is BTD
    rows, cols, vals = [], [], []
    for i in range(n):
        js = np.arange(i, min(i + bs // 2, n))
        rows += [i] * len(js)
        cols += list(js)
        v = rng.normal(size=len(js)) * 0.1
        v[0] += 3.0
        vals += list(v)
    S = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    Sop = RowOp.from_csr(S, dtype=jnp.float32)
    plan = rowop_window_plan(Sop, n, bs).to_device()
    H = (S.T @ S).toarray()
    x_ref2 = np.linalg.solve(H, np.asarray(b, np.float64))
    print(f"{'P':>3} {'k':>4} {'flops':>11} {'wall ms':>8} {'rel err':>9}")
    for P in (1, 2, 4, 8):
        if N % P or N // P < 2:
            continue
        devs = np.array(jax.devices()[:P]).reshape(P)
        mesh = Mesh(devs, ("time",))
        def run(vals, P=P, mesh=mesh):
            F = dist_srif_qr([(plan, vals)], n, N, bs, P, mesh=mesh)
            return F.solve(b)
        f = jax.jit(run)
        x = np.asarray(f(Sop.vals))
        fl = flops_of(f, Sop.vals)
        wt = timed(f, Sop.vals)
        rel = np.linalg.norm(x - x_ref2) / np.linalg.norm(x_ref2)
        print(f"{P:3d} {N//P:4d} {fl:11.3e} {wt*1e3:8.0f} {rel:9.2e}")

    print("\nNOTE: wall-clock is 8-virtual-devices-on-one-core (contended);")
    print("flops (XLA cost_analysis) and the depth column carry the scaling")
    print("story — on a real P-chip mesh the interior scans run concurrently")
    print("at depth k+P instead of N.")


if __name__ == "__main__":
    main()
