"""Slope-timed probe: XLA QR at the Darcy N300 window shape, standalone
vs inside the window scan (carry-chained), plus the window-panel gather.

The SRIF factor at N_xy=300 (97 windows of [22272, 7424] stacked rows)
runs ~40 s/instance while a standalone QR at that shape measured 200 ms
(round 1) — this probe isolates where the other half goes (in-scan op
degradation vs panel assembly).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=22272)
    p.add_argument("--cols", type=int, default=7424)
    p.add_argument("--windows", type=int, default=4)
    p.add_argument("--backend", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import diffeqgmrfs_tpu  # noqa: F401

    jax.config.update("jax_enable_x64", False)
    R_, C = args.rows, args.cols
    bs = C // 2
    key = jax.random.PRNGKey(0)
    T = jax.random.normal(key, (R_, C), dtype=jnp.float32)

    def slope(name, f, *xs, K=4, flops=None):
        def loop(reps, *xs):
            def body(i, acc):
                return acc + f(xs[0] + i.astype(jnp.float32) * 1e-7, *xs[1:])

            return lax.fori_loop(0, reps, body, jnp.float32(0.0))

        g = jax.jit(loop, static_argnums=0)
        t0 = time.perf_counter()
        float(g(1, *xs))
        comp = time.perf_counter() - t0
        float(g(K, *xs))
        t1, tK = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(1, *xs))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(g(K, *xs))
            tK.append(time.perf_counter() - t0)
        dt = (min(tK) - min(t1)) / (K - 1)
        msg = f"{name}: {dt * 1e3:.1f} ms"
        if flops:
            msg += f" = {flops / dt / 1e12:.2f} TF/s"
        print(msg, flush=True)
        return dt

    qr_flops = 2 * R_ * C * C - 2 * C**3 / 3

    # standalone QR
    slope(
        "qr standalone",
        lambda t: jnp.sum(jnp.linalg.qr(t, mode="r")[: 2 * bs]),
        T,
        flops=qr_flops,
    )

    # engine comparison at the window shape
    from diffeqgmrfs_tpu.ops.srif import _bhh_qr_r, _bcgs_qr_r, _tshh_qr_r

    def _prec(p, f, *a):
        with jax.default_matmul_precision(p):
            return f(*a)

    for name, f in [
        ("bhh p512 reorth", lambda t: _bhh_qr_r(t, 512, True)),
        ("bhh p512 noreorth", lambda t: _bhh_qr_r(t, 512, False)),
        ("bhh p1024 noreorth", lambda t: _bhh_qr_r(t, 1024, False)),
        ("bcgs p512", lambda t: _bcgs_qr_r(t, 512)),
        ("bcgs2 p512", lambda t: _bcgs_qr_r(t, 512, reorth=True)),
        ("bcgs2 p1024", lambda t: _bcgs_qr_r(t, 1024, reorth=True)),
        ("bcgs2 p512 tf32",
         lambda t: _prec("tensorfloat32", _bcgs_qr_r, t, 512, 3, True)),
        ("tshh p512 reorth", lambda t: _tshh_qr_r(t, 512, True)),
        ("tshh p512 noreorth", lambda t: _tshh_qr_r(t, 512, False)),
        ("tshh p512 k16", lambda t: _tshh_qr_r(t, 512, False, 16)),
        ("tshh p256 noreorth", lambda t: _tshh_qr_r(t, 256, False)),
        # reduced-precision trailing updates (panel Householder unaffected;
        # factor error ~ eps_mm * sqrt(cond H), absorbed by refinement
        # while < 1 — srif_precision blueprint knob)
        ("bhh p512 reorth tf32",
         lambda t: _prec("tensorfloat32", _bhh_qr_r, t, 512, True)),
        ("bhh p512 noreorth tf32",
         lambda t: _prec("tensorfloat32", _bhh_qr_r, t, 512, False)),
        ("bhh p512 reorth bf16",
         lambda t: _prec("bfloat16", _bhh_qr_r, t, 512, True)),
    ]:
        try:
            slope(name, lambda t, f=f: jnp.sum(f(t)[: 2 * bs]), T,
                  flops=qr_flops)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # carry-chained window scan: each step overwrites the carry rows of a
    # fresh window stack with the previous R (the srif sweep's data flow)
    W = args.windows
    ops = jax.random.normal(key, (W, R_ - bs, C), dtype=jnp.float32)

    def sweep(o):
        def step(carry, rows):
            Tw = jnp.concatenate([carry, rows], axis=0)
            Rw = jnp.linalg.qr(Tw, mode="r")[: 2 * bs]
            return Rw[:bs, :], jnp.sum(Rw)

        carry0 = jnp.zeros((bs, C), dtype=jnp.float32)
        _, ss = lax.scan(step, carry0, o)
        return jnp.sum(ss)

    dt = slope("qr window-scan", sweep, ops, flops=None)
    print(
        f"  per-window: {dt / W * 1e3:.1f} ms = "
        f"{qr_flops / (dt / W) / 1e12:.2f} TF/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
