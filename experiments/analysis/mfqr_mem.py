"""HBM ledger for the chunked multifrontal sqrt-QR factorization.

VERDICT r3 weak #2: the N500 (1e6-dof) runs die RESOURCE_EXHAUSTED inside
the first leaf level while the builder's memory model says ~7 of 15.75 GB
— and the relay exposes no memory_stats. This script replaces conjecture
with two instruments, both chip-free:

1. an ANALYTIC ledger of every device buffer resident at each level of
   `mfqr_factorize_chunked` (exact replay of the driver's allocation
   sequence at `solve_darcy_mfqr.py:340-379`), sized with TPU tiling
   rules (f32/int32 pad [-2] to 8 and [-1] to 128 — the lane padding
   that produced the round-3 "Unpadded 1.23G / Padded 19.70G" compile
   OOMs), and

2. `jax.jit(...).lower().compile().memory_analysis()` of the EXACT
   per-level chunk kernels on the CPU backend (same HLO memory plan
   modulo layout padding) for temp/argument/output accounting.

Usage:
  python experiments/analysis/mfqr_mem.py --N_xy 500 --leaf_target 512 \
      --max_panel_mb 1024 [--compile_levels 0,1,2]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def tpu_padded_bytes(shape, itemsize=4):
    """v5e tiling: [-1] lanes -> 128, [-2] sublanes -> 8 (f32/int32).
    1-D arrays tile linearly (layout {0:T(1024)}): pad to 1024 only — NO
    8x sublane inflation (this is exactly why the round-4 flat operand
    layout wins). f64 is emulated (2x f32 words)."""
    if len(shape) == 0:
        return 128 * 8 * itemsize  # scalar tile
    s = list(shape)
    if len(s) == 1:
        return -(-s[0] // 1024) * 1024 * itemsize
    s[-1] = -(-s[-1] // 128) * 128
    s[-2] = -(-s[-2] // 8) * 8
    n = 1
    for d in s:
        n *= d
    return n * itemsize


def fmt(b):
    return f"{b / 1e9:6.2f} GB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N_xy", type=int, default=500)
    ap.add_argument("--grid", type=int, default=241)
    ap.add_argument("--leaf_target", type=int, default=512)
    ap.add_argument("--max_panel_mb", type=int, default=1024)
    ap.add_argument("--offload_levels", type=int, default=-1)
    ap.add_argument("--compile_levels", type=str, default="",
                    help="comma-separated level indices to run CPU "
                         "memory_analysis on (expensive at big shapes)")
    args = ap.parse_args()

    import jax

    # the axon TPU plugin force-registers itself even when
    # JAX_PLATFORMS=cpu (conftest.py note) — pin CPU after import so this
    # NEVER touches the chip (a mid-sweep run must not OOM the queue job)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.fem.operators import RowOp
    from diffeqgmrfs_tpu.gmrf.affine import AffineMap
    from diffeqgmrfs_tpu.models import MaternSPDE
    from diffeqgmrfs_tpu.models.matern import matern_sqrt_host
    from diffeqgmrfs_tpu.ops.mf_qr import (
        mfqr_chunk_plans,
        structural_cols,
        symbolic_mf_qr,
        _mfqr_chunk_kernel,
    )
    from diffeqgmrfs_tpu.problems.darcy import DarcyFEMObservations

    disc = uniform_unit_square_discretization(
        args.N_xy, element_order=2, use_dirichlet_bc=True
    )
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    n_free = affine.n_free
    print(f"ndofs={disc.ndofs} free={n_free}")

    spde = MaternSPDE(d=2, range=1 / np.sqrt(args.N_xy), smoothness=2)
    Lam = RowOp.from_csr(matern_sqrt_host(spde, disc, affine),
                         dtype=jnp.float32)
    xc = yc = np.linspace(0, 1, args.grid)
    obs = DarcyFEMObservations(
        disc, xc, yc, beta=1.0, inflated_boundary=False, N_xy=args.N_xy,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    coeff0 = jnp.ones((args.grid, args.grid), jnp.float32)
    A0, _ = obs(coeff0)
    A0c = affine.condense_rowop(A0)
    a_cols = structural_cols(
        np.where(np.asarray(affine.s_coef)[np.asarray(A0.cols)] == 0.0,
                 n_free, np.asarray(A0c.cols)),
        np.asarray(A0c.vals), n_free,
    )
    lam_cols = structural_cols(
        np.asarray(Lam.cols), np.asarray(Lam.vals), n_free
    )
    coords_free = np.asarray(disc.mesh.coords)[affine.free_dofs]
    qt = symbolic_mf_qr(
        [lam_cols, a_cols], n_free, coords_free, cut_width=None,
        leaf_target=args.leaf_target,
    )
    nlv = [(p.own.shape[0], p.s, p.f) for p in qt.tree.levels]
    print(f"front tree: {len(nlv)} levels {nlv}")
    plans = mfqr_chunk_plans(qt, args.max_panel_mb << 20)
    off = (args.offload_levels if args.offload_levels >= 0
           else (3 if n_free > 500_000 else 0))

    # ---- static residents (live through the whole factorization) ----
    n_rows_tot = sum(c.shape[0] for c in [lam_cols, a_cols])
    K = qt.K
    print(f"operand stack: rows={n_rows_tot} (lam {lam_cols.shape[0]} "
          f"K={lam_cols.shape[1]}, A {a_cols.shape[0]} "
          f"K={a_cols.shape[1]}) Kmax={K}")
    static = {}
    # operand stack (round-4 FLAT layout: no K->128 lane pad): driver's
    # vals copy (freed only at Mean) + vpad copy + cols_global
    # NB: genuinely 1-D shapes — (1, n) would trigger the 8x sublane pad
    # this very ledger exists to avoid (ADVICE r4)
    static["vals flat"] = tpu_padded_bytes((n_rows_tot * K,))
    static["vpad flat"] = tpu_padded_bytes((n_rows_tot * K + K,))
    static["cols_global flat"] = tpu_padded_bytes((n_rows_tot * K,))
    # driver residents during factorization: Acv + yc + cs (Q64 is
    # host-side until the Mean phase in the round-4 driver)
    static["Acv [n_obs_rows,19]"] = tpu_padded_bytes(
        (a_cols.shape[0], a_cols.shape[1])
    )
    # chunk-plan arrays: ALL levels pre-uploaded (mfqr_chunk_plans_device)
    plan_by_level = []
    for p, (cB, nc, chunks, rc) in enumerate(plans):
        b = 0
        for la in chunks:
            for k, v in la.items():
                b += tpu_padded_bytes(v.shape, v.dtype.itemsize)
        plan_by_level.append(b)
        static[f"plan L{p} ({nc}x{cB} chunks)"] = b
    # solve arrays (mfqr_device_arrays solve_only): own/bnd per level
    arrs_b = 0
    for p, plan in enumerate(qt.tree.levels):
        arrs_b += tpu_padded_bytes(plan.own.shape)
        if hasattr(plan, "bnd") and plan.bnd is not None:
            arrs_b += tpu_padded_bytes(plan.bnd.shape)
    static["solve arrs (own/bnd)"] = arrs_b

    stat_tot = sum(static.values())
    print("\n-- static residents (TPU-padded) --")
    for k, v in sorted(static.items(), key=lambda kv: -kv[1]):
        if v > 50e6:
            print(f"  {fmt(v)}  {k}")
    print(f"  {fmt(stat_tot)}  TOTAL static")

    # ---- per-level dynamic ledger ----
    print("\n-- per-level ledger (TPU-padded) --")
    print("lvl  (B,s,f) cBxnc rc | upad_in upad_out r11+r12 "
          "| panel kern~3x | level peak | +static")
    factor_acc = 0  # accumulated non-streamed fronts from earlier levels
    worst = (0, -1)
    for p, plan in enumerate(qt.tree.levels):
        cB, nc, chunks, rc = plans[p]
        B, s, f = plan.own.shape[0], plan.s, plan.f
        Rm = qt.rlevels[p].rows_src.shape[1]
        u_prev = 0
        if p > 0:
            prev = qt.tree.levels[p - 1]
            u_prev = prev.f - prev.s
        u_next = f - s
        stream = p < off
        upad_in = (tpu_padded_bytes(
            (plans[p - 1][0] * plans[p - 1][1] + 1, u_prev, u_prev + 1))
            if p else 0)
        upad_out = tpu_padded_bytes((nc * cB + 1, u_next, u_next + 1))
        rbuf = 0 if stream else (
            tpu_padded_bytes((nc * cB, s, s))
            + tpu_padded_bytes((nc * cB, s, f - s))
        )
        rows_tot = Rm + 2 * u_prev + s
        panel = tpu_padded_bytes((cB, rows_tot, f + 1))
        if rc:
            panel = tpu_padded_bytes((cB, min(rows_tot, rc + f), f + 1))
        kern = 3 * panel  # QR scratch heuristic; see memory_analysis below
        peak = upad_in + upad_out + rbuf + factor_acc + kern
        tot = peak + stat_tot
        if tot > worst[0]:
            worst = (tot, p)
        print(f" L{p:<2d} ({B},{s},{f}) {cB}x{nc} rc={rc} | "
              f"{fmt(upad_in)} {fmt(upad_out)} {fmt(rbuf)} | "
              f"{fmt(panel)} {fmt(kern)} | {fmt(peak)} | {fmt(tot)}")
        if not stream:
            factor_acc += rbuf
    print(f"\nWORST level: L{worst[1]} at {fmt(worst[0])} "
          f"(chip HBM 15.75 GB)")

    # ---- exact kernel memory_analysis on CPU backend ----
    if args.compile_levels:
        lvls = [int(x) for x in args.compile_levels.split(",")]
        print("\n-- CPU-backend memory_analysis of chunk kernels --")
        for p in lvls:
            cB, nc, chunks, rc = plans[p]
            plan = qt.tree.levels[p]
            B, s, f = plan.own.shape[0], plan.s, plan.f
            Rm = qt.rlevels[p].rows_src.shape[1]
            u_prev = 0
            if p > 0:
                prev = qt.tree.levels[p - 1]
                u_prev = prev.f - prev.s
            la = {k: jnp.asarray(v) for k, v in chunks[0].items()}
            # FLAT vpad (base = rows_src*K) matching the round-4 kernel
            vpad = jnp.zeros((n_rows_tot * K + K,), jnp.float32)
            up_in = (jnp.zeros(
                (plans[p - 1][0] * plans[p - 1][1] + 1, u_prev,
                 u_prev + 1), jnp.float32)
                if p else jnp.zeros((1, 1, 2), jnp.float32))
            kern = jax.jit(
                _mfqr_chunk_kernel,
                static_argnames=("shapes", "qr_impl", "dtype"),
            )
            lowered = kern.lower(
                vpad, la, up_in, (cB, s, f, Rm, u_prev, rc),
                jnp.float32, "xla",
            )
            ma = lowered.compile().memory_analysis()
            print(f" L{p}: args {fmt(ma.argument_size_in_bytes)} "
                  f"out {fmt(ma.output_size_in_bytes)} "
                  f"temp {fmt(ma.temp_size_in_bytes)} "
                  f"gen {fmt(getattr(ma, 'generated_code_size_in_bytes', 0))}")


if __name__ == "__main__":
    main()
