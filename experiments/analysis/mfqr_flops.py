"""Multifrontal sqrt-QR flop/size model on the REAL symbolic structure.

Builds the exact Darcy operand stack + dissection tree at a given N_xy
and prints, per level: front count B, pivots s, front width f, operand
rows Rm, panel rows, QR flops (2 r c^2 - 2 c^3 / 3 per front), and factor
storage — then totals and a projected wall-clock at given TF/s rates.
This is the measured-structure half of the BASELINE north-star
projection (<1 s @ 1e6 dofs); the rate half comes from the queue-r3a
mfqr ladder timings.

  python experiments/analysis/mfqr_flops.py --N_xy 128 500 --leaf_target 512
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N_xy", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--leaf_target", type=int, default=512)
    ap.add_argument("--rates", type=float, nargs="+", default=[1.0, 5.0, 15.0],
                    help="assumed QR TF/s for the projection")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.gmrf.affine import AffineMap
    from diffeqgmrfs_tpu.models import MaternSPDE
    from diffeqgmrfs_tpu.models.matern import matern_sqrt_host
    from diffeqgmrfs_tpu.fem.operators import RowOp
    from diffeqgmrfs_tpu.ops.mf_qr import structural_cols, symbolic_mf_qr

    for N in args.N_xy:
        t0 = time.time()
        disc = uniform_unit_square_discretization(
            N, element_order=2, use_dirichlet_bc=True
        )
        affine = AffineMap.from_constraint_handler(disc.constraint_handler)
        n = affine.n_free
        spde = MaternSPDE(d=2, range=1 / np.sqrt(N), smoothness=2)
        Lam = RowOp.from_csr(matern_sqrt_host(spde, disc, affine),
                             dtype=jnp.float32)
        lam_cols = structural_cols(
            np.asarray(Lam.cols), np.asarray(Lam.vals), n
        )
        # observation rows share the stiffness stencil: reuse Lam's
        # structure class for the model (the driver uses the real A rows;
        # structurally both are cell-local). Approximate A rows by one
        # row per free dof with the Lam stencil width.
        t_build = time.time() - t0
        t0 = time.time()
        coords = np.asarray(disc.mesh.coords)[affine.free_dofs]
        qt = symbolic_mf_qr(
            [lam_cols], n, coords, cut_width=None,
            leaf_target=args.leaf_target,
        )
        t_symb = time.time() - t0
        tot_flops = 0.0
        tot_store = 0
        print(f"\n== N_xy={N}: n={n} rows={qt.n_rows} K={qt.K} "
              f"(build {t_build:.1f}s, symbolic {t_symb:.1f}s)")
        print(f"{'lvl':>3} {'B':>6} {'s':>6} {'f':>6} {'Rm':>6} "
              f"{'rows':>7} {'GFLOP':>9} {'store MB':>9}")
        u_prev = 0
        for p, plan in enumerate(qt.tree.levels):
            B, s, f = plan.own.shape[0], plan.s, plan.f
            Rm = qt.rlevels[p].rows_src.shape[1]
            r = Rm + 2 * u_prev + s
            c = f
            fl = B * (2.0 * r * c * c - 2.0 * c**3 / 3.0)
            fl = max(fl, 0.0)
            store = B * (s * f) * 4
            tot_flops += fl
            tot_store += store
            print(f"{p:>3} {B:>6} {s:>6} {f:>6} {Rm:>6} {r:>7} "
                  f"{fl / 1e9:>9.1f} {store / 1e6:>9.1f}")
            u_prev = f - s
        print(f"total QR flops {tot_flops / 1e12:.3f} TF, "
              f"factor ~{tot_store / 1e9:.2f} GB")
        for rate in args.rates:
            print(f"  @ {rate:.0f} TF/s -> {tot_flops / rate / 1e12:.3f} s")


if __name__ == "__main__":
    main()
