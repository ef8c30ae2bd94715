"""Interactive-style single-instance Burgers solve (low-level API demo).

Analog of `/root/reference/scripts/solve_burger.jl`: a standalone script that
loads a PDEBench HDF5 (or synthetic) Burgers instance, builds the
spatiotemporal prior, and runs a HAND-ROLLED Gauss-Newton loop against the
low-level API (explicit residual assembly, explicit `add_ata` + BTD Cholesky
refactorization per step with fixed structure — the analog of the
reference's fixed-permutation `cholesky(Q + tau J'J)` loop,
`solve_burger.jl:143-180`). The reference's `extract_blocks` COO -> block-
tridiagonal conversion (`:182-254`) is a no-op here: the precision lives in
block-tridiagonal storage natively. Saves a panel figure of posterior time
slices with 2-std bands instead of a Makie slider.

Usage:
  python experiments/burgers/solve_burger.py --N_x 64 --backend cpu
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from diffeqgmrfs_tpu.utils.experiment import (
    base_parser,
    finalize_args,
    select_backend,
    setup_logging,
)


def parse_cmd():
    p = base_parser("Standalone Burgers GMRF solve")
    p.add_argument("--hdf5", type=str, default=None, help="PDEBench HDF5 path")
    p.add_argument("--N_x", type=int, default=64)
    p.add_argument("--instance", type=int, default=0)
    p.add_argument("--max_newton", type=int, default=10)
    p.add_argument("--outdir", type=str, default="plots")
    p.add_argument("--interactive", action="store_true",
                   help="time-slider exploration window (Makie-slider "
                        "analog, `scripts/solve_burger.jl:4-37`) instead "
                        "of the static panel figure")
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import (
        periodic_unit_interval_discretization,
        evaluation_matrix,
        spatial_to_spatiotemporal,
        replicate_over_time,
    )
    from diffeqgmrfs_tpu.models import (
        MaternSPDE,
        AdvectionDiffusionSPDE,
        discretize_advection_diffusion,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations, ConstrainedGMRF
    from diffeqgmrfs_tpu.gmrf.conditioning import add_ata
    from diffeqgmrfs_tpu.ops import btd_cholesky
    from diffeqgmrfs_tpu.problems import BurgersFEMResidual
    from diffeqgmrfs_tpu.datasets import BurgersDataset
    from diffeqgmrfs_tpu.utils.results import datadir

    if args.hdf5:
        ds = BurgersDataset(args.hdf5)
    else:
        ds = BurgersDataset.synthetic(
            n_instances=2, n_x=129, n_t=26, visc=0.02,
            cache=datadir("input_data", "synthetic", "burger_single.npz"),
        )
    log.info("%s", ds)
    ic = jnp.asarray(ds.get_initial_condition(args.instance))
    soln = np.asarray(ds.get_solution(args.instance))
    x_coords, ts = ds.x_coords, ds.ts
    N_t = len(ts)

    disc = periodic_unit_interval_discretization(args.N_x, element_order=2)
    bulk = float(jnp.mean(ic))
    c = 1.0 / ds.nu
    kappa = float(np.sqrt(8 * 1.5) / np.sqrt(1 / args.N_x))
    spde = AdvectionDiffusionSPDE(
        d=1, kappa=0.0, alpha=1, gamma=jnp.asarray([-c * bulk]), c=c,
        tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=1.5),
    )
    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=bulk)
    E = evaluation_matrix(disc, x_coords)
    A_ic = spatial_to_spatiotemporal(E, 0, N_t)
    x_ic = condition_on_observations(x, A_ic, 1e8, ic)

    # ---- hand-rolled Gauss-Newton (low-level API) ----
    res = BurgersFEMResidual(disc, ts, ds.nu)
    affine = x_ic.affine
    Q = x_ic.inner_gmrf.precision
    mu_prior = x_ic.inner_gmrf.mean()
    tau = 1e12
    w = mu_prior
    Qmu = Q.matvec(mu_prior)
    for it in range(args.max_newton):
        f, J = res.f_and_J(affine.free_to_full(w))
        Jc = affine.condense_rowop(J)
        H = add_ata(Q, Jc, tau)
        F = btd_cholesky(H)
        # delta form (H dx = -grad): numerically preferable to solving for
        # w_new directly — see solvers/gauss_newton.py body
        dx = F.solve(Qmu - Q.matvec(w) - tau * Jc.rmatvec(f))
        w_new = w + dx
        step = float(jnp.linalg.norm(dx))
        r = float(jnp.linalg.norm(f))
        log.info("newton %d: |f| = %.3e, |dx| = %.3e", it, r, step)
        w = w_new
        if step < 1e-8:
            break
    post = ConstrainedGMRF(
        type(x_ic.inner_gmrf).tree_unflatten(
            x_ic.inner_gmrf.tree_flatten()[1], (w, H, F)
        ),
        affine,
    )

    E_st = replicate_over_time(E, range(N_t), N_t)
    mean = np.asarray(E_st.matvec(post.mean())).reshape(N_t, len(x_coords))
    std_dof = np.asarray(post.std()).reshape(N_t, -1)
    dof_x = np.asarray(disc.mesh.coords[:, 0])
    order = np.argsort(dof_x)

    import matplotlib

    if not args.interactive:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.outdir, exist_ok=True)
    if args.interactive:
        # time-slider exploration — the Makie slider analog
        # (`/root/reference/scripts/solve_burger.jl:4-37,288`)
        from matplotlib.widgets import Slider

        fig, ax = plt.subplots(figsize=(8, 5))
        plt.subplots_adjust(bottom=0.2)
        s0 = np.interp(x_coords, dof_x[order], std_dof[0][order])
        (lm,) = ax.plot(x_coords, mean[0], label="posterior mean")
        band = ax.fill_between(
            x_coords, mean[0] - 2 * s0, mean[0] + 2 * s0, alpha=0.3
        )
        (ld,) = ax.plot(x_coords, soln[0], "--", color="orange", label="data")
        ax.legend()
        ax_sl = plt.axes([0.15, 0.05, 0.7, 0.04])
        sl = Slider(ax_sl, "t index", 0, N_t - 1, valinit=0, valstep=1)

        def update(_):
            nonlocal band
            ti = int(sl.val)
            s = np.interp(x_coords, dof_x[order], std_dof[ti][order])
            lm.set_ydata(mean[ti])
            ld.set_ydata(soln[ti])
            band.remove()
            band = ax.fill_between(
                x_coords, mean[ti] - 2 * s, mean[ti] + 2 * s,
                alpha=0.3, color="C0",
            )
            ax.set_title(f"t = {ts[ti]:.3f}")
            fig.canvas.draw_idle()

        sl.on_changed(update)
        plt.show()
        out = None
    else:
        t_idcs = np.linspace(0, N_t - 1, 6).astype(int)
        fig, axes = plt.subplots(2, 3, figsize=(11, 5), sharey=True)
        for ax, ti in zip(axes.ravel(), t_idcs):
            s = np.interp(x_coords, dof_x[order], std_dof[ti][order])
            ax.plot(x_coords, mean[ti], label="posterior mean")
            ax.fill_between(x_coords, mean[ti] - 2 * s, mean[ti] + 2 * s, alpha=0.3)
            ax.plot(x_coords, soln[ti], "--", color="orange", label="data")
            ax.set_title(f"t = {ts[ti]:.2f}")
        axes[0, 0].legend()
        fig.tight_layout()
        out = os.path.join(args.outdir, "solve_burger.png")
        fig.savefig(out, dpi=120)
        log.info("saved %s", out)
    err = np.linalg.norm(mean[1:] - soln[1:]) / np.linalg.norm(soln[1:])
    log.info("trajectory rel_err = %.4e", err)


if __name__ == "__main__":
    main()
