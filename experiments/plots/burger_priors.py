"""Prior-comparison figures: adv-diff vs product-Matérn Burgers priors.

Analog of `/root/reference/scripts/plots/burger_priors.jl`: build both ST
priors on (-6, 6), condition on a Gaussian-bump initial condition, compare
the posterior time slices (mean ± 2 std) against an independent FD Burgers
solve, and save per-time PDF figures.

Usage:
  python experiments/plots/burger_priors.py --N_x 250 --backend cpu
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
    p = base_parser("Burgers prior comparison plots")
    p.add_argument("--N_x", type=int, default=250)
    p.add_argument("--N_t", type=int, default=76)
    p.add_argument("--nu", type=float, default=0.5)
    p.add_argument("--T", type=float, default=3.0)
    p.add_argument("--spatial_range", type=float, default=0.4)
    p.add_argument("--matern_temporal_lengthscale", type=float, default=3.0)
    p.add_argument("--outdir", type=str, default="plots/burger_priors")
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import (
        IntervalMesh,
        FEMDiscretization,
        get_periodic_constraint,
        evaluation_matrix,
        spatial_to_spatiotemporal,
        replicate_over_time,
    )
    from diffeqgmrfs_tpu.models import (
        MaternSPDE,
        AdvectionDiffusionSPDE,
        discretize_advection_diffusion,
        product_matern,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.datasets.burgers import periodic_burgers_fd

    # periodic mesh on (-6, 6) (`burger_priors.jl:50-63`)
    mesh = IntervalMesh(-6.0, 6.0, args.N_x, order=2)
    disc = FEMDiscretization(
        mesh, element_order=2, quad_degree=3, fields=("u",),
        bcs=[(get_periodic_constraint(mesh), 1e-2)],
    )
    ts = np.linspace(0.0, args.T, args.N_t)
    N_t = len(ts)
    x_coords = np.linspace(-6.0, 6.0, 1000)
    ic = np.exp(-(x_coords**2) / 8.0)

    nu_m = 1.5
    kappa = float(np.sqrt(8 * nu_m) / args.spatial_range)
    c = 1.0 / args.nu
    adv_spde = AdvectionDiffusionSPDE(
        d=1, kappa=0.0, alpha=1,
        gamma=jnp.asarray([-c * float(np.mean(ic))]),
        c=c, tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
    )
    log.info("building adv-diff prior...")
    x_adv = discretize_advection_diffusion(
        adv_spde, disc, ts, mean_offset=float(np.mean(ic))
    )
    log.info("building product-Matérn prior...")
    x_pm = product_matern(
        MaternSPDE(d=1, range=args.matern_temporal_lengthscale, smoothness=0,
                   sigma_sq=0.1),
        N_t,
        MaternSPDE(d=1, range=args.spatial_range, smoothness=3, sigma_sq=0.1),
        disc,
    )

    E = evaluation_matrix(disc, x_coords)
    A_ic = spatial_to_spatiotemporal(E, 0, N_t)
    log.info("conditioning...")
    x_adv_c = condition_on_observations(x_adv, A_ic, 1e8, jnp.asarray(ic))
    x_pm_c = condition_on_observations(x_pm, A_ic, 1e5, jnp.asarray(ic))

    # independent FD reference: rescale x -> (x+6)/12, v = u/12, nu -> nu/144
    # maps Burgers on (-6,6) onto the unit periodic domain exactly
    fd = 12.0 * periodic_burgers_fd(ic / 12.0, args.nu / 144.0, ts, n_fd=1024)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.outdir, exist_ok=True)
    E_st = replicate_over_time(E, range(N_t), N_t)

    def slices(x_cond):
        m = np.asarray(E_st.matvec(x_cond.mean())).reshape(N_t, len(x_coords))
        # marginal std per dof, mapped to plot points via nearest (cheap)
        s_dof = np.asarray(x_cond.std()).reshape(N_t, -1)
        return m, s_dof

    m_adv, s_adv = slices(x_adv_c)
    m_pm, s_pm = slices(x_pm_c)
    dof_x = np.asarray(disc.mesh.coords[:, 0])

    order = np.argsort(dof_x)
    for t_plot in (0.0, 1.5, 3.0):
        idx = int(np.argmin(np.abs(ts - t_plot)))
        for label, m, s in (("adv_diff", m_adv, s_adv), ("matern", m_pm, s_pm)):
            fig, ax = plt.subplots(figsize=(4.5, 3))
            ax.plot(x_coords, m[idx], label=f"{label} mean")
            s_interp = np.interp(x_coords, dof_x[order], s[idx][order])
            ax.fill_between(
                x_coords, m[idx] - 2 * s_interp, m[idx] + 2 * s_interp, alpha=0.25
            )
            ax.plot(x_coords, fd[idx], color="orange", lw=2, label="FD reference")
            ax.set_xlim(-6, 6)
            ax.set_ylim(-0.08, 1.08)
            ax.legend()
            fig.tight_layout()
            out = os.path.join(args.outdir, f"{label}_{t_plot}.pdf")
            fig.savefig(out)
            plt.close(fig)
            log.info("saved %s", out)


if __name__ == "__main__":
    main()
