"""Burgers GMRF-collocation sweep with adv-diff or product-Matérn priors.

TPU-native analog of
`/root/reference/scripts/burgers/solve_burgers_gmrf-collocation.jl`: the PDE
residual is enforced pointwise at N_collocation points (evaluation + first/
second derivative operators), with either the advection-diffusion ST prior
or a separable product-Matérn prior; extra calibration metrics: squared
Mahalanobis distance of the interpolated true solution under the posterior
and the NLL via the factor log-determinant.

Usage:
  python experiments/burgers/solve_burgers_gmrf_collocation.py \
      --N_basis 64 --N_collocation 64 --prior_type adv_diff
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
    p = base_parser("Burgers GMRF-collocation sweep")
    p.add_argument("--datasetname", type=str, default="synthetic")
    p.add_argument("--N_basis", type=int, default=64)
    p.add_argument("--N_collocation", type=int, default=64)
    p.add_argument("--prior_type", type=str, default="adv_diff",
                   choices=["adv_diff", "product_matern"])
    p.add_argument("--matern_temporal_lengthscale", type=float, default=3.0)
    p.add_argument("--matern_spatial_lengthscale", type=float, default=0.02)
    p.add_argument("--N_samples", type=int, default=30)
    p.add_argument("--N_instances", type=int, default=8)
    p.add_argument("--nu", type=float, default=0.01)
    p.add_argument("--n_t_data", type=int, default=26)
    p.add_argument("--n_x_data", type=int, default=129)
    p.add_argument("--max_steps", type=int, default=30,
                   help="Gauss-Newton step cap (the 15-step default was "
                        "binding at N_basis >= 192: every instance exited "
                        "on the cap, not the decrement)")
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
        product_matern,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import BurgersCollocationResidual
    from diffeqgmrfs_tpu.solvers import (
        gauss_newton_solve,
        NewtonDecrementCriterion,
        StepNumberCriterion,
        OrCriterion,
    )
    from diffeqgmrfs_tpu.datasets import BurgersDataset
    from diffeqgmrfs_tpu.metrics import rel_err, rmse, max_err
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    params = dict(
        datasetname=args.datasetname,
        N_basis=args.N_basis,
        N_collocation=args.N_collocation,
        prior_type=args.prior_type,
        matern_temporal_lengthscale=args.matern_temporal_lengthscale,
        matern_spatial_lengthscale=args.matern_spatial_lengthscale,
        dry_run=args.dry_run,
        N_samples=args.N_samples,
    )
    log.info("params: %s", params)
    to = PhaseTimers()

    mat_path = datadir("input_data", "Burgers", f"{args.datasetname}.mat")
    if args.datasetname != "synthetic" and os.path.exists(mat_path):
        ds = BurgersDataset(mat_path)
    else:
        ds = BurgersDataset.synthetic(
            n_instances=args.N_instances, n_x=args.n_x_data, n_t=args.n_t_data,
            visc=args.nu,
            cache=datadir("input_data", "synthetic",
                          f"burgers_v{args.nu:g}_t{args.n_t_data}_x{args.n_x_data}_n{args.N_instances}.npz"),
        )
    log.info("%s", ds)
    x_coords, ts = ds.x_coords, ds.ts
    N_t = len(ts)

    with to("Mesh generation"):
        disc = periodic_unit_interval_discretization(args.N_basis, element_order=2)
    with to("Etc"):
        E = evaluation_matrix(disc, x_coords)
        E_st = replicate_over_time(E, range(N_t), N_t)
        A_ic = spatial_to_spatiotemporal(E, 0, N_t)
        A_soln = E_st
    with to("PDE Discretization (Linear part)"):
        # N_collocation = 0 is a legitimate sweep rung (the reference's
        # collocation-count analysis starts at 0: IC-conditioned prior
        # only, no PDE information — `_research/burgers_collocation_plot.jl:25`)
        if args.N_collocation > 0:
            dx = 1.0 / args.N_collocation
            coll = np.linspace(
                x_coords[0] + dx, x_coords[-1] - dx, args.N_collocation
            )
            res = BurgersCollocationResidual(disc, ts, ds.nu, coll)
        else:
            res = None

    c = 1.0 / ds.nu
    nu_matern = 1.5
    kappa_s = float(np.sqrt(8 * nu_matern) / args.matern_spatial_lengthscale)
    noise_ic = 1e8
    noise_collocation = 1e8

    def make_prior(ic):
        if args.prior_type == "adv_diff":
            bulk = jnp.mean(ic)
            spde = AdvectionDiffusionSPDE(
                d=1, kappa=0.0, alpha=1,
                gamma=jnp.asarray([-c * bulk]),
                c=c, tau=0.1 * np.sqrt(c),
                spatial_spde=MaternSPDE(d=1, kappa=kappa_s, nu=nu_matern),
                initial_spde=MaternSPDE(d=1, kappa=kappa_s, nu=nu_matern),
            )
            return discretize_advection_diffusion(
                spde, disc, ts, mean_offset=bulk
            )
        return product_matern(
            MaternSPDE(d=1, range=args.matern_temporal_lengthscale,
                       smoothness=0, sigma_sq=0.1),
            N_t,
            MaternSPDE(d=1, range=args.matern_spatial_lengthscale,
                       smoothness=3, sigma_sq=0.1),
            disc,
        )

    def solve_instance(ic, soln_flat, key):
        x = make_prior(ic)
        x_ic = condition_on_observations(x, A_ic, noise_ic, ic)
        ic_pred = E_st.matvec(x_ic.mean()).reshape(N_t, len(x_coords))
        if res is None:  # N_collocation = 0: the posterior IS x_ic
            post = x_ic.factorize() if hasattr(x_ic, "factorize") else x_ic
            n_steps = jnp.zeros((), jnp.int32)
        else:
            result = gauss_newton_solve(
                x_ic.inner_gmrf.mean(),
                x_ic.inner_gmrf.precision,
                res.f_and_J,
                noise_collocation,
                jnp.zeros(res.n_rows),
                x_ic.inner_gmrf.mean(),
                criterion=OrCriterion(
                    [NewtonDecrementCriterion(1e-6),
                     StepNumberCriterion(args.max_steps)]
                ),
                affine=x_ic.affine,
            )
            post = result.posterior(affine=x_ic.affine)
            n_steps = result.n_steps
        pred = E_st.matvec(post.mean()).reshape(N_t, len(x_coords))
        std = post.std()
        smp = post.sample(key, 1)
        # calibration: interpolate the true solution into dof space
        # (`solve_burgers_gmrf-collocation.jl:200-215`)
        x_soln = condition_on_observations(x, A_soln, 1e12, soln_flat)
        soln_dofs = x_soln.inner_gmrf.mean()
        sqm = post.inner_gmrf.sqmahal(soln_dofs)
        n = soln_dofs.shape[-1]
        log_det_sigma = -post.inner_gmrf.log_det_precision()
        nll = 0.5 * (n * jnp.log(2 * jnp.pi) + sqm + log_det_sigma)
        return pred, ic_pred, std, smp, n_steps, sqm, nll

    solve_jit = jax.jit(solve_instance)
    key = jax.random.PRNGKey(985368934)

    def inputs(i):
        ic = np.asarray(ds.get_initial_condition(i))
        soln = np.array(ds.get_solution(i))
        soln[0] = ic
        return jnp.asarray(ic), jnp.asarray(soln.reshape(-1))

    with to("Prior construction + first solve (compile)"):
        out0 = solve_jit(*inputs(0), key)
        to.sync(out0[0])

    N = min(3, len(ds)) if args.dry_run else min(args.N_samples, len(ds))
    cols = {k: [] for k in (
        "rel_errs", "rmses", "max_errs", "ic_rel_errs", "std_norms",
        "N_newton_steps", "sqmahals", "nlls", "optimization_times")}
    for i in range(N):
        soln = jnp.asarray(ds.get_solution(i))[1:]
        cur = PhaseTimers()
        with cur("Optimization"):
            pred, ic_pred, std, smp, n_steps, sqm, nll = solve_jit(
                *inputs(i), jax.random.fold_in(key, i)
            )
            cur.sync(pred)
        cols["rel_errs"].append(float(rel_err(pred[1:], soln)))
        cols["rmses"].append(float(rmse(pred[1:], soln)))
        cols["max_errs"].append(float(max_err(pred[1:], soln)))
        cols["ic_rel_errs"].append(float(rel_err(ic_pred[1:], soln)))
        cols["std_norms"].append(float(jnp.linalg.norm(std)))
        cols["N_newton_steps"].append(int(n_steps))
        cols["sqmahals"].append(float(sqm))
        cols["nlls"].append(float(nll))
        cols["optimization_times"].append(cur.time("Optimization"))
        log.info("instance %d: rel_err=%.3e nll=%.3e", i, cols["rel_errs"][-1],
                 cols["nlls"][-1])

    out = dict(**cols, timers=to.as_dict(), **params)
    path = tagsave(
        os.path.join(datadir("sims", "burgers", "gmrf-collocation"), savename(params)),
        out,
    )
    log.info("mean rel_err = %.4e", float(np.mean(cols["rel_errs"])))
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
