"""Burgers classical FEM baseline: deterministic implicit-Euler time march.

The non-probabilistic reference point for the Burgers GMRF pipeline — the
analog of `/root/reference/scripts/darcy/solve_darcy_fem.jl` for the
time-dependent problem (the reference repo has no such script; its role is
played by the DifferentialEquations.jl check,
`scripts/plots/burger_priors.jl:127-159`). Marches the SAME P2 periodic
FEM discretization the GMRF posterior uses (problems/burgers.
BurgersForwardMarch, per-step spatial Newton with folded Galerkin
condensation) from the data IC, and reports trajectory errors vs the
dataset. The GMRF-FEM MAP at noise_fem=1e12 converges to this trajectory,
so this driver both anchors the posterior's accuracy and measures the
pure-solver cost (it is also the --warm_start initializer).

Usage:
  python experiments/burgers/solve_burgers_fem.py --N_x 128 --backend cpu
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from diffeqgmrfs_tpu.utils.experiment import (
    base_parser,
    finalize_args,
    select_backend,
    setup_logging,
)


def parse_cmd():
    p = base_parser("Burgers classical FEM baseline (implicit-Euler march)")
    p.add_argument("--datasetname", type=str, default="synthetic")
    p.add_argument("--N_x", type=int, default=128)
    p.add_argument("--N_instances", type=int, default=8)
    p.add_argument("--n_x_data", type=int, default=129)
    p.add_argument("--n_t_data", type=int, default=100)
    p.add_argument("--nu", type=float, default=0.01)
    p.add_argument("--substeps", type=int, default=2,
                   help="internal implicit-Euler substeps per data interval")
    p.add_argument("--n_newton", type=int, default=4,
                   help="spatial Newton iterations per substep")
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.datasets import BurgersDataset
    from diffeqgmrfs_tpu.fem import evaluation_matrix
    from diffeqgmrfs_tpu.fem.discretization import (
        periodic_unit_interval_discretization,
    )
    from diffeqgmrfs_tpu.problems.burgers import BurgersForwardMarch
    from diffeqgmrfs_tpu.metrics import rel_err, rmse, max_err
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    params = dict(datasetname=args.datasetname, N_x=args.N_x,
                  dry_run=args.dry_run)
    log.info("params: %s", params)
    to = PhaseTimers()

    mat_path = datadir("input_data", "Burgers", f"{args.datasetname}.mat")
    if args.datasetname != "synthetic" and os.path.exists(mat_path):
        ds = BurgersDataset(mat_path)
    else:
        ds = BurgersDataset.synthetic(
            n_instances=args.N_instances, n_x=args.n_x_data,
            n_t=args.n_t_data, visc=args.nu,
            cache=datadir(
                "input_data", "synthetic",
                f"burgers_v{args.nu:g}_t{args.n_t_data}_x{args.n_x_data}"
                f"_n{args.N_instances}.npz",
            ),
        )
    log.info("%s", ds)
    x_coords, ts = np.asarray(ds.x_coords), np.asarray(ds.ts)

    with to("Mesh generation"):
        disc = periodic_unit_interval_discretization(
            args.N_x, element_order=2
        )
    with to("Operators"):
        march = BurgersForwardMarch(
            disc, ts, ds.nu, n_newton=args.n_newton, substeps=args.substeps
        )
        E = evaluation_matrix(disc, x_coords)
        # IC fit: overdetermined least squares on a fine grid (a bare fit
        # on the coarse data grid is underdetermined at N_x >= 64 ->
        # min-norm oscillation that Burgers amplifies; march_check.py)
        x_fine = np.linspace(0.0, 1.0, 16 * args.N_x + 1)
        E_fine = np.asarray(evaluation_matrix(disc, x_fine).to_dense())

    def solve(ic):
        ic_fine = np.interp(x_fine, x_coords, np.asarray(ic), period=1.0)
        u0, *_ = np.linalg.lstsq(E_fine, ic_fine, rcond=None)
        W = traj_jit(jnp.asarray(u0, jnp.float32))
        return E.matvec(W)  # [N_t, n_x_data]

    traj_jit = jax.jit(march.trajectory)

    N = min(3, len(ds)) if args.dry_run else min(args.N_instances, len(ds))
    with to("First solve (compile)"):
        out = solve(ds.get_initial_condition(0))
        to.sync(out)

    rel_errs, rmses, max_errs, times = [], [], [], []
    for i in range(N):
        t0 = time.perf_counter()
        pred = solve(ds.get_initial_condition(i))
        to.sync(pred)
        dt_i = time.perf_counter() - t0
        soln = jnp.asarray(ds.get_solution(i))
        rel_errs.append(float(rel_err(pred.reshape(-1), soln.reshape(-1))))
        rmses.append(float(rmse(pred.reshape(-1), soln.reshape(-1))))
        max_errs.append(float(max_err(pred.reshape(-1), soln.reshape(-1))))
        times.append(dt_i)
        log.info("instance %d: rel_err=%.3e (%.2f s)", i, rel_errs[-1], dt_i)

    log.info("mean rel_err = %.4e, mean solve %.3f s",
             float(np.mean(rel_errs)), float(np.mean(times)))
    out_dict = dict(
        params, rel_errs=rel_errs, rmses=rmses, max_errs=max_errs,
        solve_times=times, timers=to.as_dict(),
    )
    path = tagsave(
        os.path.join(datadir("sims", "burgers", "fem"), savename(params)),
        out_dict,
    )
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
