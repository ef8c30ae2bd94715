"""Darcy GMRF-collocation sweep.

TPU-native analog of
`/root/reference/scripts/darcy/solve_darcy_gmrf-collocation.jl`: the PDE is
enforced at collocation points on a 2*N_xy grid via second-derivative
operators, A = 1e-5 * diag(a) * (-Laplacian), y = 1e-5 * beta, then the same
conditioning/posterior pipeline as the FEM variant.

Usage:
  python experiments/darcy/solve_darcy_gmrf_collocation.py --N_xy 24
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
    p = base_parser("Darcy GMRF-collocation sweep")
    p.add_argument("--datasetname", type=str, default="synthetic")
    p.add_argument("--N_xy", type=int, default=24)
    p.add_argument("--boundary_width", type=float, default=0.0)
    p.add_argument("--N_instances", type=int, default=8)
    p.add_argument("--grid", type=int, default=61)
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import (
        uniform_unit_square_discretization,
        evaluation_matrix,
    )
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import DarcyCollocationObservations
    from diffeqgmrfs_tpu.datasets import DarcyDataset
    from diffeqgmrfs_tpu.metrics import rel_err, rmse, max_err
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    params = dict(
        datasetname=args.datasetname,
        N_xy=args.N_xy,
        boundary_width=args.boundary_width,
        dry_run=args.dry_run,
    )
    log.info("params: %s", params)
    to = PhaseTimers()

    mat_path = datadir("input_data", "Darcy_241", f"{args.datasetname}.mat")
    if args.datasetname != "synthetic" and os.path.exists(mat_path):
        ds = DarcyDataset(mat_path)
    else:
        ds = DarcyDataset.synthetic(
            n_instances=args.N_instances, grid=args.grid, n_xy_fem=max(args.N_xy * 2, 40),
            cache=datadir("input_data", "synthetic",
                          f"darcy_g{args.grid}_n{args.N_instances}.npz"),
        )
    log.info("%s", ds)

    with to("Mesh generation"):
        disc = uniform_unit_square_discretization(args.N_xy, element_order=2)
    with to("Prior construction"):
        spde = MaternSPDE(d=2, range=1 / np.sqrt(args.N_xy), smoothness=2)
        prior = discretize_matern(spde, disc)
    with to("Set up collocation matrices"):
        obs = DarcyCollocationObservations(
            disc, ds.x_coords, ds.y_coords, beta=1.0, N_xy=args.N_xy
        )
    pts = np.stack(np.meshgrid(ds.x_coords, ds.y_coords, indexing="xy"), -1).reshape(-1, 2)
    E = evaluation_matrix(disc, pts)
    ny, nx = len(ds.y_coords), len(ds.x_coords)
    Q_eps = 1e8

    def solve_instance(coeff, key):
        A, ys = obs(coeff)
        post = condition_on_observations(prior, A, Q_eps, ys)
        pred = E.matvec(post.mean()).reshape(ny, nx)
        return pred, post.std(), post.sample(key, 1)

    solve_jit = jax.jit(solve_instance)
    key = jax.random.PRNGKey(1)
    with to("Conditioning + first solve (compile)"):
        out0 = solve_jit(jnp.asarray(ds.get_problem(0)[1]), key)
        to.sync(out0[0])

    N = min(3, len(ds)) if args.dry_run else len(ds)
    rel_errs, rmses, max_errs, std_norms, times = [], [], [], [], []
    for i in range(N):
        soln, coeff = ds.get_problem(i)
        cur = PhaseTimers()
        with cur("Conditioning"):
            pred, std, smp = solve_jit(jnp.asarray(coeff), jax.random.fold_in(key, i))
            cur.sync(pred)
        rel_errs.append(float(rel_err(pred, jnp.asarray(soln))))
        rmses.append(float(rmse(pred, jnp.asarray(soln))))
        max_errs.append(float(max_err(pred, jnp.asarray(soln))))
        std_norms.append(float(jnp.linalg.norm(std)))
        times.append(cur.time("Conditioning"))
        log.info("instance %d: rel_err=%.3e", i, rel_errs[-1])

    out = dict(
        rel_errs=rel_errs, rmses=rmses, max_errs=max_errs, std_norms=std_norms,
        conditioning_times=times, timers=to.as_dict(), **params,
    )
    path = tagsave(
        os.path.join(datadir("sims", "darcy", "gmrf-collocation"), savename(params)),
        out,
    )
    log.info("mean rel_err = %.4e", float(np.mean(rel_errs)))
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
