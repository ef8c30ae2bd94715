"""Darcy classical FEM baseline: direct solve per instance.

TPU-native analog of `/root/reference/scripts/darcy/solve_darcy_fem.jl`:
assemble the per-instance Darcy system, solve the Dirichlet-condensed SPD
system with the block-tridiagonal Cholesky, evaluate on the dataset grid,
report rel/rmse/max errors. This is the non-probabilistic reference point
for the GMRF pipeline.

Usage:
  python experiments/darcy/solve_darcy_fem.py --N_xy 40 --dry_run true
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
    p = base_parser("Darcy classical FEM baseline")
    p.add_argument("--datasetname", type=str, default="synthetic")
    p.add_argument("--N_xy", type=int, default=40)
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
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached
    from diffeqgmrfs_tpu.gmrf.affine import AffineMap
    from diffeqgmrfs_tpu.ops import btd_cholesky, make_btd_pattern
    from diffeqgmrfs_tpu.datasets import DarcyDataset
    from diffeqgmrfs_tpu.metrics import rel_err, rmse, max_err
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave
    from diffeqgmrfs_tpu.fem.assembly import assemble_darcy

    params = dict(datasetname=args.datasetname, N_xy=args.N_xy, dry_run=args.dry_run)
    log.info("params: %s", params)
    to = PhaseTimers()

    mat_path = datadir("input_data", "Darcy_241", f"{args.datasetname}.mat")
    if args.datasetname != "synthetic" and os.path.exists(mat_path):
        ds = DarcyDataset(mat_path)
    else:
        ds = DarcyDataset.synthetic(
            n_instances=args.N_instances, grid=args.grid, n_xy_fem=max(args.N_xy, 40),
            cache=datadir("input_data", "synthetic",
                          f"darcy_g{args.grid}_n{args.N_instances}.npz"),
        )
    log.info("%s", ds)

    disc = uniform_unit_square_discretization(args.N_xy, element_order=2)
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    obs = DarcyFEMObservations(disc, ds.x_coords, ds.y_coords, beta=1.0)
    pts = np.stack(np.meshgrid(ds.x_coords, ds.y_coords, indexing="xy"), -1).reshape(-1, 2)
    E = evaluation_matrix(disc, pts)
    ny, nx = len(ds.y_coords), len(ds.x_coords)

    def solve_instance(coeff):
        """Direct FEM solve: condense K to free dofs, BTD Cholesky."""
        coeff_q = obs.coeff_at_quad(coeff)
        op = assemble_darcy(disc, coeff_q, beta=1.0)
        r, c = op.coo_structure()
        fr, fc, fac = disc.constraint_handler.condense_coo_structure(r, c)
        pat = make_btd_pattern(fr, fc, affine.n_free)
        K = pat.scatter(op.coo_values() * jnp.asarray(fac)).add_identity_padding()
        f_full = op.rhs_vector()
        f = affine.restrict(f_full)
        u_free = btd_cholesky(K).solve(f)
        u = affine.free_to_full(u_free)
        return E.matvec(u).reshape(ny, nx)

    solve_jit = jax.jit(solve_instance)
    with to("First solve (compile)"):
        out0 = solve_jit(jnp.asarray(ds.get_problem(0)[1]))
        to.sync(out0)

    N = min(3, len(ds)) if args.dry_run else len(ds)
    rel_errs, rmses, max_errs, times = [], [], [], []
    for i in range(N):
        soln, coeff = ds.get_problem(i)
        cur = PhaseTimers()
        with cur("Solve"):
            pred = solve_jit(jnp.asarray(coeff))
            cur.sync(pred)
        rel_errs.append(float(rel_err(pred, jnp.asarray(soln))))
        rmses.append(float(rmse(pred, jnp.asarray(soln))))
        max_errs.append(float(max_err(pred, jnp.asarray(soln))))
        times.append(cur.time("Solve"))
        log.info("instance %d: rel_err=%.3e", i, rel_errs[-1])

    out = dict(
        rel_errs=rel_errs, rmses=rmses, max_errs=max_errs,
        solve_times=times, timers=to.as_dict(), **params,
    )
    path = tagsave(os.path.join(datadir("sims", "darcy", "fem"), savename(params)), out)
    log.info("mean rel_err = %.4e", float(np.mean(rel_errs)))
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
