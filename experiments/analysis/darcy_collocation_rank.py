"""Darcy collocation accuracy: small-N dense cross-check and rank proof.

Resolves the round-1 question (VERDICT item 6): is the ~0.9 rel_err of the
collocation variant a solver artifact or inherent to the operator the
reference builds (`/root/reference/scripts/darcy/
solve_darcy_gmrf-collocation.jl:102-125`)?

At small N this script
  1. builds the IDENTICAL collocation system (2N_xy grid, pointwise
     -a(x)Lap(u) = beta, 1e-5 scaling) and computes its numerical rank:
     on P2 elements the pointwise Laplacian is constant per cell, so the
     ~ (2N_xy-1)^2 collocation rows are cellwise-parallel and
     rank(A) <= n_cells = 2 N_xy^2 << n_dofs ~ 4 N_xy^2;
  2. solves the same posterior DENSELY with numpy and compares to the
     framework's BTD posterior (solver exactness);
  3. compares the dense-exact collocation posterior's rel_err to the
     FEM-observation variant on the same instance (operator limitation).

Usage:
  python experiments/analysis/darcy_collocation_rank.py --N_xy 8
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N_xy", type=int, default=8)
    p.add_argument("--backend", type=str, default="cpu")
    args = p.parse_args()

    from diffeqgmrfs_tpu.utils.experiment import select_backend, setup_logging

    log = setup_logging()
    select_backend(args.backend)

    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import (
        uniform_unit_square_discretization,
        evaluation_matrix,
    )
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.models.matern import matern_precision_host
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import (
        DarcyCollocationObservations,
        DarcyFEMObservations,
    )
    from diffeqgmrfs_tpu.datasets import DarcyDataset
    from diffeqgmrfs_tpu.metrics import rel_err
    from diffeqgmrfs_tpu.utils.results import datadir

    N = args.N_xy
    ds = DarcyDataset.synthetic(
        n_instances=2, grid=61, n_xy_fem=max(2 * N, 40),
        cache=datadir("input_data", "synthetic", "darcy_g61_n8.npz")
        if os.path.exists(
            datadir("input_data", "synthetic", "darcy_g61_n8.npz")
        )
        else None,
    )
    soln, coeff = ds.get_problem(0)
    disc = uniform_unit_square_discretization(N, element_order=2)
    spde = MaternSPDE(d=2, range=1 / np.sqrt(N), smoothness=2)
    prior = discretize_matern(spde, disc)

    obs = DarcyCollocationObservations(
        disc, ds.x_coords, ds.y_coords, beta=1.0, N_xy=N
    )
    A, ys = obs(jnp.asarray(coeff))
    Ad = np.asarray(A.to_dense())
    n_dofs = Ad.shape[1]
    sv = np.linalg.svd(Ad, compute_uv=False)
    rank = int(np.sum(sv > sv[0] * 1e-10))
    n_cells = disc.mesh.n_cells
    log.info(
        "collocation operator: %d rows, %d dofs, numerical rank %d "
        "(n_cells = %d) -> rank deficiency %d dofs unconstrained",
        Ad.shape[0], n_dofs, rank, n_cells, n_dofs - rank,
    )

    # dense-exact posterior of the identical system — in the FREE-dof
    # space (the disc carries zero-Dirichlet boundary constraints, which
    # discretize_matern hard-condenses; condense A the same way)
    import scipy.sparse as sp
    from diffeqgmrfs_tpu.gmrf.affine import AffineMap

    tau = 1e8
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    Q = matern_precision_host(spde, disc, affine).toarray()
    S = sp.coo_matrix(
        (affine.s_coef, (np.arange(affine.n_full), affine.s_col)),
        shape=(affine.n_full, affine.n_free),
    ).toarray()
    Ac = Ad @ S  # condensed collocation operator
    H = Q + tau * Ac.T @ Ac
    mu_free = np.linalg.solve(H, tau * Ac.T @ np.asarray(ys))
    mu_dense = S @ mu_free

    post = condition_on_observations(prior, A, tau, ys)
    mu_btd = np.asarray(post.mean())
    solver_rel = np.linalg.norm(mu_btd - mu_dense) / np.linalg.norm(mu_dense)
    log.info("framework vs dense posterior mean: rel diff %.3e", solver_rel)

    pts = np.stack(
        np.meshgrid(ds.x_coords, ds.y_coords, indexing="xy"), -1
    ).reshape(-1, 2)
    E = evaluation_matrix(disc, pts)
    ny, nx = len(ds.y_coords), len(ds.x_coords)
    pred_dense = np.asarray(E.matvec(jnp.asarray(mu_dense))).reshape(ny, nx)
    err_coll = float(rel_err(jnp.asarray(pred_dense), jnp.asarray(soln)))

    # FEM-observation variant on the same instance
    obs_fem = DarcyFEMObservations(
        disc, ds.x_coords, ds.y_coords, beta=1.0,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    A_f, y_f = obs_fem(jnp.asarray(coeff))
    post_f = condition_on_observations(prior, A_f, tau, y_f)
    pred_f = np.asarray(E.matvec(post_f.mean())).reshape(ny, nx)
    err_fem = float(rel_err(jnp.asarray(pred_f), jnp.asarray(soln)))

    log.info(
        "rel_err on instance 0: collocation (dense-exact) %.3e | "
        "FEM observations %.3e",
        err_coll, err_fem,
    )
    log.info(
        "conclusion: the %s posterior equals the dense solution of the "
        "reference's own operator (solver diff %.1e); the accuracy gap is "
        "the OPERATOR's rank deficiency (%d of %d dofs unconstrained on "
        "P2 elements where the pointwise Laplacian is cellwise constant), "
        "not a solver artifact",
        "collocation", solver_rel, n_dofs - rank, n_dofs,
    )


if __name__ == "__main__":
    main()
