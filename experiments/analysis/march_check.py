"""Quality check of the BurgersForwardMarch warm-start initializer.

Marches the FEM discretization forward from the true IC and reports
rel_err of the marched trajectory vs the dataset trajectory, per
substep count — if the march itself is accurate, Gauss-Newton started
from it should converge in a handful of steps; if not, the warm start
is a liability (observed: N200x100 warm-started GN converges WORSE
than the prior-mean start, RESULTS.md round 2 continued).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.utils.experiment import select_backend

select_backend("cpu")

from diffeqgmrfs_tpu.datasets.burgers import BurgersDataset
from diffeqgmrfs_tpu.fem.discretization import (
    periodic_unit_interval_discretization,
)
from diffeqgmrfs_tpu.fem.operators import evaluation_matrix
from diffeqgmrfs_tpu.problems.burgers import BurgersForwardMarch
from diffeqgmrfs_tpu.metrics import rel_err


def main():
    N_x = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    ds = BurgersDataset.synthetic(n_instances=2, n_x=129, n_t=100)
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    E = evaluation_matrix(disc, np.asarray(ds.x_coords))
    E_dense = np.asarray(E.to_dense())
    # IC fit on an overdetermined dense grid (a bare lstsq on the coarse
    # data grid is underdetermined at N_x >= 64 -> min-norm oscillation
    # that Burgers amplifies)
    x_fine = np.linspace(0.0, 1.0, 2049)
    E_fine = np.asarray(evaluation_matrix(disc, x_fine).to_dense())

    for inst in range(2):
        sol = np.asarray(ds.get_solution(inst))  # [N_t, n_x_data]
        ic = sol[0]
        ic_fine = np.interp(x_fine, np.asarray(ds.x_coords), ic,
                            period=1.0)
        u0, *_ = np.linalg.lstsq(E_fine, ic_fine, rcond=None)
        for substeps in (1, 2, 4):
            march = BurgersForwardMarch(
                disc, np.asarray(ds.ts), ds.nu, substeps=substeps
            )
            W = jax.jit(march.trajectory)(jnp.asarray(u0, jnp.float32))
            pred = np.asarray(W @ E_dense.T)  # [N_t, n_x_data]
            e = rel_err(pred.reshape(-1), sol.reshape(-1))
            e_final = rel_err(pred[-1], sol[-1])
            print(
                f"inst {inst} substeps {substeps}: "
                f"traj rel_err {float(e):.4e}  final-slice {float(e_final):.4e}"
            )


if __name__ == "__main__" and not (
    len(sys.argv) > 1 and sys.argv[1] in ("diag", "resid", "arbiter")
):
    main()


def diag():
    N_x = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    ds = BurgersDataset.synthetic(n_instances=2, n_x=129, n_t=100)
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    x_fine = np.linspace(0.0, 1.0, 2049)
    E_fine = np.asarray(evaluation_matrix(disc, x_fine).to_dense())
    E_dense = np.asarray(
        evaluation_matrix(disc, np.asarray(ds.x_coords)).to_dense()
    )
    sol = np.asarray(ds.get_solution(1))
    ic_fine = np.interp(x_fine, np.asarray(ds.x_coords), sol[0], period=1.0)
    u0, *_ = np.linalg.lstsq(E_fine, ic_fine, rcond=None)
    for n_newton, substeps in ((4, 1), (8, 2), (12, 4), (8, 8)):
        march = BurgersForwardMarch(
            disc, np.asarray(ds.ts), ds.nu,
            n_newton=n_newton, substeps=substeps,
        )
        W = np.asarray(jax.jit(march.trajectory)(jnp.asarray(u0, jnp.float32)))
        pred = W @ E_dense.T
        e = rel_err(pred.reshape(-1), sol.reshape(-1))
        print(
            f"n_newton {n_newton} substeps {substeps}: rel {float(e):.3e} "
            f"max|u| {np.abs(W).max():.3e} (data max {np.abs(sol).max():.3e})"
        )
        # per-time error profile at the coarsest setting
        if n_newton == 4:
            et = np.linalg.norm(pred - sol, axis=1) / (
                np.linalg.norm(sol, axis=1) + 1e-30
            )
            print("   rel by t:", " ".join(f"{v:.2f}" for v in et[::10]))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "diag":
    diag()


def resid():
    N_x = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    from diffeqgmrfs_tpu.problems.burgers import BurgersFEMResidual

    ds = BurgersDataset.synthetic(n_instances=2, n_x=129, n_t=100)
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    x_fine = np.linspace(0.0, 1.0, 2049)
    E_fine = np.asarray(evaluation_matrix(disc, x_fine).to_dense())
    res = BurgersFEMResidual(disc, np.asarray(ds.ts), ds.nu)
    for inst in range(2):
        sol = np.asarray(ds.get_solution(inst))
        # dof-space interpolant of the WHOLE data trajectory
        sol_fine = np.stack([
            np.interp(x_fine, np.asarray(ds.x_coords), s, period=1.0)
            for s in sol
        ])
        Wdata, *_ = np.linalg.lstsq(E_fine, sol_fine.T, rcond=None)
        Wdata = Wdata.T  # [N_t, ndofs]
        u0 = Wdata[0]
        march = BurgersForwardMarch(disc, np.asarray(ds.ts), ds.nu,
                                    substeps=2)
        Wm = np.asarray(jax.jit(march.trajectory)(jnp.asarray(u0, jnp.float32)))
        for name, W in (("march", Wm), ("data-interp", Wdata)):
            f, _ = res.f_and_J(jnp.asarray(W.reshape(-1)))
            print(f"inst {inst} {name}: ||f|| {float(jnp.linalg.norm(f)):.3e} "
                  f"max|f| {float(jnp.max(jnp.abs(f))):.3e}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "resid":
    resid()


def arbiter():
    """Finer FD (n_fd=4096) as arbiter between data (n_fd=512) and march."""
    from diffeqgmrfs_tpu.datasets.burgers import periodic_burgers_fd

    ds = BurgersDataset.synthetic(n_instances=2, n_x=129, n_t=100)
    sol = np.asarray(ds.get_solution(1))
    fine = periodic_burgers_fd(sol[0], ds.nu, np.asarray(ds.ts), n_fd=4096)
    e = rel_err(fine.reshape(-1), sol.reshape(-1))
    print(f"inst 1: fine-FD(4096) vs data(512): rel {float(e):.3e}")
    N_x = 200
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    x_fine = np.linspace(0.0, 1.0, 2049)
    E_fine = np.asarray(evaluation_matrix(disc, x_fine).to_dense())
    E_dense = np.asarray(
        evaluation_matrix(disc, np.asarray(ds.x_coords)).to_dense()
    )
    ic_f = np.interp(x_fine, np.asarray(ds.x_coords), sol[0], period=1.0)
    u0, *_ = np.linalg.lstsq(E_fine, ic_f, rcond=None)
    march = BurgersForwardMarch(disc, np.asarray(ds.ts), ds.nu, substeps=2)
    Wm = np.asarray(jax.jit(march.trajectory)(jnp.asarray(u0, jnp.float32)))
    pred = Wm @ E_dense.T
    e2 = rel_err(pred.reshape(-1), fine.reshape(-1))
    print(f"inst 1: march(N200) vs fine-FD(4096): rel {float(e2):.3e}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "arbiter":
    arbiter()
