"""Chen24 nonlinear elliptic benchmark: -Delta u + alpha u^3 = f.

TPU-native analog of `/root/reference/_research/elliptic_chen24.jl`: the
600-mode sine-series analytic truth, Matérn prior (range 0.1, smoothness 1),
boundary conditioning at h=0.001 spacing with precision 1e12, Gauss-Newton
on the FEM residual at precision 3e13 with
Or(NewtonDecrement(1e-5), StepNumber(10)), errors on the 99x99 interior grid:
err_L2 = sqrt(sum e^2 / N), err_MAE, err_rel.

Usage:
  python experiments/chen24/elliptic_chen24.py --N_el_xy 40 --el_order 2
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

ALPHA = 1.0
M_POW = 3
FREQ = 600
S_DECAY = 6


def fun_u(pts):
    """600-mode analytic truth (`elliptic_chen24.jl:60-77`), vectorized."""
    pts = np.asarray(pts, dtype=np.float64)
    k = np.arange(1, FREQ + 1)
    sx = np.sin(np.pi * np.multiply.outer(pts[..., 0], k))
    sy = np.sin(np.pi * np.multiply.outer(pts[..., 1], k))
    return np.einsum("...k,...k,k->...", sx, sy, 1.0 / k.astype(np.float64) ** S_DECAY)


def fun_rhs(pts):
    """f = sum 2 k^2 pi^2 sin sin / k^s + alpha u^m (`:88-91`)."""
    pts = np.asarray(pts, dtype=np.float64)
    k = np.arange(1, FREQ + 1)
    sx = np.sin(np.pi * np.multiply.outer(pts[..., 0], k))
    sy = np.sin(np.pi * np.multiply.outer(pts[..., 1], k))
    lin = np.einsum(
        "...k,...k,k->...", sx, sy, 2.0 * k**2 * np.pi**2 / k.astype(np.float64) ** S_DECAY
    )
    return lin + ALPHA * fun_u(pts) ** M_POW


def parse_cmd():
    p = base_parser("Chen24 elliptic benchmark")
    p.add_argument("--N_el_xy", type=int, default=40)
    p.add_argument("--el_order", type=int, default=2)
    p.add_argument("--mixed_precision", action="store_true",
                   help="f32 MXU factorization + f64 refinement (TPU path)")
    p.add_argument("--sqrt", action="store_true",
                   help="SRIF square-root Newton systems: windowed QR of "
                        "[Lambda_Q; sqrt(tau_b) A_b; sqrt(tau) J] — f32 "
                        "stays valid at N_el_xy=100 where the equilibrated "
                        "f32 Cholesky goes indefinite")
    p.add_argument("--srif_qr_impl", type=str, default="bhh1",
                   help="SRIF window-QR engine: xla | bhh | bhh1 | bcgs2 "
                        "| bcgs4 (see solve_darcy_gmrf_fem.py). bhh1 is "
                        "the default HERE because at this driver's window "
                        "shapes it halves the N100 wall (8.2 vs 17.2 s, "
                        "queue Y) at identical err_L2 7.06e-9; Darcy/chen24 "
                        "keep xla (bhh1 measured neutral-to-slower there)")
    p.add_argument("--qr_split", type=int, default=0,
                   help="SRIF window split override (0 = auto_split)")
    p.add_argument("--no_prefactor", action="store_true",
                   help="disable the SRIF measurement-update prefactor "
                        "(regression bisection)")
    p.add_argument("--matern_range", type=float, default=0.1)
    p.add_argument("--matern_smoothness", type=int, default=1)
    p.add_argument("--h_bd", type=float, default=0.001)
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import (
        unit_square_discretization,
        evaluation_matrix,
    )
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import EllipticCubicResidual
    from diffeqgmrfs_tpu.solvers import (
        gauss_newton,
        GNCholeskySolverBlueprint,
        NewtonDecrementCriterion,
        StepNumberCriterion,
        OrCriterion,
    )
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    params = dict(N_el_xy=args.N_el_xy, el_order=args.el_order)
    log.info("params: %s", params)
    to = PhaseTimers()

    # sample grids (`elliptic_chen24.jl:98-113`)
    h_in, h_bd = 0.01, args.h_bd
    xin = np.arange(h_in, 1.0 - h_in / 2, h_in)
    X_domain = np.stack(np.meshgrid(xin, xin, indexing="ij"), -1).reshape(-1, 2)
    line = np.arange(0.0, 1.0 - h_bd / 2, h_bd)
    zeros, ones = np.zeros_like(line), np.ones_like(line)
    X_boundary = np.concatenate(
        [
            np.stack([line, zeros], -1),
            np.stack([ones, line], -1),
            np.stack([line[::-1] + h_bd, ones], -1),
            np.stack([zeros, line[::-1] + h_bd], -1),
        ]
    )
    truth = fun_u(X_domain)

    def gmrf_fem_solve():
        disc = unit_square_discretization(args.N_el_xy, element_order=args.el_order)
        spde = MaternSPDE(
            d=2, range=args.matern_range, smoothness=args.matern_smoothness
        )
        x = discretize_matern(spde, disc)
        A_b = evaluation_matrix(disc, X_boundary)
        y_b = jnp.asarray(fun_u(X_boundary))
        x_bc = condition_on_observations(x, A_b, 1e12, y_b)
        A_eval = evaluation_matrix(disc, X_domain)
        prescribed = disc.dof_handler.node_dofs("u", disc.mesh.node_sets["boundary"])
        rhs_q = fun_rhs(disc.geometry.qcoords)
        res = EllipticCubicResidual(disc, rhs_q, prescribed, alpha=ALPHA)

        # Prebuild the J^T J -> BTD scatter pattern and pass it as a jit
        # ARGUMENT: inlined it would put ~1e7-1e8 index literals into the
        # HLO (breaks remote-compile size limits at production sizes).
        from diffeqgmrfs_tpu.fem.operators import RowOp

        jcols, _, K = res.diff_cell.rowop_structure()
        j_struct = RowOp(jcols, jnp.zeros((disc.ndofs, K)), disc.ndofs)
        if args.sqrt:
            # SRIF operands: Lambda (Q = Λ^T Λ), boundary rows, plus the
            # f64 ELL of the CONDITIONED prior Q_bc = Q + tau_b A_b^T A_b
            # for refinement residuals — all static per config (host-built)
            import scipy.sparse as sp_
            from diffeqgmrfs_tpu.models.matern import (
                matern_sqrt_host,
                matern_precision_host,
            )
            from diffeqgmrfs_tpu.ops.srif import rowop_window_plan
            from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

            from diffeqgmrfs_tpu.ops.ata_windows import auto_split

            n, bsz = disc.ndofs, x_bc.precision.bs
            spl = args.qr_split or auto_split(bsz)
            log.info("bs=%d qr_split=%d prefactor=%s", bsz, spl,
                     not args.no_prefactor)
            lam32 = RowOp.from_csr(matern_sqrt_host(spde, disc),
                                   dtype=jnp.float32)
            lam_plan = rowop_window_plan(lam32, n, bsz, split=spl).to_device()
            ab_plan = rowop_window_plan(A_b, n, bsz, split=spl).to_device()
            ab_vals = A_b.vals * np.sqrt(1e12)
            Ab_csr = A_b.to_csr_host()
            Q_bc = (matern_precision_host(spde, disc)
                    + 1e12 * (Ab_csr.T @ Ab_csr)).tocsr()
            q_ell = RowOp.from_csr(Q_bc, dtype=jnp.float64)
            q_diag = jnp.asarray(Q_bc.diagonal())
            j_plan = make_ata_window_plan(
                np.asarray(jcols), n, bsz, split=spl
            ).to_device()
            sqrt_arrays = dict(
                j_plan=j_plan,
                sqrt_ops=[(lam_plan, lam32.vals), (ab_plan, ab_vals)],
                q_ell=q_ell,
                q_diag=q_diag,
            )
            pat = None
        else:
            sqrt_arrays = None
            pat = j_struct.ata_pattern(bs=x_bc.precision.bs).to_device()

        bp_gn = GNCholeskySolverBlueprint(
            mixed_precision=args.mixed_precision, sqrt_factor=args.sqrt,
            srif_qr_impl=args.srif_qr_impl,
        )

        # the conditioned prior (Q is hundreds of MB at production size) and
        # the scatter pattern enter through the jit SIGNATURE, not closures
        def solve(x_bc_arg, ata_pattern, sa):
            if sa is not None:
                aux = dict(
                    ata_window_plan=sa["j_plan"],
                    sqrt_ops=sa["sqrt_ops"],
                    q_ell=sa["q_ell"],
                    q_diag=sa["q_diag"],
                    final_factor=False,  # only the MAP mean is needed
                    srif_prefactor=not args.no_prefactor,
                )
            else:
                aux = dict(ata_pattern=ata_pattern)
            result = gauss_newton(
                x_bc_arg.mean(),
                x_bc_arg.precision,
                res.f_and_J,
                3e13,
                jnp.zeros(res.n_rows),
                x_bc_arg.mean(),
                blueprint=bp_gn,
                aux=aux,
                criterion=OrCriterion(
                    [NewtonDecrementCriterion(1e-5), StepNumberCriterion(10)]
                ),
            )
            post = result.posterior()
            return A_eval.matvec(post.mean()), result.n_steps

        f = jax.jit(solve)
        x_bc_dev = jax.device_put(x_bc)
        sqrt_dev = jax.device_put(sqrt_arrays) if sqrt_arrays else None
        return lambda: f(x_bc_dev, pat, sqrt_dev)

    solve_jit = gmrf_fem_solve()
    log.info("First solve (compile)...")
    sol, _ = solve_jit()
    sol.block_until_ready()
    log.info("Actual solve...")
    with to("Solve time"):
        sol, n_steps = solve_jit()
        to.sync(sol)
    sol = np.asarray(sol)

    err = truth - sol
    out = dict(
        err_L2=float(np.sqrt(np.sum(err**2) / len(truth))),
        err_MAE=float(np.max(np.abs(err))),
        err_rel=float(np.linalg.norm(err) / np.linalg.norm(sol)),
        n_newton_steps=int(n_steps),
        solve_time_ns=to.time("Solve time"),
        timers=to.as_dict(),
        **params,
    )
    log.info("err_L2=%.4e err_MAE=%.4e err_rel=%.4e (%.2f s)",
             out["err_L2"], out["err_MAE"], out["err_rel"],
             out["solve_time_ns"] / 1e9)
    path = tagsave(
        os.path.join(datadir("sims", "elliptic-chen"), savename(params)), out
    )
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
