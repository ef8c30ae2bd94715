"""Burgers GMRF-FEM sweep: spatiotemporal posterior per dataset instance.

TPU-native analog of
`/root/reference/scripts/burgers/solve_burgers_gmrf-fem.jl`: per instance —
advection-diffusion ST prior (bulk speed from the IC), IC conditioning at
precision 1e8, Gauss-Newton on the implicit-Euler FEM residual at precision
1e12, posterior mean/sample/std + rel_err/rmse/max_err (and IC-only
variants) vs the dataset trajectories. The ENTIRE per-instance pipeline
(prior assembly included, since the advection speed is traced) is one jitted
XLA program.

Usage:
  python experiments/burgers/solve_burgers_gmrf_fem.py --N_x 64 --dry_run true
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
    p = base_parser("Burgers GMRF-FEM sweep")
    p.add_argument("--datasetname", type=str, default="synthetic")
    p.add_argument("--N_x", type=int, default=64)
    p.add_argument("--N_instances", type=int, default=8)
    p.add_argument("--nu", type=float, default=0.01, help="synthetic viscosity")
    p.add_argument("--n_t_data", type=int, default=26, help="synthetic timesteps")
    p.add_argument("--n_x_data", type=int, default=129, help="synthetic x points")
    p.add_argument("--mixed_precision", action="store_true",
                   help="f32 MXU factorization + f64 refinement (TPU path)")
    p.add_argument("--gemm_solves", action="store_true",
                   help="GEMM-only solve form for the posterior factor "
                        "(sampling/std ~10x faster than TRSM scans on TPU)")
    p.add_argument("--pad_block", type=int, default=None,
                   help="pad spatial block to a multiple (e.g. 128)")
    p.add_argument("--damping", action="store_true",
                   help="backtracking Gauss-Newton (step fractions "
                        "{1,1/2,1/4,1/8} on the MAP objective) — needed on "
                        "shocky long-horizon trajectories where plain GN "
                        "diverges")
    p.add_argument("--toeplitz", action="store_true",
                   help="hold the ST prior in distinct-block (Toeplitz) "
                        "form inside the Gauss-Newton loop — no full-size "
                        "f64 BTD in the loop body (required for N_x >= "
                        "~400 x 100 steps on a 16 GB chip)")
    p.add_argument("--sqrt", action="store_true",
                   help="ST-SRIF square-root Gauss-Newton: windowed QR of "
                        "the stacked [Λ_0; P^{1/2}(−M~|T) per step; "
                        "sqrt(τ_ic) A_ic; sqrt(τ) J] — f32-valid where "
                        "mixed-precision Cholesky NaNs (fine-dt sweeps, "
                        "N_x >= 200 x N_t = 100); implies Toeplitz-form "
                        "prior in the loop and never materializes H")
    p.add_argument("--factor_winv", type=int, default=0,
                   help="panel-inverse GEMM-chain TRSM in the f32 BTD "
                        "factor sweep (panel size; 0 = monolithic TRSM)")
    p.add_argument("--factor_panel", type=int, default=0,
                   help="blocked-panel POTRF in the f32 BTD factor sweep "
                        "(panel size; 0 = monolithic chol)")
    p.add_argument("--srif_qr_impl", type=str, default="xla",
                   help="SRIF window-QR engine: xla | bhh | bhh1 | bcgs2 "
                        "| bcgs4 | bcgs")
    p.add_argument("--srif_qr_dtype", type=str, default="f32",
                   help="SRIF window-QR factor dtype: f32 | f64 (exact-"
                        "direction arm for cond(H) beyond f32 sqrt "
                        "validity — flagship N800x100; ~47x QR cost)")
    p.add_argument("--srif_solve", type=str, default="refine",
                   choices=("refine", "pcg"),
                   help="SRIF direction solve: Richardson refinement or "
                        "preconditioned CG (factors beyond f32 validity)")
    p.add_argument("--srif_pcg_iters", type=int, default=32)
    p.add_argument("--sub_dtype", type=str, default="cond",
                   help="substitution dtype through the f32 SRIF factor: "
                        "cond (f32 + conditional f64 re-sweep on overflow) "
                        "| f32 | f64. Batched (vmap) runs should pass f32 "
                        "when in range — under vmap lax.cond executes both "
                        "branches")
    p.add_argument("--factor_prec", type=str, default="float32",
                   help="matmul precision in the f32 BTD factor sweep: "
                        "float32 | tensorfloat32")
    p.add_argument("--batch", type=int, default=1,
                   help="vmap batch size: whole posterior pipelines (prior "
                        "assembly + IC conditioning + Gauss-Newton + "
                        "sampling/std) per XLA program — the DP "
                        "chip-saturation axis (SURVEY.md 2.4)")
    p.add_argument("--warm_start", action="store_true",
                   help="initialize Gauss-Newton at the deterministic "
                        "implicit-Euler forward march from the IC-"
                        "conditioned mean's first slice (problems/burgers."
                        "BurgersForwardMarch) — cuts GN steps sharply at "
                        "fine resolution where the reference's x0=mean(x_ic) "
                        "start needs >15 steps")
    p.add_argument("--warm_substeps", type=int, default=2,
                   help="internal implicit-Euler substeps per observation "
                        "interval in the warm-start march")
    p.add_argument("--warm_src", choices=("fit", "posterior"), default="fit",
                   help="march IC source: 'fit' = dense-grid least-squares "
                        "fit of the OBSERVED IC (march_check.py; robust at "
                        "every N_x), 'posterior' = slice 0 of the f32 "
                        "IC-conditioned posterior mean (the round-2 "
                        "default; garbage at N_x=800 where the f32 "
                        "conditioning sweep is beyond validity — "
                        "RESULTS.md queue P)")
    p.add_argument("--max_steps", type=int, default=15,
                   help="Gauss-Newton step cap (StepNumberCriterion)")
    p.add_argument("--stepwise", action="store_true",
                   help="split the per-instance pipeline into separate "
                        "jitted programs (setup / one GN step / posterior) "
                        "with a host-side convergence loop — the workaround "
                        "for the relay kernel fault on large fused "
                        "while_loop programs (requires --sqrt, batch=1)")
    p.add_argument("--gn_diag", action="store_true",
                   help="per-step diagnostics (stepwise, batch=1): log the "
                        "f64 MAP objective phi and the trajectory rel_err "
                        "at the warm start and after every Newton step — "
                        "separates 'bad warm start' from 'bad directions' "
                        "from 'objective minimized away from the truth' "
                        "(flagship N800x100 divergence triage)")
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
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import BurgersFEMResidual
    from diffeqgmrfs_tpu.solvers import (
        gauss_newton,
        NewtonDecrementCriterion,
        StepNumberCriterion,
        OrCriterion,
    )
    from diffeqgmrfs_tpu.datasets import BurgersDataset
    from diffeqgmrfs_tpu.metrics import rel_err, rmse, max_err
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    params = dict(datasetname=args.datasetname, N_x=args.N_x, dry_run=args.dry_run)
    log.info("params: %s", params)
    to = PhaseTimers()

    mat_path = datadir("input_data", "Burgers", f"{args.datasetname}.mat")
    if args.datasetname != "synthetic" and os.path.exists(mat_path):
        ds = BurgersDataset(mat_path)
    else:
        if args.datasetname != "synthetic":
            log.warning("dataset %s not found; generating synthetic", mat_path)
        ds = BurgersDataset.synthetic(
            n_instances=args.N_instances,
            n_x=args.n_x_data,
            n_t=args.n_t_data,
            visc=args.nu,
            cache=datadir(
                "input_data", "synthetic",
                f"burgers_v{args.nu:g}_t{args.n_t_data}_x{args.n_x_data}_n{args.N_instances}.npz",
            ),
        )
    log.info("%s", ds)
    x_coords, ts = ds.x_coords, ds.ts
    N_t = len(ts)
    if args.toeplitz or args.sqrt:
        # ToeplitzBTD.from_btd slices diag[1] as THE interior block — valid
        # only for uniform time grids (else interior blocks vary and the
        # sliced factor is silently wrong)
        dts = np.diff(np.asarray(ts))
        assert np.allclose(dts, dts[0], rtol=1e-8), (
            "--toeplitz requires a uniform time grid"
        )

    with to("Mesh generation"):
        disc = periodic_unit_interval_discretization(args.N_x, element_order=2)
    with to("Etc"):
        E = evaluation_matrix(disc, x_coords)
        E_st = replicate_over_time(E, range(N_t), N_t)
        A_ic = spatial_to_spatiotemporal(E, 0, N_t)
    res = BurgersFEMResidual(disc, ts, ds.nu, scheme="implicit_euler")

    nu_matern = 1.5
    kappa = float(np.sqrt(8 * nu_matern) / np.sqrt(1 / args.N_x))
    c = 1.0 / ds.nu
    noise_ic, noise_fem = 1e8, 1e12
    criterion = OrCriterion(
        [NewtonDecrementCriterion(1e-6), StepNumberCriterion(args.max_steps)]
    )

    # Prebuild the condensed-Jacobian A^T A pattern (jit argument; the
    # inlined form exceeds remote-compile size limits at production sizes).
    from diffeqgmrfs_tpu.gmrf.affine import AffineMap
    from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint

    # mixed precision is safe for the GN systems / posterior (the huge
    # noise_fem term dominates and the equilibrated system stays in f32
    # range) but NOT for the IC conditioning alone, whose adv-diff prior
    # spread exceeds f32 — conditioning stays f64.
    bp_cond = CholeskySolverBlueprint()
    bp = CholeskySolverBlueprint(
        mixed_precision=args.mixed_precision, gemm_solves=args.gemm_solves
    )
    from diffeqgmrfs_tpu.solvers import GNCholeskySolverBlueprint

    bp_gn = GNCholeskySolverBlueprint(
        mixed_precision=args.mixed_precision,
        toeplitz=args.toeplitz or args.sqrt,
        sqrt_factor=args.sqrt,
        damping=args.damping,
        gemm_solves=args.gemm_solves,
        srif_qr_impl=args.srif_qr_impl,
        srif_qr_dtype=args.srif_qr_dtype,
        sub_dtype=args.sub_dtype,
        srif_solve=args.srif_solve,
        srif_pcg_iters=args.srif_pcg_iters,
        factor_winv_trsm=args.factor_winv or None,
        factor_panel=args.factor_panel or None,
        factor_precision=args.factor_prec,
    )
    stride = None
    if args.pad_block and disc.n_free % args.pad_block:
        stride = -(-disc.n_free // args.pad_block) * args.pad_block
    affine_st = AffineMap.from_constraint_handler(disc.constraint_handler).replicate(N_t, stride=stride)
    # structure-only evaluation: run on the host CPU backend (the
    # eager TPU path is slow and fault-prone through the relay)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        _, J0 = res.f_and_J(jnp.zeros(N_t * disc.ndofs))
        Jc0 = affine_st.condense_rowop(J0)
    n_free_st = affine_st.n_free
    bs_blk = stride if stride else disc.n_free

    if args.warm_start:
        from diffeqgmrfs_tpu.problems.burgers import BurgersForwardMarch

        march = BurgersForwardMarch(
            disc, ts, ds.nu, substeps=args.warm_substeps
        )
        if args.warm_src == "fit":
            # dense-grid least-squares IC fit (march_check.py): a bare
            # lstsq on the coarse data grid is underdetermined at
            # N_x >= 64 (min-norm oscillation Burgers amplifies), so fit
            # a periodic interp of the data on a 2049-point grid. The
            # pinv is built once per mesh on the CPU backend (the host
            # numpy here has no SIMD).
            _x_fine = np.linspace(0.0, 1.0, 2049)
            _E_fine = np.asarray(
                evaluation_matrix(disc, _x_fine).to_dense()
            )
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                _P_fit_h = np.asarray(
                    jnp.linalg.pinv(jnp.asarray(_E_fine, jnp.float64))
                )
            _P_fit = jnp.asarray(_P_fit_h, jnp.float32)
            _xf_j = jnp.asarray(_x_fine, jnp.float32)
            _xc_j = jnp.asarray(np.asarray(x_coords), jnp.float32)

        def _warm_x0(mu_ic, ic_obs):
            # march in f32 (TPU LuDecomposition has no f64 path; precision
            # is irrelevant for an initial iterate), restrict back to the
            # padded free layout in the iterate dtype
            if args.warm_src == "fit":
                ic_f = jnp.interp(
                    _xf_j, _xc_j, ic_obs.astype(jnp.float32), period=1.0
                )
                u0 = _P_fit @ ic_f
            else:
                mu_full = affine_st.free_to_full(mu_ic)
                u0 = mu_full[: disc.ndofs].astype(jnp.float32)
            W = march.trajectory(u0)
            return affine_st.restrict(W.reshape(-1)).astype(mu_ic.dtype)

    spde_static = dict(
        d=1, kappa=0.0, alpha=1, c=c, tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_matern),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_matern),
    )
    if args.sqrt:
        # ST-SRIF operands (host-built structure; gamma enters in-trace)
        from diffeqgmrfs_tpu.models.advection_diffusion import st_sqrt_ops
        from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan
        from diffeqgmrfs_tpu.ops.srif import rowop_window_plan

        st_ops = st_sqrt_ops(
            AdvectionDiffusionSPDE(gamma=0.0, **spde_static), disc, ts,
            pad_block=args.pad_block,
        )
        A_ic_c = affine_st.condense_rowop(A_ic)
        ic_plan = rowop_window_plan(
            A_ic_c, affine_st.n_free_padded, bs_blk
        ).to_device()
        j_plan = make_ata_window_plan(
            np.asarray(Jc0.cols), affine_st.n_free_padded, bs_blk
        ).to_device()
        y_shift = np.asarray(affine_st.offset_shift(A_ic))
        gn_aux = jax.device_put(dict(
            st=st_ops, ic_plan=ic_plan, ic_vals=A_ic_c.vals,
            ic_cols=jnp.asarray(A_ic_c.cols), j_plan=j_plan,
            y_shift=jnp.asarray(y_shift),
        ))
    else:
        gn_aux = ata_pattern_cached(
            Jc0, affine_st.n_free_padded, bs_blk
        ).to_device()

    def solve_instance(ic, key, aux):
        bulk = jnp.mean(ic)
        gamma = -c * bulk
        spde = AdvectionDiffusionSPDE(
            gamma=jnp.asarray([gamma]), **spde_static
        )
        if args.sqrt:
            # fully f64-BTD-free pipeline: Toeplitz-form prior + SRIF
            # IC conditioning + SRIF Gauss-Newton + final-factor posterior
            from diffeqgmrfs_tpu.models.advection_diffusion import (
                st_prior_toeplitz,
            )
            from diffeqgmrfs_tpu.gmrf.conditioning import condition_st_sqrt
            from diffeqgmrfs_tpu.fem.operators import RowOp
            from diffeqgmrfs_tpu.ops.packed import ShapeOnly

            mu_p, q_top, affine_inst = st_prior_toeplitz(
                spde, disc, ts, mean_offset=bulk, pad_block=args.pad_block
            )
            prior_ops = aux["st"].sqrt_ops(gamma)
            A_c = RowOp(aux["ic_cols"], aux["ic_vals"], q_top.n)
            mu_ic, q_ic, eta_ic, pre = condition_st_sqrt(
                mu_p, q_top, prior_ops, A_c, noise_ic,
                ic - aux["y_shift"], aux["ic_plan"], return_factor=True,
            )
            ic_pred = E_st.matvec(
                affine_inst.free_to_full(mu_ic)
            ).reshape(N_t, len(x_coords))
            gn_aux_t = dict(
                sqrt_ops=prior_ops
                + [(aux["ic_plan"], aux["ic_vals"] * np.sqrt(noise_ic))],
                ata_window_plan=aux["j_plan"],
                q_ell=q_ic,
                q_diag=q_ic.diagonal(),
                q_mu=eta_ic,  # exact information vector (see condition_st_sqrt)
                # conditioning factor doubles as the SRIF prefactor: each
                # Newton step QRs only [R_ic·rescale; sqrt(tau) J]
                srif_prior_R=pre[0],
                srif_prior_cs0=pre[1],
            )
            x0 = _warm_x0(mu_ic, ic) if args.warm_start else mu_ic
            result = gauss_newton(
                mu_ic,
                ShapeOnly(q_ic.n, q_ic.N, q_ic.bs),
                res.f_and_J,
                noise_fem,
                jnp.zeros(res.n_rows),
                x0,
                blueprint=bp_gn,
                aux=gn_aux_t,
                criterion=criterion,
                affine=affine_inst,
            )
            post = result.posterior(affine=affine_inst, blueprint=bp)
            pred = E_st.matvec(post.mean()).reshape(N_t, len(x_coords))
            return pred, ic_pred, post.std(), post.sample(key, 1), result.n_steps

        x = discretize_advection_diffusion(
            spde, disc, ts, mean_offset=bulk, pad_block=args.pad_block
        )
        x_ic = condition_on_observations(
            x, A_ic, noise_ic, ic, solver_blueprint=bp_cond
        )
        ic_pred = E_st.matvec(x_ic.mean()).reshape(N_t, len(x_coords))
        gn_aux_t = dict(ata_pattern=aux)
        x0 = (
            _warm_x0(x_ic.inner_gmrf.mean(), ic)
            if args.warm_start else x_ic.inner_gmrf.mean()
        )
        result = gauss_newton(
            x_ic.inner_gmrf.mean(),
            x_ic.inner_gmrf.precision,
            res.f_and_J,
            noise_fem,
            jnp.zeros(res.n_rows),
            x0,
            blueprint=bp_gn,
            aux=gn_aux_t,
            criterion=criterion,
            affine=x_ic.affine,
        )
        post = result.posterior(affine=x_ic.affine, blueprint=bp)
        pred = E_st.matvec(post.mean()).reshape(N_t, len(x_coords))
        std = post.std()
        smp = post.sample(key, 1)
        return pred, ic_pred, std, smp, result.n_steps

    if args.stepwise:
        # split programs + host convergence loop (relay-fault workaround);
        # with --batch > 1 each per-step program is vmapped over instances
        # and the host loop runs until every batch member converges
        assert args.sqrt, "--stepwise requires --sqrt"
        from diffeqgmrfs_tpu.models.advection_diffusion import (
            st_prior_toeplitz,
        )
        from diffeqgmrfs_tpu.gmrf.conditioning import condition_st_sqrt
        from diffeqgmrfs_tpu.fem.operators import RowOp
        from diffeqgmrfs_tpu.ops.packed import ShapeOnly
        from diffeqgmrfs_tpu.solvers import StepNumberCriterion

        def _spde(gamma):
            return AdvectionDiffusionSPDE(
                gamma=jnp.asarray([gamma]), **spde_static
            )

        def _sw_setup(ic, aux):
            bulk = jnp.mean(ic)
            gamma = -c * bulk
            mu_p, q_top, affine_inst = st_prior_toeplitz(
                _spde(gamma), disc, ts, mean_offset=bulk,
                pad_block=args.pad_block,
            )
            A_c = RowOp(aux["ic_cols"], aux["ic_vals"], q_top.n)
            mu_ic, q_ic, eta_ic, pre = condition_st_sqrt(
                mu_p, q_top, aux["st"].sqrt_ops(gamma), A_c, noise_ic,
                ic - aux["y_shift"], aux["ic_plan"], return_factor=True,
            )
            return mu_ic, q_ic, eta_ic, gamma, pre

        def _gn_aux(aux, gamma, q_ic, eta_ic, final_factor, pre):
            return dict(
                sqrt_ops=aux["st"].sqrt_ops(gamma)
                + [(aux["ic_plan"], aux["ic_vals"] * np.sqrt(noise_ic))],
                ata_window_plan=aux["j_plan"],
                q_ell=q_ic,
                q_diag=q_ic.diagonal(),
                q_mu=eta_ic,
                final_factor=final_factor,
                # setup's conditioning factor doubles as the SRIF
                # prefactor: per-step programs QR only
                # [R_ic*rescale; sqrt(tau) J] (ops/srif.py prior_factor)
                srif_prior_R=pre[0],
                srif_prior_cs0=pre[1],
            )

        def _sw_step(mu_ic, x_cur, gamma, q_ic, eta_ic, pre, aux):
            r = gauss_newton(
                mu_ic, ShapeOnly(q_ic.n, q_ic.N, q_ic.bs), res.f_and_J,
                noise_fem, jnp.zeros(res.n_rows), x_cur,
                blueprint=bp_gn,
                aux=_gn_aux(aux, gamma, q_ic, eta_ic, False, pre),
                criterion=StepNumberCriterion(1),
                affine=affine_st,
            )
            return r.x_k, r.newton_decrement

        def _sw_posterior(mu_ic, x_fin, gamma, q_ic, eta_ic, pre, aux, key):
            r = gauss_newton(
                mu_ic, ShapeOnly(q_ic.n, q_ic.N, q_ic.bs), res.f_and_J,
                noise_fem, jnp.zeros(res.n_rows), x_fin,
                blueprint=bp_gn,
                aux=_gn_aux(aux, gamma, q_ic, eta_ic, True, pre),
                criterion=StepNumberCriterion(0),  # no steps: factor at x_fin
                affine=affine_st,
            )
            post = r.posterior(affine=affine_st, blueprint=bp)
            pred = E_st.matvec(post.mean()).reshape(N_t, len(x_coords))
            return pred, post.std(), post.sample(key, 1)

        def _sw_icpred(mu_ic):
            return E_st.matvec(affine_st.free_to_full(mu_ic)).reshape(
                N_t, len(x_coords)
            )

        sw_setup = jax.jit(_sw_setup)
        sw_step = jax.jit(_sw_step)
        sw_posterior = jax.jit(_sw_posterior)
        sw_icpred = jax.jit(_sw_icpred)

        def _sw_phi(x_cur, q_ic, eta_ic):
            # the GN body's damping objective, in f64: noise_fem*||F(x)||^2
            # + x'Qx - 2 x'eta (constant-in-x terms dropped — comparisons
            # only). J is dead -> DCE'd.
            f_c, _ = res.f_and_J(affine_st.free_to_full(x_cur))
            f64 = f_c.astype(jnp.float64)
            x64 = x_cur.astype(jnp.float64)
            return (
                noise_fem * jnp.sum(f64 * f64)
                + jnp.dot(x64, q_ic.matvec(x_cur).astype(jnp.float64))
                - 2.0 * jnp.dot(x64, jnp.asarray(eta_ic, jnp.float64))
            )

        sw_phi = jax.jit(_sw_phi)
        _diag_truth = [None]  # set per instance by the host loop

        def _gn_diag(tag, xd, q_ic, eta_ic):
            if not args.gn_diag:
                return
            phi = float(sw_phi(xd, q_ic, eta_ic))
            t = _diag_truth[0]
            re = float("nan")
            if t is not None:
                pred_d = np.asarray(sw_icpred(xd))
                re = float(rel_err(pred_d[1:], t[1:]))
            log.info("  gn_diag %s: phi=%.10e rel_err=%.4e", tag, phi, re)
        sw_warm = jax.jit(_warm_x0) if args.warm_start else None
        max_steps = args.max_steps

        if args.batch > 1:
            vsw_setup = jax.jit(jax.vmap(_sw_setup, in_axes=(0, None)))
            vsw_step = jax.jit(
                jax.vmap(_sw_step, in_axes=(0, 0, 0, 0, 0, 0, None))
            )
            vsw_posterior = jax.jit(
                jax.vmap(_sw_posterior, in_axes=(0, 0, 0, 0, 0, 0, None, 0))
            )
            vsw_icpred = jax.jit(jax.vmap(_sw_icpred))

            vsw_warm = (
                jax.jit(jax.vmap(_warm_x0)) if args.warm_start else None
            )

            _phase_logs = [0]  # log per-phase wall for the first few batches

            def stepwise_batch_solve(ics, keys):
                import time as _t

                t0 = _t.perf_counter()
                mu_ic, q_ic, eta_ic, gamma, pre = vsw_setup(ics, gn_aux)
                ic_pred = vsw_icpred(mu_ic)
                x = vsw_warm(mu_ic, ics) if args.warm_start else mu_ic
                jax.block_until_ready(x)
                t_setup = _t.perf_counter() - t0
                t0 = _t.perf_counter()
                B = ics.shape[0]
                steps_taken = np.full(B, max_steps, dtype=np.int64)
                # plateau stop: the absolute decrement tolerance rarely
                # fires at fine resolutions (the f32-factor decrement floor
                # sits above 1e-6) so instances used to run to the cap;
                # stop once NO instance has improved its best decrement by
                # >= 10% for 3 consecutive steps (the iterate is already at
                # the floor — extra steps oscillate there)
                best = np.full(B, np.inf)
                stall = np.zeros(B, dtype=np.int64)
                for s in range(max_steps):
                    x, dec = vsw_step(
                        mu_ic, x, gamma, q_ic, eta_ic, pre, gn_aux
                    )
                    dec_h = np.asarray(dec)
                    improved = dec_h < 0.9 * best
                    stall = np.where(improved, 0, stall + 1)
                    best = np.minimum(best, dec_h)
                    done = (dec_h < 1e-6) | ((stall >= 3) & (s + 1 >= 4))
                    steps_taken = np.where(
                        done & (steps_taken == max_steps), s + 1, steps_taken
                    )
                    if done.all():
                        break
                t_steps = _t.perf_counter() - t0
                t0 = _t.perf_counter()
                pred, std, smp = vsw_posterior(
                    mu_ic, x, gamma, q_ic, eta_ic, pre, gn_aux, keys
                )
                jax.block_until_ready(pred)
                if _phase_logs[0] < 3:
                    _phase_logs[0] += 1
                    log.info(
                        "batch phases: setup %.2fs, %d steps %.2fs "
                        "(%.2fs/step), posterior %.2fs",
                        t_setup, int(np.max(steps_taken)), t_steps,
                        t_steps / max(int(np.max(steps_taken)), 1),
                        _t.perf_counter() - t0,
                    )
                return pred, ic_pred, std, smp, jnp.asarray(steps_taken)

        def solve_jit(ic, key):
            mu_ic, q_ic, eta_ic, gamma, pre = sw_setup(ic, gn_aux)
            ic_pred = sw_icpred(mu_ic)
            x = sw_warm(mu_ic, ic) if args.warm_start else mu_ic
            _gn_diag("x0 (warm)" if args.warm_start else "x0 (mu_ic)",
                     x, q_ic, eta_ic)
            n_steps = 0
            best, stall = np.inf, 0
            for _ in range(max_steps):
                x, dec = sw_step(mu_ic, x, gamma, q_ic, eta_ic, pre, gn_aux)
                n_steps += 1
                _gn_diag(f"step {n_steps} (dec {float(dec):.3e})",
                         x, q_ic, eta_ic)
                d = float(dec)
                if d < 1e-6:
                    break
                if d < 0.9 * best:
                    stall = 0
                else:
                    stall += 1
                    if stall >= 3 and n_steps >= 4:
                        break  # decrement floor (see batched loop note)
                best = min(best, d)
            pred, std, smp = sw_posterior(
                mu_ic, x, gamma, q_ic, eta_ic, pre, gn_aux, key
            )
            return pred, ic_pred, std, smp, jnp.asarray(n_steps)

    else:
        _solve = jax.jit(solve_instance)

        def solve_jit(ic, key):
            return _solve(ic, key, gn_aux)

    key = jax.random.PRNGKey(345903459)
    if args.gn_diag and args.stepwise and args.batch == 1:
        _diag_truth[0] = np.asarray(ds.get_solution(0))
    if args.batch == 1:
        with to("Prior construction + first solve (compile)"):
            out = solve_jit(jnp.asarray(ds.get_initial_condition(0)), key)
            to.sync(out[0])

    N = min(3, len(ds)) if args.dry_run else len(ds)
    KEYS = ("rel_errs", "rmses", "max_errs", "ic_rel_errs", "ic_rmses",
            "ic_max_errs", "std_norms", "n_std_nonfinite", "N_newton_steps",
            "optimization_times")
    cols = {k: [] for k in KEYS}
    # mid-sweep checkpointing: per-instance JSONL; restarts after a relay
    # worker crash skip completed instances (utils/results.IncrementalSaver)
    from diffeqgmrfs_tpu.utils.results import IncrementalSaver

    saver = IncrementalSaver(
        os.path.join(datadir("sims", "burgers", "gmrf-fem"), savename(params))
    )

    def record(i, pred, ic_pred, std, n_steps, opt_time):
        soln = jnp.asarray(ds.get_solution(i))[1:]
        row = saver.record(
            i,
            rel_errs=float(rel_err(pred[1:], soln)),
            rmses=float(rmse(pred[1:], soln)),
            max_errs=float(max_err(pred[1:], soln)),
            ic_rel_errs=float(rel_err(ic_pred[1:], soln)),
            ic_rmses=float(rmse(ic_pred[1:], soln)),
            ic_max_errs=float(max_err(ic_pred[1:], soln)),
            # std rides the f32 factor with an f64 overflow rescue
            # (ops/refine.SRIFNewtonFactor.variance_diag); any dof still
            # non-finite carries NO f32 variance information — norm over
            # the finite entries and COUNT the rest (honesty metric)
            std_norms=float(
                jnp.linalg.norm(jnp.where(jnp.isfinite(std), std, 0.0))
            ),
            n_std_nonfinite=int(jnp.sum(~jnp.isfinite(std))),
            N_newton_steps=int(n_steps),
            optimization_times=opt_time,
        )
        _log_row(i, row)

    def _log_row(i, row):
        log.info(
            "instance %d: rel_err=%.3e (ic-only %.3e), %d Newton steps",
            i, row["rel_errs"], row["ic_rel_errs"], int(row["N_newton_steps"]),
        )

    sweep_t0 = None
    throughput = None
    if args.batch > 1:
        if args.stepwise:
            def vsolve(ics, keys, _aux):
                return stepwise_batch_solve(ics, keys)
        else:
            vsolve = jax.jit(jax.vmap(solve_instance, in_axes=(0, 0, None)))
        import time as _time

        for start in range(0, N, args.batch):
            idxs = list(range(start, min(start + args.batch, N)))
            if all(saver.has(i) for i in idxs):
                for i in idxs:
                    _log_row(i, saver.get(i))
                continue
            pad = args.batch - len(idxs)
            ics = jnp.asarray(np.stack(
                [np.asarray(ds.get_initial_condition(i)) for i in idxs]
                + [np.asarray(ds.get_initial_condition(idxs[-1]))] * pad))
            keys = jax.random.split(jax.random.fold_in(key, start), args.batch)
            cur = PhaseTimers()
            with cur("Optimization"):
                pred, ic_pred, std, smp, n_steps = vsolve(ics, keys, gn_aux)
                cur.sync(pred)
            if sweep_t0 is None:
                # first batch includes the vmapped compile; time from here
                sweep_t0 = _time.perf_counter()
                n_done_at_t0 = idxs[-1] + 1
            t_b = cur.time("Optimization") / len(idxs)
            for j, i in enumerate(idxs):
                record(i, pred[j], ic_pred[j], std[j], n_steps[j], t_b)
        if sweep_t0 is not None and N > n_done_at_t0:
            dt = _time.perf_counter() - sweep_t0
            thr = (N - n_done_at_t0) / dt if dt > 0 else 0.0
            log.info("throughput (post-compile): %.2f instances/s", thr)
            throughput = thr
    else:
        for i in range(N):
            if saver.has(i):
                _log_row(i, saver.get(i))
                continue
            ic = jnp.asarray(ds.get_initial_condition(i))
            if args.gn_diag and args.stepwise:
                _diag_truth[0] = np.asarray(ds.get_solution(i))
            cur = PhaseTimers()
            with cur("Optimization"):
                pred, ic_pred, std, smp, n_steps = solve_jit(
                    ic, jax.random.fold_in(key, i)
                )
                cur.sync(pred)
            record(i, pred, ic_pred, std, n_steps, cur.time("Optimization"))

    for row in saver.rows():
        for k in KEYS:
            cols[k].append(row[k])
    out = dict(throughput_inst_per_s=throughput, **cols,
               timers=to.as_dict(), **params)
    path = tagsave(
        os.path.join(datadir("sims", "burgers", "gmrf-fem"), savename(params)), out
    )
    saver.finalize()
    log.info("mean rel_err = %.4e", float(np.mean(cols["rel_errs"])))
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
