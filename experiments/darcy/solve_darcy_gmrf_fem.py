"""Darcy GMRF-FEM sweep: per-instance posterior mean/std/sample + metrics.

TPU-native analog of `/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl`:
Matérn-2 prior on the unit square, observations = rows of the per-instance
Darcy FEM system, information-form conditioning at precision 1e8, posterior
mean / joint sample / marginal std, rel_err/rmse/max_err vs the dataset
solutions. The whole per-instance solve is ONE jitted XLA program (assembly +
conditioning + Takahashi std + sampling), reused across instances — the
analog of the reference's fixed CHOLMOD permutation reuse
(`solve_darcy_gmrf-fem.jl:169-174`).

Usage:
  python experiments/darcy/solve_darcy_gmrf_fem.py --N_xy 40 --dry_run true
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
    p = base_parser("Darcy GMRF-FEM sweep")
    p.add_argument("--datasetname", type=str, default="synthetic")
    p.add_argument("--N_xy", type=int, default=40)
    p.add_argument("--boundary_width", type=float, default=0.0)
    p.add_argument("--N_instances", type=int, default=8)
    p.add_argument("--grid", type=int, default=61, help="dataset grid resolution")
    p.add_argument("--truth_N_xy", type=int, default=0,
                   help="synthetic-truth FEM mesh resolution (0 = "
                        "max(N_xy, 40)). Lower it for large-instance-count "
                        "throughput sweeps: this host generates reference "
                        "solutions on ONE slow core, and a 1024-instance "
                        "dataset at truth fidelity N300 would take days")
    p.add_argument("--batch", type=int, default=1, help="vmap batch size")
    p.add_argument("--mixed_precision", action="store_true",
                   help="f32 MXU factorization + f64 refinement (TPU path)")
    p.add_argument("--nll", action="store_true",
                   help="per-instance calibration: sqmahal + NLL of the "
                        "posterior at the dof-interpolated true solution "
                        "(analog of solve_burgers_gmrf-collocation.jl:200-215)")
    p.add_argument("--nll_fused", action="store_true",
                   help="force BOTH conditionings (posterior + 1e12 "
                        "solution-interpolation) into one program. Default "
                        "for --nll is the 2-program residency split: "
                        "program A = fused posterior (mean/std/sample/"
                        "log-det; the darcy_N300_full_nopf rc=0 class), "
                        "program B = E-conditioning + operator-form "
                        "sqmahal AFTER the posterior factor frees — the "
                        "all-fused program's 17.1 MB MLIR crashes the "
                        "relay compile helper at N300 and full phase-split "
                        "breaks cross-jit residency (RESULTS.md r4)")
    p.add_argument("--compact", action="store_true",
                   help="production-memory prior: f32 BTD factor + f64 ELL "
                        "operator (CompactGMRF / MatFreeConditionFactor)")
    p.add_argument("--f64_factor", action="store_true",
                   help="factor in f64 (needed when cond(H~) > 1/eps_f32, "
                        "i.e. Darcy FEM observations beyond N_xy ~ 100; "
                        "~47x slower on v5e but exact)")
    p.add_argument("--packed", action="store_true",
                   help="packed banded-block storage: half the operator and "
                        "factor HBM (implies --compact and --ata_windows)")
    p.add_argument("--ata_windows", action="store_true",
                   help="A^T A via block-window GEMMs instead of flat "
                        "scatter (scatter-free MXU path)")
    p.add_argument("--gemm_solves", action="store_true",
                   help="GEMM-only solve form (W_i = L_i^{-1} precomputed; "
                        "sampling/variance/refinement ride pure matmuls)")
    p.add_argument("--srif_chunk", type=str, default="auto",
                   help="SRIF window-QR chunk policy: auto | off | <int>")
    p.add_argument("--srif_precision", type=str, default="float32",
                   help="MXU precision inside the SRIF QR: float32 | "
                        "tensorfloat32")
    p.add_argument("--srif_qr_impl", type=str, default="xla",
                   help="SRIF window-QR engine: xla (monolithic "
                        "Householder) | bhh (blocked Householder panels + "
                        "GEMM trailing updates) | bhh1 (bhh without the "
                        "reorth pass — fastest Householder-grade engine) "
                        "| bcgs2 (all-GEMM BCGS2 + "
                        "shifted-CholQR3 panels) | bcgs4 (all-GEMM BCGS2 + "
                        "staged-shift CholQR4 panels: Householder-grade "
                        "orthonormality) | bcgs (experimental)")
    p.add_argument("--refine_iters", type=int, default=0,
                   help="mean-solve refinement iterations (0 = per-factor "
                        "default; 2 reaches the f64 floor at Darcy N300)")
    p.add_argument("--phase_probe", action="store_true",
                   help="time assembly/conditioning/eval as separate jitted "
                        "phases on one instance, then exit (diagnostics)")
    p.add_argument("--mean_only", action="store_true",
                   help="skip posterior std/sampling (memory bisection / "
                        "mean-benchmark mode)")
    p.add_argument("--phase_split", action="store_true",
                   help="host-orchestrated FULL posterior: factor+mean, "
                        "Takahashi std, and sampling run as separate jitted "
                        "dispatches with the factor pytree crossing the jit "
                        "boundaries. The fused mean+std+sample program needs "
                        "18.8 GiB at N_xy=300 (queue-L darcy_N300_full "
                        "RESOURCE_EXHAUSTED); the split keeps peak HBM at "
                        "~(prior args + one factor + scan carries). "
                        "Requires --sqrt, batch=1, no --nll")
    p.add_argument("--factor_winv", type=int, default=0,
                   help="panel-inverse GEMM-chain TRSM in the f32 BTD "
                        "factor sweep (panel size; 0 = monolithic TRSM)")
    p.add_argument("--factor_panel", type=int, default=0,
                   help="blocked-panel POTRF in the f32 BTD factor sweep "
                        "(panel size; 0 = monolithic chol)")
    p.add_argument("--factor_prec", type=str, default="float32",
                   help="matmul precision in the f32 BTD factor sweep: "
                        "float32 | tensorfloat32")
    p.add_argument("--sqrt_prefactor", type=str, default="auto",
                   choices=("auto", "on", "off", "chunked"),
                   help="SRIF measurement-update prefactor: pre-reduce the "
                        "prior rows once at discretization (auto: on at "
                        "bs >= 512). 'chunked': prefactor ON with the "
                        "window sweep run as host-orchestrated chunked "
                        "dispatches (donated factor state) — the v5e HBM "
                        "fit at N_xy=300 where the fused prefactor program "
                        "needs 18.7 GiB (requires --sqrt --mean_only, "
                        "batch=1)")
    p.add_argument("--srif_chunk_windows", type=int, default=16,
                   help="windows per dispatch in the chunked sweep")
    p.add_argument("--sqrt", action="store_true",
                   help="SRIF square-root factorization: windowed QR of the "
                        "stacked [Lambda_Q; sqrt(tau) A] (implies --packed); "
                        "f32-valid at cond(H) ~ N_xy^4 where direct f32 "
                        "Cholesky breaks (N_xy >= 128)")
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    devices = select_backend(args.backend)
    log.info("devices: %s", devices)

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import uniform_unit_square_discretization
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.fem import evaluation_matrix
    from diffeqgmrfs_tpu.datasets import DarcyDataset
    from diffeqgmrfs_tpu.metrics import rel_err, rmse, max_err
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    beta = 1.0
    params = dict(
        datasetname=args.datasetname,
        N_xy=args.N_xy,
        boundary_width=args.boundary_width,
        dry_run=args.dry_run,
        beta=beta,
    )
    if args.nll:
        # keyed ONLY when set: the r4a N300 NLL arm shared the plain
        # sweep's savename, silently reusing (and at finalize DELETING)
        # the 1024-sweep's IncrementalSaver partial. The sweep's own
        # savename must stay unchanged (its partial is resume state).
        params["nll"] = True
    if args.datasetname == "synthetic":
        # truth fidelity changes the dataset (and so the quoted errors):
        # runs against different truth caches must not share result
        # files / saver partials (r4a collision postmortem). The r4a
        # sweep partial was migrated to the keyed name in-flight.
        params["truth_N_xy"] = args.truth_N_xy
    log.info("params: %s", params)
    to = PhaseTimers()

    # ---- dataset ----
    mat_path = datadir("input_data", "Darcy_241", f"{args.datasetname}.mat")
    if args.datasetname != "synthetic" and os.path.exists(mat_path):
        ds = DarcyDataset(mat_path)
    else:
        if args.datasetname != "synthetic":
            log.warning("dataset %s not found; generating synthetic", mat_path)
        truth_n = args.truth_N_xy or max(args.N_xy, 40)
        truth_tag = f"_t{truth_n}" if args.truth_N_xy else ""
        ds = DarcyDataset.synthetic(
            n_instances=args.N_instances,
            grid=args.grid,
            n_xy_fem=truth_n,
            cache=datadir("input_data", "synthetic",
                          f"darcy_g{args.grid}_n{args.N_instances}"
                          f"{truth_tag}.npz"),
        )
    log.info("%s", ds)
    inflated = args.boundary_width > 0.0

    # ---- discretization, prior, observation structure ----
    with to("Mesh generation"):
        disc = uniform_unit_square_discretization(
            args.N_xy,
            boundary_width=args.boundary_width,
            element_order=2,
            use_dirichlet_bc=not inflated,
        )
    log.info("ndofs=%d free=%d", disc.ndofs, disc.n_free)
    with to("Etc"):
        pts = np.stack(
            np.meshgrid(ds.x_coords, ds.y_coords, indexing="xy"), -1
        ).reshape(-1, 2)
        E = evaluation_matrix(disc, pts)
    with to("Prior construction"):
        spde = MaternSPDE(d=2, range=1 / np.sqrt(args.N_xy), smoothness=2)
        if args.sqrt:
            args.packed = True
        prior = discretize_matern(
            spde, disc, compact=args.compact, packed=args.packed,
            sqrt=args.sqrt,
            sqrt_prefactor={
                "auto": "auto", "on": True, "off": False, "chunked": True,
            }[args.sqrt_prefactor],
        )
    obs = DarcyFEMObservations(
        disc,
        ds.x_coords,
        ds.y_coords,
        beta=beta,
        inflated_boundary=inflated,
        N_xy=args.N_xy,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    Q_eps = 1e8
    ny, nx = len(ds.y_coords), len(ds.x_coords)

    # Prebuild the A^T A -> BTD pattern for the CONDENSED observation
    # operator and thread prior + pattern through the jit signature (large
    # index/precision arrays must be jit arguments, not closure constants).
    inner_prior = prior.inner_gmrf if hasattr(prior, "inner_gmrf") else prior
    # structure-only evaluation: run on the host CPU backend (the eager TPU
    # path through the relay is fault-prone and competes with the resident
    # prior for HBM at production sizes)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        A0, _ = obs(jnp.asarray(ds.get_problem(0)[1]))
        A0c = prior.affine.condense_rowop(A0) if hasattr(prior, "affine") else A0
    from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached

    if args.packed:
        args.ata_windows = True
    if args.ata_windows:
        from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

        # structural-zero slots: constraint condensation (s_coef == 0)
        zs_A = (
            np.asarray(prior.affine.s_coef)[A0.cols] == 0.0
            if hasattr(prior, "affine")
            else None
        )
        # the SRIF stacked QR requires the obs plan to share the prior
        # sqrt plan's window split (fine windows, ops/srif.py)
        plan_split = (
            getattr(inner_prior.sqrt_plan, "split", 1) if args.sqrt else 1
        )
        pat = make_ata_window_plan(
            A0c.cols, inner_prior.precision.n, inner_prior.precision.bs,
            zero_slots=zs_A, split=plan_split,
        ).to_device()
    else:
        pat = ata_pattern_cached(
            A0c, inner_prior.precision.n, inner_prior.precision.bs
        ).to_device()
    prior_put = prior
    inner0 = prior.inner_gmrf if hasattr(prior, "inner_gmrf") else prior
    if (
        getattr(inner0, "sqrt_R32", None) is not None
        and args.sqrt_prefactor != "off"
    ):
        # prefactor-active conditioning never reads the raw Λ operand;
        # keep its ~1 GB (values + window plan) off the 16 GB chip. The
        # packed-Cholesky scatter plan (q_pack_idx, 0.15 GB at N300) is
        # likewise dead on the SRIF path.
        pruned = inner0.drop_sqrt_operands()
        if args.sqrt:
            pruned.q_pack_idx = None
        prior_put = (
            type(prior)(pruned, prior.affine)
            if hasattr(prior, "affine") else pruned
        )
    prior_dev = jax.device_put(prior_put)
    geom_dev = jax.device_put(obs.geom_arrays())
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        obs_st = obs.structure_arrays()
    obs_st = jax.device_put(obs_st)

    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint

    bp = CholeskySolverBlueprint(
        mixed_precision=args.mixed_precision,
        gemm_solves=args.gemm_solves,
        factor_dtype="f64" if args.f64_factor else "f32",
        sqrt_factor=args.sqrt,
        srif_chunk=(
            args.srif_chunk if args.srif_chunk in ("auto", "off")
            else int(args.srif_chunk)
        ),
        srif_precision=args.srif_precision,
        srif_qr_impl=args.srif_qr_impl,
        refine_iters=args.refine_iters or None,
        factor_winv_trsm=args.factor_winv or None,
        factor_panel=args.factor_panel or None,
        factor_precision=args.factor_prec,
    )

    # Calibration target: true solution interpolated into dof space by
    # conditioning the prior on the full evaluation grid at precision 1e12
    # (the Burgers-collocation driver's construction,
    # `solve_burgers_gmrf-collocation.jl:200-215`).
    pat_E = None
    if args.nll:
        E_c = prior.affine.condense_rowop(E) if hasattr(prior, "affine") else E
        if args.ata_windows:
            from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

            zs_E = (
                np.asarray(prior.affine.s_coef)[E.cols] == 0.0
                if hasattr(prior, "affine")
                else None
            )
            pat_E = make_ata_window_plan(
                E_c.cols, inner_prior.precision.n, inner_prior.precision.bs,
                zero_slots=zs_E, split=plan_split,
            )
        else:
            pat_E = ata_pattern_cached(
                E_c, inner_prior.precision.n, inner_prior.precision.bs
            )
        # phase-split/2-program NLL runs at the HBM margin (r4a OOM at
        # ps_eval with the factor + prior f64 operands resident): keep
        # the E-plan host-side and upload per instance AFTER the
        # posterior factor is freed (sequential residency; ~seconds of
        # relay upload). The fused/batched paths keep the resident copy.
        if not args.phase_split and args.nll_fused:
            pat_E = pat_E.to_device()

    nll_split = args.nll and not args.phase_split and not args.nll_fused
    if nll_split and args.batch > 1:
        raise SystemExit("--nll 2-program split requires batch=1 "
                         "(use --nll_fused for the batched path)")

    def solve_instance(prior_arg, pattern, pattern_E, geom, structure, coeff, key, soln_flat):
        A, ys = obs(coeff, geom=geom, structure=structure)
        post = condition_on_observations(
            prior_arg, A, Q_eps, ys, solver_blueprint=bp, pattern=pattern
        )
        pred = E.matvec(post.mean()).reshape(ny, nx)
        if args.mean_only:
            std = jnp.zeros(())
            smp = jnp.zeros(())
        else:
            std = post.std()
            smp = post.sample(key, 1)
        if args.nll and not nll_split:
            # same blueprint as the posterior: the sqrt path both accepts
            # the (possibly split) window plan and survives the 1e12
            # interpolation precision where plain f32 Cholesky breaks
            x_soln = condition_on_observations(
                prior_arg, E, 1e12, soln_flat, solver_blueprint=bp,
                pattern=pattern_E,
            )
            soln_full = x_soln.mean()
            sqm = post.sqmahal(soln_full)
            inner = post.inner_gmrf if hasattr(post, "inner_gmrf") else post
            nll = 0.5 * (
                inner.n * jnp.log(2 * jnp.pi) + sqm - post.log_det_precision()
            )
        elif args.nll:
            # 2-program split, program A: emit the free-space posterior
            # mean and the log-det; sqmahal runs in program B once this
            # program's factor buffers are dead (they never escape the
            # jit). sqm slot carries mu_free, nll slot the log-det.
            inner = post.inner_gmrf if hasattr(post, "inner_gmrf") else post
            sqm = inner.mean()
            nll = post.log_det_precision()
        else:
            sqm = nll = jnp.zeros(())
        return pred, std, smp, sqm, nll

    _solve = jax.jit(solve_instance)

    def solve_jit(coeff, key, soln_flat):
        return _solve(
            prior_dev, pat, None if nll_split else pat_E, geom_dev, obs_st,
            coeff, key, soln_flat,
        )

    if nll_split:
        # Program B of the 2-program NLL split: the 1e12-precision
        # E-conditioning builds ITS factor only after program A's
        # posterior factor is dead (the two 5.3 GiB factor classes cannot
        # be co-resident at N300 — r4a phase-split OOM). sqmahal needs no
        # posterior factor at all: it is d^T H d with H applied in
        # operator form (prior ELL + tau A^T A via the window plan).
        from diffeqgmrfs_tpu.ops.refine import SymSumOp

        def solve_nll_b(prior_arg, pattern, pattern_E, geom, structure,
                        coeff, soln_flat, mu_free):
            A, _ys = obs(coeff, geom=geom, structure=structure)
            x_soln = condition_on_observations(
                prior_arg, E, 1e12, soln_flat, solver_blueprint=bp,
                pattern=pattern_E,
            )
            soln_full = x_soln.mean()
            affine = prior_arg.affine
            inner_p = prior_arg.inner_gmrf
            A_free = affine.condense_rowop(A)
            tau64 = jnp.asarray(Q_eps, dtype=inner_p.precision64.vals.dtype)
            H_op = SymSumOp(
                inner_p.precision64, A_free, tau64, diag_Q=inner_p.diag64,
                a_plan=pattern if hasattr(pattern, "t_rows") else None,
            )
            d = affine.restrict(soln_full) - mu_free
            return jnp.dot(d, H_op.matvec(d))

        _solve_b = jax.jit(solve_nll_b)

        def solve_b_jit(coeff, soln_flat, mu_free):
            return _solve_b(prior_dev, pat, pat_E, geom_dev, obs_st,
                            coeff, soln_flat, mu_free)

        n_free_nll = int(inner_prior.precision.n)

    use_chunked = args.sqrt and args.sqrt_prefactor == "chunked"
    if use_chunked:
        # host-orchestrated conditioning: (A) assembly+equilibration+rhs,
        # (B) chunked prefactor window sweep with a donated factor state
        # (ops/srif.srif_packed_qr_chunked — the v5e HBM fit at N300),
        # (C) refined mean solve on the prebuilt factor.
        if args.batch > 1 or args.nll or not args.mean_only:
            raise SystemExit(
                "--sqrt_prefactor chunked requires --mean_only, batch=1, "
                "no --nll (host-orchestrated mean pipeline)"
            )
        from diffeqgmrfs_tpu.ops.refine import (
            SymSumOp,
            SRIFConditionFactor,
            srif_condition_scale,
        )
        from diffeqgmrfs_tpu.ops.srif import srif_packed_qr_chunked

        def _ck_asm(coeff):
            return obs(coeff, geom=geom_dev, structure=obs_st)

        def _ck_h_op(prior_arg, pattern, A_free):
            x = (
                prior_arg.inner_gmrf
                if hasattr(prior_arg, "affine")
                else prior_arg
            )
            tau64 = jnp.asarray(Q_eps, dtype=x.precision64.vals.dtype)
            return x, tau64, SymSumOp(
                x.precision64, A_free, tau64, diag_Q=x.diag64,
                a_plan=pattern if hasattr(pattern, "t_rows") else None,
            )

        def _ck_stage_a(prior_arg, pattern, A, ys):
            if hasattr(prior_arg, "affine"):
                A_free = prior_arg.affine.condense_rowop(A)
                y_free = jnp.asarray(ys) - prior_arg.affine.offset_shift(A)
            else:
                A_free, y_free = A, jnp.asarray(ys)
            x, tau64, H_op = _ck_h_op(prior_arg, pattern, A_free)
            d = srif_condition_scale(H_op, pattern)
            cs = 1.0 / d
            rs = cs.astype(jnp.float32) / jnp.asarray(
                x.sqrt_cs0, jnp.float32
            )
            Av = A_free.vals * jnp.sqrt(tau64)
            rhs = x.precision64.matvec(x.mu) + tau64 * A_free.rmatvec(
                jnp.asarray(y_free, dtype=tau64.dtype)
            )
            return A_free, Av, cs, rs, rhs

        def _ck_stage_c(prior_arg, pattern, A_free, F32, rhs):
            x, _, H_op = _ck_h_op(prior_arg, pattern, A_free)
            ri = args.refine_iters or None
            factor = SRIFConditionFactor(
                H_op, pattern, None, None,
                x.precision.n, x.precision.N, x.precision.bs,
                **({} if ri is None else {"refine_iters": int(ri)}),
                gemm_solves=args.gemm_solves,
                prefactored=F32,
            )
            mu_free = factor.solve(rhs)
            mu_full = (
                prior_arg.affine.free_to_full(mu_free)
                if hasattr(prior_arg, "affine")
                else mu_free
            )
            return E.matvec(mu_full).reshape(ny, nx)

        ck_asm = jax.jit(_ck_asm)
        ck_a = jax.jit(_ck_stage_a)
        ck_c = jax.jit(_ck_stage_c)
        _x_host = (
            prior_put.inner_gmrf
            if hasattr(prior_put, "affine")
            else prior_put
        )
        _ck_shape = (
            _x_host.precision.n, _x_host.precision.N, _x_host.precision.bs
        )
        _ck_prior_R = _x_host.sqrt_R32
        assert _ck_prior_R is not None, (
            "--sqrt_prefactor chunked needs a prior discretized with an "
            "active sqrt prefactor (sqrt_R32)"
        )

        def _ck_cond_mean(A_, ys_):
            A_free, Av, cs, rs, rhs = ck_a(prior_dev, pat, A_, ys_)
            nq, Nq, bsq = _ck_shape
            F32 = srif_packed_qr_chunked(
                [(pat, Av)], nq, Nq, bsq, dtype=jnp.float32,
                col_scale=cs, prior_factor=_ck_prior_R, prior_rescale=rs,
                chunk_windows=args.srif_chunk_windows,
                chunk_rows=(
                    args.srif_chunk if args.srif_chunk in ("auto",)
                    else None if args.srif_chunk == "off"
                    else int(args.srif_chunk)
                ),
                matmul_precision=args.srif_precision,
                qr_impl=args.srif_qr_impl,
            )
            return ck_c(prior_dev, pat, A_free, F32, rhs)

        def solve_jit(coeff, key, soln_flat):  # noqa: F811
            A_, ys_ = ck_asm(coeff)
            pred = _ck_cond_mean(A_, ys_)
            z = jnp.zeros(())
            return pred, z, z, z, z

    if args.phase_split:
        if args.batch > 1 or args.mean_only or use_chunked:
            raise SystemExit(
                "--phase_split requires batch=1, no --mean_only/"
                "--sqrt_prefactor chunked (host-orchestrated full posterior)"
            )

        ps_asm = jax.jit(lambda c: obs(c, geom=geom_dev, structure=obs_st))

        def _ps_cond(pr, pt, A, ys):
            post = condition_on_observations(
                pr, A, Q_eps, ys, solver_blueprint=bp, pattern=pt
            )
            inner = post.inner_gmrf if hasattr(post, "inner_gmrf") else post
            # factor is a pytree: H_op children alias the jit INPUTS
            # (zero-copy pass-through), so the only fresh output buffer is
            # the packed R itself
            return inner.factor, inner.mu, post.mean(), inner.factor.log_det()

        def _ps_std_smp_full(pr, stdf, smpf):
            if hasattr(pr, "affine"):
                var_full = jnp.asarray(pr.affine.s_coef) ** 2 * (
                    (stdf**2)[..., pr.affine.s_col]
                )
                return jnp.sqrt(var_full), pr.affine.free_to_full(smpf)
            return stdf, smpf

        ps_cond = jax.jit(_ps_cond)
        # E threaded as a jit ARGUMENT (RowOp pytree), not a closure
        # constant: the r3d darcy_N300_nll arm OOM'd at trace time when
        # the captured eval operator re-materialized as an MLIR constant
        # (device->host fetch under exhausted HBM, VERDICT r3 weak #4)
        E_dev = jax.device_put(E)
        ps_eval = jax.jit(lambda Eop, mu: Eop.matvec(mu))
        ps_std = jax.jit(lambda factor: jnp.sqrt(factor.variance_diag()))
        ps_smp = jax.jit(
            lambda factor, mu_free, k: mu_free[None, :]
            + factor.sample_zero_mean(k, 1)
        )
        ps_full = jax.jit(_ps_std_smp_full)
        if args.nll:
            # NLL with SEQUENTIAL factor residency: the posterior factor is
            # freed before the solution-interpolation factor is built (two
            # 5.3 GiB factors cannot be co-resident at N300), and sqmahal
            # applies H in operator form (no factor needed).
            n_free_stat = int(inner_prior.precision.n)

            def _ps_cond_E(pr, Eop, ptE, soln_flat):
                xE = condition_on_observations(
                    pr, Eop, 1e12, soln_flat, solver_blueprint=bp,
                    pattern=ptE,
                )
                inner = xE.inner_gmrf if hasattr(xE, "inner_gmrf") else xE
                return inner.mu

            def _ps_sqm(pr, pt, A, muE_free, mu_free):
                from diffeqgmrfs_tpu.ops.refine import SymSumOp

                x = pr.inner_gmrf if hasattr(pr, "affine") else pr
                A_free = (
                    pr.affine.condense_rowop(A)
                    if hasattr(pr, "affine") else A
                )
                tau64 = jnp.asarray(Q_eps, dtype=x.precision64.vals.dtype)
                H_op = SymSumOp(
                    x.precision64, A_free, tau64, diag_Q=x.diag64,
                    a_plan=pt if hasattr(pt, "t_rows") else None,
                )
                d = muE_free - mu_free
                return jnp.dot(d, H_op.matvec(d))

            ps_cond_E = jax.jit(_ps_cond_E)
            ps_sqm = jax.jit(_ps_sqm)

        def solve_jit(coeff, key, soln_flat):  # noqa: F811
            A_, ys_ = ps_asm(coeff)
            factor, mu_free, mu_full, ld = ps_cond(prior_dev, pat, A_, ys_)
            pred = ps_eval(E_dev, mu_full).reshape(ny, nx)
            std_free = ps_std(factor)
            smp_free = ps_smp(factor, mu_free, key)
            std_full, smp_full = ps_full(prior_dev, std_free, smp_free)
            if args.nll:
                del factor  # free the posterior factor before the E factor
                pat_E_dev = pat_E.to_device()
                muE_free = ps_cond_E(prior_dev, E_dev, pat_E_dev, soln_flat)
                jax.block_until_ready(muE_free)
                del pat_E_dev  # freed before the next instance's factor
                sqm = ps_sqm(prior_dev, pat, A_, muE_free, mu_free)
                nll = 0.5 * (
                    n_free_stat * jnp.log(2 * jnp.pi) + sqm - ld
                )
            else:
                sqm = nll = jnp.zeros(())
            return pred, std_full, smp_full, sqm, nll

    def _solve_batch(vsolve, prior_arg, pattern, pattern_E, coeffs, keys, solns):
        return vsolve(prior_arg, pattern, pattern_E, geom_dev, obs_st, coeffs, keys, solns)

    # warm-up compile (reference "Trigger precompilation")
    key = jax.random.PRNGKey(523802340)
    soln0, coeff0 = (jnp.asarray(v) for v in ds.get_problem(0))

    if args.phase_probe and use_chunked:
        # chunked-prefactor probe: assembly program + host-orchestrated
        # conditioning (stage A + chunked QR dispatches + refined mean)
        f_asm = jax.jit(
            lambda c: obs(c, geom=geom_dev, structure=obs_st)
        )
        for it in range(3):
            cur = PhaseTimers()
            with cur("assembly"):
                A_, ys_ = f_asm(coeff0)
                cur.sync(A_.vals)
            with cur("cond+mean"):
                mu_ = _ck_cond_mean(A_, ys_)
                cur.sync(mu_)
            d = {k: round(v / 1e9, 2) for k, v in cur.as_dict().items()}
            log.info("phase_probe pass %d: %s", it, d)
            mu_ = None  # noqa: F841
        return

    if args.phase_probe:
        # phase-split instance timing: separate jits per phase (assembly /
        # conditioning factor+mean / evaluation), 2 warm passes then timed.
        # The factor NEVER leaves a program as an output: with the SRIF
        # prefactor resident (4.98 GiB at N300) a factor-output copy of
        # the conditioning program (another 4.98 GiB on top of the
        # internal loop carry) is what pushed queue J's probes past the
        # 15.75 GiB HBM budget (RESOURCE_EXHAUSTED). Extra-rhs resolve
        # cost is measured as the delta of a fused cond+mean+resolve
        # program instead.
        f_asm = jax.jit(
            lambda c: obs(c, geom=geom_dev, structure=obs_st)
        )

        def _post(pr, pt, A, ys):
            return condition_on_observations(
                pr, A, Q_eps, ys, solver_blueprint=bp, pattern=pt
            )

        def _cond(pr, pt, A, ys):
            return _post(pr, pt, A, ys).mean()

        def _cond_resolve(pr, pt, A, ys):
            post = _post(pr, pt, A, ys)
            inner = post.inner_gmrf if hasattr(post, "inner_gmrf") else post
            mu = post.mean()
            x = inner.factor.solve(jnp.ones((inner.n,), dtype=mu.dtype))
            return mu, x

        f_cond = jax.jit(_cond)
        f_cond_resolve = jax.jit(_cond_resolve)
        f_eval = jax.jit(lambda mu: E.matvec(mu))

        for it in range(3):
            cur = PhaseTimers()
            with cur("assembly"):
                A_, ys_ = f_asm(coeff0)
                cur.sync(A_.vals)
            with cur("cond+mean"):
                mu_ = f_cond(prior_dev, pat, A_, ys_)
                cur.sync(mu_)
            with cur("cond+mean+resolve"):
                mu2_, x_ = f_cond_resolve(prior_dev, pat, A_, ys_)
                cur.sync(x_)
            with cur("eval"):
                pr_ = f_eval(mu_)
                cur.sync(pr_)
            d = {k: round(v / 1e9, 2) for k, v in cur.as_dict().items()}
            d["resolve(delta)"] = round(
                d["cond+mean+resolve"] - d["cond+mean"], 2
            )
            log.info("phase_probe pass %d: %s", it, d)
            mu_ = mu2_ = x_ = pr_ = None  # noqa: F841
        return
    with to("Conditioning + Node reordering"):
        out = solve_jit(coeff0, key, soln0.reshape(-1))
        to.sync(out[0])
    if nll_split:
        # compile program B on the warmup instance too (A's factor is
        # dead after the sync above)
        with to("NLL compile"):
            sqm0 = solve_b_jit(coeff0, soln0.reshape(-1), out[3])
            to.sync(sqm0)
    mat_nnz = prior.precision_map().nnz() if hasattr(prior, "precision_map") else 0

    N = min(3, len(ds)) if args.dry_run else len(ds)
    throughput = None
    rel_errs, rmses, max_errs, std_norms = [], [], [], []
    sqmahals, nlls = [], []
    cond_times = []
    if args.batch > 1:
        # DP: vmap the whole posterior pipeline over instance batches — the
        # chip-saturation axis (SURVEY.md §2.4); replaces the serial loop.
        import time as _time

        sweep_t0 = None
        n_done_at_t0 = 0
        vsolve = jax.jit(
            jax.vmap(solve_instance, in_axes=(None, None, None, None, None, 0, 0, 0))
        )
        for start in range(0, N, args.batch):
            idxs = list(range(start, min(start + args.batch, N)))
            pad = args.batch - len(idxs)
            coeffs = jnp.asarray(
                np.stack([ds.get_problem(i)[1] for i in idxs]
                         + [ds.get_problem(idxs[-1])[1]] * pad)
            )
            keys = jax.random.split(jax.random.fold_in(key, start), args.batch)
            solns = jnp.asarray(
                np.stack([np.asarray(ds.get_problem(i)[0]).reshape(-1) for i in idxs]
                         + [np.asarray(ds.get_problem(idxs[-1])[0]).reshape(-1)] * pad)
            )
            cur = PhaseTimers()
            with cur("Conditioning"):
                pred, std, smp, sqm, nll = _solve_batch(
                    vsolve, prior_dev, pat, pat_E, coeffs, keys, solns
                )
                cur.sync(pred)
            for j, i in enumerate(idxs):
                soln = jnp.asarray(ds.get_problem(i)[0])
                rel_errs.append(float(rel_err(pred[j], soln)))
                rmses.append(float(rmse(pred[j], soln)))
                max_errs.append(float(max_err(pred[j], soln)))
                std_norms.append(float(jnp.linalg.norm(
                    jnp.where(jnp.isfinite(std[j]), std[j], 0.0)
                )))
                if args.nll:
                    sqmahals.append(float(sqm[j]))
                    nlls.append(float(nll[j]))
                log.info("instance %d: rel_err=%.3e", i, rel_errs[-1])
            cond_times.append(cur.time("Conditioning"))
            if sweep_t0 is None:
                # first batch includes the vmapped compile; time from here
                sweep_t0 = _time.perf_counter()
                n_done_at_t0 = idxs[-1] + 1
        if sweep_t0 is not None and N > n_done_at_t0:
            dt = _time.perf_counter() - sweep_t0
            thr = (N - n_done_at_t0) / dt if dt > 0 else 0.0
            log.info("throughput (post-compile): %.2f instances/s", thr)
            throughput = thr
    else:
        # mid-sweep checkpointing: restarts after an infrastructure fault
        # resume at the first unrecorded instance
        from diffeqgmrfs_tpu.utils.results import IncrementalSaver

        saver = IncrementalSaver(
            os.path.join(datadir("sims", "darcy", "gmrf-fem"), savename(params))
        )
        for i in range(N):
            if saver.has(i):
                row = saver.get(i)
            else:
                soln, coeff = ds.get_problem(i)
                cur = PhaseTimers()
                with cur("Conditioning"):
                    pred, std, smp, sqm, nll = solve_jit(
                        jnp.asarray(coeff), jax.random.fold_in(key, i),
                        jnp.asarray(np.asarray(soln).reshape(-1)),
                    )
                    cur.sync(pred, std, smp)
                if nll_split:
                    # program A is complete (sync above) -> its factor
                    # buffers are dead; program B may now build the
                    # 1e12-precision E factor
                    mu_free, logdet = sqm, nll
                    with cur("NLL"):
                        sqm = solve_b_jit(
                            jnp.asarray(coeff),
                            jnp.asarray(np.asarray(soln).reshape(-1)),
                            mu_free,
                        )
                        cur.sync(sqm)
                    nll = 0.5 * (
                        n_free_nll * np.log(2 * np.pi)
                        + float(sqm) - float(logdet)
                    )
                row = saver.record(
                    i,
                    rel_err=float(rel_err(pred, jnp.asarray(soln))),
                    rmse=float(rmse(pred, jnp.asarray(soln))),
                    max_err=float(max_err(pred, jnp.asarray(soln))),
                    # norm over finite entries + honesty count (see the
                    # Burgers sweep driver / SRIFNewtonFactor rescue)
                    std_norm=float(jnp.linalg.norm(
                        jnp.where(jnp.isfinite(std), std, 0.0)
                    )),
                    n_std_nonfinite=int(jnp.sum(~jnp.isfinite(std))),
                    sqmahal=float(sqm) if args.nll else None,
                    nll=float(nll) if args.nll else None,
                    cond_time=cur.time("Conditioning"),
                )
            rel_errs.append(row["rel_err"])
            rmses.append(row["rmse"])
            max_errs.append(row["max_err"])
            std_norms.append(row["std_norm"])
            if args.nll:
                sqmahals.append(row["sqmahal"])
                nlls.append(row["nll"])
            cond_times.append(row["cond_time"])
            log.info("instance %d: rel_err=%.3e", i, rel_errs[-1])
            if (i + 1) % 10 == 0:
                log.info("Finished %d / %d", i + 1, N)

    out = dict(
        throughput_inst_per_s=throughput,
        rel_errs=rel_errs,
        rmses=rmses,
        max_errs=max_errs,
        std_norms=std_norms,
        sqmahals=sqmahals,
        nlls=nlls,
        conditioning_times=cond_times,
        mat_nnz=mat_nnz,
        timers=to.as_dict(),
        **params,
    )
    path = tagsave(
        os.path.join(datadir("sims", "darcy", "gmrf-fem"), savename(params)), out
    )
    if args.batch <= 1:
        saver.finalize()
    log.info("mean rel_err = %.4e", float(np.mean(rel_errs)))
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
