"""Chen24 Burgers benchmark: 1D Burgers vs Cole-Hopf analytic solution.

TPU-native analog of `/root/reference/_research/burgers_chen24.jl`:
u_t + u u_x = nu u_xx on (-1,1), u(x,0) = -sin(pi x), u(+-1,t)=0, nu=0.001,
T=1, dt=0.02 (51 steps). Crank-Nicolson FEM residual, advection-diffusion ST
prior, IC precision 1e12, FEM precision 1e18, Newton cap 30; errors at the
final time slice vs the Gauss-Hermite Cole-Hopf quadrature solution.

Usage:
  python experiments/chen24/burgers_chen24.py --N_x 200 --el_order 2
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

NU = 0.001
T_END = 1.0


def cole_hopf_solution(x, t, nu, n_quad=100):
    """Cole-Hopf solution via Gauss-Hermite quadrature
    (`burgers_chen24.jl:68-74`), vectorized over x."""
    gh_x, gh_w = np.polynomial.hermite.hermgauss(n_quad)
    x = np.asarray(x, dtype=np.float64)[:, None]
    temp = x - np.sqrt(4 * nu * t) * gh_x[None, :]
    arg = -np.cos(np.pi * temp) / (2 * np.pi * nu)
    arg = arg - arg.max(axis=1, keepdims=True)  # stabilized exp
    e = gh_w[None, :] * np.exp(arg)
    val1 = np.sum(e * np.sin(np.pi * temp), axis=1)
    val2 = np.sum(e, axis=1)
    return -val1 / val2


def parse_cmd():
    p = base_parser("Chen24 Burgers benchmark")
    p.add_argument("--N_x", type=int, default=200)
    p.add_argument("--el_order", type=int, default=2)
    p.add_argument("--mixed_precision", action="store_true",
                   help="f32 MXU factorization + f64 refinement (TPU path)")
    p.add_argument("--noise_ic", type=float, default=1e12)
    p.add_argument("--noise_fem", type=float, default=1e18)
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--pad_block", type=int, default=None,
                   help="pad spatial block to a multiple (e.g. 128 for MXU tiles)")
    p.add_argument("--sqrt", action="store_true",
                   help="ST-SRIF square-root Gauss-Newton (f32 windowed QR "
                        "of the stacked sqrt system; no f64 BTD anywhere — "
                        "smallest-memory TPU path and a structurally "
                        "different program from the chol/scatter one that "
                        "faults the relay at N_x=1000)")
    p.add_argument("--srif_qr_impl", type=str, default="xla",
                   help="SRIF window-QR engine: xla | bhh | bhh1 | bcgs2 "
                        "| bcgs (see solve_darcy_gmrf_fem.py)")
    p.add_argument("--srif_solve", type=str, default="refine",
                   choices=("refine", "pcg"),
                   help="SRIF direction solve: Richardson refinement or "
                        "preconditioned CG (factors beyond f32 validity)")
    p.add_argument("--srif_pcg_iters", type=int, default=32)
    p.add_argument("--stall_band", type=float, default=1.10,
                   help="stepwise decrement-stall detection: stop when the "
                        "last stall_patience+1 decrements all lie within a "
                        "max/min ratio of stall_band. The f32 direction "
                        "floor is characteristically FLAT (queue r2-r4 "
                        "logs: decrement pinned at 1.50-1.51e-5 from step "
                        "~10 with the iterate — and final err to 5 digits "
                        "— frozen, so the remaining 20 capped steps buy "
                        "nothing; VERDICT r4 weak #3), while productive GN "
                        "phases move the decrement by 2-20x per step, so a "
                        "tight band does not misfire early")
    p.add_argument("--stall_patience", type=int, default=3,
                   help="window length minus 1 for the stall band "
                        "(0 disables stall detection)")
    p.add_argument("--warm_start", action="store_true",
                   help="start the stepwise GN from a deterministic "
                        "implicit-Euler FEM march of the ANALYTIC IC "
                        "(-sin(pi x) evaluated at the P2 dof nodes) "
                        "instead of the IC-conditioned prior mean — the "
                        "sweep driver's BurgersForwardMarch warm start "
                        "cut GN steps ~40% (RESULTS.md round 2); the "
                        "march runs on-device (one small dense LU per "
                        "time step)")
    p.add_argument("--probe_phases", action="store_true",
                   help="instead of the solve: slope-time the stepwise GN "
                        "phases (assembly, window QR, direction solve, "
                        "full step) at this config and exit")
    p.add_argument("--stepwise", action="store_true",
                   help="per-step dispatch: each Newton step is its own "
                        "jitted XLA program (compiled once, invoked in a "
                        "host loop) instead of one fused while_loop — the "
                        "workaround probe for the relay kernel fault at "
                        "flagship sizes (requires --sqrt)")
    return finalize_args(p.parse_args())


def _make_phase_probe(jax, jnp, log, res, affine, aux_dev, mu_dev,
                      q_shape, bp_gn, args, step_f):
    """Per-phase slope probe of the stepwise GN step (VERDICT r4 weak #3:
    the 3.4 s/step cost at N_x=1000 was never decomposed). Times, each as
    its own jitted program on the live backend: CN assembly+condense, the
    SRIF window QR (factor construction), QR+direction solve, and the
    full production step. Logs a breakdown and exits."""
    import time as _time

    from diffeqgmrfs_tpu.ops.refine import SRIFNewtonFactor

    n, N, bs = q_shape.n, q_shape.N, q_shape.bs
    tau = jnp.asarray(args.noise_fem, jnp.float32)

    def asm(x, aux):
        f, J = res.f_and_J(affine.free_to_full(x))
        return f, affine.condense_rowop(J)

    def mk_factor(Jc, aux):
        return SRIFNewtonFactor(
            aux["q_ell"], aux["q_diag"], aux["sqrt_ops"],
            aux["ata_window_plan"], Jc, tau, n, N, bs,
            qr_impl=bp_gn.srif_qr_impl,
            prior_R=aux.get("srif_prior_R"),
            prior_cs0=aux.get("srif_prior_cs0"),
            solve_method=bp_gn.srif_solve,
            pcg_iters=bp_gn.srif_pcg_iters,
        )

    asm_full = jax.jit(asm)
    f0, Jc0 = asm_full(mu_dev, aux_dev)
    rhs0 = jax.jit(lambda aux, m: aux["q_ell"].matvec(m))(aux_dev, mu_dev)

    def asm_out(x, aux):
        f, Jc = asm(x, aux)
        return jnp.sum(f) + jnp.sum(Jc.vals)

    def qr_out(Jc, aux):
        F = mk_factor(Jc, aux)
        return sum(
            jnp.sum(jnp.abs(leaf))
            for leaf in jax.tree_util.tree_leaves(F.F32)
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        )

    def solve_out(Jc, aux, rhs):
        F = mk_factor(Jc, aux)
        return jnp.sum(F.solve(rhs))

    def mvh_out(Jc, aux, v):
        F = mk_factor(Jc, aux)
        return jnp.sum(F.matvec_H(v))

    probes = [
        ("assembly+condense", jax.jit(asm_out), (mu_dev, aux_dev)),
        ("window QR (factor)", jax.jit(qr_out), (Jc0, aux_dev)),
        ("QR + solve", jax.jit(solve_out), (Jc0, aux_dev, rhs0)),
        ("QR + matvec_H", jax.jit(mvh_out), (Jc0, aux_dev, rhs0)),
        ("full step", None, None),
    ]

    def run_probe():
        times = {}
        for name, fn, fa in probes:
            if fn is None:
                t0 = _time.perf_counter()
                x1, dec = step_f(mu_dev, mu_dev, aux_dev)
                float(dec)
                log.info("  [%s] compile+first: %.2fs",
                         name, _time.perf_counter() - t0)
                reps = []
                for _ in range(3):
                    t0 = _time.perf_counter()
                    x1, dec = step_f(mu_dev, mu_dev, aux_dev)
                    float(dec)
                    reps.append(_time.perf_counter() - t0)
            else:
                t0 = _time.perf_counter()
                float(fn(*fa))
                log.info("  [%s] compile+first: %.2fs",
                         name, _time.perf_counter() - t0)
                reps = []
                for _ in range(3):
                    t0 = _time.perf_counter()
                    float(fn(*fa))
                    reps.append(_time.perf_counter() - t0)
            times[name] = min(reps)
            log.info("  [%s] %.3f s (min of 3)", name, times[name])
        qr = times["window QR (factor)"]
        log.info("phase breakdown: assembly %.3f | QR %.3f | solve-only "
                 "%.3f | matvec_H-only %.3f | full step %.3f (sum of "
                 "parts %.3f)",
                 times["assembly+condense"], qr,
                 times["QR + solve"] - qr, times["QR + matvec_H"] - qr,
                 times["full step"],
                 times["assembly+condense"] + times["QR + solve"] - qr
                 + times["QR + matvec_H"] - qr + qr)
        raise SystemExit(0)

    return run_probe


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import (
        interval_discretization,
        evaluation_matrix,
        spatial_to_spatiotemporal,
    )
    from diffeqgmrfs_tpu.models import (
        MaternSPDE,
        AdvectionDiffusionSPDE,
        discretize_advection_diffusion,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.problems import BurgersFEMResidual
    from diffeqgmrfs_tpu.solvers import (
        gauss_newton_solve,
        NewtonDecrementCriterion,
        StepNumberCriterion,
        OrCriterion,
    )
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    params = dict(N_x=args.N_x, el_order=args.el_order)
    log.info("params: %s", params)
    to = PhaseTimers()

    h = 0.001  # evaluation grid (`burgers_chen24.jl:56,61-66`)
    X_domain = np.arange(-1 + h, 1 - h / 2, h)
    ts = np.arange(0.0, T_END + args.dt / 2, args.dt)
    N_t = len(ts)

    def build():
        return _build_setup_on_cpu()

    def _build_setup_on_cpu():
        # the ENTIRE eager setup phase (prior construction, IC
        # conditioning, structure-only Jacobian) runs on the host CPU
        # backend: eager chains on the relay keep several multi-GB f64 BTD
        # intermediates alive simultaneously (no cross-op liveness
        # analysis) and OOM the TPU at N_x=1000 before the solve even
        # compiles. Only (mu, Q, pattern) ship to the TPU.
        cpu0 = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu0):
            return _build_inner()

    def _build_inner():
        disc = interval_discretization(
            -1.0, 1.0, args.N_x, element_order=args.el_order, dirichlet=True
        )
        ic = -np.sin(np.pi * X_domain)
        bulk = float(np.mean(ic))
        desired_range = np.sqrt(1 / args.N_x)
        c = 1.0 / NU
        spde = AdvectionDiffusionSPDE(
            d=1, kappa=0.0, alpha=1,
            gamma=jnp.asarray([-c * bulk]),
            c=c, tau=0.1 * np.sqrt(c),
            initial_spde=MaternSPDE(d=1, range=desired_range, smoothness=2),
            spatial_spde=MaternSPDE(d=1, range=desired_range, smoothness=1),
        )
        u_prior = discretize_advection_diffusion(
            spde, disc, ts, mean_offset=bulk, pad_block=args.pad_block
        )
        A_ic = spatial_to_spatiotemporal(
            evaluation_matrix(disc, X_domain), 0, N_t
        )
        from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint
        from diffeqgmrfs_tpu.gmrf.conditioning import ata_pattern_cached

        bp = CholeskySolverBlueprint(mixed_precision=args.mixed_precision)
        u_ic = condition_on_observations(
            u_prior, A_ic, args.noise_ic, jnp.asarray(ic), solver_blueprint=bp
        )
        res = BurgersFEMResidual(disc, ts, NU, scheme="crank_nicolson")
        A_eval = spatial_to_spatiotemporal(
            evaluation_matrix(disc, X_domain), N_t - 1, N_t
        )
        affine = u_ic.affine
        # IC mean + precision flow through the jit signature (not closure
        # constants), with the cached factor stripped; the GN scatter
        # pattern is prebuilt host-side (see BTDPattern docstring)
        mu_ic = u_ic.inner_gmrf.mean()
        Q_ic = u_ic.inner_gmrf.precision
        # release the eager-phase buffers (prior precision, IC factor —
        # several GB at N_x=1000) before the Gauss-Newton program runs
        u_ic.inner_gmrf.factor = None
        del u_prior
        import gc

        gc.collect()
        # structure-only evaluation: run on the host CPU backend (the
        # eager TPU path is slow and fault-prone through the relay)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            _, J0 = res.f_and_J(jnp.zeros(N_t * disc.ndofs))
            Jc0 = affine.condense_rowop(J0)
        gn_pat = ata_pattern_cached(Jc0, Q_ic.n, Q_ic.bs)
        # prior precision in compact ELL/COO form: the f64 BTD never
        # reaches the TPU (x64 pair emulation + while-loop copies pushed
        # the N_x=1000 GN body to 31.5 GB; the ELL path runs in a few GB)
        from diffeqgmrfs_tpu.fem.operators import RowOp
        from diffeqgmrfs_tpu.ops.btd import make_btd_pattern
        from diffeqgmrfs_tpu.ops.packed import ShapeOnly
        import numpy as np_

        if not (args.mixed_precision or args.sqrt):
            # f64 reference path keeps the BTD (host/CPU runs)
            tpu0 = jax.devices()[0]
            gn_pat = jax.device_put(gn_pat, tpu0)
            mu_dev, Q_dev = jax.device_put((mu_ic, Q_ic), tpu0)

            def solve_f64(mu_arg, Q_arg, pattern):
                result = gauss_newton_solve(
                    mu_arg, Q_arg, res.f_and_J, args.noise_fem,
                    jnp.zeros(res.n_rows), mu_arg,
                    criterion=OrCriterion(
                        [NewtonDecrementCriterion(1e-5), StepNumberCriterion(30)]
                    ),
                    affine=affine, ata_pattern=pattern, materialize_H=False,
                )
                x_full = affine.free_to_full(result.x_k)
                return A_eval.matvec(x_full), result.n_steps

            f64_fn = jax.jit(solve_f64)
            return lambda: f64_fn(mu_dev, Q_dev, gn_pat)

        if args.sqrt:
            # ST-SRIF: no f64 BTD anywhere. The refinement operator is the
            # 4-distinct-block Toeplitz form of the IC-conditioned prior
            # (~4 bs^2 f64 instead of N_t bs^2); the factor is the f32
            # windowed-QR R (P + U flat slots). gamma is static here (one
            # instance), so the sqrt operands are fully host-precomputed.
            from diffeqgmrfs_tpu.models.advection_diffusion import st_sqrt_ops
            from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan
            from diffeqgmrfs_tpu.ops.srif import rowop_window_plan
            from diffeqgmrfs_tpu.ops.btd import ToeplitzBTD
            from diffeqgmrfs_tpu.solvers import (
                gauss_newton,
                GNCholeskySolverBlueprint,
            )

            st_ops = st_sqrt_ops(spde, disc, ts, pad_block=args.pad_block)
            A_ic_c = affine.condense_rowop(A_ic)
            ic_plan = rowop_window_plan(A_ic_c, Q_ic.n, Q_ic.bs)
            sqrt_ops = st_ops.sqrt_ops(float(np.asarray(spde.gamma)[0])) + [
                (ic_plan, A_ic_c.vals * np.sqrt(args.noise_ic))
            ]
            j_plan = make_ata_window_plan(
                np_.asarray(Jc0.cols), Q_ic.n, Q_ic.bs
            )
            q_top = ToeplitzBTD.from_btd(Q_ic)
            del Q_ic, u_ic
            gc.collect()
            tpu0 = jax.devices()[0]
            aux_dev = jax.device_put(
                dict(
                    sqrt_ops=sqrt_ops,
                    ata_window_plan=j_plan,
                    q_ell=q_top,
                    q_diag=q_top.diagonal(),
                ),
                tpu0,
            )
            mu_dev = jax.device_put(mu_ic, tpu0)
            q_shape = ShapeOnly(q_top.n, q_top.N, q_top.bs)
            bp_gn = GNCholeskySolverBlueprint(
                sqrt_factor=True, srif_qr_impl=args.srif_qr_impl,
                srif_solve=args.srif_solve,
                srif_pcg_iters=args.srif_pcg_iters,
            )

            # stage-1 SRIF prefactor: pre-reduce the (step-invariant) prior
            # rows ONCE; every Newton-step program then QRs only
            # [R_Q·rescale; sqrt(tau) J] (ops/srif.py prior_factor). For
            # the stepwise variant this removes the prior QR from EVERY
            # per-step program (operands ride the jit signature — the
            # relay rejects big HLO literals).
            from diffeqgmrfs_tpu.ops.srif import srif_packed_qr

            cs0 = (1.0 / jnp.sqrt(aux_dev["q_diag"])).astype(jnp.float32)
            pre_R = jax.jit(
                lambda ops, c: srif_packed_qr(
                    ops, q_top.n, q_top.N, q_top.bs, dtype=jnp.float32,
                    col_scale=c, chunk_rows="auto",
                )
            )(aux_dev["sqrt_ops"], cs0)
            aux_dev = dict(
                aux_dev, srif_prior_R=pre_R, srif_prior_cs0=cs0
            )

            warm_f = None
            if args.warm_start:
                from diffeqgmrfs_tpu.problems.burgers import (
                    BurgersForwardMarch,
                )

                march = BurgersForwardMarch(disc, ts, NU)
                node_x = np.asarray(disc.mesh.coords).reshape(-1)
                u0_host = jnp.asarray(
                    (-np.sin(np.pi * node_x)).astype(np.float32)
                )

                def _warm(u0):
                    W = march.trajectory(u0)
                    return affine.restrict(W.reshape(-1))

                warm_f = jax.jit(_warm)

            if args.stepwise:
                # per-step dispatch: ONE jitted program per Newton step
                # (identical structure -> compiled once), convergence test
                # on the host. No while_loop wraps the factorization.
                def gn_step(mu_arg, x_cur, aux):
                    aux = dict(aux, final_factor=False)
                    result = gauss_newton(
                        mu_arg,
                        q_shape,
                        res.f_and_J,
                        args.noise_fem,
                        jnp.zeros(res.n_rows),
                        x_cur,
                        blueprint=bp_gn,
                        aux=aux,
                        criterion=StepNumberCriterion(1),
                        affine=affine,
                    )
                    return result.x_k, result.newton_decrement

                step_f = jax.jit(gn_step)
                eval_f = jax.jit(
                    lambda x: A_eval.matvec(affine.free_to_full(x))
                )

                def run_stepwise():
                    x = (
                        warm_f(u0_host).astype(mu_dev.dtype)
                        if warm_f is not None else mu_dev
                    )
                    n_steps = 0
                    window = []
                    for it in range(30):
                        x, dec = step_f(mu_dev, x, aux_dev)
                        n_steps += 1
                        d = float(dec)  # host readback forces completion
                        log.info("  stepwise GN %d: decrement %.3e", it, d)
                        if d < 1e-5:
                            break
                        if args.stall_patience > 0:
                            window.append(d)
                            if len(window) > args.stall_patience + 1:
                                window.pop(0)
                            if (
                                len(window) == args.stall_patience + 1
                                and max(window) <= args.stall_band * min(window)
                            ):
                                log.info(
                                    "  decrement flat at %.3e over last %d "
                                    "steps (f32 direction floor); stopping",
                                    d, len(window),
                                )
                                break
                    return eval_f(x), jnp.asarray(n_steps)

                if args.probe_phases:
                    return _make_phase_probe(
                        jax, jnp, log, res, affine, aux_dev, mu_dev,
                        q_shape, bp_gn, args, step_f,
                    )

                return run_stepwise

            def solve_sqrt(mu_arg, aux):
                # only the final time slice is evaluated -> skip the
                # final-iterate factor (config flag, not traced data)
                aux = dict(aux, final_factor=False)
                result = gauss_newton(
                    mu_arg,
                    q_shape,
                    res.f_and_J,
                    args.noise_fem,
                    jnp.zeros(res.n_rows),
                    mu_arg,
                    blueprint=bp_gn,
                    aux=aux,
                    criterion=OrCriterion(
                        [NewtonDecrementCriterion(1e-5), StepNumberCriterion(30)]
                    ),
                    affine=affine,
                )
                x_full = affine.free_to_full(result.x_k)
                return A_eval.matvec(x_full), result.n_steps

            f_sq = jax.jit(solve_sqrt)
            return lambda: f_sq(mu_dev, aux_dev)

        Q_csr = Q_ic.to_csr_host()
        q_ell = RowOp.from_csr(Q_csr, dtype=jnp.float64)
        q_diag = jnp.asarray(Q_csr.diagonal())
        coo = Q_csr.tocoo()
        q_pattern = make_btd_pattern(coo.row, coo.col, Q_ic.n, bs=Q_ic.bs)
        q_coo = (
            jnp.asarray(coo.row.astype(np_.int32)),
            jnp.asarray(coo.col.astype(np_.int32)),
            jnp.asarray(coo.data),
        )
        q_shape = ShapeOnly(Q_ic.n, Q_ic.N, Q_ic.bs)
        del Q_ic, u_ic
        gc.collect()
        tpu0 = jax.devices()[0]
        gn_pat, q_pattern = jax.device_put((gn_pat, q_pattern), tpu0)
        mu_dev, q_ell, q_diag, q_coo = jax.device_put(
            (mu_ic, q_ell, q_diag, q_coo), tpu0
        )

        def solve(mu_arg, pattern, q_ell_a, q_diag_a, q_pattern_a, q_coo_a):
            result = gauss_newton_solve(
                mu_arg,
                q_shape,
                res.f_and_J,
                args.noise_fem,
                jnp.zeros(res.n_rows),
                mu_arg,
                criterion=OrCriterion(
                    [NewtonDecrementCriterion(1e-5), StepNumberCriterion(30)]
                ),
                affine=affine,
                mixed_precision=args.mixed_precision,
                ata_pattern=pattern,
                materialize_H=False,  # only the MAP mean is evaluated
                q_ell=q_ell_a,
                q_diag=q_diag_a,
                q_pattern=q_pattern_a,
                q_coo=q_coo_a,
            )
            x_full = affine.free_to_full(result.x_k)
            return A_eval.matvec(x_full), result.n_steps

        f = jax.jit(solve)
        return lambda: f(mu_dev, gn_pat, q_ell, q_diag, q_pattern, q_coo)

    solve_jit = build()
    log.info("First solve (compile)...")
    sol1, n_steps = solve_jit()
    sol = np.asarray(sol1)  # full fetch forces true completion (relay)
    n_steps = int(n_steps)
    log.info("first run done (%d Newton steps); timed re-run...", n_steps)
    # re-executions of large GN programs on the relay sometimes hit a
    # generic "TPU device error" kernel fault; the first run's result is
    # already in hand, so a timing-rerun fault is reported, not fatal
    try:
        with to("Solve time"):
            sol2, n_steps2 = solve_jit()
            to.sync(sol2)
        sol = np.asarray(sol2)
        n_steps = int(n_steps2)
    except Exception as e:  # pragma: no cover - relay flakiness
        log.warning("timed re-run failed (%s); keeping first-run result",
                    str(e)[:140].replace("\n", " "))
    truth = cole_hopf_solution(X_domain, T_END, NU)

    err = sol - truth
    out = dict(
        err_L2=float(np.sqrt(np.sum(err**2) / len(truth))),
        err_MAE=float(np.max(np.abs(err))),
        err_rel=float(np.linalg.norm(err) / np.linalg.norm(sol)),
        n_newton_steps=int(n_steps),
        solve_time_ns=to.time("Solve time"),
        timers=to.as_dict(),
        **params,
    )
    log.info("err_L2=%.4e err_MAE=%.4e err_rel=%.4e, %d Newton steps (%.2f s)",
             out["err_L2"], out["err_MAE"], out["err_rel"],
             int(n_steps), out["solve_time_ns"] / 1e9)
    path = tagsave(
        os.path.join(datadir("sims", "burgers-chen"), savename(params)), out
    )
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
