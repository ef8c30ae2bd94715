"""Darcy GMRF posterior via multifrontal sqrt-QR (ops/mf_qr) — the
1e6-dof north-star driver (BASELINE.md: posterior mean + marginal std at
1e6 DOF, <1 s target on one chip).

Same math as `solve_darcy_gmrf_fem.py`'s SRIF path (Matérn-2 prior,
per-instance Darcy FEM observation rows at precision 1e8,
`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:92-98,163`), but
the stacked [Λ; sqrt(tau) A] system is factored by nested-dissection
multifrontal QR instead of the banded window sweep:

  * O(n^1.5)-class flops (vs O(n bw^2), bw ~ 6 sqrt(n)) concentrated in
    MXU-sized separator fronts,
  * O(n log n) factor storage (vs O(n bw) — the packed banded factor
    alone is ~16 GB at 1e6 dofs, past the v5e's HBM).

Posterior std comes from the factor's one-shot batched Monte-Carlo
backsolve (the sample leg of the reference's RBMCStrategy(50),
`solve_darcy_gmrf-fem.jl:100,192`).

Usage (1e6-dof arm: N_xy=500 -> 1001^2 ~ 1e6 dofs):
  python experiments/darcy/solve_darcy_mfqr.py --N_xy 500 --N_instances 1
  python experiments/darcy/solve_darcy_mfqr.py --N_xy 120 --check_banded
"""

import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from diffeqgmrfs_tpu.utils.experiment import (  # noqa: E402
    base_parser,
    finalize_args,
    select_backend,
    setup_logging,
)
from diffeqgmrfs_tpu.utils.results import (  # noqa: E402
    datadir,
    savename,
    tagsave,
)


def parse_cmd():
    p = base_parser("Darcy GMRF posterior via multifrontal sqrt-QR")
    p.add_argument("--N_xy", type=int, default=64)
    p.add_argument("--grid", type=int, default=241)
    p.add_argument("--N_instances", type=int, default=1)
    p.add_argument("--truth_N_xy", type=int, default=64,
                   help="synthetic truth fidelity (FEM mesh of the "
                        "dataset generator)")
    p.add_argument("--tau", type=float, default=1e8,
                   help="observation precision (reference 1e8)")
    p.add_argument("--leaf_target", type=int, default=512)
    p.add_argument("--qr_impl", type=str, default="xla",
                   choices=("xla", "cholqr", "gram", "auto"),
                   help="level-QR engine: xla = batched jnp.linalg.qr "
                        "(0.38 TF/s measured composite at N300); gram = "
                        "all-GEMM staged CholeskyQR (round-4 engine, 9x "
                        "at N300 but INVALID at the top fronts' "
                        "condition); auto = gram below the top "
                        "--auto_top levels, xla at the top (production "
                        "hybrid); cholqr is an alias of gram")
    p.add_argument("--auto_top", type=int, default=3,
                   help="number of TOP tree levels kept on Householder "
                        "QR under --qr_impl auto")
    p.add_argument("--n_std", type=int, default=50,
                   help="MC samples for marginal std (reference RBMC 50)")
    p.add_argument("--std_impl", type=str, default="selinv",
                   choices=("mc", "selinv", "both", "none"),
                   help="marginal std: selinv = EXACT selected inversion "
                        "over the front tree (mfqr_variance_selected, "
                        "round 4 — no sampling noise); mc = 50-sample "
                        "batched backsolve (reference RBMCStrategy(50) "
                        "analog); both = selinv std + recorded median "
                        "relative deviation from the MC estimate; none = "
                        "skip the std phase entirely (mean-only sweep "
                        "throughput mode)")
    p.add_argument("--refine_iters", type=int, default=2,
                   help="f64 iterative-refinement steps for the mean")
    p.add_argument("--refine_host", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="compute the f64 refinement residuals on the "
                        "HOST (numpy) instead of a device h64 program: "
                        "removes the Q64/A64/transpose-ELL HBM "
                        "residency in the Mean phase — the site of the "
                        "N500 1e6-dof RESOURCE_EXHAUSTED (queue r5c: "
                        "factorization completed, post_mean OOMed at "
                        "the first h64 apply). The refinement operator "
                        "is memory-bound; host f64 costs ~1-2 s/apply "
                        "at 1e6 dofs vs ~GBs of HBM. auto = on above "
                        "5e5 free dofs")
    p.add_argument("--max_panel_mb", type=int, default=1024,
                   help="per-chunk panel budget for the chunked "
                        "factorization dispatch")
    p.add_argument("--host_solves", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="per-level dispatched solves (mfqr_solve_hosted) "
                        "instead of one fused solve program — the fused "
                        "program's compile explodes at big trees; auto = "
                        "on above 1e5 free dofs")
    p.add_argument("--offload_levels", type=int, default=-1,
                   help="stream the first k levels' fronts to host RAM "
                        "during factorization (solves re-upload per "
                        "level); -1 = auto (6 above 5e5 free dofs) — the "
                        "1e6-dof factor + transients exceed HBM otherwise "
                        "(mfqr_mem.py ledger)")
    p.add_argument("--fused", action="store_true",
                   help="single-program factorization (small N only; the "
                        "chunked per-level dispatch is the default — the "
                        "relay faults on very large fused programs)")
    p.add_argument("--check_banded", action="store_true",
                   help="cross-check mean against the dense solve of the "
                        "normal equations (small N only)")
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax
    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.datasets import DarcyDataset
    from diffeqgmrfs_tpu.fem import (
        evaluation_matrix,
        uniform_unit_square_discretization,
    )
    from diffeqgmrfs_tpu.gmrf.affine import AffineMap
    from diffeqgmrfs_tpu.metrics import max_err, rel_err, rmse
    from diffeqgmrfs_tpu.models import MaternSPDE
    from diffeqgmrfs_tpu.models.matern import matern_sqrt_host
    from diffeqgmrfs_tpu.ops.mf_qr import (
        MFQRFactor,
        mfqr_chunk_plans,
        mfqr_device_arrays,
        mfqr_factorize_chunked,
        symbolic_mf_qr,
    )
    from diffeqgmrfs_tpu.problems.darcy import DarcyFEMObservations
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers

    n_inst = 3 if args.dry_run else args.N_instances
    to = PhaseTimers()

    # ---- dataset (synthetic cache, same naming as the main driver) ----
    ds = DarcyDataset.synthetic(
        n_instances=max(n_inst, args.N_instances),
        grid=args.grid,
        n_xy_fem=args.truth_N_xy,
        cache=datadir(
            "input_data", "synthetic",
            f"darcy_g{args.grid}_n{max(n_inst, args.N_instances)}"
            f"_t{args.truth_N_xy}.npz",
        ),
    )

    with to("Mesh generation"):
        disc = uniform_unit_square_discretization(
            args.N_xy, element_order=2, use_dirichlet_bc=True
        )
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    n_free = affine.n_free
    log.info("ndofs=%d free=%d", disc.ndofs, n_free)

    with to("Prior construction"):
        spde = MaternSPDE(d=2, range=1 / np.sqrt(args.N_xy), smoothness=2)
        Lam_csr = matern_sqrt_host(spde, disc, affine)
        from diffeqgmrfs_tpu.fem.operators import RowOp

        Lam = RowOp.from_csr(Lam_csr, dtype=jnp.float32)

    obs = DarcyFEMObservations(
        disc, ds.x_coords, ds.y_coords, beta=1.0,
        inflated_boundary=False, N_xy=args.N_xy,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    cpu0 = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu0):
        A0, y0 = obs(jnp.asarray(ds.get_problem(0)[1]))
        A0c = affine.condense_rowop(A0)
    # structurally-dead slots (ELL padding col-0 aliases, s_coef == 0
    # condensation slots) must not enter the dissection graph — see
    # mf_qr.structural_cols; verified per instance by the leak check below
    from diffeqgmrfs_tpu.ops.mf_qr import structural_cols

    a_cols = structural_cols(
        np.where(
            np.asarray(affine.s_coef)[np.asarray(A0.cols)] == 0.0,
            n_free,
            np.asarray(A0c.cols),
        ),
        np.asarray(A0c.vals),
        n_free,
    )

    with to("Symbolic analysis"):
        coords_free = np.asarray(disc.mesh.coords)[affine.free_dofs]
        from diffeqgmrfs_tpu.ops.mf_qr import stack_operand_cols

        lam_cols = structural_cols(
            np.asarray(Lam.cols), np.asarray(Lam.vals), n_free
        )
        ops_cols = [lam_cols, a_cols]
        # the symbolic phase is instance-independent and pure-host
        # (~5 min at N300 on this core, worse under contention): cache
        # the tree to disk keyed by the structural inputs so repeated
        # arms (repro pairs, yardstick re-runs) skip it
        import pickle

        sym_cache = datadir(
            "cache",
            f"mfqr_sym_N{args.N_xy}_g{args.grid}_lt{args.leaf_target}.pkl",
        )
        qt = None
        if os.path.exists(sym_cache):
            try:
                with open(sym_cache, "rb") as f:
                    qt = pickle.load(f)
                log.info("symbolic tree loaded from %s", sym_cache)
            except Exception as e:  # noqa: BLE001
                log.warning("symbolic cache load failed (%r); rebuilding", e)
                qt = None
        if qt is None:
            qt = symbolic_mf_qr(
                ops_cols, n_free, coords_free, cut_width=None,
                leaf_target=args.leaf_target,
            )
            try:
                os.makedirs(os.path.dirname(sym_cache), exist_ok=True)
                with open(sym_cache + ".tmp", "wb") as f:
                    pickle.dump(qt, f)
                os.replace(sym_cache + ".tmp", sym_cache)
                log.info("symbolic tree cached to %s", sym_cache)
            except Exception as e:  # noqa: BLE001
                log.warning("symbolic cache save failed: %r", e)
        nlv = [
            (p.own.shape[0], p.s, p.f) for p in qt.tree.levels
        ]
        log.info("front tree: %d levels %s", len(nlv), nlv)
        from diffeqgmrfs_tpu.ops.mf_qr import mfqr_chunk_plans_device

        chunk_plans = None if args.fused else mfqr_chunk_plans_device(
            mfqr_chunk_plans(qt, args.max_panel_mb << 20)
        )
        arrs = mfqr_device_arrays(qt, solve_only=not args.fused)
        # FLAT [rows*K] stack: the [rows, K] device layout lane-pads
        # K -> 128 (3.8x HBM; mfqr_mem.py round-4 ledger)
        cols_global = jnp.asarray(
            stack_operand_cols(ops_cols, n_free).astype(np.int32).reshape(-1)
        )
    geom = jax.device_put(obs.geom_arrays())
    with jax.default_device(cpu0):
        obs_st = obs.structure_arrays()
    obs_st = jax.device_put(obs_st)
    E = evaluation_matrix(
        disc,
        np.stack(
            np.meshgrid(ds.x_coords, ds.y_coords, indexing="xy"), -1
        ).reshape(-1, 2),
    )

    sqrt_tau = np.sqrt(args.tau)

    from diffeqgmrfs_tpu.ops.mf_qr import stack_operand_vals

    # refinement operator in GATHER-ONLY form: Q as an f64 ELL (exactly
    # matches Λ^T Λ — matern_precision_host), A^T through a host-built
    # transpose ELL. The naive RowOp.rmatvec scatter-add OOMed the N300
    # post-mean program (TPU scatter lowering; see mf_qr.transpose_ell).
    from diffeqgmrfs_tpu.models.matern import matern_precision_host
    from diffeqgmrfs_tpu.ops.mf_qr import rmatvec_gather, transpose_ell

    # Q64 stays on the HOST CPU until first use: as a device resident it
    # costs ~1.5 GB (f64 + K->128 lane pad) during factorization, where
    # every HBM GB counts at 1e6 dofs; device_put happens once, after
    # the first factor exists (update panels freed by then).
    with jax.default_device(cpu0):
        Q64_cpu = RowOp.from_csr(
            matern_precision_host(spde, disc, affine), dtype=jnp.float64
        )
    Q64 = None  # TPU-resident copy, created lazily in the Mean phase
    aT = tuple(
        jnp.asarray(x) if False else x  # host np: jit args upload per call
        # SANITIZED cols: the raw condensed cols alias dead slots to free
        # dof 0, giving column 0 a ~10k multiplicity -> K_T explodes the
        # transpose ELL to tens of GB (the N300 rc=137 host OOM: "88.11GB
        # constants captured during lowering"). Dead slots carry exact
        # zeros, so dropping them is exact.
        for x in transpose_ell(a_cols, n_free)
    )

    _lc = lam_cols.reshape(-1)
    _lv = np.asarray(Lam.vals, np.float64).reshape(-1)
    lam_colsq = np.bincount(
        np.where(_lc >= n_free, n_free, _lc), weights=_lv**2,
        minlength=n_free + 1,
    )[:n_free]
    lam_colsq_dev = jax.device_put(jnp.asarray(lam_colsq))

    # every per-instance compute path is JITTED: the eager relay dispatch
    # floor (~10-26 ms/op) makes eager tree solves (hundreds of small ops
    # per level sweep) pathologically slow on TPU — observed as a silent
    # ~30 min stall at N64 (queue r3a, first attempt)
    @jax.jit
    def operand_vals(coeff, geom, obs_st, lam_vals, cols_g, aT, lam_sq):
        A, ys = obs(coeff, geom=geom, structure=obs_st)
        Acv = affine.condense_rowop(A).vals
        yc = jnp.asarray(ys) - affine.offset_shift(A)
        vals = stack_operand_vals(
            [lam_vals, sqrt_tau * Acv], qt.K, dtype=jnp.float32
        ).reshape(-1)  # flat: kills the K->128 lane pad on the output
        # drop-column leak check: the structural zero-slot mask must hold
        # for EVERY instance (a nonzero value in a masked slot would be
        # silently dropped from H)
        leak = jnp.max(jnp.abs(jnp.where(cols_g == n_free, vals, 0.0)))
        # column equilibration diag H = colsq(Lam) + tau colsq(A):
        # Lam's part is instance-independent (host bincount, below); A's
        # comes through the gather-form transpose (no TPU scatter)
        colsq_a = rmatvec_gather(
            aT,
            (Acv.astype(jnp.float64)) ** 2,
            jnp.ones((A0c.n_rows,), jnp.float64),
        )
        sq = lam_sq + args.tau * colsq_a
        cs = 1.0 / jnp.sqrt(jnp.maximum(sq, 1e-30))
        return vals, yc, Acv, cs.astype(jnp.float32), leak

    def _h64(aT, q64, A64, x):
        """H x = Q x + tau A^T A x in f64 (gather-only refinement)."""
        ax = rmatvec_gather(aT, A64.vals, A64.matvec(x))
        return q64.matvec(x) + args.tau * ax

    use_hosted = args.host_solves == "on" or (
        args.host_solves == "auto" and n_free > 100_000
    )

    @jax.jit
    def post_mean_fused(F, aT, q64, A64, yc):
        b64 = args.tau * rmatvec_gather(
            aT, A64.vals, yc.astype(jnp.float64)
        )
        x = F.solve(b64.astype(jnp.float32)).astype(jnp.float64)
        for _ in range(args.refine_iters):
            r = b64 - _h64(aT, q64, A64, x)
            x = x + F.solve(r.astype(jnp.float32)).astype(jnp.float64)
        return x

    @jax.jit
    def post_std_fused(F, key):
        return jnp.sqrt(F.variance_mc(key, args.n_std))

    from diffeqgmrfs_tpu.ops.mf_qr import (
        mfqr_sample_hosted,
        mfqr_solve_hosted,
    )

    rmv64 = jax.jit(
        lambda aT, A64, yv: args.tau
        * rmatvec_gather(aT, A64.vals, yv.astype(jnp.float64))
    )
    h64_jit = jax.jit(_h64)

    # ---- host-side f64 refinement (the N500 OOM fix) ----
    refine_host = args.refine_host == "on" or (
        args.refine_host == "auto" and n_free > 500_000
    )
    _q_cols_np = np.asarray(Q64_cpu.cols)
    _q_vals_np = np.asarray(Q64_cpu.vals, np.float64)
    _a_cols_np = np.asarray(A0c.cols)
    _qm_np = (_q_cols_np >= 0) & (_q_cols_np < n_free)
    _am_np = (_a_cols_np >= 0) & (_a_cols_np < n_free)

    def _at_host(a_vals64, z):
        """tau-free A^T z on the host (scatter-add over the ELL)."""
        atz = np.zeros(n_free)
        keep = _am_np.reshape(-1)
        np.add.at(
            atz,
            _a_cols_np.reshape(-1)[keep],
            (a_vals64 * z[:, None]).reshape(-1)[keep],
        )
        return atz

    def _h64_host(a_vals64, x):
        """H x = Q x + tau A^T A x, pure numpy f64 (memory-bound —
        host cost ~1-2 s at 1e6 dofs, no HBM residency)."""
        xq = x[np.clip(_q_cols_np, 0, n_free - 1)]
        hx = (_q_vals_np * np.where(_qm_np, xq, 0.0)).sum(1)
        xa = x[np.clip(_a_cols_np, 0, n_free - 1)]
        az = (a_vals64 * np.where(_am_np, xa, 0.0)).sum(1)
        return hx + args.tau * _at_host(a_vals64, az)

    def post_mean_hostrefine(F, a_vals64, yc):
        """Hosted solve sweeps on chip; b64 + refinement residuals on
        the host. Q64/A64/aT never touch the device."""
        yc64 = np.asarray(yc, np.float64)
        b64 = args.tau * _at_host(a_vals64, yc64)
        x = np.asarray(
            mfqr_solve_hosted(F, jnp.asarray(b64, jnp.float32)),
            np.float64,
        )
        b_norm = float(np.linalg.norm(b64))
        prev_rn = None
        for _ in range(args.refine_iters):
            r = b64 - _h64_host(a_vals64, x)
            rn = float(np.linalg.norm(r))
            if rn <= 1e-7 * b_norm:
                break
            if prev_rn is not None and rn > 0.7 * prev_rn:
                break  # stalled (same rule as the device path)
            x = x + np.asarray(
                mfqr_solve_hosted(F, jnp.asarray(r, jnp.float32)),
                np.float64,
            )
            prev_rn = rn
        r = b64 - _h64_host(a_vals64, x)
        res = float(np.linalg.norm(r) / np.linalg.norm(b64))
        log.info(
            "mean residual |b-Hx|/|b| (f64 HOST, post-refinement): %.3e",
            res,
        )
        results.setdefault("mean_residuals", []).append(res)
        return jnp.asarray(x)
    var_of = jax.jit(lambda z: jnp.sqrt(jnp.mean(z * z, axis=1)))

    def post_mean(F, aT, q64, A64, yc):
        if not use_hosted:
            return post_mean_fused(F, aT, q64, A64, yc)
        b64 = rmv64(aT, A64, yc)
        x = mfqr_solve_hosted(F, b64.astype(jnp.float32)).astype(jnp.float64)
        # adaptive refinement (host loop -> residual readbacks are ~free
        # relative to a hosted 10-level solve sweep): stop once the
        # residual is solver-grade or has stopped contracting — with a
        # healthy factor one refinement reaches ~1e-6-class and the
        # remaining sweeps were pure Mean-phase waste (orphan r5a arm:
        # Mean 27.5 s vs factorization 5.7 s at N300)
        b_norm = float(jnp.linalg.norm(b64))
        prev_rn = None
        for _ in range(args.refine_iters):
            r = b64 - h64_jit(aT, q64, A64, x)
            rn = float(jnp.linalg.norm(r))
            if rn <= 1e-7 * b_norm:
                break
            if prev_rn is not None and rn > 0.7 * prev_rn:
                break  # stalled: more sweeps through this factor won't help
            x = x + mfqr_solve_hosted(
                F, r.astype(jnp.float32)
            ).astype(jnp.float64)
            prev_rn = rn
        # factor-quality diagnostic: ||b - H x|| / ||b|| in f64 after
        # refinement. Near machine-level = factor is solver-grade;
        # O(1) = the FACTOR is wrong (disambiguates from truth-yardstick
        # mismatch — the round-4 gram-at-top-fronts failure read as
        # rel_err 7-25 with no way to tell which stage broke)
        r = b64 - h64_jit(aT, q64, A64, x)
        res = float(jnp.linalg.norm(r) / jnp.linalg.norm(b64))
        log.info("mean residual |b-Hx|/|b| (f64, post-refinement): %.3e", res)
        results.setdefault("mean_residuals", []).append(res)
        return x

    from diffeqgmrfs_tpu.ops.mf_qr import mfqr_variance_selected

    def post_std_mc(F, key):
        if not use_hosted:
            return post_std_fused(F, key)
        z = mfqr_sample_hosted(F, key, args.n_std)
        return var_of(z)

    def post_std(F, key):
        """(std, selinv_vs_mc median relative deviation or None)."""
        if args.std_impl == "none":
            # sweep mode: mean-only throughput (the banded sweep driver's
            # --mean_only analog); std stats recorded as zeros
            return jnp.zeros((1,), jnp.float32), None
        if args.std_impl == "mc":
            return post_std_mc(F, key), None
        v = mfqr_variance_selected(F)
        std = jnp.sqrt(v)
        dev = None
        if args.std_impl == "both":
            std_mc = post_std_mc(F, key)
            dev = float(jnp.median(jnp.abs(std_mc - std)
                                   / jnp.maximum(std, 1e-30)))
        return std, dev

    # (Q64 built above is the f64 refinement operator)
    fused_factor = jax.jit(
        lambda v, cg, c: MFQRFactor.factorize(
            qt, v, cols_global=cg, col_scale=c,
            dtype=jnp.float32, qr_impl=args.qr_impl, arrs=arrs,
        )
    )
    results = dict(rel_errs=[], rmses=[], max_errs=[], std_norms=[],
                   n_std_nonfinite=[])
    def _hbm(tag):
        try:
            st = jax.devices()[0].memory_stats()
            log.info(
                "hbm[%s]: in_use %.2f GB peak %.2f GB", tag,
                st.get("bytes_in_use", 0) / 1e9,
                st.get("peak_bytes_in_use", 0) / 1e9,
            )
        except Exception:
            pass

    per_instance_timers = []
    for i in range(n_inst):
        cur = PhaseTimers()
        coeff = jnp.asarray(ds.get_problem(i)[1])
        with to("PDE Discretization"), cur("PDE Discretization"):
            vals, yc, Acv, cs, leak = operand_vals(
                coeff, geom, obs_st, Lam.vals, cols_global, aT,
                lam_colsq_dev,
            )
            if float(leak) != 0.0:
                raise AssertionError(
                    f"structural zero-slot mask violated: |val| {float(leak)}"
                    " in a dropped column (instance-dependent structure)"
                )
            vals.block_until_ready()
            if n_inst == 1:
                # single-instance (1e6-dof) run: the assembly gather
                # structures (~0.5 GB at N500) are dead after operand_vals
                del geom, obs_st
                import gc as _gc
                _gc.collect()
        _hbm("post-operands")
        with to("Conditioning"), cur("Conditioning"):
            if args.fused:
                F = fused_factor(vals, cols_global, cs)
            else:
                off = (
                    args.offload_levels
                    if args.offload_levels >= 0
                    else (6 if n_free > 500_000 else 0)
                )
                F = mfqr_factorize_chunked(
                    qt, vals, chunk_plans=chunk_plans,
                    cols_global=cols_global, col_scale=cs,
                    dtype=jnp.float32, qr_impl=args.qr_impl, arrs=arrs,
                    offload_levels=off, auto_top=args.auto_top,
                    progress_cb=(
                        (lambda p: _hbm(f"level {p}")) if i == 0 else None
                    ),
                )
            jax.block_until_ready(F.rfronts[-1][0])
        _hbm("post-factor")
        with to("Mean"), cur("Mean"):
            del vals  # operand stack is dead once the factor exists
            if refine_host and use_hosted:
                # Q64/A64 never uploaded: residuals run host-side
                x = post_mean_hostrefine(
                    F, np.asarray(Acv, np.float64), yc
                )
            else:
                if Q64 is None:
                    Q64 = jax.device_put(Q64_cpu)
                A64 = RowOp(A0c.cols, Acv.astype(jnp.float64), n_free)
                x = post_mean(F, aT, Q64, A64, yc)
            x.block_until_ready()
        _hbm("post-mean")
        with to("Std dev"), cur("Std dev"):
            std, std_dev_mc = post_std(F, jax.random.PRNGKey(100 + i))
            std.block_until_ready()
            if std_dev_mc is not None:
                results.setdefault("std_selinv_vs_mc_median_rel", []).append(
                    std_dev_mc
                )
                log.info(
                    "selinv vs MC std: median rel deviation %.3g "
                    "(expect ~sqrt(2/%d) ~ %.2g from sampling noise)",
                    std_dev_mc, args.n_std, np.sqrt(2.0 / args.n_std) / 2,
                )
        with to("Evaluation"), cur("Evaluation"):
            full = affine.free_to_full(x)
            pred = E.matvec(full).reshape(args.grid, args.grid)
            truth = jnp.asarray(ds.get_problem(i)[0])
            re = float(rel_err(pred, truth))
            rm = float(rmse(pred, truth))
            mx = float(max_err(pred, truth))
        nf = int(jnp.sum(~jnp.isfinite(std)))
        results["rel_errs"].append(re)
        results["rmses"].append(rm)
        results["max_errs"].append(mx)
        results["std_norms"].append(float(jnp.linalg.norm(
            jnp.nan_to_num(std))))
        results["n_std_nonfinite"].append(nf)
        per_instance_timers.append(
            {k: v / 1e9 for k, v in cur.as_dict().items()}
        )
        log.info(
            "instance %d: rel_err %.4g rmse %.4g max %.4g std_nonfinite %d "
            "phases(s) %s",
            i, re, rm, mx, nf,
            {k: round(v, 2) for k, v in per_instance_timers[-1].items()},
        )
        # incremental save after EVERY instance: at 1e6-dof scale a
        # timeout mid-run must not lose the finished instances (the
        # round-4 N300 gram arm spent ~50 min in contended setup alone)
        _save(args, n_inst, results, to, per_instance_timers)
        if args.check_banded and n_free <= 20000:
            import scipy.sparse as sp

            S_lam = Lam_csr.astype(np.float64)
            r_idx = np.repeat(np.arange(A0c.n_rows), A0c.K)
            cc = np.asarray(A0c.cols).reshape(-1)
            keep = (cc >= 0) & (cc < n_free)
            S_a = sp.csr_matrix(
                (np.asarray(Acv, np.float64).reshape(-1)[keep],
                 (r_idx[keep], cc[keep])),
                shape=(A0c.n_rows, n_free),
            )
            H = (S_lam.T @ S_lam + args.tau * (S_a.T @ S_a)).toarray()
            b_chk = args.tau * np.asarray(
                RowOp(A0c.cols, Acv.astype(jnp.float64), n_free).rmatvec(
                    yc.astype(jnp.float64)
                )
            )
            x_ref = np.linalg.solve(H, b_chk)
            dd = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
            log.info("dense cross-check: |x - x_ref|/|x_ref| = %.3g", dd)
            results.setdefault("dense_check", []).append(float(dd))

    log.info("timers:\n%s", to)
    path = _save(args, n_inst, results, to, per_instance_timers)
    log.info("saved %s", path)


def _save(args, n_inst, results, to, per_instance_timers):
    params = dict(
        N_xy=args.N_xy, grid=args.grid, N_instances=n_inst, tau=args.tau,
        leaf_target=args.leaf_target, qr_impl=args.qr_impl,
        n_std=args.n_std, truth_N_xy=args.truth_N_xy, solver="mfqr",
        std_impl=args.std_impl,
    )
    out = dict(
        params=params, **results, timers=to.as_dict(),
        per_instance_timers=per_instance_timers,
    )
    return tagsave(datadir("sims", "darcy_mfqr", savename(params)), out)


if __name__ == "__main__":
    main()
