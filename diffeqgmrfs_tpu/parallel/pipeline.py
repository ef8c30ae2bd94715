"""Pipeline-parallel BTD factor sweeps across devices (PP, SURVEY.md §2.4).

The block-tridiagonal Cholesky sweep is a serial recurrence over blocks
(`/root/reference/src/tridiagonal_cholesky.jl:65-82`), so a SINGLE
factorization cannot spread over devices without changing the algorithm
(that is ops/dist_btd.py's nested dissection). But production sweeps
factor MANY independent systems (dataset instances, GN iterates across a
batch): here we pipeline the sweep itself across the mesh —

* device d holds blocks segment [d·N/P, (d+1)·N/P) of EVERY instance
  (weights-stationary layout: the big [M, N/P, bs, bs] block arrays
  never move),
* instance m enters device 0 at tick m; each tick every device runs its
  segment's scan for its current instance and hands the [bs, bs]
  boundary factor to the next device over ICI `ppermute` — the only
  cross-device traffic (bs² elements per tick per edge),
* after M + P − 1 ticks all M factors are materialized in place;
  steady-state throughput approaches P sweeps per sweep-time (pipeline
  bubble P − 1).

This is the TPU analog of a pipelined wavefront factorization; compare
the DP path (parallel/batched.py: whole instances per device) which
needs M ≥ P full instances of HBM per device, while PP needs only
1/P of each instance's blocks per device — the axis to use when a
single factor's block array dominates HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def pipelined_batched_btd_cholesky(
    diag,
    lower,
    mesh,
    axis_name: str = "pp",
    precision: str = "float32",
):
    """Factor M independent BTD systems, block axis sharded over
    `axis_name`, instances streamed through the devices.

    diag  [M, N, bs, bs], lower [M, N-1, bs, bs] — N must divide evenly
    by the axis size. Returns (Ls [M, N, bs, bs], Cs [M, N-1, bs, bs])
    matching `btd_cholesky` per instance (wrap as
    `BTDCholesky(Ls[m], Cs[m], N*bs)`).
    """
    try:
        from jax import shard_map as _sm

        def shard_map(f=None, **kw):
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm(f, **kw) if f is not None else _sm(**kw)
    except ImportError:
        from jax.experimental.shard_map import shard_map

    M, N, bs, _ = diag.shape
    nP = mesh.shape[axis_name]
    if N % nP:
        raise ValueError(f"N={N} blocks not divisible by {axis_name}={nP}")

    # shift the coupling blocks so entry i pairs with block i (entry 0 is
    # exact zeros: block 0 of a fresh instance has no predecessor, and a
    # zero B gives C = 0 against the identity boot carry)
    lsh = jnp.concatenate(
        [jnp.zeros((M, 1, bs, bs), lower.dtype), lower], axis=1
    )
    spec = P(None, axis_name, None, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_rep=False,
    )
    def run(d_loc, b_loc):  # local [M, N/P, bs, bs]
        d_idx = lax.axis_index(axis_name)
        eye = jnp.eye(bs, dtype=d_loc.dtype)

        def seg(L_carry, Dm, Bm):
            def step(Lp, inp):
                D_i, B_i = inp
                C = lax.linalg.triangular_solve(
                    Lp, B_i, left_side=False, lower=True, transpose_a=True
                )
                L_i = jnp.linalg.cholesky(D_i - C @ C.T)
                return L_i, (L_i, C)

            Lf, (Ls, Cs) = lax.scan(step, L_carry, (Dm, Bm))
            return Lf, Ls, Cs

        Nl = d_loc.shape[1]
        # row M is scratch: out-of-range pipeline ticks write there
        out_L = jnp.zeros((M + 1, Nl, bs, bs), d_loc.dtype)
        out_C = jnp.zeros((M + 1, Nl, bs, bs), d_loc.dtype)

        def tick(t, state):
            carry_in, oL, oC = state
            m = t - d_idx
            valid = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            Dm = lax.dynamic_index_in_dim(d_loc, mi, 0, keepdims=False)
            Bm = lax.dynamic_index_in_dim(b_loc, mi, 0, keepdims=False)
            # device 0 boots each instance: B row is zeros there, so any
            # nonsingular carry gives C = 0 — use I
            Lc = jnp.where(d_idx == 0, eye, carry_in)
            with jax.default_matmul_precision(precision):
                Lf, Ls, Cs = seg(Lc, Dm, Bm)
            w = jnp.where(valid, mi, M)
            oL = lax.dynamic_update_index_in_dim(oL, Ls, w, 0)
            oC = lax.dynamic_update_index_in_dim(oC, Cs, w, 0)
            # boundary factor to the next pipeline stage (bs² per edge —
            # the only cross-device traffic)
            carry_out = lax.ppermute(
                Lf, axis_name, [(i, i + 1) for i in range(nP - 1)]
            )
            return carry_out, oL, oC

        carry0 = jnp.zeros((bs, bs), d_loc.dtype)
        _, out_L, out_C = lax.fori_loop(
            0, M + nP - 1, tick, (carry0, out_L, out_C)
        )
        return out_L[:M], out_C[:M]

    Ls, Cs = run(diag, lsh)
    return Ls, Cs[:, 1:]


def pipelined_batched_srif_qr(
    plan,
    vals,
    n: int,
    mesh,
    axis_name: str = "pp",
    col_scale=None,
    dtype=jnp.float32,
):
    """Pipeline the SRIF windowed-QR sweep (ops/srif.srif_packed_qr) for M
    independent stacked systems across the mesh — the square-root analog
    of `pipelined_batched_btd_cholesky`.

    Device d owns window segment [d·Nw/P, (d+1)·Nw/P) of every instance
    (the static plan slices are weights-stationary); instance m enters
    device 0 at tick m and its [bs, 2bs] carry trapezoid rides `ppermute`
    to the next stage — the only cross-device traffic. After M + P − 1
    ticks every instance's packed R factor is materialized in place.

    plan: split=1 banded ATAWindowPlan (single operand; stack multiple
    operands into one RowOp first). vals [M, n_rows, K] per-instance
    values; col_scale optional [M, n]. Returns P_out [M, N, bs*bs] — per
    instance identical to `srif_packed_qr([(plan, vals[m])], ...)`
    (apply ops/srif._fix_padding per instance for padded tails).
    """
    from functools import partial
    try:
        from jax import shard_map as _sm

        def shard_map(f=None, **kw):
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm(f, **kw) if f is not None else _sm(**kw)
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from diffeqgmrfs_tpu.ops.ata_windows import dense_rows_from_slots

    if plan.split != 1:
        raise ValueError("pipelined SRIF requires a split=1 plan")
    if not (0 <= plan.max_span < plan.bs):
        raise ValueError("pipelined SRIF requires banded rows (span < bs)")
    bs, N, Nw = plan.bs, plan.N, plan.Nw
    if N - 1 != Nw:
        raise ValueError("plan window count mismatch")
    M = vals.shape[0]
    nP = mesh.shape[axis_name]
    if Nw % nP:
        raise ValueError(f"Nw={Nw} windows not divisible by {axis_name}={nP}")
    Nl = Nw // nP
    rows = jnp.asarray(plan.rows)
    mask = jnp.asarray(plan.mask, dtype=dtype)
    lcols = jnp.asarray(plan.local_cols)
    cs = None
    if col_scale is not None:
        cs = jnp.asarray(col_scale, dtype=dtype)
        pad = N * bs - cs.shape[-1]
        if pad:
            cs = jnp.concatenate(
                [cs, jnp.ones(cs.shape[:-1] + (pad,), cs.dtype)], axis=-1
            )
    else:
        cs = jnp.ones((M, N * bs), dtype=dtype)

    wspec = P(axis_name)
    vspec = P()  # vals replicated (throughput-scaling PP variant)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(wspec, wspec, wspec, vspec, vspec),
        out_specs=(P(None, axis_name), P(axis_name)),
        check_rep=False,
    )
    def run(rows_l, mask_l, lcols_l, vals_g, cs_g):
        d_idx = lax.axis_index(axis_name)

        def window_qr(carry, inp, vm, csm):
            r_b, m_b, lc_b, w_loc = inp
            v = (vals_dtype(vm)[r_b] * m_b[:, None]).astype(dtype)
            gcols = (d_idx * Nl + w_loc) * bs + lc_b
            v = v * csm[gcols]
            panel = dense_rows_from_slots(v, lc_b, 2 * bs)
            T = jnp.concatenate([carry, panel], axis=0)
            R_T = jnp.linalg.qr(T, mode="r")[: 2 * bs]
            s = jnp.where(jnp.diagonal(R_T) < 0, -1.0, 1.0).astype(dtype)
            R_T = s[:, None] * R_T
            slot = jnp.triu(R_T[:bs, :bs]) + jnp.tril(R_T[:bs, bs:], -1)
            carry_n = jnp.pad(R_T[bs:, bs:], ((0, 0), (0, bs)))
            return carry_n, slot.reshape(-1)

        def vals_dtype(vm):
            return vm

        def seg(carry, vm, csm):
            xs = (rows_l, mask_l, lcols_l, jnp.arange(Nl))
            return lax.scan(
                lambda c, inp: window_qr(c, inp, vm, csm), carry, xs
            )

        out_P = jnp.zeros((M + 1, Nl, bs * bs), dtype)
        out_last = jnp.zeros((M + 1, bs * bs), dtype)

        def tick(t, state):
            carry_in, oP, oL = state
            m = t - d_idx
            valid = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            vm = lax.dynamic_index_in_dim(vals_g, mi, 0, keepdims=False)
            csm = lax.dynamic_index_in_dim(cs_g, mi, 0, keepdims=False)
            carry = jnp.where(
                d_idx == 0, jnp.zeros((bs, 2 * bs), dtype), carry_in
            )
            carry_f, slots = seg(carry, vm, csm)
            w = jnp.where(valid, mi, M)
            oP = lax.dynamic_update_index_in_dim(oP, slots, w, 0)
            # last device also finalizes block N-1 from its final carry
            cl = carry_f[:, :bs]
            s = jnp.where(jnp.diagonal(cl) < 0, -1.0, 1.0).astype(dtype)
            oL = lax.dynamic_update_index_in_dim(
                oL, jnp.triu(s[:, None] * cl).reshape(-1), w, 0
            )
            carry_out = lax.ppermute(
                carry_f, axis_name, [(i, i + 1) for i in range(nP - 1)]
            )
            return carry_out, oP, oL

        carry0 = jnp.zeros((bs, 2 * bs), dtype)
        _, out_P, out_last = lax.fori_loop(
            0, M + nP - 1, tick, (carry0, out_P, out_last)
        )
        return out_P[:M], out_last[None, :M]

    P_wins, lasts = run(
        rows, mask, lcols, jnp.asarray(vals), cs
    )  # [M, Nw, bs*bs], [nP, M, bs*bs]
    # window slots in global order + the LAST device's final block
    return jnp.concatenate([P_wins, lasts[-1][:, None]], axis=1)
