"""Parallel-in-time SRIF factorization: nested-dissection windowed QR.

The sequential SRIF sweep (`ops/srif.srif_packed_qr`) reduces N-1 windows
left to right through a loop-carried trapezoid — serial across a
time-sharded mesh, exactly like the BTD Cholesky sweep it replaces. This
module is the SQUARE-ROOT analog of `ops/dist_btd.dist_btd_cholesky`:
QR-eliminate under the same time-chunked nested-dissection order (P chunks
of k blocks; every chunk's k-1 interior blocks first — independent across
chunks, batched over [P] so the chunk axis shards over the mesh time axis
— then a small sequential reduction over the P chunk separators).

Because the elimination is by ORTHOGONAL transforms on the stacked rows S
(S^T S = H), the factor keeps the SRIF robustness: f32-valid at
cond(H) up to ~1/eps_f32^2 — this is the only parallel-in-time
factorization that survives the Darcy/Chen24 production conditions where
f32 Cholesky (including the nested-dissection one) goes indefinite.

Fronts: interior front i of chunk p eliminates global block g = p*k + i
over the 3bs columns (g, g+1, s_{p-1}): the carry from front i-1, the
natural-window-g operand rows (span (g, g+1) by plan construction), and —
for i = 0 — the previous SEPARATOR window's rows (span (s_{p-1}, g),
column-swapped into the front layout). One QR per front emits R's block
row g: Rd[g] = R[g, g] (triu), Ru[g] = R[g, g+1], Rv[g] = R[g, s_{p-1}]
(the QR image of dist_btd's L/W/V), a [bs, 2bs] carry spanning
(g+1, s_{p-1}), and bs separator-only rows that fold into a per-chunk
[bs, bs] accumulator by a QR merge (TSQR associativity). The leftover
per-chunk rows — final carries spanning (s_p, s_{p-1}) and the
accumulators — form a block-banded stacked system over the P separators,
reduced by the classic sequential two-block window sweep (P is the device
count: tiny).

R^T R = Pi H Pi^T for the nested-dissection permutation Pi, and R^T has
EXACTLY the sparsity of the ND Cholesky factor, so the result is returned
AS a `dist_btd.DistBTDCholesky` (L := Rd^T, W := Ru, V := Rv, red := the
separator R factor) — solves, sampling, log-det all inherited unchanged.

Reference parity: this parallelizes the factorization step of
`/root/reference/src/tridiagonal_cholesky.jl:65-82` across devices, a
capability the reference lacks entirely (single CHOLMOD factorization per
instance on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.dist_btd import DistBTDCholesky
from diffeqgmrfs_tpu.ops.packed import PackedBTDRFullFactor
from diffeqgmrfs_tpu.ops.srif import _window_panel, _fix_padding_full


def dist_srif_qr(
    operands,
    n: int,
    N: int,
    bs: int,
    n_chunks: int,
    dtype=jnp.float32,
    col_scale=None,
    mesh=None,
    time_axis: str = "time",
    matmul_precision: str = "float32",
) -> DistBTDCholesky:
    """QR-factor the stacked banded system under the time-chunked
    nested-dissection order; returns a solve-ready `DistBTDCholesky`.

    operands: [(ATAWindowPlan, vals)] as for `srif_packed_qr`; every plan
    must have split == 1 (fronts are classic two-block windows plus the
    separator column). Requires N % n_chunks == 0 and k = N/n_chunks >= 2.
    col_scale: optional [n] column equilibration of the stacked S.
    With `mesh`, the [P, ...] front batches carry sharding constraints
    over `time_axis` so each device eliminates its own chunks' interiors.
    """
    P = int(n_chunks)
    if N % P:
        raise ValueError(f"N={N} blocks not divisible into {P} chunks")
    k = N // P
    if k < 2:
        raise ValueError("dist_srif_qr needs k = N/n_chunks >= 2")
    for plan, _ in operands:
        if (plan.N, plan.bs) != (N, bs):
            raise ValueError("operand plan partition mismatch")
        if plan.split != 1:
            raise ValueError("dist_srif_qr requires split=1 window plans")

    cs = None
    if col_scale is not None:
        cs = jnp.asarray(col_scale)
        pad = N * bs - cs.shape[0]
        if pad:
            cs = jnp.concatenate([cs, jnp.ones((pad,), cs.dtype)])

    def constrain(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        spec = [None] * x.ndim
        spec[0] = time_axis
        return lax.with_sharding_constraint(
            x, NamedSharding(mesh, Pspec(*spec))
        )

    def panels_at(b_vec):
        """[P, R_total, 2bs] stacked operand panels of windows b_vec [P]."""
        outs = []
        for plan, vals in operands:
            f = lambda b: _window_panel(
                plan, jnp.asarray(vals), b, bs, dtype, cs
            )
            outs.append(jax.vmap(f)(b_vec))
        return jnp.concatenate(outs, axis=1)

    qr_r = jax.vmap(lambda T: jnp.linalg.qr(T, mode="r"))

    def front_qr(T):
        """[P, m, 3bs] -> sign-fixed [P, 3bs, 3bs] triangular."""
        m = T.shape[1]
        if m < 3 * bs:
            T = jnp.pad(T, ((0, 0), (0, 3 * bs - m), (0, 0)))
        R_T = qr_r(T)[:, : 3 * bs]
        s = jnp.where(
            jnp.diagonal(R_T, axis1=-2, axis2=-1) < 0, -1.0, 1.0
        ).astype(dtype)
        return s[:, :, None] * R_T

    chunk0 = k * jnp.arange(P)

    with jax.default_matmul_precision(matmul_precision):
        # ---- front 0 of every chunk (needs the separator-window rows) ----
        sep_prev = jnp.clip(chunk0 - 1, 0, N - 2)  # window s_{p-1}; p=0 dummy
        Ps = panels_at(sep_prev)  # [P, Rs, 2bs], natural cols (s_{p-1}, g)
        # zero out chunk 0's dummy rows (no previous separator)
        Ps = Ps * jnp.where(jnp.arange(P) == 0, 0.0, 1.0).astype(dtype)[
            :, None, None
        ]
        # column-swap into front layout (g, g+1, s_{p-1})
        Ps_f = jnp.concatenate(
            [Ps[:, :, bs:], jnp.zeros_like(Ps[:, :, :bs]), Ps[:, :, :bs]],
            axis=2,
        )
        Pw = panels_at(chunk0)  # [P, R, 2bs], cols (g, g+1)
        Pw_f = jnp.pad(Pw, ((0, 0), (0, 0), (0, bs)))
        R_T = front_qr(jnp.concatenate([Pw_f, Ps_f], axis=1))
        Rd0 = jnp.triu(R_T[:, :bs, :bs])
        Ru0 = R_T[:, :bs, bs : 2 * bs]
        Rv0 = R_T[:, :bs, 2 * bs :]
        carry = jnp.concatenate(
            [R_T[:, bs : 2 * bs, bs : 2 * bs], R_T[:, bs : 2 * bs, 2 * bs :]],
            axis=2,
        )  # [P, bs, 2bs]: (g+1, s_{p-1})
        racc = R_T[:, 2 * bs :, 2 * bs :]  # [P, bs, bs]: (s_{p-1})
        carry = constrain(carry)
        racc = constrain(racc)

        # ---- fronts 1..k-2 (scan; batched over chunks) ----
        def body(state, i):
            carry, racc = state
            Pw = panels_at(chunk0 + i)  # cols (g, g+1)
            Pw_f = jnp.pad(Pw, ((0, 0), (0, 0), (0, bs)))
            c_f = jnp.concatenate(
                [
                    carry[:, :, :bs],
                    jnp.zeros((P, bs, bs), dtype),
                    carry[:, :, bs:],
                ],
                axis=2,
            )
            R_T = front_qr(jnp.concatenate([c_f, Pw_f], axis=1))
            carry_n = jnp.concatenate(
                [
                    R_T[:, bs : 2 * bs, bs : 2 * bs],
                    R_T[:, bs : 2 * bs, 2 * bs :],
                ],
                axis=2,
            )
            racc_n = qr_r(
                jnp.concatenate([racc, R_T[:, 2 * bs :, 2 * bs :]], axis=1)
            )[:, :bs]
            return (constrain(carry_n), constrain(racc_n)), (
                jnp.triu(R_T[:, :bs, :bs]),
                R_T[:, :bs, bs : 2 * bs],
                R_T[:, :bs, 2 * bs :],
            )

        if k > 2:
            (carry, racc), (Rds, Rus, Rvs) = lax.scan(
                body, (carry, racc), jnp.arange(1, k - 1)
            )
            # scan emits [k-2, P, ...]; prepend front 0 -> [P, k-1, ...]
            Rd = jnp.concatenate(
                [Rd0[:, None], jnp.swapaxes(Rds, 0, 1)], axis=1
            )
            Ru = jnp.concatenate(
                [Ru0[:, None], jnp.swapaxes(Rus, 0, 1)], axis=1
            )
            Rv = jnp.concatenate(
                [Rv0[:, None], jnp.swapaxes(Rvs, 0, 1)], axis=1
            )
        else:
            Rd, Ru, Rv = Rd0[:, None], Ru0[:, None], Rv0[:, None]
        Rd = constrain(Rd)
        Ru = constrain(Ru)
        Rv = constrain(Rv)

        # ---- separator reduction (sequential over P blocks; tiny) ----
        # stacked rows over separator columns (s_0 .. s_{P-1}):
        #   chunk p+1 final carry: (s_{p+1}, s_p) -> window p, swapped
        #   chunk p+1 accumulator: (s_p)          -> window p
        #   chunk 0 final carry:   (s_0)          -> window 0 (left half;
        #     its "s_{-1}" half is structurally zero)
        P_sep = jnp.zeros((P, bs * bs), dtype)
        U_sep = jnp.zeros((max(P - 1, 0), bs * bs), dtype)
        carry_s = jnp.pad(carry[0, :, :bs], ((0, 0), (0, bs)))
        if P == 1:
            R_last = jnp.linalg.qr(carry_s[:, :bs], mode="r")
        else:
            for p in range(P - 1):
                rows = [
                    carry_s,
                    jnp.concatenate(
                        [carry[p + 1, :, bs:], carry[p + 1, :, :bs]], axis=1
                    ),
                    jnp.pad(racc[p + 1], ((0, 0), (0, bs))),
                ]
                R_T = jnp.linalg.qr(jnp.concatenate(rows, axis=0), mode="r")[
                    : 2 * bs
                ]
                s = jnp.where(jnp.diagonal(R_T) < 0, -1.0, 1.0).astype(dtype)
                R_T = s[:, None] * R_T
                P_sep = P_sep.at[p].set(jnp.triu(R_T[:bs, :bs]).reshape(-1))
                U_sep = U_sep.at[p].set(R_T[:bs, bs:].reshape(-1))
                carry_s = jnp.pad(R_T[bs:, bs:], ((0, 0), (0, bs)))
            R_last = carry_s[:, :bs]
        s = jnp.where(jnp.diagonal(R_last) < 0, -1.0, 1.0).astype(dtype)
        P_sep = P_sep.at[P - 1].set(jnp.triu(s[:, None] * R_last).reshape(-1))

    pad_total = N * bs - n
    red = PackedBTDRFullFactor(P_sep, U_sep, P * bs - pad_total, bs)
    red = _fix_padding_full(red)
    # re-wrap at full separator length: unit padding rows are inert, and
    # DistBTDCholesky feeds the red factor full [P*bs] padded vectors
    red = PackedBTDRFullFactor(red.P, red.U, P * bs, bs)

    # R^T has the ND-Cholesky sparsity: L := Rd^T, W := Ru, V := Rv
    L = jnp.swapaxes(Rd, -1, -2)
    return DistBTDCholesky(L, Ru, Rv, red, n)
