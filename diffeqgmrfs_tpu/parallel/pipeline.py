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
