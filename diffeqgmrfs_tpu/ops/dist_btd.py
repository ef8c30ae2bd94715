"""Parallel-in-time BTD Cholesky with a REUSABLE factor (nested dissection
in time).

The sequential sweep (`ops/cholesky.py`, spec
`/root/reference/src/tridiagonal_cholesky.jl:65-82`) is a loop-carried
chain over N time blocks — serial across a time-sharded mesh. Cyclic
reduction (`ops/cyclic_reduction.py`) parallelizes a single SOLVE but
leaves no reusable factor. This module factors under a *nested-dissection
elimination order over the time axis*: split the N blocks into P chunks,
eliminate every chunk's k−1 interior blocks first (independent across
chunks — a lax.scan of length k−1 over [P]-batched dense POTRF/TRSM/GEMM,
so the P axis shards over the mesh "time" axis and each device sweeps its
own chunk), then factor the reduced P-block tridiagonal system over the
chunk separators (small, sequential).

Fill is confined by construction: eliminating interior block i of chunk p
touches only (i+1, i+1), (i+1, s_{p−1}) and (s_{p−1}, s_{p−1}) — one extra
[bs, bs] coupling column per chunk (the V blocks). Flops ≈ 2x the
sequential sweep (the extra V/TRSM + Schur GEMMs), depth O(k + P).

The stored factor (interior chols L, couplings W = L^{-1}A[i,i+1],
V = L^{-1}A[i,s_prev], plus the reduced-system factor) is reused across
solves — sampling, RBMC, refinement all ride it, unlike cyclic reduction.

Storage uses the "incoming-lower" convention Li[i] = A[i, i−1] with
Li[0] = 0 — length N, so the chunk axis divides BOTH diag and lower
evenly (the [N−1]-length `lower` of BTD can never split on the same
boundaries as `diag`; cf. parallel/multichip.shard_btd).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.btd import BTD
from diffeqgmrfs_tpu.ops.cholesky import btd_cholesky, BTDCholesky


def _tsolve(L, X, transpose=False):
    return lax.linalg.triangular_solve(
        L, X, left_side=True, lower=True, transpose_a=transpose
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class DistBTDCholesky:
    """Factor of the time-chunked nested-dissection elimination (see module
    docstring). P chunks of k blocks each; block (p, k−1) is chunk p's
    separator."""

    L: jnp.ndarray  # [P, k-1, bs, bs] interior Cholesky factors (lower)
    W: jnp.ndarray  # [P, k-1, bs, bs] L^{-1} A[i, i+1]
    V: jnp.ndarray  # [P, k-1, bs, bs] L^{-1} A[i, s_{p-1}]
    red: BTDCholesky  # factor of the reduced separator system [P blocks]
    n: int

    def tree_flatten(self):
        return (self.L, self.W, self.V, self.red), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @property
    def P(self):
        return self.L.shape[0]

    @property
    def k(self):
        return self.L.shape[1] + 1

    @property
    def bs(self):
        return self.L.shape[-1]

    @property
    def dtype(self):
        return self.L.dtype

    def log_det(self):
        d = jnp.diagonal(self.L, axis1=-2, axis2=-1)
        return 2.0 * jnp.sum(jnp.log(d)) + self.red.log_det()

    def solve(self, b):
        """Solve A x = b, b [..., n] (batched over leading dims)."""
        P, k, bs = self.P, self.k, self.bs
        b = jnp.asarray(b)
        batch_shape = b.shape[:-1]
        nb = 1
        for s in batch_shape:
            nb *= s
        bb = b.reshape(nb, -1).T
        pad = P * k * bs - b.shape[-1]
        if pad:
            bb = jnp.pad(bb, ((0, pad), (0, 0)))
        bb = bb.reshape(P, k, bs, nb)

        if k == 1:
            x = self.red.solve(bb.reshape(P * bs, nb).T).T
            x = x.reshape(P, 1, bs, nb)
            return self._unblock(x, batch_shape, b.shape[-1])

        # forward: eliminate interiors, accumulate separator contributions
        def fwd(carry, inp):
            bt, racc = carry  # [P, bs, nb], [P, bs, nb]
            L_i, W_i, V_i, b_next = inp
            y = _tsolve(L_i, bt)
            bt_next = b_next - jnp.swapaxes(W_i, -1, -2) @ y
            racc = racc + jnp.swapaxes(V_i, -1, -2) @ y
            return (bt_next, racc), y

        xs = (
            jnp.swapaxes(self.L, 0, 1),
            jnp.swapaxes(self.W, 0, 1),
            jnp.swapaxes(self.V, 0, 1),
            jnp.swapaxes(bb[:, 1:], 0, 1),
        )
        (b_sep, racc), ys = lax.scan(
            fwd, (bb[:, 0], jnp.zeros_like(bb[:, 0])), xs
        )
        # separator rhs[p] = b_sep[p] − racc[p+1]
        r_shift = jnp.concatenate(
            [racc[1:], jnp.zeros_like(racc[:1])], axis=0
        )
        rhs_red = b_sep - r_shift  # [P, bs, nb]
        x_sep = self.red.solve(rhs_red.reshape(P * bs, nb).T).T
        x_sep = x_sep.reshape(P, bs, nb)
        x = self._backward(ys, x_sep)
        return self._unblock(x, batch_shape, b.shape[-1])

    def _backward(self, ys, x_sep):
        """Back-substitution L^T x = y given interior y blocks
        ([k-1, P, bs, nb], scan layout) and the solved separator blocks
        x_sep [P, bs, nb]; returns natural-layout x [P, k, bs, nb]."""
        # x of the PREVIOUS chunk's separator, per chunk
        x_prev = jnp.concatenate(
            [jnp.zeros_like(x_sep[:1]), x_sep[:-1]], axis=0
        )

        def bwd(x_next, inp):
            L_i, W_i, V_i, y_i = inp
            x_i = _tsolve(
                L_i, y_i - W_i @ x_next - V_i @ x_prev, transpose=True
            )
            return x_i, x_i

        _, xs_int = lax.scan(
            bwd,
            x_sep,
            (
                jnp.swapaxes(self.L, 0, 1),
                jnp.swapaxes(self.W, 0, 1),
                jnp.swapaxes(self.V, 0, 1),
                ys,
            ),
            reverse=True,
        )
        return jnp.concatenate(
            [jnp.swapaxes(xs_int, 0, 1), x_sep[:, None]], axis=1
        )

    def backward_solve(self, b):
        """Solve L^T x = b through the nested-dissection factor (L is the
        Cholesky factor of A in the elimination order; b is laid out in
        NATURAL block order with the separator as the last block of each
        chunk — the same layout `solve` consumes/produces).

        For b ~ N(0, I) this yields x ~ N(0, A^{-1}): permuting iid
        Gaussians is free, so the elimination order never surfaces.
        """
        P, k, bs = self.P, self.k, self.bs
        b = jnp.asarray(b)
        batch_shape = b.shape[:-1]
        nb = 1
        for s in batch_shape:
            nb *= s
        bb = b.reshape(nb, -1).T
        pad = P * k * bs - b.shape[-1]
        if pad:
            bb = jnp.pad(bb, ((0, pad), (0, 0)))
        bb = bb.reshape(P, k, bs, nb)

        z_sep = bb[:, -1].reshape(P * bs, nb)
        x_sep = self.red.backward_solve(z_sep.T).T.reshape(P, bs, nb)
        if k == 1:
            x = x_sep[:, None]
        else:
            zs_int = jnp.swapaxes(bb[:, :-1], 0, 1)  # [k-1, P, bs, nb]
            x = self._backward(zs_int, x_sep)
        return self._unblock(x, batch_shape, b.shape[-1])

    def _unblock(self, x, batch_shape, n_out):
        P, k, bs = self.P, self.k, self.bs
        flat = x.reshape(P * k * bs, -1)[:n_out]
        return flat.T.reshape(*batch_shape, n_out)

    def sample_zero_mean(self, key, n_samples: int = 1):
        """Samples from N(0, A^{-1}) via x = L^{-T} z, z ~ N(0, I) —
        the factor-backsolve sampler (`rand(rng, x_cond)`, SURVEY §3.1),
        parallel-in-time: the interior back-substitution is batched over
        chunks, so it shards over the mesh time axis like the factor."""
        z = jax.random.normal(
            key, (n_samples, self.P * self.k * self.bs), dtype=self.dtype
        )
        return self.backward_solve(z)[..., : self.n]

    def variance_diag(self):
        """Marginal variances diag(A^{-1}) by Takahashi selected inversion
        on the nested-dissection factor (ops/takahashi.takahashi_diag_dist)
        — the interior recursion is batched over chunks, so variance
        extraction is parallel-in-time like the factorization."""
        from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag_dist

        return takahashi_diag_dist(self)

    def nnz(self) -> int:
        return int(self.L.size + self.W.size + self.V.size + self.red.nnz())


def dist_btd_cholesky(
    A: BTD,
    n_chunks: int,
    mesh=None,
    time_axis: str = "time",
    precision: str = "float32",
) -> DistBTDCholesky:
    """Factor A under the time-chunked nested-dissection order.

    Requires N % n_chunks == 0 (choose the block count to match the mesh).
    With `mesh` given, the chunk axis carries a sharding constraint over
    `time_axis`, so each device factors its own chunks' interiors; the
    reduced separator system (P blocks) is factored replicated.

    Single-chip use is ALSO profitable: the interior scan's POTRF/TRSM are
    batched over the P chunks, amortizing their serial column-latency
    (XLA's chol/TRSM at bs=2048 are latency- not flop-bound), at ~2x the
    sweep's flops but ~k/N of its sequential depth.

    `precision`: matmul precision for the TRSM/GEMM bulk.
    """
    N, bs = A.N, A.bs
    P = int(n_chunks)
    if N % P:
        raise ValueError(f"N={N} blocks not divisible into {P} chunks")
    k = N // P
    D = A.diag.reshape(P, k, bs, bs)
    # incoming-lower convention: Li[g] = A[g, g-1], Li[0] = 0 — length N
    Li = jnp.concatenate([jnp.zeros((1, bs, bs), A.dtype), A.lower], axis=0)
    Li = Li.reshape(P, k, bs, bs)

    def constrain(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        spec = [None] * x.ndim
        spec[0] = time_axis
        return lax.with_sharding_constraint(
            x, NamedSharding(mesh, Pspec(*spec))
        )

    D = constrain(D)
    Li = constrain(Li)

    if k == 1:
        red = btd_cholesky(A)
        z = jnp.zeros((P, 0, bs, bs), A.dtype)
        return DistBTDCholesky(z, z, z, red, A.n)

    def step(carry, inp):
        Dt, U, S = carry  # [P, bs, bs] each
        D_next, Li_next = inp
        L_i = jnp.linalg.cholesky(Dt)
        W_i = _tsolve(L_i, jnp.swapaxes(Li_next, -1, -2))
        V_i = _tsolve(L_i, U)
        Dt_next = D_next - jnp.swapaxes(W_i, -1, -2) @ W_i
        U_next = -jnp.swapaxes(W_i, -1, -2) @ V_i
        S = S + jnp.swapaxes(V_i, -1, -2) @ V_i
        return (Dt_next, U_next, S), (L_i, W_i, V_i)

    with jax.default_matmul_precision(precision):
        init = (D[:, 0], Li[:, 0], jnp.zeros((P, bs, bs), A.dtype))
        xs = (jnp.swapaxes(D[:, 1:], 0, 1), jnp.swapaxes(Li[:, 1:], 0, 1))
        (D_sep, U_sep, S), (Ls, Ws, Vs) = lax.scan(step, init, xs)
        Ls = constrain(jnp.swapaxes(Ls, 0, 1))
        Ws = constrain(jnp.swapaxes(Ws, 0, 1))
        Vs = constrain(jnp.swapaxes(Vs, 0, 1))
        # reduced separator system: diag[p] = D_sep[p] − S[p+1] (chunk p+1's
        # interior Schur lands on ITS previous separator = s_p);
        # lower[p] = A'[s_{p+1}, s_p] = U_sep[p+1] (U's k−1 row IS s_{p+1})
        S_shift = jnp.concatenate([S[1:], jnp.zeros_like(S[:1])], axis=0)
        diag_r = D_sep - S_shift
        lower_r = U_sep[1:]
        red = btd_cholesky(BTD(diag_r, lower_r, P * bs), precision=precision)
    return DistBTDCholesky(Ls, Ws, Vs, red, A.n)
