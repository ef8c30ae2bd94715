"""Block-tridiagonal Cholesky: the MXU north-star kernel.

TPU-native re-design of the reference's `tridiagonal_cholesky`
(`/root/reference/src/tridiagonal_cholesky.jl:65-82`) and of the CHOLMOD
factorizations it replaces: a sequential sweep over time/band blocks where
each step is dense POTRF + TRSM + SYRK on [bs, bs] blocks —

    L_1 = chol(D_1)
    C_i = B_i L_{i-1}^{-T}          (TRSM)           [tridiagonal_cholesky.jl:74]
    L_i = chol(D_i - C_i C_i^T)     (SYRK + POTRF)   [tridiagonal_cholesky.jl:77]

expressed as a `lax.scan` whose body is jnp.linalg.cholesky /
triangular_solve / matmul, which XLA maps onto the MXU. Forward/backward
block solves (`forward_solve`/`backward_solve`,
`tridiagonal_cholesky.jl:24-52`) are scans with a [bs, k] GEMM per step and
batch over right-hand sides — posterior mean solves, joint samples, and RBMC
variance probes all ride the same kernels.

The factor L is block lower-bidiagonal: A = L L^T with L[i,i] = L_i (dense
lower-triangular) and L[i+1,i] = C_i.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.btd import BTD


def _tsolve(L, b, *, trans=False):
    """Solve L x = b (or L^T x = b) with L dense lower-triangular."""
    return lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=trans
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class BTDCholesky:
    """Cholesky factor of a symmetric positive-definite BTD matrix."""

    Ls: jnp.ndarray  # [N, bs, bs] lower-triangular diagonal blocks
    Cs: jnp.ndarray  # [N-1, bs, bs] subdiagonal blocks of L
    n: int

    def tree_flatten(self):
        return (self.Ls, self.Cs), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def N(self):
        return self.Ls.shape[0]

    @property
    def bs(self):
        return self.Ls.shape[1]

    @property
    def dtype(self):
        return self.Ls.dtype

    # -- block vector plumbing ----------------------------------------------

    def _to_blocks(self, b):
        """[..., n] -> [N, bs, k] with batch dims flattened into k."""
        b = jnp.asarray(b)
        batch_shape = b.shape[:-1]
        k = 1
        for s in batch_shape:
            k *= s
        bb = b.reshape(k, b.shape[-1]).T  # [n, k]
        pad = self.N * self.bs - b.shape[-1]
        if pad:
            bb = jnp.pad(bb, ((0, pad), (0, 0)))
        return bb.reshape(self.N, self.bs, k), batch_shape

    def _from_blocks(self, xb, batch_shape):
        x = xb.reshape(self.N * self.bs, -1)[: self.n]  # [n, k]
        return x.T.reshape(*batch_shape, self.n)

    # -- solves --------------------------------------------------------------

    def forward_solve(self, b):
        """Solve L y = b. (reference forward_solve :43-52)"""
        with jax.default_matmul_precision("float32"):
            bb, batch_shape = self._to_blocks(b)
            x0 = _tsolve(self.Ls[0], bb[0])

            def step(x_prev, inp):
                L_i, C_im1, b_i = inp
                x_i = _tsolve(L_i, b_i - C_im1 @ x_prev)
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(step, x0, (self.Ls[1:], self.Cs, bb[1:]))
                xb = jnp.concatenate([x0[None], xs], axis=0)
            else:
                xb = x0[None]
            return self._from_blocks(xb, batch_shape)

    def backward_solve(self, b):
        """Solve L^T x = b. (reference backward_solve :24-33)"""
        with jax.default_matmul_precision("float32"):
            bb, batch_shape = self._to_blocks(b)
            xN = _tsolve(self.Ls[-1], bb[-1], trans=True)

            def step(x_next, inp):
                L_i, C_i, b_i = inp
                x_i = _tsolve(L_i, b_i - C_i.T @ x_next, trans=True)
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(
                    step, xN, (self.Ls[:-1], self.Cs, bb[:-1]), reverse=True
                )
                xb = jnp.concatenate([xs, xN[None]], axis=0)
            else:
                xb = xN[None]
            return self._from_blocks(xb, batch_shape)

    def solve(self, b):
        """Solve A x = b (forward then backward; reference ldiv :54-63)."""
        return self.backward_solve(self.forward_solve(b))

    # -- derived quantities --------------------------------------------------

    def log_det(self):
        """log det A = 2 sum log diag(L). Padding contributes log(1)=0.

        Used for NLL (`scripts/burgers/solve_burgers_gmrf-collocation.jl:209`).
        """
        d = jnp.diagonal(self.Ls, axis1=-2, axis2=-1)
        return 2.0 * jnp.sum(jnp.log(d))

    def sample_zero_mean(self, key, n_samples: int = 1):
        """Samples from N(0, A^{-1}) via x = L^{-T} z, z ~ N(0, I).

        The factor-backsolve-on-white-noise sampler the reference uses
        (`rand(rng, x_cond)`, SURVEY.md §3.1).
        """
        z = jax.random.normal(key, (n_samples, self.n), dtype=self.dtype)
        return self.backward_solve(z)

    def nnz(self) -> int:
        return int(self.Ls.size + self.Cs.size)


def btd_cholesky_pallas(
    A: BTD, interpret: bool = False, precision: str = "float32"
) -> BTDCholesky:
    """BTD factor sweep with the Pallas panel-streamed POTRF
    (ops/pallas_potrf.py): the per-block chol runs in one VMEM-resident
    kernel (no per-column HBM sync) and emits panel inverses, so the
    sweep's TRSM C_i = B_i L^{-T} is a short GEMM chain. f32, block size
    a multiple of 256.

    `precision`: matmul precision for the GEMM bulk (TRSM chain + SYRK):
    "float32" (6-pass, full f32) or "tensorfloat32" (3-pass — measured
    2.1x the GEMM rate on v5e; factor error stays within the refinement
    paths' contract, see tests/test_cholesky.py precision tests).
    """
    from diffeqgmrfs_tpu.ops.pallas_potrf import (
        potrf_winv,
        tsolve_right_T_winv,
    )

    with jax.default_matmul_precision(precision):
        L0, W0 = potrf_winv(A.diag[0], interpret=interpret)
        L0 = jnp.tril(L0)
        if A.N == 1:
            return BTDCholesky(L0[None], A.lower, A.n)

        def step(carry, inp):
            L_prev, W_prev = carry
            D_i, B_i = inp
            C = tsolve_right_T_winv(L_prev, W_prev, B_i)
            S = D_i - C @ C.T
            L_i, W_i = potrf_winv(S, interpret=interpret)
            L_i = jnp.tril(L_i)
            return (L_i, W_i), (L_i, C)

        _, (Ls, Cs) = lax.scan(step, (L0, W0), (A.diag[1:], A.lower))
        return BTDCholesky(jnp.concatenate([L0[None], Ls], axis=0), Cs, A.n)


def _panel_winv(L, panel: int):
    """Inverses of the diagonal [panel, panel] blocks of lower-triangular
    L [bs, bs] -> [bs/panel, panel, panel], via one BATCHED triangular
    solve (the batched column loop amortizes the serial latency across
    panels). With these, any TRSM against L becomes a GEMM chain
    (`tsolve_right_T_winv` / `tsolve_left_winv`)."""
    bs = L.shape[-1]
    nP = bs // panel
    Ld = L.reshape(nP, panel, nP, panel)
    panels = jnp.moveaxis(jnp.diagonal(Ld, axis1=0, axis2=2), -1, 0)
    eye = jnp.broadcast_to(
        jnp.eye(panel, dtype=L.dtype), (nP, panel, panel)
    )
    return lax.linalg.triangular_solve(
        panels, eye, left_side=True, lower=True
    )


def tsolve_right_T_panels(L, Winv, B, panel: int):
    """C = B L^{-T} as a column-panel GEMM chain with precomputed panel
    inverses (no TRSM on the critical path; rides the ambient matmul
    precision)."""
    n = L.shape[-1]
    nP = n // panel
    C = jnp.zeros_like(B)
    for k in range(nP):
        o = k * panel
        Bk = B[..., :, o : o + panel]
        if k:
            Bk = Bk - C[..., :, :o] @ jnp.swapaxes(L[o : o + panel, :o], -1, -2)
        C = C.at[..., :, o : o + panel].set(
            Bk @ jnp.swapaxes(Winv[k], -1, -2)
        )
    return C


def btd_cholesky(
    A: BTD,
    panel: int | None = None,
    precision: str = "float32",
    winv_trsm: int | None = None,
    unroll: int = 1,
) -> BTDCholesky:
    """Factor a symmetric positive-definite BTD matrix.

    Direct TPU analog of `/root/reference/src/tridiagonal_cholesky.jl:65-82`.
    Matmuls are pinned to true-f32 precision: TPU "default" matmul precision
    is bf16 passes, which would silently degrade the factor (and stall the
    mixed-precision refinement loop).

    `panel`: use blocked-panel POTRF/TRSM (ops/blocked_factor.py) inside the
    sweep — the slow monolithic chol/TRSM shrink to [panel, panel] while the
    trailing updates become MXU-rate GEMMs. Defaults to monolithic (None);
    production factor phases at bs >= ~1024 set it via the blueprint.

    `precision`: matmul precision for TRSM/SYRK ("float32" = full f32
    6-pass, "tensorfloat32" = 3-pass at ~2.1x the GEMM rate).

    `winv_trsm`: replace the sweep's TRSM with a panel-inverse GEMM chain
    of this panel size (slope-measured ~8x over the monolithic TRSM on
    v5e at bs=2048; one batched [bs/p, p, p] triangular solve per block
    computes the inverses).
    """
    if winv_trsm:
        # the panel-inverse chain needs panel | bs: shrink to the largest
        # divisor; if only tiny divisors exist (e.g. prime bs) the chain
        # degenerates to a latency-bound column loop — use the plain TRSM
        pw = int(winv_trsm)
        if A.bs % pw:
            pw = max(d for d in range(1, pw + 1) if A.bs % d == 0)
        if pw < 32:
            winv_trsm = None
    if winv_trsm:
        if panel:
            from diffeqgmrfs_tpu.ops.blocked_factor import blocked_cholesky

            chol = lambda X: blocked_cholesky(X, panel)  # noqa: E731
        else:
            chol = jnp.linalg.cholesky
        with jax.default_matmul_precision(precision):
            if A.N == 1:
                L0 = chol(A.diag[0])
                return BTDCholesky(L0[None], A.lower, A.n)
            L0 = chol(A.diag[0])
            W0 = _panel_winv(L0, pw)

            def step(carry, inp):
                L_prev, W_prev = carry
                D_i, B_i = inp
                C = tsolve_right_T_panels(L_prev, W_prev, B_i, pw)
                S = D_i - C @ C.T
                L_i = chol(S)
                W_i = _panel_winv(L_i, pw)
                return (L_i, W_i), (L_i, C)

            _, (Ls, Cs) = lax.scan(
                step, (L0, W0), (A.diag[1:], A.lower), unroll=unroll
            )
            return BTDCholesky(jnp.concatenate([L0[None], Ls], 0), Cs, A.n)

    if panel:
        from diffeqgmrfs_tpu.ops.blocked_factor import (
            blocked_cholesky,
            blocked_tsolve_right_T,
        )

        chol = lambda X: blocked_cholesky(X, panel)  # noqa: E731
        tsr = lambda L, B: blocked_tsolve_right_T(L, B, panel)  # noqa: E731
    else:
        chol = jnp.linalg.cholesky

        def tsr(L, B):
            return lax.linalg.triangular_solve(
                L, B, left_side=False, lower=True, transpose_a=True
            )

    with jax.default_matmul_precision(precision):
        if A.N == 1:
            L0 = chol(A.diag[0])
            return BTDCholesky(L0[None], A.lower, A.n)

        L0 = chol(A.diag[0])

        def step(L_prev, inp):
            D_i, B_i = inp
            # C_i = B_i L_{i-1}^{-T}:  solve C L_prev^T = B_i
            C = tsr(L_prev, B_i)
            S = D_i - C @ C.T
            L_i = chol(S)
            return L_i, (L_i, C)

        _, (Ls, Cs) = lax.scan(
            step, L0, (A.diag[1:], A.lower), unroll=unroll
        )
        return BTDCholesky(jnp.concatenate([L0[None], Ls], axis=0), Cs, A.n)
