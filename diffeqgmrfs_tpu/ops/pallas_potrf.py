"""Pallas blocked POTRF with panel inverses: the factor-phase MXU kernel.

XLA's `jnp.linalg.cholesky` / `triangular_solve` on TPU serialize over
columns with an HBM round-trip per iteration — slope-timed ~0.4-0.6 ms
for chol[2048] f32 on v5e vs ~0.1 ms MXU-ideal (RESULTS.md round-2
probes), and the POTRF is the serial bottleneck of the BTD factor sweep
(`/root/reference/src/tridiagonal_cholesky.jl:65-82` is the algorithm
being accelerated).

This kernel runs the whole factorization of one [n, n] block inside ONE
Pallas program: column panels stream HBM->VMEM via DMA, the serial
micro-Cholesky chains run on VMEM-resident values (no per-column HBM
sync), panel TRSMs ride precomputed micro-inverses as MXU GEMMs, and the
trailing SYRK streams column strips with one GEMM each. It additionally
emits W_k = L_kk^{-1} for every diagonal panel — with those, every later
TRSM against this factor (the sweep's C_i = B_i L^{-T}, forward/backward
solves) becomes a short chain of GEMMs (`tsolve_right_T_winv`).

Mosaic lowering constraints shape the implementation: no dynamic_slice /
scatter on VALUES (only refs support slicing), no 1D iota. The micro
Cholesky/triangular-inverse therefore use onehot-mask + matmul column
extraction (`_chol_micro` / `_inv_lower_micro`), and the panel loop
reads/writes static slices of the VMEM scratch refs in place.

Layout: panels of P=256; micro-blocks of M=32 inside a panel. The L
output buffer doubles as the working storage for not-yet-factored
panels (trailing updates write into it; panel k>0 reads from it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl

try:  # pragma: no cover - TPU-only import
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

PANEL = 256
MICRO = 32


def _mm(a, b):
    # precision pinned: Mosaic's dot lowering rejects HIGH (3-pass), which
    # an ambient jax.default_matmul_precision("tensorfloat32") would set
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _chol_micro(A):
    """Lower Cholesky of an [m, m] SPD value by m masked outer-product
    steps (fori_loop). Column extraction via matmul with onehot vectors —
    Mosaic supports no dynamic slicing on values."""
    m = A.shape[0]
    rowi = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    coli = lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def step(j, carry):
        A, L = carry
        ejc = (rowi == j).astype(A.dtype)  # [m, 1] onehot column
        ejr = (coli == j).astype(A.dtype)  # [1, m] onehot row
        col = _mm(A, ejc)  # [m, 1] = A[:, j]
        piv = _mm(ejr, col)  # [1, 1] = A[j, j]
        inv = lax.rsqrt(piv)
        colv = col * inv
        Lcol = jnp.where(rowi >= j, colv, 0.0)
        L = L + Lcol * ejr  # write column j
        # symmetric trailing update: A -= c c^T on the strict submatrix
        cm = jnp.where(rowi > j, colv, 0.0)  # [m, 1]
        rowv = _mm(ejr, A) * inv  # [1, m] = A[j, :] / sqrt(piv)
        rm = jnp.where(coli > j, rowv, 0.0)  # [1, m]
        A = A - cm * rm
        return A, L

    _, L = lax.fori_loop(0, m, step, (A, jnp.zeros_like(A)))
    return L


def _inv_lower_micro(L):
    """L^{-1} for an [m, m] lower-triangular value by masked forward
    substitution rows (fori_loop; same no-value-slicing constraints)."""
    m = L.shape[0]
    rowi = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    coli = lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def step(j, X):
        ejc = (rowi == j).astype(L.dtype)
        ejr = (coli == j).astype(L.dtype)
        Lrow = _mm(ejr, L)  # [1, m] = L[j, :]
        piv = _mm(Lrow, ejc)  # [1, 1] = L[j, j]
        Lrow_strict = jnp.where(coli < j, Lrow, 0.0)
        row = (ejr - _mm(Lrow_strict, X)) / piv
        return X + ejc * row

    return lax.fori_loop(0, m, step, jnp.zeros_like(L))


def _eye_rows(mo, m, P, dtype):
    """[m, P] slice rows mo..mo+m of the PxP identity (2D iota only)."""
    r = lax.broadcasted_iota(jnp.int32, (m, P), 0)
    c = lax.broadcasted_iota(jnp.int32, (m, P), 1)
    return (c == r + mo).astype(dtype)


def _potrf_kernel(n, nP, A_ref, L_ref, W_ref, colbuf, stripbuf, sem):
    P = PANEL
    nM = P // MICRO
    M = MICRO

    def dma(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    for k in range(nP):
        o = k * P
        rows = n - o
        src = A_ref if k == 0 else L_ref
        dma(src.at[pl.ds(o, rows), pl.ds(o, P)], colbuf.at[pl.ds(0, rows)])

        # ---- factor the top [P, P] square of colbuf in place ----
        for mb in range(nM):
            mo = mb * M
            Lb = _chol_micro(colbuf[mo : mo + M, mo : mo + M])
            colbuf[mo : mo + M, mo : mo + M] = Lb
            rem = P - mo - M
            if rem > 0:
                Wb = _inv_lower_micro(Lb)
                below = colbuf[mo + M : P, mo : mo + M]
                Lbelow = _mm(below, Wb.T)
                colbuf[mo + M : P, mo : mo + M] = Lbelow
                trail = colbuf[mo + M : P, mo + M : P]
                colbuf[mo + M : P, mo + M : P] = trail - _mm(
                    Lbelow, Lbelow.T
                )

        # ---- panel inverse Wp = Lp^{-1} into stripbuf[0:P, :] ----
        for mb in range(nM):
            mo = mb * M
            Lb = colbuf[mo : mo + M, mo : mo + M]
            Wb = _inv_lower_micro(Lb)
            rhs = _eye_rows(mo, M, P, Lb.dtype)
            if mo > 0:
                Lleft = colbuf[mo : mo + M, 0:mo]
                rhs = rhs - _mm(Lleft, stripbuf[0:mo, 0:P])
            stripbuf[mo : mo + M, 0:P] = _mm(Wb, rhs)

        # ---- below-panel column: L[o+P:, o:o+P] = A[o+P:, o:o+P] Wp^T ----
        if rows > P:
            below = colbuf[pl.ds(P, rows - P), :]
            colbuf[pl.ds(P, rows - P), :] = _mm(below, stripbuf[0:P, 0:P].T)

        # write the finished L column panel + the panel inverse
        dma(colbuf.at[pl.ds(0, rows)], L_ref.at[pl.ds(o, rows), pl.ds(o, P)])
        dma(stripbuf.at[pl.ds(0, P)], W_ref.at[k])

        # ---- trailing SYRK: one GEMM per remaining column strip ----
        # (strips read the ORIGINAL A at k=0; afterwards the L buffer
        # holds the updated working values)
        for c in range(k + 1, nP):
            co = c * P
            crows = n - co
            dma(
                src.at[pl.ds(co, crows), pl.ds(co, P)],
                stripbuf.at[pl.ds(0, crows)],
            )
            lc = colbuf[pl.ds(co - o, crows), :]
            lpan = colbuf[pl.ds(co - o, P), :]
            stripbuf[pl.ds(0, crows), :] = stripbuf[
                pl.ds(0, crows), :
            ] - _mm(lc, lpan.T)
            dma(
                stripbuf.at[pl.ds(0, crows)],
                L_ref.at[pl.ds(co, crows), pl.ds(co, P)],
            )


def potrf_winv(A, interpret: bool = False):
    """Lower Cholesky of SPD A [n, n] (f32) -> (L, Winv [n/P, P, P]).

    n must be a multiple of PANEL. The strict upper triangle of L contains
    scratch garbage — consumers must tril() (matching LAPACK semantics).
    """
    n = A.shape[-1]
    if n % PANEL:
        raise ValueError(f"n={n} must be a multiple of {PANEL}")
    nP = n // PANEL
    # Mosaic kernels traced under jax_enable_x64=True fail the relay's AOT
    # compile helper (see ops/pallas_btd._sweep); trace f32 kernels with
    # x64 locally disabled
    import contextlib

    ctx = (
        jax.enable_x64(False)
        if A.dtype == jnp.float32 and not interpret
        else contextlib.nullcontext()
    )
    with ctx:
        return _potrf_call(A, n, nP, interpret)


def _potrf_call(A, n, nP, interpret):
    kernel = partial(_potrf_kernel, n, nP)
    L, W = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), A.dtype),
            jax.ShapeDtypeStruct((nP, PANEL, PANEL), A.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, PANEL), A.dtype),
            pltpu.VMEM((n, PANEL), A.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=bool(interpret),
    )(A)
    return L, W


def tsolve_right_T_winv(L, Winv, B):
    """C = B L^{-T} via panel GEMMs using the precomputed panel inverses:
    column-panel forward sweep, no TRSM anywhere."""
    n = L.shape[-1]
    P = PANEL
    nP = n // P
    C = jnp.zeros_like(B)
    for k in range(nP):
        o = k * P
        Bk = B[..., :, o : o + P]
        if k:
            # subtract C[:, :o] @ L[o:o+P, :o]^T
            Bk = Bk - C[..., :, :o] @ jnp.swapaxes(
                L[o : o + P, :o], -1, -2
            )
        C = C.at[..., :, o : o + P].set(Bk @ jnp.swapaxes(Winv[k], -1, -2))
    return C
