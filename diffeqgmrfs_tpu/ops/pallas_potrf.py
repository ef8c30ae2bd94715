"""Pallas blocked POTRF with panel inverses: the factor-phase MXU kernel.

XLA's `jnp.linalg.cholesky` / `triangular_solve` on TPU serialize over
columns with an HBM round-trip per iteration — measured ~0.5 us/column
regardless of shape, batching, or panel blocking (RESULTS.md round-2
probes): chol[2048] ~1.1 ms and TRSM[2048] ~1.1 ms vs ~0.13/0.38 ms
MXU-ideal, and these dominate the BTD factor sweep
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

Layout: panels of P=256; micro-blocks of M=32 inside a panel. The L
output buffer doubles as the working storage for not-yet-factored
panels (trailing updates write into it; panel k>0 reads from it).
"""

from __future__ import annotations

from functools import partial

import numpy as np
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


def _chol_small(A):
    """Lower Cholesky of an [m, m] value by sequential columns (runs on
    VMEM-resident values inside the kernel; m = MICRO)."""
    m = A.shape[0]
    idx = jnp.arange(m)

    def step(j, A):
        inv = lax.rsqrt(A[j, j])
        col = jnp.where(idx >= j, A[:, j] * inv, 0.0)
        A = A.at[:, j].set(col)
        cm = jnp.where(idx > j, col, 0.0)
        return A - cm[:, None] * cm[None, :]

    A = lax.fori_loop(0, m, step, A)
    return jnp.tril(A)


def _inv_lower_small(L):
    """L^{-1} for [m, m] lower triangular by forward substitution."""
    m = L.shape[0]
    idx = jnp.arange(m)

    def step(j, X):
        lrow = jnp.where(idx < j, L[j, :], 0.0)
        row = (jnp.where(idx == j, 1.0, 0.0) - lrow @ X) / L[j, j]
        return X.at[j, :].set(row)

    return lax.fori_loop(0, m, step, jnp.zeros_like(L))


def _chol_panel(Ap):
    """[P, P] value -> (L lower, Winv = L^{-1}): micro-blocked right-looking
    factorization; micro TRSMs/trailing updates are MXU GEMMs."""
    P = Ap.shape[0]
    nM = P // MICRO
    A = Ap
    L = jnp.zeros_like(Ap)
    for mb in range(nM):
        o = mb * MICRO
        Ab = lax.dynamic_slice(A, (o, o), (MICRO, MICRO))
        Lb = _chol_small(Ab)
        Wb = _inv_lower_small(Lb)
        L = lax.dynamic_update_slice(L, Lb, (o, o))
        r = P - o - MICRO
        if r > 0:
            below = lax.dynamic_slice(A, (o + MICRO, o), (r, MICRO))
            Lbelow = jnp.dot(below, Wb.T, preferred_element_type=A.dtype)
            L = lax.dynamic_update_slice(L, Lbelow, (o + MICRO, o))
            trail = lax.dynamic_slice(A, (o + MICRO, o + MICRO), (r, r))
            trail = trail - jnp.dot(
                Lbelow, Lbelow.T, preferred_element_type=A.dtype
            )
            A = lax.dynamic_update_slice(A, trail, (o + MICRO, o + MICRO))
    # Winv by blocked forward substitution against I using micro inverses:
    # X[o-block rows] = Wb @ (I_rows - L[o, :o] X[:o])
    X = jnp.zeros_like(Ap)
    eye = jnp.eye(P, dtype=Ap.dtype)
    for mb in range(nM):
        o = mb * MICRO
        Lb = lax.dynamic_slice(L, (o, o), (MICRO, MICRO))
        Wb = _inv_lower_small(Lb)
        rhs = lax.dynamic_slice(eye, (o, 0), (MICRO, P))
        if o > 0:
            Lleft = lax.dynamic_slice(L, (o, 0), (MICRO, o))
            rhs = rhs - jnp.dot(
                Lleft, X[:o, :], preferred_element_type=Ap.dtype
            )
        X = lax.dynamic_update_slice(
            X, jnp.dot(Wb, rhs, preferred_element_type=Ap.dtype), (o, 0)
        )
    return L, X


def _potrf_kernel(n, nP, A_ref, L_ref, W_ref, colbuf, stripbuf, sem):
    P = PANEL

    def dma(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    for k in range(nP):
        o = k * P
        rows = n - o
        src = A_ref if k == 0 else L_ref
        dma(src.at[pl.ds(o, rows), pl.ds(o, P)], colbuf.at[pl.ds(0, rows)])
        Lp, Wp = _chol_panel(colbuf[0:P, :])
        colbuf[0:P, :] = Lp
        W_ref_slot = W_ref.at[k]
        if rows > P:
            below = colbuf[pl.ds(P, rows - P), :]
            colbuf[pl.ds(P, rows - P), :] = jnp.dot(
                below, Wp.T, preferred_element_type=below.dtype
            )
        # write the finished L column panel
        dma(colbuf.at[pl.ds(0, rows)], L_ref.at[pl.ds(o, rows), pl.ds(o, P)])
        # store the panel inverse
        stripbuf[0:P, :] = Wp
        dma(stripbuf.at[pl.ds(0, P)], W_ref_slot)
        # trailing SYRK: one GEMM per remaining column strip (strips read
        # the ORIGINAL A at k=0; afterwards the L buffer holds the updated
        # working values)
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
            ] - jnp.dot(lc, lpan.T, preferred_element_type=lc.dtype)
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
