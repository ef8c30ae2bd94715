"""Pallas TPU kernels for block-tridiagonal sweeps.

The substitution sweeps (forward/backward solves) are chains of per-block
GEMMs with a loop-carried [bs, k] state. Under XLA's `lax.scan` each step is
a separate kernel launch with HBM round-trips for the carry; these Pallas
kernels fuse the whole sweep into ONE kernel: the carry lives in VMEM
scratch (which persists across sequential grid steps on TPU), and the
per-step W_i = L_i^{-1} / C_i blocks stream in through the BlockSpec
pipeline (double-buffered by the Pallas runtime).

Applicable when one block row fits VMEM (bs <= ~1024 in f32); callers fall
back to the XLA scan path otherwise (`BTDInverseSolver`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; CPU interpreter works without them
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _fwd_kernel(W_ref, C_ref, b_ref, out_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry[...])

    t = b_ref[0] - jnp.dot(C_ref[0], carry[...], preferred_element_type=carry.dtype)
    x = jnp.dot(W_ref[0], t, preferred_element_type=carry.dtype)
    carry[...] = x
    out_ref[0] = x


def _bwd_kernel(W_ref, C_ref, b_ref, out_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry[...])

    t = b_ref[0] - jnp.dot(
        C_ref[0].T, carry[...], preferred_element_type=carry.dtype
    )
    x = jnp.dot(W_ref[0].T, t, preferred_element_type=carry.dtype)
    carry[...] = x
    out_ref[0] = x


def _sweep(kernel, Ws, Cs, b, reverse: bool, interpret: bool):
    """Run a fused substitution sweep. b: [N, bs, k] blocks."""
    if pltpu is None:
        raise RuntimeError("pallas tpu backend unavailable")
    N, bs, k = b.shape
    dtype = b.dtype
    if reverse:
        # backward step at block i couples through C_i (to x_{i+1});
        # pad a dummy at the end so block N-1 (first grid step) reads zeros
        c_arr = jnp.concatenate([Cs, jnp.zeros((1, bs, bs), dtype=Cs.dtype)], 0)
        idx = lambda i: (N - 1 - i, 0, 0)
    else:
        # forward step at block i couples through C_{i-1}; dummy at the front
        c_arr = jnp.concatenate([jnp.zeros((1, bs, bs), dtype=Cs.dtype), Cs], 0)
        idx = lambda i: (i, 0, 0)

    # Mosaic kernels traced with jax_enable_x64=True fail remote (AOT)
    # compilation (tpu_compile_helper exit 1, verified by bisection: the
    # identical kernel compiles with x64 off). f32 sweeps (the TPU path)
    # are traced with x64 locally disabled — outer f64 program semantics
    # are unaffected (tracers keep their dtypes). f64 sweeps (CPU
    # interpreter tests) must NOT use the context: x64-off downgrades the
    # f64 out_shape/scratch requests to f32 and the kernel refs mismatch.
    import contextlib

    ctx = (
        jax.enable_x64(False)
        if dtype == jnp.float32
        else contextlib.nullcontext()
    )
    with ctx:
        return pl.pallas_call(
            kernel,
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, bs, bs), idx),
                pl.BlockSpec((1, bs, bs), idx),
                pl.BlockSpec((1, bs, k), idx),
            ],
            out_specs=pl.BlockSpec((1, bs, k), idx),
            out_shape=jax.ShapeDtypeStruct((N, bs, k), dtype),
            scratch_shapes=[pltpu.VMEM((bs, k), dtype)],
            interpret=interpret,
        )(Ws, c_arr, b)


def pallas_forward_solve(Ws, Cs, b, interpret: bool = False):
    """Solve L y = b with L_i^{-1} = Ws[i]; b: [N, bs, k] blocks."""
    return _sweep(_fwd_kernel, Ws, Cs, b, reverse=False, interpret=interpret)


def pallas_backward_solve(Ws, Cs, b, interpret: bool = False):
    """Solve L^T x = b; sweeps blocks in reverse."""
    return _sweep(_bwd_kernel, Ws, Cs, b, reverse=True, interpret=interpret)


def pallas_solve(Ws, Cs, b, interpret: bool = False):
    """Full A^{-1} b = L^{-T} L^{-1} b on block vectors [N, bs, k]."""
    return pallas_backward_solve(
        Ws, Cs, pallas_forward_solve(Ws, Cs, b, interpret), interpret
    )
