"""Global configuration helpers.

The reference stack runs in float64 on CPU (Julia defaults). Accuracy parity
(RMSE matched to ~1e-6, cf. BASELINE.md) requires f64 for the
information-form updates with observation precisions of 1e8..1e18
(`/root/reference/_research/burgers_chen24.jl:101`), so x64 is enabled
globally at import. TPU performance paths run explicitly in float32 (with
iterative refinement where needed) by passing `dtype=jnp.float32`.
"""

import os

import jax
import jax.numpy as jnp

_X64_ENABLED = False


def enable_x64() -> None:
    """Enable 64-bit JAX globally unless DIFFEQGMRFS_NO_X64 is set."""
    global _X64_ENABLED
    if os.environ.get("DIFFEQGMRFS_NO_X64"):
        return
    jax.config.update("jax_enable_x64", True)
    _X64_ENABLED = True


def default_float():
    """Default floating dtype for correctness-critical math."""
    if jax.config.jax_enable_x64:
        return jnp.float64
    return jnp.float32
