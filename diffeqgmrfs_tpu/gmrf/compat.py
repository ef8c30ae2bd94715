"""Reference-API parity helpers.

Small free functions matching names the reference consumes from
GaussianMarkovRandomFields.jl (SURVEY.md §2.3) that don't warrant their own
modules here.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from diffeqgmrfs_tpu.gmrf.gmrf import ConstrainedGMRF
from diffeqgmrfs_tpu.ops.btd import BTD


def constrainify_linear_system(A, y, x):
    """Rewrite an observation system (A, y) on full dofs onto the free dofs
    of a constrained GMRF: A -> A S, y -> y - A g.

    Analog of `constrainify_linear_system(A, y, x)`
    (`/root/reference/scripts/solve_burger.jl:120-123`).
    """
    if not isinstance(x, ConstrainedGMRF):
        return A, jnp.asarray(y)
    return x.affine.condense_rowop(A), jnp.asarray(y) - x.affine.offset_shift(A)


def transform_free_to_full(x, w):
    """Free-dof vector -> full-dof vector under x's constraints
    (`_research/burgers_chen24.jl:215,222`)."""
    if isinstance(x, ConstrainedGMRF):
        return x.affine.free_to_full(w)
    return jnp.asarray(w)


@dataclass
class LinearMapWithSqrt:
    """Precision operator carrying a square-root factor
    (`/root/reference/src/spdes/shallow_water.jl:194`).

    Q = Q_sqrt @ Q_sqrt^T; `sample_whitened(z) = solve-free` prior samples
    are not needed on the BTD path (the Cholesky factor plays this role),
    but the type is provided for construction parity.
    """

    Q: BTD
    Q_sqrt: object  # RowOp or dense

    def matvec(self, v):
        return self.Q.matvec(v)

    def sqrt_matvec(self, z):
        if hasattr(self.Q_sqrt, "matvec"):
            return self.Q_sqrt.matvec(z)
        return self.Q_sqrt @ jnp.asarray(z)
