"""Affine embeddings between free and full dof spaces.

`AffineMap` materializes x_full = S x_free + g with at-most-one master per
constrained dof (covers Dirichlet + periodic; see fem/constraints.py). It is
the constraint object `ConstrainedGMRF` carries, and it replicates over the
time axis for spatiotemporal GMRFs (each time block shares the spatial
constraints — cf. the per-time prescribed-dof loop at
`/root/reference/src/spdes/shallow_water.jl:203-207`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class AffineMap:
    s_col: np.ndarray  # [n_full] int: free index feeding each full dof (0 if none)
    s_coef: np.ndarray  # [n_full] float: coefficient (0 if constant dof)
    g: np.ndarray  # [n_full] float: offset
    free_dofs: np.ndarray  # [n_free] int
    prescribed_dofs: np.ndarray  # [n_pres] int

    @property
    def n_full(self) -> int:
        return self.s_col.shape[0]

    @property
    def n_free(self) -> int:
        return self.free_dofs.shape[0]

    @classmethod
    def from_constraint_handler(cls, ch) -> "AffineMap":
        return cls(
            s_col=ch.s_col,
            s_coef=ch.s_coef,
            g=ch.g,
            free_dofs=ch.free_dofs,
            prescribed_dofs=ch.prescribed_dofs,
        )

    def free_to_full(self, x_free):
        """x_full = S x_free + g (`transform_free_to_full`,
        `/root/reference/_research/burgers_chen24.jl:215`)."""
        xf = jnp.asarray(x_free)
        return jnp.asarray(self.s_coef) * xf[..., self.s_col] + jnp.asarray(self.g)

    def free_to_full_linear(self, x_free):
        """S x_free without the offset (for stds / samples around the mean)."""
        xf = jnp.asarray(x_free)
        return jnp.asarray(self.s_coef) * xf[..., self.s_col]

    def restrict(self, x_full):
        """Select free-dof entries."""
        return jnp.asarray(x_full)[..., self.free_dofs]

    def replicate(self, N_t: int) -> "AffineMap":
        """Tile over N_t time blocks (space-time dof layout x[t*n_full + s])."""
        n, nf = self.n_full, self.n_free
        t = np.arange(N_t)
        s_col = (self.s_col[None, :] + t[:, None] * nf).reshape(-1)
        s_coef = np.tile(self.s_coef, N_t)
        g = np.tile(self.g, N_t)
        free = (self.free_dofs[None, :] + t[:, None] * n).reshape(-1)
        pres = (self.prescribed_dofs[None, :] + t[:, None] * n).reshape(-1)
        return AffineMap(s_col, s_coef, g, free.astype(np.int64), pres.astype(np.int64))

    def condense_rowop(self, A):
        """A -> A S (column remap into free space).

        Works both host-side (NumPy cols, keeps structure static) and under
        trace (cols passed through a jit signature)."""
        from diffeqgmrfs_tpu.fem.operators import RowOp

        if isinstance(A.cols, np.ndarray):
            new_cols = self.s_col[A.cols].astype(np.int32)
            fac = self.s_coef[A.cols]
        else:
            new_cols = jnp.asarray(self.s_col, dtype=jnp.int32)[A.cols]
            fac = jnp.asarray(self.s_coef)[A.cols]
        return RowOp(new_cols, A.vals * jnp.asarray(fac), self.n_free)

    def offset_shift(self, A):
        """A @ g — the target shift for condensed observations
        (y_free = y - A g, reference `constrainify_linear_system`)."""
        return A.matvec(jnp.asarray(self.g))
