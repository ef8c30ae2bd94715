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
    free_total: int | None = None  # free-space length incl. block padding

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
        """Full-dof vector -> free-space vector (padded layout aware)."""
        v = jnp.asarray(x_full)[..., self.free_dofs]
        npad = self.n_free_padded
        if npad == self.n_free:
            return v
        out = jnp.zeros(v.shape[:-1] + (npad,), dtype=v.dtype)
        return out.at[..., self.s_col[self.free_dofs]].set(v)

    def replicate(self, N_t: int, stride: int | None = None) -> "AffineMap":
        """Tile over N_t time blocks (space-time dof layout x[t*n_full + s]).

        `stride` (>= n_free, default n_free): spacing of time blocks in the
        FREE space — used when the spatial block is padded to an MXU-friendly
        size (free dofs t*stride + [0, n_free), inert padding above).
        """
        n, nf = self.n_full, self.n_free
        stride = nf if stride is None else int(stride)
        assert stride >= nf
        t = np.arange(N_t)
        s_col = (self.s_col[None, :] + t[:, None] * stride).reshape(-1)
        s_coef = np.tile(self.s_coef, N_t)
        g = np.tile(self.g, N_t)
        free = (self.free_dofs[None, :] + t[:, None] * n).reshape(-1)
        pres = (self.prescribed_dofs[None, :] + t[:, None] * n).reshape(-1)
        return AffineMap(
            s_col, s_coef, g, free.astype(np.int64), pres.astype(np.int64),
            free_total=stride * N_t,
        )

    @property
    def n_free_padded(self) -> int:
        """Total free-space length including block padding (== n_free when
        unpadded)."""
        return self.free_total if self.free_total is not None else self.n_free

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
        return RowOp(new_cols, A.vals * jnp.asarray(fac), self.n_free_padded)

    def offset_shift(self, A):
        """A @ g — the target shift for condensed observations
        (y_free = y - A g, reference `constrainify_linear_system`)."""
        return A.matvec(jnp.asarray(self.g))
