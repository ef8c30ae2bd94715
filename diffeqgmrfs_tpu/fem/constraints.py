"""Constraint handling: Dirichlet and affine (periodic) constraints.

TPU-native analog of Ferrite's `ConstraintHandler`/`AffineConstraint`/
`Dirichlet`/`apply!`/`prescribed_dofs` (SURVEY.md §2.3;
`/root/reference/src/utils.jl:5-18`, `_research/elliptic_chen24.jl:136-140`).

Each prescribed dof p satisfies x[p] = coef * x[master] + offset with at most
one master (this covers every constraint the reference uses: homogeneous /
inhomogeneous Dirichlet has no master; the 1D periodic constraint maps the
left boundary dof onto the right one with coef 1.0,
`src/utils.jl:17`). The handler materializes the affine embedding

    x_full = S @ x_free + g

as three static arrays, so that condensation of matrices (Sᵀ A S), right-hand
sides, and observation operators (A S) are cheap index remaps + value scalings
that jit-compile — the analog of Ferrite's `apply!` and of the reference's
`constrainify_linear_system` / `transform_free_to_full`
(`scripts/solve_burger.jl:120-123`, `_research/burgers_chen24.jl:215`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.dofs import DofHandler


@dataclass
class Dirichlet:
    """x[dof] = value on a node set, for one field."""

    field: str
    nodes: np.ndarray | str  # node indices or a mesh node-set name
    value: float | None = 0.0  # constant value, or use value_fn
    value_fn: object = None  # callable(coords [n,dim]) -> values [n]


@dataclass
class AffineConstraint:
    """x[constrained] = coef * x[master] + offset."""

    constrained_dof: int
    master_dof: int
    coef: float = 1.0
    offset: float = 0.0


class ConstraintHandler:
    def __init__(self, dofh: DofHandler, constraints=()):
        self.dofh = dofh
        self._constraints = list(constraints)
        self._closed = False

    def add(self, c):
        self._constraints.append(c)
        return self

    def close(self):
        dofh = self.dofh
        mesh = dofh.mesh
        n = dofh.ndofs
        # per-dof: master dof (-1 = none), coef, offset; NaN-free static arrays
        prescribed = np.zeros(n, dtype=bool)
        master = np.full(n, -1, dtype=np.int64)
        coef = np.zeros(n, dtype=np.float64)
        offset = np.zeros(n, dtype=np.float64)
        for c in self._constraints:
            if isinstance(c, Dirichlet):
                nodes = (
                    mesh.node_sets[c.nodes] if isinstance(c.nodes, str) else np.asarray(c.nodes)
                )
                dofs = dofh.node_dofs(c.field, nodes)
                prescribed[dofs] = True
                if c.value_fn is not None:
                    offset[dofs] = np.asarray(c.value_fn(mesh.coords[nodes]))
                else:
                    offset[dofs] = float(c.value)
            elif isinstance(c, AffineConstraint):
                p = int(c.constrained_dof)
                prescribed[p] = True
                master[p] = int(c.master_dof)
                coef[p] = float(c.coef)
                offset[p] = float(c.offset)
            else:
                raise TypeError(f"unknown constraint {type(c)}")
        self.prescribed_mask = prescribed
        self.prescribed_dofs = np.where(prescribed)[0].astype(np.int32)
        self.free_dofs = np.where(~prescribed)[0].astype(np.int32)
        self.n_free = self.free_dofs.shape[0]
        # full -> free index (-1 for prescribed)
        full_to_free = np.full(n, -1, dtype=np.int64)
        full_to_free[self.free_dofs] = np.arange(self.n_free)
        self.full_to_free = full_to_free
        # S matrix rows: for each full dof, (free col, coefficient)
        s_col = np.where(prescribed, np.where(master >= 0, full_to_free[np.maximum(master, 0)], -1), full_to_free)
        s_coef = np.where(prescribed, np.where(master >= 0, coef, 0.0), 1.0)
        # a prescribed dof whose master is itself prescribed is unsupported
        if np.any(prescribed & (master >= 0) & (s_col < 0)):
            raise ValueError("chained affine constraints are not supported")
        s_coef = np.where(s_col < 0, 0.0, s_coef)
        # dofs with no free image (pure Dirichlet) get a zero-valued pointer
        # to the NEAREST free dof, so condensed operators keep entries close
        # to the diagonal (bandwidth preservation for BTD scatter)
        if self.n_free == 0:
            raise ValueError("all dofs prescribed")
        nearest = np.searchsorted(self.free_dofs, np.arange(n))
        nearest = np.clip(nearest, 0, self.n_free - 1)
        self.s_col = np.where(s_col < 0, nearest, s_col).astype(np.int64)
        self.s_coef = s_coef
        self.g = np.where(prescribed, offset, 0.0)
        self.has_inhomogeneity = bool(np.any(self.g != 0.0))
        self._closed = True
        return self

    # -- affine embedding ---------------------------------------------------

    def free_to_full(self, x_free):
        """x_full = S x_free + g (reference `transform_free_to_full`)."""
        xf = jnp.asarray(x_free)
        batch_shape = xf.shape[:-1]
        full = jnp.asarray(self.s_coef) * xf[..., self.s_col] + jnp.asarray(self.g)
        return full.reshape(*batch_shape, -1)

    def full_to_free_values(self, x_full):
        """Restrict a full-dof vector to free dofs."""
        return jnp.asarray(x_full)[..., self.free_dofs]

    # -- condensation -------------------------------------------------------

    def condense_coo_structure(self, rows: np.ndarray, cols: np.ndarray):
        """Static part of Sᵀ A S for COO structure (rows, cols).

        Returns (free_rows, free_cols, factor) where the condensed entry value
        is v * factor; dropped entries get factor 0 and row/col 0.
        """
        fr = self.s_col[rows]
        fc = self.s_col[cols]
        fac = self.s_coef[rows] * self.s_coef[cols]
        return fr.astype(np.int32), fc.astype(np.int32), fac

    def condense_rows_structure(self, cols: np.ndarray):
        """Static part of A S for row-supported operators: remap columns.

        Returns (free_cols, factor): observation row entries A[r, j] become
        A_free[r, full_to_free(j)] * coef(j); the inhomogeneity shifts the
        target: y_free = y - A @ g (use `g` below).
        """
        return self.s_col[cols].astype(np.int32), self.s_coef[cols]
