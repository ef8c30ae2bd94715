"""Banded matrices in diagonal (LAPACK-style) storage — traced operator algebra.

SPDE precision construction chains sparse products like
Q = K^T M^{-1} K (Lindgren-Rue; visible in the reference's in-repo analog
`/root/reference/src/spdes/shallow_water.jl:177-190`). When the operator
values are *traced* (e.g. the Burgers advection-diffusion prior depends on
the per-instance bulk speed, `scripts/burgers/solve_burgers_gmrf-fem.jl:88-99`),
host-side scipy is unavailable — so products run in JAX on banded storage:

    band[i, b + o] = A[i, i + o],  o in [-b, b]

Banded x banded multiply is (2bA+1)(2bB+1) elementwise length-n multiplies —
cheap for the small 1D bandwidths involved (b <= ~6) and fully jit/vmappable.
The final precision scatters into BTD block storage via a static index map.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.ops.btd import BTD, make_btd_pattern, BTDPattern


def _shift(x, o):
    """y[i] = x[i + o] with zero fill (static o)."""
    if o == 0:
        return x
    n = x.shape[-1]
    z = jnp.zeros_like(x)
    if o > 0:
        return z.at[..., : n - o].set(x[..., o:])
    return z.at[..., -o:].set(x[..., :n + o])


@jax.tree_util.register_pytree_node_class
@dataclass
class Banded:
    """n x n banded matrix, A[i, i+o] = data[i, b+o]."""

    data: jnp.ndarray  # [n, 2b+1]
    b: int

    def tree_flatten(self):
        return (self.data,), (self.b,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def n(self):
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def from_coo(cls, rows, cols, vals, n, b=None):
        rows = np.asarray(rows).reshape(-1)
        cols = np.asarray(cols).reshape(-1)
        if b is None:
            b = int(np.max(np.abs(rows - cols))) if rows.size else 0
        data = jnp.zeros((n, 2 * b + 1), dtype=jnp.asarray(vals).dtype)
        data = data.at[rows, cols - rows + b].add(jnp.asarray(vals).reshape(-1))
        return cls(data, b)

    @classmethod
    def from_diag(cls, d):
        return cls(jnp.asarray(d)[:, None], 0)

    @classmethod
    def eye(cls, n, dtype=jnp.float64):
        return cls(jnp.ones((n, 1), dtype=dtype), 0)

    def offsets(self):
        return range(-self.b, self.b + 1)

    def matvec(self, x):
        x = jnp.asarray(x)
        y = jnp.zeros_like(x, shape=x.shape[:-1] + (self.n,))
        for o in self.offsets():
            y = y + self.data[:, self.b + o] * _shift(x, o)
        return y

    def T(self) -> "Banded":
        """A^T: band_T[i, b-o] = A[i+... ] ; A^T[i,j] = A[j,i]."""
        out = jnp.zeros_like(self.data)
        for o in self.offsets():
            # A^T[i, i+o] = A[i+o, i] = data[i+o, b-o]
            out = out.at[:, self.b + o].set(_shift(self.data[:, self.b - o], o))
        return Banded(out, self.b)

    def __matmul__(self, other: "Banded") -> "Banded":
        bC = self.b + other.b
        n = self.n
        out = jnp.zeros((n, 2 * bC + 1), dtype=self.data.dtype)
        for oA in self.offsets():
            a = self.data[:, self.b + oA]
            for oB in other.offsets():
                # C[i, i+oA+oB] += A[i, i+oA] * B[i+oA, i+oA+oB]
                contrib = a * _shift(other.data[:, other.b + oB], oA)
                out = out.at[:, bC + oA + oB].add(contrib)
        return Banded(out, bC)

    def __add__(self, other: "Banded") -> "Banded":
        b = max(self.b, other.b)
        out = jnp.zeros((self.n, 2 * b + 1), dtype=self.data.dtype)
        out = out.at[:, b - self.b : b + self.b + 1].add(self.data)
        out = out.at[:, b - other.b : b + other.b + 1].add(other.data)
        return Banded(out, b)

    def __sub__(self, other: "Banded") -> "Banded":
        return self + other.scale(-1.0)

    def scale(self, s) -> "Banded":
        return Banded(self.data * s, self.b)

    def dmul(self, d) -> "Banded":
        """diag(d) @ A (scale rows)."""
        return Banded(self.data * jnp.asarray(d)[:, None], self.b)

    def mul_d(self, d) -> "Banded":
        """A @ diag(d) (scale columns)."""
        d = jnp.asarray(d)
        out = jnp.zeros_like(self.data)
        for o in self.offsets():
            out = out.at[:, self.b + o].set(self.data[:, self.b + o] * _shift(d, o))
        return Banded(out, self.b)

    def diagonal(self):
        return self.data[:, self.b]

    def trim(self, tol=0.0) -> "Banded":
        """Drop outer zero diagonals (host-side check; call outside jit only
        when values are concrete)."""
        return self

    def to_dense(self):
        A = jnp.zeros((self.n, self.n), dtype=self.dtype)
        for o in self.offsets():
            idx = np.arange(max(0, -o), min(self.n, self.n - o))
            A = A.at[idx, idx + o].set(self.data[idx, self.b + o])
        return A

    def symmetrize(self) -> "Banded":
        return Banded(0.5 * (self.data + self.T().data), self.b)

    # -- conversion to BTD ---------------------------------------------------

    def btd_structure(self, bs: int | None = None):
        """Static COO structure of the band (including zero slots)."""
        n, b = self.n, self.b
        i = np.repeat(np.arange(n), 2 * b + 1)
        o = np.tile(np.arange(-b, b + 1), n)
        j = i + o
        valid = (j >= 0) & (j < n)
        return i, j, valid

    def to_btd(self, bs: int | None = None) -> BTD:
        i, j, valid = self.btd_structure()
        # clamp out-of-range entries to (0, 0) with zero values
        i2 = np.where(valid, i, 0)
        j2 = np.where(valid, j, 0)
        pat = make_btd_pattern(i2, j2, self.n, bs=bs)
        vals = self.data.reshape(-1) * jnp.asarray(valid, dtype=self.dtype)
        return pat.scatter(vals)

    def to_block(self, bs: int) -> jnp.ndarray:
        """Materialize as a single dense [bs, bs] block (n <= bs), for
        building ST diagonal/off-diagonal blocks."""
        n, b = self.n, self.b
        A = jnp.zeros((bs, bs), dtype=self.dtype)
        i, j, valid = self.btd_structure()
        i2 = np.where(valid, i, 0)
        j2 = np.where(valid, j, 0)
        vals = self.data.reshape(-1) * jnp.asarray(valid, dtype=self.dtype)
        return A.at[i2, j2].add(vals)


def banded_from_cellop(op, affine_map=None, b=None) -> Banded:
    """Assemble a CellOp into banded storage, optionally condensed to free
    dofs through an AffineMap (S^T A S)."""
    r, c = op.coo_structure()
    v = op.coo_values()
    n = op.ndofs
    if affine_map is not None:
        fr = affine_map.s_col[r]
        fc = affine_map.s_col[c]
        fac = affine_map.s_coef[r] * affine_map.s_coef[c]
        v = v * jnp.asarray(fac)
        r, c, n = fr, fc, affine_map.n_free
    return Banded.from_coo(r, c, v, n, b=b)
