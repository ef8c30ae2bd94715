"""GEMM-only BTD solves via precomputed block inverses.

Profiling on TPU v5e shows triangular solves (TRSM) run ~6x below MXU GEMM
throughput, and every posterior phase is solve-heavy: the mean solve, joint
samples, 50-probe RBMC variance estimates, and the refinement loop each run
forward/backward substitution sweeps whose per-block op is a TRSM.

Precomputing W_i = L_i^{-1} once per factor (N triangular solves against the
identity, ~bs^3/2 each) turns *every* subsequent substitution step into pure
GEMMs:

    forward:  x_i = W_i (b_i - C_{i-1} x_{i-1})
    backward: x_i = W_i^T (b_i - C_i^T x_{i+1})

which the MXU executes at full rate — the same trade CHOLMOD makes when it
caches the supernodal factor in solve-optimized form.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky


@jax.tree_util.register_pytree_node_class
@dataclass
class BTDInverseSolver:
    """Solve-optimized form of a BTDCholesky factor.

    `logdet` carries log det A (A = L L^T) so the GEMM form is a drop-in
    factor for NLL computations; diag(L) is not recoverable from W = L^{-1}
    without a second triangular read, so it is captured at conversion time.
    """

    Ws: jnp.ndarray  # [N, bs, bs] = L_i^{-1} (lower triangular)
    Cs: jnp.ndarray  # [N-1, bs, bs]
    n: int
    logdet: jnp.ndarray | None = None

    def tree_flatten(self):
        return (self.Ws, self.Cs, self.logdet), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2])

    @property
    def N(self):
        return self.Ws.shape[0]

    @property
    def bs(self):
        return self.Ws.shape[1]

    @property
    def dtype(self):
        return self.Ws.dtype

    @classmethod
    def from_factor(cls, F: BTDCholesky) -> "BTDInverseSolver":
        with jax.default_matmul_precision("float32"):
            eye = jnp.eye(F.bs, dtype=F.dtype)
            Ws = lax.linalg.triangular_solve(
                F.Ls, jnp.broadcast_to(eye, F.Ls.shape), left_side=True, lower=True
            )
        return cls(Ws, F.Cs, F.n, F.log_det())

    def log_det(self):
        """log det A, captured from the originating factor."""
        if self.logdet is None:
            # fallback: log det A = -2 sum log diag(W) (W_i = L_i^{-1})
            d = jnp.diagonal(self.Ws, axis1=-2, axis2=-1)
            return -2.0 * jnp.sum(jnp.log(d))
        return self.logdet

    def nnz(self) -> int:
        return int(self.Ws.size + self.Cs.size)

    def _to_blocks(self, b):
        b = jnp.asarray(b)
        batch_shape = b.shape[:-1]
        k = 1
        for s in batch_shape:
            k *= s
        bb = b.reshape(k, b.shape[-1]).T
        pad = self.N * self.bs - b.shape[-1]
        if pad:
            bb = jnp.pad(bb, ((0, pad), (0, 0)))
        return bb.reshape(self.N, self.bs, k), batch_shape

    def _from_blocks(self, xb, batch_shape):
        x = xb.reshape(self.N * self.bs, -1)[: self.n]
        return x.T.reshape(*batch_shape, self.n)

    def forward_solve(self, b):
        with jax.default_matmul_precision("float32"):
            bb, batch_shape = self._to_blocks(b)
            x0 = self.Ws[0] @ bb[0]

            def step(x_prev, inp):
                W_i, C_im1, b_i = inp
                x_i = W_i @ (b_i - C_im1 @ x_prev)
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(step, x0, (self.Ws[1:], self.Cs, bb[1:]))
                xb = jnp.concatenate([x0[None], xs], axis=0)
            else:
                xb = x0[None]
            return self._from_blocks(xb, batch_shape)

    def backward_solve(self, b):
        with jax.default_matmul_precision("float32"):
            bb, batch_shape = self._to_blocks(b)
            xN = self.Ws[-1].T @ bb[-1]

            def step(x_next, inp):
                W_i, C_i, b_i = inp
                x_i = W_i.T @ (b_i - C_i.T @ x_next)
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(
                    step, xN, (self.Ws[:-1], self.Cs, bb[:-1]), reverse=True
                )
                xb = jnp.concatenate([xs, xN[None]], axis=0)
            else:
                xb = xN[None]
            return self._from_blocks(xb, batch_shape)

    def solve(self, b):
        return self.backward_solve(self.forward_solve(b))

    def sample_zero_mean(self, key, n_samples: int = 1):
        z = jax.random.normal(
            key, (n_samples, self.n), dtype=self.Ws.dtype
        )
        return self.backward_solve(z)


@jax.tree_util.register_pytree_node_class
@dataclass
class RFullInverseSolver:
    """GEMM-only solve form of a PackedBTDRFullFactor (the ST-SRIF factor):
    Us_i = R_ii^{-1} (upper) precomputed once, off-diagonal blocks U_i kept
    as dense [bs, bs] — every substitution step and the Takahashi variance
    recursion become pure GEMMs (TRSM runs ~6x below MXU GEMM rate)."""

    Us: jnp.ndarray  # [N, bs, bs] = R_ii^{-1} (upper triangular)
    U: jnp.ndarray  # [N-1, bs, bs] = R[i, i+1]
    n: int
    logdet: jnp.ndarray | None = None

    def tree_flatten(self):
        return (self.Us, self.U, self.logdet), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2])

    @property
    def N(self):
        return self.Us.shape[0]

    @property
    def bs(self):
        return self.Us.shape[1]

    @property
    def dtype(self):
        return self.Us.dtype

    @classmethod
    def from_factor(cls, F) -> "RFullInverseSolver":
        """F: PackedBTDRFullFactor (flat [N, bs*bs] slots)."""
        bs = F.bs
        R = jnp.triu(F.P.reshape(F.N, bs, bs))
        eye = jnp.broadcast_to(jnp.eye(bs, dtype=F.dtype), R.shape)
        Us = lax.linalg.triangular_solve(
            R, eye, left_side=True, lower=False
        )
        U = F.U.reshape(max(F.N - 1, 0), bs, bs)
        return cls(Us, U, F.n, F.log_det())

    def log_det(self):
        return self.logdet

    def nnz(self) -> int:
        return int(self.Us.size + self.U.size)

    _to_blocks = BTDInverseSolver._to_blocks
    _from_blocks = BTDInverseSolver._from_blocks

    def forward_solve(self, b):
        """R^T y = b: y_i = Us_i^T (b_i - U_{i-1}^T y_{i-1})."""
        with jax.default_matmul_precision("float32"):
            bb, batch_shape = self._to_blocks(b)
            y0 = lax.dot_general(
                self.Us[0], bb[0], (((0,), (0,)), ((), ()))
            )

            def step(y_prev, inp):
                Us_i, U_im1, b_i = inp
                t = b_i - lax.dot_general(
                    U_im1, y_prev, (((0,), (0,)), ((), ()))
                )
                y_i = lax.dot_general(Us_i, t, (((0,), (0,)), ((), ())))
                return y_i, y_i

            if self.N > 1:
                _, ys = lax.scan(step, y0, (self.Us[1:], self.U, bb[1:]))
                yb = jnp.concatenate([y0[None], ys], axis=0)
            else:
                yb = y0[None]
            return self._from_blocks(yb, batch_shape)

    def backward_solve(self, b):
        """R x = b: x_i = Us_i (b_i - U_i x_{i+1})."""
        with jax.default_matmul_precision("float32"):
            bb, batch_shape = self._to_blocks(b)
            xN = self.Us[-1] @ bb[-1]

            def step(x_next, inp):
                Us_i, U_i, b_i = inp
                x_i = Us_i @ (b_i - U_i @ x_next)
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(
                    step, xN, (self.Us[:-1], self.U, bb[:-1]), reverse=True
                )
                xb = jnp.concatenate([xs, xN[None]], axis=0)
            else:
                xb = xN[None]
            return self._from_blocks(xb, batch_shape)

    def solve(self, b):
        return self.backward_solve(self.forward_solve(b))

    def sample_zero_mean(self, key, n_samples: int = 1):
        z = jax.random.normal(key, (n_samples, self.n), dtype=self.dtype)
        return self.backward_solve(z)

    def variance_diag(self, compute_dtype=None):
        """Takahashi selected inversion riding the precomputed Us (no
        per-step triangular solves). `compute_dtype` casts per step
        (overflow-only rescue: the f32 inverses are already formed)."""
        dt = compute_dtype or self.Us.dtype
        with jax.default_matmul_precision("float32"):
            V_N = self.Us[-1].astype(dt)
            Sigma_N = V_N @ V_N.T

            def step(Sigma_next, inp):
                V, U_i = inp
                V = V.astype(dt)
                W2 = V @ U_i.astype(dt)
                Sigma_i = V @ V.T + W2 @ (Sigma_next @ W2.T)
                return Sigma_i, jnp.diagonal(Sigma_i)

            if self.N > 1:
                _, diags = lax.scan(
                    step, Sigma_N, (self.Us[:-1], self.U), reverse=True
                )
                all_diag = jnp.concatenate(
                    [diags, jnp.diagonal(Sigma_N)[None]], axis=0
                )
            else:
                all_diag = jnp.diagonal(Sigma_N)[None]
            return all_diag.reshape(-1)[: self.n]
