"""Packed banded-block storage: BTD at half the memory for banded matrices.

For a banded matrix (bandwidth bw) blocked at bs > bw, the BTD blocks have
complementary triangular structure:

  * diagonal blocks D_i are symmetric          -> only tril(D_i) is needed
  * coupling blocks B_i = block(i, i-1) are upper-shifted-triangular:
    B_i[r, c] != 0 requires c >= r + s with shift s = bs - bw >= 1

so tril(D_i) and B_i occupy DISJOINT regions of one [bs, bs] array. Packed
slot i carries the diagonal block AND the coupling to the PREVIOUS block:

    Hp[i] = tril(D_i) + B_i            (B_0 = 0)

The Cholesky factor inherits the structure exactly (L_i lower-triangular,
C_i = B_i L_{i-1}^{-T} keeps c >= r + s since triangular x triangular
preserves the shift):

    Pp[i] = L_i + C_i                  (C_0 = 0)

Full-block BTD stores (2N-1) bs^2 floats; packed stores N bs^2 — at Darcy
N_xy=300 (bw=3594, bs=3712, N=97) that is 10.6 GB -> 5.3 GB per object,
the difference between OOM and fitting operator + factor in a 16 GB v5e.
This is the TPU replacement for profile/skyline storage in classical
banded solvers (the reference leans on CHOLMOD's supernodal compression
instead, `/root/reference/src/tridiagonal_cholesky.jl`). The slot-i
convention makes every sweep step consume/emit exactly ONE packed slice,
so scans never materialize separate L/C stacks.

Validity requires bw < bs strictly (shift s >= 1) so that C_i has an empty
diagonal; `choose_block_size(bandwidth + 1, n)` guarantees it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.btd import BTD


def _sym_from_tril(T):
    """tril (incl diag) -> full symmetric."""
    return T + T.T - jnp.diag(jnp.diagonal(T))


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedBTD:
    """Banded-block symmetric matrix, packed: P[i] = tril(D_i) + B_i."""

    P: jnp.ndarray  # [N, bs, bs]
    n: int

    def tree_flatten(self):
        return (self.P,), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def N(self):
        return self.P.shape[0]

    @property
    def bs(self):
        return self.P.shape[1]

    @property
    def dtype(self):
        return self.P.dtype

    @classmethod
    def from_btd(cls, A: BTD) -> "PackedBTD":
        """Pack a BTD whose coupling blocks are strictly upper-shifted.

        Structure is the caller's contract (bw < bs); a nonzero tril part
        of a coupling block would be silently dropped, so callers building
        from unknown structure should verify once host-side.
        """
        D_tril = jnp.tril(A.diag)
        if A.N > 1:
            B = jnp.concatenate(
                [jnp.zeros((1, A.bs, A.bs), A.lower.dtype), jnp.triu(A.lower, 1)],
                axis=0,
            )
        else:
            B = jnp.zeros_like(D_tril)
        return cls(D_tril + B, A.n)

    def to_btd(self) -> BTD:
        diag = jax.vmap(lambda P: _sym_from_tril(jnp.tril(P)))(self.P)
        lower = (
            jnp.triu(self.P[1:], 1)
            if self.N > 1
            else jnp.zeros((0, self.bs, self.bs), self.dtype)
        )
        return BTD(diag, lower, self.n)

    def diagonal(self):
        d = jnp.diagonal(self.P, axis1=-2, axis2=-1).reshape(-1)
        return d[: self.n]

    def add_identity_padding(self) -> "PackedBTD":
        """Set padded tail diagonal entries to 1 (keeps chol well-posed)."""
        pad = self.N * self.bs - self.n
        if pad == 0:
            return self
        flat = jnp.diagonal(self.P, axis1=-2, axis2=-1).reshape(-1)
        mask = (jnp.arange(self.N * self.bs) >= self.n) & (flat == 0)
        newd = jnp.where(mask, 1.0, flat).reshape(self.N, self.bs)
        r = jnp.arange(self.bs)
        P = self.P.at[:, r, r].set(newd)
        return PackedBTD(P, self.n)

    def nnz(self) -> int:
        return int(self.P.size)


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedBTDCholesky:
    """Packed Cholesky factor: P[i] = L_i + C_i (C_0 = 0)."""

    P: jnp.ndarray  # [N, bs, bs]
    n: int

    def tree_flatten(self):
        return (self.P,), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def N(self):
        return self.P.shape[0]

    @property
    def bs(self):
        return self.P.shape[1]

    @property
    def dtype(self):
        return self.P.dtype

    # -- block vector plumbing (same layout as BTDCholesky) -------------------

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
        """L y = b; slot i holds both L_i and the coupling C_i it needs.

        P is read via dynamic_slice on the invariant buffer (slicing P
        inside scan xs would materialize a full-size copy)."""
        with jax.default_matmul_precision("float32"):
            bs = self.bs
            P = self.P
            bb, batch_shape = self._to_blocks(b)
            x0 = lax.linalg.triangular_solve(
                jnp.tril(P[0]), bb[0], left_side=True, lower=True
            )

            def step(x_prev, inp):
                i, b_i = inp
                P_i = lax.dynamic_slice(P, (i, 0, 0), (1, bs, bs))[0]
                t = b_i - jnp.triu(P_i, 1) @ x_prev
                x_i = lax.linalg.triangular_solve(
                    jnp.tril(P_i), t, left_side=True, lower=True
                )
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(step, x0, (jnp.arange(1, self.N), bb[1:]))
                xb = jnp.concatenate([x0[None], xs], axis=0)
            else:
                xb = x0[None]
            return self._from_blocks(xb, batch_shape)

    def backward_solve(self, b):
        """L^T x = b; step i needs C_{i+1} from slot i+1."""
        with jax.default_matmul_precision("float32"):
            bs = self.bs
            P = self.P
            bb, batch_shape = self._to_blocks(b)
            xN = lax.linalg.triangular_solve(
                jnp.tril(P[-1]), bb[-1],
                left_side=True, lower=True, transpose_a=True,
            )

            def step(x_next, inp):
                i, b_i = inp
                P_i = lax.dynamic_slice(P, (i, 0, 0), (1, bs, bs))[0]
                P_ip1 = lax.dynamic_slice(P, (i + 1, 0, 0), (1, bs, bs))[0]
                t = b_i - jnp.triu(P_ip1, 1).T @ x_next
                x_i = lax.linalg.triangular_solve(
                    jnp.tril(P_i), t,
                    left_side=True, lower=True, transpose_a=True,
                )
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(
                    step, xN, (jnp.arange(self.N - 1), bb[:-1]), reverse=True
                )
                xb = jnp.concatenate([xs, xN[None]], axis=0)
            else:
                xb = xN[None]
            return self._from_blocks(xb, batch_shape)

    def solve(self, b):
        return self.backward_solve(self.forward_solve(b))

    def log_det(self):
        d = jnp.diagonal(self.P, axis1=-2, axis2=-1)
        return 2.0 * jnp.sum(jnp.log(d))

    def sample_zero_mean(self, key, n_samples: int = 1):
        z = jax.random.normal(key, (n_samples, self.n), dtype=self.dtype)
        return self.backward_solve(z)

    def variance_diag(self, compute_dtype=None):
        """Takahashi selected inversion on the packed factor
        (cf. ops/takahashi.py; step i reads C_{i+1} from slot i+1).

        `compute_dtype`: run the recursion in this dtype (slots cast per
        step). The f32 recursion OVERFLOWS on clamped beyond-f32-validity
        factors (diag floored at 2e-7 rel -> W entries ~5e6 -> Sigma
        products past 3.4e38 within a few blocks) while the f64 recursion
        of the SAME factor is finite and correct — the flagship N800x100
        std NaN, RESULTS.md round 2."""
        dt = compute_dtype or self.dtype
        with jax.default_matmul_precision("float32"):
            bs = self.bs
            eye = jnp.eye(bs, dtype=dt)

            def inv_lower(P_i):
                return lax.linalg.triangular_solve(
                    jnp.tril(P_i).astype(dt), eye, left_side=True, lower=True
                )

            P = self.P
            W_N = inv_lower(P[-1])
            Sigma_N = W_N.T @ W_N

            def step(Sigma_next, i):
                P_i = lax.dynamic_slice(P, (i, 0, 0), (1, bs, bs))[0]
                P_ip1 = lax.dynamic_slice(P, (i + 1, 0, 0), (1, bs, bs))[0]
                W = inv_lower(P_i)
                G = jnp.triu(P_ip1, 1).astype(dt) @ W
                Sigma_i = W.T @ W + G.T @ (Sigma_next @ G)
                return Sigma_i, jnp.diagonal(Sigma_i)

            if self.N > 1:
                _, diags = lax.scan(
                    step, Sigma_N, jnp.arange(self.N - 1), reverse=True
                )
                all_diag = jnp.concatenate(
                    [diags, jnp.diagonal(Sigma_N)[None]], axis=0
                )
            else:
                all_diag = jnp.diagonal(Sigma_N)[None]
            return all_diag.reshape(-1)[: self.n]

    def nnz(self) -> int:
        return int(self.P.size)


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedBTDRFactor:
    """Packed UPPER (R-form) factor of H = R^T R: slot b = triu(R_bb) +
    strict-tril(R_{b,b+1}), stored FLAT as [N, bs*bs].

    The SRIF windowed QR (ops/srif.py) emits R block row b -- R[b,b]
    (upper-tri) and R[b,b+1] (strictly lower-shifted when bw < bs) -- in
    one piece at step b, written with a SINGLE dynamic_update_slice.

    Flat 2D storage is deliberate: with a 3D [N, bs, bs] buffer, XLA's
    layout assignment reconciled the QR-output producer and the
    triangular-solve consumers by giving the whole factor a transposed
    {0,2,1} layout and inserting full-size layout copies of the loop carry
    (2x 6.6 GB at Darcy N_xy=300 -- the OOM). The reshape at each slot
    boundary pins the buffer to a plain row-major 2D layout on both sides
    for ~52 MB/step of slice-local reshape traffic.

    Semantics match PackedBTDCholesky with L = R^T: `forward_solve` solves
    R^T y = b, `backward_solve` solves R x = b.
    """

    P: jnp.ndarray  # [N, bs*bs] flat slots
    n: int
    block: int

    def tree_flatten(self):
        return (self.P,), (self.n, self.block)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def N(self):
        return self.P.shape[0]

    @property
    def bs(self):
        return self.block

    @property
    def dtype(self):
        return self.P.dtype

    _to_blocks = PackedBTDCholesky._to_blocks
    _from_blocks = PackedBTDCholesky._from_blocks

    def _slot(self, i):
        bs = self.block
        return lax.dynamic_slice(self.P, (i, 0), (1, bs * bs)).reshape(bs, bs)

    def forward_solve(self, b):
        """R^T y = b (forward sweep; step b reads R[b-1,b] from slot b-1).

        Runs in the RHS dtype (factor slots cast per step): f64 rhs gives
        f64 substitution through the f32 factor — see the full-offdiag
        variant's docstring."""
        with jax.default_matmul_precision("float32"):
            bs = self.block
            bb, batch_shape = self._to_blocks(b)
            dt = bb.dtype
            y0 = lax.linalg.triangular_solve(
                jnp.triu(self.P[0].reshape(bs, bs)).astype(dt), bb[0],
                left_side=True, lower=False, transpose_a=True,
            )

            def step(y_prev, inp):
                i, b_i = inp
                P_im1 = self._slot(i - 1).astype(dt)
                P_i = self._slot(i).astype(dt)
                # tril(P)^T @ y as a dim-0 contraction (no materialized
                # transpose of factor slices)
                t = b_i - lax.dot_general(
                    jnp.tril(P_im1, -1), y_prev, (((0,), (0,)), ((), ()))
                )
                y_i = lax.linalg.triangular_solve(
                    jnp.triu(P_i), t,
                    left_side=True, lower=False, transpose_a=True,
                )
                return y_i, y_i

            if self.N > 1:
                _, ys = lax.scan(step, y0, (jnp.arange(1, self.N), bb[1:]))
                yb = jnp.concatenate([y0[None], ys], axis=0)
            else:
                yb = y0[None]
            return self._from_blocks(yb, batch_shape)

    def backward_solve(self, b):
        """R x = b (reverse sweep; slot b holds both R_bb and R[b,b+1]).
        Runs in the RHS dtype (see forward_solve)."""
        with jax.default_matmul_precision("float32"):
            bs = self.block
            bb, batch_shape = self._to_blocks(b)
            dt = bb.dtype
            xN = lax.linalg.triangular_solve(
                jnp.triu(self.P[-1].reshape(bs, bs)).astype(dt), bb[-1],
                left_side=True, lower=False,
            )

            def step(x_next, inp):
                i, b_i = inp
                P_i = self._slot(i).astype(dt)
                t = b_i - jnp.tril(P_i, -1) @ x_next
                x_i = lax.linalg.triangular_solve(
                    jnp.triu(P_i), t, left_side=True, lower=False
                )
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(
                    step, xN, (jnp.arange(self.N - 1), bb[:-1]), reverse=True
                )
                xb = jnp.concatenate([xs, xN[None]], axis=0)
            else:
                xb = xN[None]
            return self._from_blocks(xb, batch_shape)

    def solve(self, b):
        return self.backward_solve(self.forward_solve(b))

    def log_det(self):
        # per-slot diagonal gather in a loop: a whole-buffer [:, didx]
        # gather wants a dim0-minor layout and forces a full layout copy
        # of the factor (see class docstring)
        bs = self.block
        didx = jnp.arange(bs) * (bs + 1)

        def body(i, acc):
            slot = lax.dynamic_slice(self.P, (i, 0), (1, bs * bs))[0]
            return acc + jnp.sum(jnp.log(slot[didx]))

        acc = lax.fori_loop(0, self.N, body, jnp.zeros((), self.dtype))
        return 2.0 * acc

    def sample_zero_mean(self, key, n_samples: int = 1):
        z = jax.random.normal(key, (n_samples, self.n), dtype=self.dtype)
        return self.backward_solve(z)

    def variance_diag(self, compute_dtype=None):
        """Takahashi selected inversion in R-form: with L = R^T,
        W_i = L_i^{-1} = (R_ii^{-1})^T and C_{i+1} = R[i,i+1]^T (slot i).
        `compute_dtype`: see PackedBTDCholesky.variance_diag (f64 rescue
        for clamped beyond-f32-validity factors)."""
        dt = compute_dtype or self.dtype
        with jax.default_matmul_precision("float32"):
            bs = self.block
            eye = jnp.eye(bs, dtype=dt)

            def inv_upper(P_i):
                return lax.linalg.triangular_solve(
                    jnp.triu(P_i).astype(dt), eye, left_side=True, lower=False
                )

            V_N = inv_upper(self.P[-1].reshape(bs, bs))  # R_NN^{-1}
            Sigma_N = V_N @ V_N.T

            def step(Sigma_next, i):
                P_i = self._slot(i)
                V = inv_upper(P_i)  # R_ii^{-1}; W = L_i^{-1} = V^T
                # G = C_{i+1} W = (V tril(P_i,-1))^T; with W2 = V tril(P_i,-1)
                # the recursion G^T Sigma G = W2 Sigma W2^T needs no
                # materialized transpose of factor slices
                W2 = V @ jnp.tril(P_i, -1).astype(dt)
                Sigma_i = V @ V.T + W2 @ (Sigma_next @ W2.T)
                return Sigma_i, jnp.diagonal(Sigma_i)

            if self.N > 1:
                _, diags = lax.scan(
                    step, Sigma_N, jnp.arange(self.N - 1), reverse=True
                )
                all_diag = jnp.concatenate(
                    [diags, jnp.diagonal(Sigma_N)[None]], axis=0
                )
            else:
                all_diag = jnp.diagonal(Sigma_N)[None]
            return all_diag.reshape(-1)[: self.n]

    def nnz(self) -> int:
        return int(self.P.size)

    def _with_P(self, P):
        return type(self)(P, self.n, self.block)

    def clamp_diag(self, rel_floor: float = 2e-7):
        """Floor |R_ii| at rel_floor * max |R_ii| (slot-local passes).

        An f32 QR of a system beyond the sqrt-factor's range leaves
        near-zero diagonals in the unresolvable directions; triangular
        solves through them overflow to Inf/NaN. Flooring bounds the
        solve there — the perturbation lives where f32 carries no
        information anyway, and Gauss-Newton/refinement absorb it."""
        bs = self.bs
        didx = jnp.arange(bs) * (bs + 1)

        def mx(i, m):
            slot = lax.dynamic_slice(self.P, (i, 0), (1, bs * bs))[0]
            return jnp.maximum(m, jnp.max(jnp.abs(slot[didx])))

        dmax = lax.fori_loop(0, self.N, mx, jnp.zeros((), self.dtype))
        floor = rel_floor * dmax

        def fix(i, P):
            slot = lax.dynamic_slice(P, (i, 0), (1, bs * bs))[0]
            d = slot[didx]
            newd = jnp.where(jnp.abs(d) < floor, floor, d)
            slot = slot.at[didx].set(newd)
            return lax.dynamic_update_slice(P, slot[None], (i, 0))

        P = lax.fori_loop(0, self.N, fix, self.P)
        return self._with_P(P)


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedRInverseSolver(PackedBTDRFactor):
    """GEMM-form solve variant of `PackedBTDRFactor` — ZERO extra memory.

    Slot b stores triu(R_bb^{-1}) + stril(R_{b,b+1}): the inverse of an
    upper-triangular block is upper-triangular, so it packs into exactly
    the slot the factor occupied, next to the untouched coupling block.
    Every substitution step becomes two GEMVs/GEMMs (one coupling product,
    one inverse application) instead of a blocked triangular solve whose
    ~bs/128 sequential panels are latency-bound on vector right-hand
    sides — the Darcy N_xy=300 refined mean dropped ~5x with this form
    (97 slots x 2 sweeps per solve, 5 solves per refined mean).

    Takahashi variances reuse the stored inverses directly (the plain
    factor's `variance_diag` has to invert every slot first), and
    log det R uses diag(R^{-1}) = 1/diag(R) (exact for triangular
    inverses). `solve`/`sample_zero_mean` are inherited — they compose
    forward/backward sweeps. Rhs-dtype substitution (f64 rhs through the
    f32 inverses) is preserved: the inverse entries are bounded by
    ~cond(R_bb), far inside f32 range where the plain TRSV overflowed.
    """

    @classmethod
    def from_factor(cls, F: "PackedBTDRFactor") -> "PackedRInverseSolver":
        """Invert each slot's triu in place (slot-local passes; the
        whole-buffer form would double resident HBM)."""
        bs = F.block
        eye = jnp.eye(bs, dtype=F.dtype)

        def body(i, P):
            slot = lax.dynamic_slice(P, (i, 0), (1, bs * bs)).reshape(bs, bs)
            W = lax.linalg.triangular_solve(
                jnp.triu(slot), eye, left_side=True, lower=False
            )
            new = jnp.triu(W) + jnp.tril(slot, -1)
            return lax.dynamic_update_slice(P, new.reshape(1, -1), (i, 0))

        with jax.default_matmul_precision("float32"):
            P = lax.fori_loop(0, F.N, body, F.P)
        return cls(P, F.n, F.block)

    def forward_solve(self, b):
        """R^T y = b via y_i = R_ii^{-T} (b_i - R[i-1,i]^T y_{i-1})."""
        with jax.default_matmul_precision("float32"):
            bs = self.block
            bb, batch_shape = self._to_blocks(b)
            dt = bb.dtype
            t_mm = (((0,), (0,)), ((), ()))  # A^T @ x as a dim-0 contraction
            y0 = lax.dot_general(
                jnp.triu(self.P[0].reshape(bs, bs)).astype(dt), bb[0], t_mm
            )

            def step(y_prev, inp):
                i, b_i = inp
                P_im1 = self._slot(i - 1).astype(dt)
                P_i = self._slot(i).astype(dt)
                t = b_i - lax.dot_general(
                    jnp.tril(P_im1, -1), y_prev, t_mm
                )
                y_i = lax.dot_general(jnp.triu(P_i), t, t_mm)
                return y_i, y_i

            if self.N > 1:
                _, ys = lax.scan(step, y0, (jnp.arange(1, self.N), bb[1:]))
                yb = jnp.concatenate([y0[None], ys], axis=0)
            else:
                yb = y0[None]
            return self._from_blocks(yb, batch_shape)

    def backward_solve(self, b):
        """R x = b via x_i = R_ii^{-1} (b_i - R[i,i+1] x_{i+1})."""
        with jax.default_matmul_precision("float32"):
            bs = self.block
            bb, batch_shape = self._to_blocks(b)
            dt = bb.dtype
            xN = jnp.triu(self.P[-1].reshape(bs, bs)).astype(dt) @ bb[-1]

            def step(x_next, inp):
                i, b_i = inp
                P_i = self._slot(i).astype(dt)
                t = b_i - jnp.tril(P_i, -1) @ x_next
                x_i = jnp.triu(P_i) @ t
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(
                    step, xN, (jnp.arange(self.N - 1), bb[:-1]), reverse=True
                )
                xb = jnp.concatenate([xs, xN[None]], axis=0)
            else:
                xb = xN[None]
            return self._from_blocks(xb, batch_shape)

    def log_det(self):
        # diag(R^{-1}) = 1/diag(R) exactly; log det R = -log det R^{-1}
        bs = self.block
        didx = jnp.arange(bs) * (bs + 1)

        def body(i, acc):
            slot = lax.dynamic_slice(self.P, (i, 0), (1, bs * bs))[0]
            return acc + jnp.sum(jnp.log(jnp.abs(slot[didx])))

        acc = lax.fori_loop(0, self.N, body, jnp.zeros((), self.dtype))
        return -2.0 * acc

    def variance_diag(self, compute_dtype=None):
        """Takahashi selected inversion reusing the stored inverses
        (V = triu(slot) directly — no per-slot triangular solve).
        `compute_dtype`: casts the stored-inverse slots per step (the
        f32 INVERSES are already formed, so unlike the factor classes
        this cannot recover digits — it only prevents product overflow)."""
        dt = compute_dtype or self.dtype
        with jax.default_matmul_precision("float32"):
            bs = self.block
            V_N = jnp.triu(self.P[-1].reshape(bs, bs)).astype(dt)
            Sigma_N = V_N @ V_N.T

            def step(Sigma_next, i):
                P_i = self._slot(i).astype(dt)
                V = jnp.triu(P_i)
                W2 = V @ jnp.tril(P_i, -1)
                Sigma_i = V @ V.T + W2 @ (Sigma_next @ W2.T)
                return Sigma_i, jnp.diagonal(Sigma_i)

            if self.N > 1:
                _, diags = lax.scan(
                    step, Sigma_N, jnp.arange(self.N - 1), reverse=True
                )
                all_diag = jnp.concatenate(
                    [diags, jnp.diagonal(Sigma_N)[None]], axis=0
                )
            else:
                all_diag = jnp.diagonal(Sigma_N)[None]
            return all_diag.reshape(-1)[: self.n]

    def clamp_diag(self, rel_floor: float = 2e-7):
        raise NotImplementedError(
            "clamp_diag applies to the factor; convert before inverting"
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedBTDRFullFactor:
    """Upper (R-form) factor of H = R^T R with a FULL off-diagonal block:
    P[b] = triu(R_bb) flat, U[b] = R[b, b+1] flat (dense).

    The strictly-lower slot packing of `PackedBTDRFactor` is valid only
    while every SRIF operand row spans < bs columns (banded spatial
    systems). Spatiotemporal joint precisions have DENSE time-coupling
    blocks (T'PM~, `models/advection_diffusion.joint_ssm`), so R[b, b+1]
    is a full block — this variant stores it separately (2x the factor
    memory of the packed form, same as a BTD Cholesky's diag+lower).
    Semantics match PackedBTDCholesky with L = R^T. Cf. the reference
    sweep `/root/reference/src/tridiagonal_cholesky.jl:65-82` whose C_i
    blocks are likewise full.
    """

    P: jnp.ndarray  # [N, bs*bs] flat triu(R_bb) slots
    U: jnp.ndarray  # [max(N-1, 0), bs*bs] flat R[b, b+1] blocks
    n: int
    block: int

    def tree_flatten(self):
        return (self.P, self.U), (self.n, self.block)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def N(self):
        return self.P.shape[0]

    @property
    def bs(self):
        return self.block

    @property
    def dtype(self):
        return self.P.dtype

    _to_blocks = PackedBTDCholesky._to_blocks
    _from_blocks = PackedBTDCholesky._from_blocks

    def _slot(self, i):
        bs = self.block
        return lax.dynamic_slice(self.P, (i, 0), (1, bs * bs)).reshape(bs, bs)

    def _uslot(self, i):
        bs = self.block
        return lax.dynamic_slice(self.U, (i, 0), (1, bs * bs)).reshape(bs, bs)

    def forward_solve(self, b):
        """R^T y = b (forward sweep; step i reads R[i-1,i] from U[i-1]).

        The sweep runs in the RHS dtype: with an f64 rhs, factor slots are
        cast per step — f64 substitution through the f32 factor. TPU's
        f32 triangular-solve path overflows to NaN on cond(R) ~ 1e8
        factors (N800 x 100, RESULTS.md round 2) while substitution is
        only O(N bs^2) work."""
        with jax.default_matmul_precision("float32"):
            bs = self.block
            bb, batch_shape = self._to_blocks(b)
            dt = bb.dtype
            y0 = lax.linalg.triangular_solve(
                jnp.triu(self.P[0].reshape(bs, bs)).astype(dt), bb[0],
                left_side=True, lower=False, transpose_a=True,
            )

            def step(y_prev, inp):
                i, b_i = inp
                U_im1 = self._uslot(i - 1).astype(dt)
                # U^T @ y as a dim-0 contraction (no materialized transpose)
                t = b_i - lax.dot_general(
                    U_im1, y_prev, (((0,), (0,)), ((), ()))
                )
                y_i = lax.linalg.triangular_solve(
                    jnp.triu(self._slot(i)).astype(dt), t,
                    left_side=True, lower=False, transpose_a=True,
                )
                return y_i, y_i

            if self.N > 1:
                _, ys = lax.scan(step, y0, (jnp.arange(1, self.N), bb[1:]))
                yb = jnp.concatenate([y0[None], ys], axis=0)
            else:
                yb = y0[None]
            return self._from_blocks(yb, batch_shape)

    def backward_solve(self, b):
        """R x = b (reverse sweep; runs in the RHS dtype, see forward)."""
        with jax.default_matmul_precision("float32"):
            bs = self.block
            bb, batch_shape = self._to_blocks(b)
            dt = bb.dtype
            xN = lax.linalg.triangular_solve(
                jnp.triu(self.P[-1].reshape(bs, bs)).astype(dt), bb[-1],
                left_side=True, lower=False,
            )

            def step(x_next, inp):
                i, b_i = inp
                t = b_i - self._uslot(i).astype(dt) @ x_next
                x_i = lax.linalg.triangular_solve(
                    jnp.triu(self._slot(i)).astype(dt), t,
                    left_side=True, lower=False,
                )
                return x_i, x_i

            if self.N > 1:
                _, xs = lax.scan(
                    step, xN, (jnp.arange(self.N - 1), bb[:-1]), reverse=True
                )
                xb = jnp.concatenate([xs, xN[None]], axis=0)
            else:
                xb = xN[None]
            return self._from_blocks(xb, batch_shape)

    def solve(self, b):
        return self.backward_solve(self.forward_solve(b))

    log_det = PackedBTDRFactor.log_det

    def sample_zero_mean(self, key, n_samples: int = 1):
        z = jax.random.normal(key, (n_samples, self.n), dtype=self.dtype)
        return self.backward_solve(z)

    def variance_diag(self, compute_dtype=None):
        """Takahashi selected inversion: with L = R^T, W_i = (R_ii^{-1})^T
        and C_{i+1} = R[i,i+1]^T. `compute_dtype`: see
        PackedBTDCholesky.variance_diag (f64 rescue for clamped
        beyond-f32-validity factors — the flagship N800x100 std NaN)."""
        dt = compute_dtype or self.dtype
        with jax.default_matmul_precision("float32"):
            bs = self.block
            eye = jnp.eye(bs, dtype=dt)

            def inv_upper(P_i):
                return lax.linalg.triangular_solve(
                    jnp.triu(P_i).astype(dt), eye, left_side=True, lower=False
                )

            V_N = inv_upper(self.P[-1].reshape(bs, bs))
            Sigma_N = V_N @ V_N.T

            def step(Sigma_next, i):
                V = inv_upper(self._slot(i))
                W2 = V @ self._uslot(i).astype(dt)
                Sigma_i = V @ V.T + W2 @ (Sigma_next @ W2.T)
                return Sigma_i, jnp.diagonal(Sigma_i)

            if self.N > 1:
                _, diags = lax.scan(
                    step, Sigma_N, jnp.arange(self.N - 1), reverse=True
                )
                all_diag = jnp.concatenate(
                    [diags, jnp.diagonal(Sigma_N)[None]], axis=0
                )
            else:
                all_diag = jnp.diagonal(Sigma_N)[None]
            return all_diag.reshape(-1)[: self.n]

    def nnz(self) -> int:
        return int(self.P.size + self.U.size)

    def _with_P(self, P):
        return type(self)(P, self.U, self.n, self.block)

    clamp_diag = PackedBTDRFactor.clamp_diag


def packed_cholesky(H: PackedBTD) -> PackedBTDCholesky:
    """Blocked Cholesky sweep on packed storage, IN PLACE.

    The factor overwrites the operator buffer slot by slot (tril(D_i)+B_i
    -> L_i+C_i) through a fori_loop whose carry is the single [N, bs, bs]
    buffer — XLA aliases the dynamic_update_slice in place, so peak memory
    is ONE packed object (a scan over `H.P[1:]` with stacked outputs holds
    input + output + slicing copies: observed 25 GB vs 15.75 at Darcy
    N_xy=300, vs ~5.4 GB here).
    """
    with jax.default_matmul_precision("float32"):
        bs = H.bs
        L0 = jnp.linalg.cholesky(_sym_from_tril(jnp.tril(H.P[0])))
        if H.N == 1:
            return PackedBTDCholesky(L0[None], H.n)
        P = lax.dynamic_update_slice(H.P, L0[None], (0, 0, 0))

        def body(i, P):
            L_prev = jnp.tril(lax.dynamic_slice(P, (i - 1, 0, 0), (1, bs, bs))[0])
            P_i = lax.dynamic_slice(P, (i, 0, 0), (1, bs, bs))[0]
            B_i = jnp.triu(P_i, 1)
            D_i = _sym_from_tril(jnp.tril(P_i))
            C = lax.linalg.triangular_solve(
                L_prev, B_i, left_side=False, lower=True, transpose_a=True
            )
            L_i = jnp.linalg.cholesky(D_i - C @ C.T)
            # shift s >= 1 keeps C strictly upper: L_i + C packs losslessly
            return lax.dynamic_update_slice(P, (L_i + jnp.triu(C, 1))[None], (i, 0, 0))

        P = lax.fori_loop(1, H.N, body, P)
        return PackedBTDCholesky(P, H.n)


# ---------------------------------------------------------------------------
# Building packed matrices: COO scatter + window-GEMM A^T A accumulation
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class ShapeOnly:
    """Placeholder precision carrying only shape metadata (packed priors
    never materialize the BTD of Q on device)."""

    n: int
    N: int
    bs: int

    def tree_flatten(self):
        return (), (self.n, self.N, self.bs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)

    @property
    def dtype(self):
        return jnp.float64  # priors are f64; only shape metadata is real

    def nnz(self) -> int:
        return 0


def make_packed_scatter_idx(rows, cols, n: int, bs: int, valid=None,
                            valid_counts=None) -> np.ndarray:
    """Host-side: COO (row, col) -> flat index into packed [N, bs, bs].

    Keeps only the lower half (i >= j); upper entries get the drop
    sentinel N*bs*bs. Same-block entries land in slot I's tril; block
    (I, I-1) entries land in slot I's (upper-shifted) coupling region.
    Entries farther than one block off-diagonal violate bandedness and
    raise. `valid`: optional bool mask (same shape) — False entries (e.g.
    ELL padding slots) are sentinel-dropped before the bandedness check.

    `rows=None` means the ELL row pattern (rows[i, k] = i for 2D cols) —
    built IN-GRAPH, avoiding a 41M-entry host materialization.
    `valid_counts`: per-row valid-slot count [n_rows] (the ELL padding
    mask `arange(K) < counts[:, None]`), likewise expanded in-graph.
    """
    N = -(-n // bs)
    size = N * bs * bs
    # this host's numpy is ~50-100x slower than XLA-compiled loops at
    # these sizes (no SIMD; one int64 divide over 41M entries = 10 s at
    # Darcy N300) — run the elementwise index math as ONE fused jitted
    # program pinned to the host CPU backend (works while the default
    # device is the TPU relay; falls back to numpy if no cpu backend)
    idt = np.int64 if size > 2**31 - 1 else np.int32
    cols = np.asarray(cols)
    if (rows is None or valid_counts is not None) and cols.ndim != 2:
        raise ValueError("rows=None / valid_counts need 2D (ELL) cols")
    from jax._src import core as _core

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if not _core.trace_state_clean():
        cpu = None  # under an outer trace: pure-host numpy path

    def compute(xp, rows_, cols_, vmask_):
        I = rows_ // bs
        J = cols_ // bs
        keep = (rows_ >= cols_)
        if vmask_ is not None:
            keep = keep & vmask_
        bad = xp.any(((I - J) > 1) & keep)
        flat = I * (bs * bs) + (rows_ - I * bs) * bs + (cols_ - J * bs)
        return xp.where(keep, flat, size), bad

    if cpu is not None:
        def f(cols_d, rows_d, valid_d, counts_d):
            c2 = cols_d.astype(idt)
            if rows_d is None:
                r2 = jax.lax.broadcasted_iota(idt, c2.shape, 0)
            else:
                r2 = rows_d.astype(idt).reshape(c2.shape)
            if counts_d is not None:
                vm = (
                    jax.lax.broadcasted_iota(jnp.int32, c2.shape, 1)
                    < counts_d.astype(jnp.int32)[:, None]
                )
            elif valid_d is not None:
                vm = valid_d.reshape(c2.shape)
            else:
                vm = None
            flat, bad = compute(jnp, r2.reshape(-1), c2.reshape(-1),
                                None if vm is None else vm.reshape(-1))
            return flat, bad

        with jax.default_device(cpu):
            flat, bad = jax.jit(f, static_argnames=())(
                cols,
                None if rows is None else np.asarray(rows),
                None if valid is None else np.asarray(valid, dtype=bool),
                None if valid_counts is None else np.asarray(valid_counts),
            )
            flat, bad = np.asarray(flat), bool(bad)
    else:
        rows_ = (
            np.broadcast_to(
                np.arange(cols.shape[0], dtype=idt)[:, None], cols.shape
            )
            if rows is None
            else np.asarray(rows, dtype=idt)
        ).reshape(-1)
        cols_ = np.asarray(cols, dtype=idt).reshape(-1)
        if valid_counts is not None:
            vmask = (
                np.arange(cols.shape[1])[None, :]
                < np.asarray(valid_counts)[:, None]
            ).reshape(-1)
        elif valid is not None:
            vmask = np.asarray(valid, dtype=bool).reshape(-1)
        else:
            vmask = None
        flat, bad = compute(np, rows_, cols_, vmask)
        bad = bool(bad)
    if bad:
        rows_ = (
            np.broadcast_to(
                np.arange(cols.shape[0], dtype=np.int64)[:, None], cols.shape
            )
            if rows is None
            else np.asarray(rows, dtype=np.int64)
        ).reshape(-1)
        cols_ = np.asarray(cols, dtype=np.int64).reshape(-1)
        I = rows_ // bs
        J = cols_ // bs
        mask = ((I - J) > 1) & (rows_ >= cols_)
        if valid_counts is not None:
            mask &= (
                np.arange(cols.shape[1])[None, :]
                < np.asarray(valid_counts)[:, None]
            ).reshape(-1)
        elif valid is not None:
            mask &= np.asarray(valid, dtype=bool).reshape(-1)
        b = int(np.argmax(mask))
        raise ValueError(
            f"entry ({rows_[b]}, {cols_[b]}) spans more than one block "
            f"(bs={bs}): matrix is not banded-blockable at this bs"
        )
    return flat.astype(idt)


def packed_scatter(idx, vals, n: int, N: int, bs: int, dtype=None) -> PackedBTD:
    """Scatter COO values through a make_packed_scatter_idx plan."""
    vals = jnp.asarray(vals).reshape(-1)
    if dtype is not None:
        vals = vals.astype(dtype)
    buf = jnp.zeros(N * bs * bs, dtype=vals.dtype)
    buf = buf.at[jnp.asarray(idx)].add(vals, mode="drop")
    return PackedBTD(buf.reshape(N, bs, bs), n)


def ata_packed_windows(plan, vals, init: PackedBTD, tau=1.0) -> PackedBTD:
    """init + tau * A^T A accumulated into PACKED storage via window GEMMs.

    Same window scheme as ops/ata_windows.py: window b's Gram G [2bs, 2bs]
    contributes tril(G11) to slot b, tril(G22) to slot b+1, and the
    coupling block G21 (upper-shifted when bw(A) < bs) to slot b+1's triu
    region. Scan-accumulates one window at a time.
    """
    vals = jnp.asarray(vals)
    dtype = init.dtype
    if getattr(plan, "split", 1) != 1:
        raise ValueError("ata_packed_windows requires a split=1 plan")
    N, bs, Nw = plan.N, plan.bs, plan.Nw
    R = plan.rows.shape[1]
    rows = jnp.asarray(plan.rows)
    mask = jnp.asarray(plan.mask, dtype=dtype)
    lcols = jnp.asarray(plan.local_cols)
    r_idx = jnp.arange(R)[:, None]

    def window_G(b):
        v = (vals[rows[b]] * mask[b][:, None]).astype(dtype)
        M = jnp.zeros((R, 2 * bs), dtype=dtype)
        M = M.at[r_idx, lcols[b]].add(v)
        with jax.default_matmul_precision("float32"):
            return (M.T @ M) * tau

    if N == 1:
        G = window_G(0)
        return PackedBTD(init.P + jnp.tril(G[:bs, :bs])[None], init.n)

    def step(P, b):
        G = window_G(b)
        Pb = lax.dynamic_slice(P, (b, 0, 0), (1, bs, bs))
        P = lax.dynamic_update_slice(P, Pb + jnp.tril(G[:bs, :bs])[None], (b, 0, 0))
        Pb1 = lax.dynamic_slice(P, (b + 1, 0, 0), (1, bs, bs))
        upd = jnp.tril(G[bs:, bs:]) + jnp.triu(G[bs:, :bs], 1)
        P = lax.dynamic_update_slice(P, Pb1 + upd[None], (b + 1, 0, 0))
        return P, None

    P, _ = lax.scan(step, init.P, jnp.arange(Nw))
    return PackedBTD(P, init.n)
