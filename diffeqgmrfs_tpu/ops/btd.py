"""Block-tridiagonal (BTD) symmetric matrices — the universal precision format.

The design stance (SURVEY.md §7): replace the reference's unstructured sparse
CHOLMOD/Pardiso algebra with *structured* algebra the TPU MXU loves.

* Spatiotemporal GMRF precisions are natively block-tridiagonal in time
  (`joint_ssm` of `ImplicitEulerSSM`, cf. `/root/reference/src/spdes/
  shallow_water.jl:219-230`, exploited by `src/tridiagonal_cholesky.jl`).
* Purely spatial precisions on lexicographically ordered structured meshes
  are *banded*; a banded matrix with half-bandwidth <= bs is block-tridiagonal
  with block size bs. So one dense-blocked kernel family covers everything.

Storage: `diag [N, bs, bs]` (full symmetric diagonal blocks, A[i,i]) and
`lower [N-1, bs, bs]` (subdiagonal blocks, A[i+1,i]); the true dimension n may
be < N*bs — padded tail rows carry an identity diagonal so factorizations
stay well-posed and contribute log(1)=0 to log-determinants.

Structure (block placement of COO entries) is computed host-side in NumPy
once per sparsity pattern; values are scattered in jit via a single
flat `.at[].add` (`BTDPattern`), so per-instance re-assembly (Darcy
coefficients, Gauss-Newton Jacobians) is one fused XLA op.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def choose_block_size(bandwidth: int, n: int, multiple: int = 128) -> int:
    """Pick a BTD block size >= bandwidth, rounded up to an MXU-friendly
    multiple, and not larger than needed for the matrix."""
    bs = max(int(bandwidth), 1)
    bs = ((bs + multiple - 1) // multiple) * multiple
    return min(bs, ((n + multiple - 1) // multiple) * multiple)


@jax.tree_util.register_pytree_node_class
@dataclass
class BTD:
    """Symmetric block-tridiagonal matrix."""

    diag: jnp.ndarray  # [N, bs, bs]
    lower: jnp.ndarray  # [N-1, bs, bs] (block (i+1, i)); [0, bs, bs] if N == 1
    n: int  # true dimension

    def tree_flatten(self):
        return (self.diag, self.lower), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def N(self) -> int:
        return self.diag.shape[0]

    @property
    def bs(self) -> int:
        return self.diag.shape[1]

    @property
    def dtype(self):
        return self.diag.dtype

    # -- vector block helpers ----------------------------------------------

    def pad_vec(self, x):
        """[..., n] -> [..., N, bs] zero-padded blocks."""
        x = jnp.asarray(x)
        pad = self.N * self.bs - self.n
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x.reshape(*x.shape[:-1], self.N, self.bs)

    def unpad_vec(self, xb):
        """[..., N, bs] -> [..., n]."""
        return xb.reshape(*xb.shape[:-2], self.N * self.bs)[..., : self.n]

    # -- linear algebra ------------------------------------------------------

    def matvec(self, x):
        """A @ x for x [..., n] (batched over leading dims)."""
        xb = self.pad_vec(x)  # [..., N, bs]
        y = jnp.einsum("nij,...nj->...ni", self.diag, xb)
        if self.N > 1:
            lo = jnp.einsum("nij,...nj->...ni", self.lower, xb[..., :-1, :])
            up = jnp.einsum("nji,...nj->...ni", self.lower, xb[..., 1:, :])
            y = y.at[..., 1:, :].add(lo).at[..., :-1, :].add(up)
        return self.unpad_vec(y)

    def diagonal(self):
        """Main diagonal of the matrix, [n]."""
        d = jnp.diagonal(self.diag, axis1=-2, axis2=-1)  # [N, bs]
        return d.reshape(-1)[: self.n]

    def __add__(self, other: "BTD") -> "BTD":
        assert self.n == other.n and self.bs == other.bs
        return BTD(self.diag + other.diag, self.lower + other.lower, self.n)

    def scale(self, s) -> "BTD":
        return BTD(self.diag * s, self.lower * s, self.n)

    def add_identity_padding(self) -> "BTD":
        """Set unit diagonal on padded tail rows (call once after assembly)."""
        total = self.N * self.bs
        if total == self.n:
            return self
        idx = np.arange(self.n, total)
        bi, r = idx // self.bs, idx % self.bs
        diag = self.diag.at[bi, r, r].set(1.0)
        return BTD(diag, self.lower, self.n)

    def add_diagonal(self, v) -> "BTD":
        """A + diagm(v) for v [n]."""
        vb = self.pad_vec(v)
        r = jnp.arange(self.bs)
        diag = self.diag.at[:, r, r].add(vb)
        return BTD(diag, self.lower, self.n)

    def to_dense(self):
        """Materialize (tests / tiny problems only)."""
        N, bs = self.N, self.bs
        A = jnp.zeros((N * bs, N * bs), dtype=self.dtype)
        for i in range(N):
            A = A.at[i * bs : (i + 1) * bs, i * bs : (i + 1) * bs].set(self.diag[i])
            if i + 1 < N:
                blk = self.lower[i]
                A = A.at[(i + 1) * bs : (i + 2) * bs, i * bs : (i + 1) * bs].set(blk)
                A = A.at[i * bs : (i + 1) * bs, (i + 1) * bs : (i + 2) * bs].set(blk.T)
        return A[: self.n, : self.n]

    def nnz(self) -> int:
        """Dense-blocked storage nonzeros (cost proxy, cf. reference mat_nnz)."""
        return int(self.diag.size + self.lower.size)

    def to_csr_host(self, tol: float = 0.0):
        """Host-side scipy CSR of the TRUE nonzeros (drops the dense-block
        padding zeros). For converting priors to compact ELL form — ST
        prior blocks are mostly zeros (1D spatial bandwidth ~4 inside
        bs ~ 2000 dense blocks)."""
        import numpy as np_
        import scipy.sparse as sp_

        N, bs, n = self.N, self.bs, self.n
        rows, cols, vals = [], [], []
        diag = np_.asarray(self.diag)
        lower = np_.asarray(self.lower)
        for i in range(N):
            r, c = np_.nonzero(np_.abs(diag[i]) > tol)
            rows.append(r + i * bs)
            cols.append(c + i * bs)
            vals.append(diag[i][np_.abs(diag[i]) > tol])
            if i + 1 < N:
                r, c = np_.nonzero(np_.abs(lower[i]) > tol)
                rows.append(r + (i + 1) * bs)
                cols.append(c + i * bs)
                vals.append(lower[i][np_.abs(lower[i]) > tol])
                # symmetric mirror (upper)
                rows.append(c + i * bs)
                cols.append(r + (i + 1) * bs)
                vals.append(lower[i][np_.abs(lower[i]) > tol])
        r = np_.concatenate(rows)
        c = np_.concatenate(cols)
        v = np_.concatenate(vals)
        keep = (r < n) & (c < n)
        return sp_.coo_matrix(
            (v[keep], (r[keep], c[keep])), shape=(n, n)
        ).tocsr()


# ---------------------------------------------------------------------------
# COO -> BTD scatter patterns (static structure, jit-able values)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class ToeplitzBTD:
    """Constant-mesh ST precision in DISTINCT-BLOCK form: the joint
    implicit-Euler precision over a uniform time grid has only four
    distinct blocks — diag[0] (IC/conditioned), diag[1..N-2] (interior,
    identical), diag[N-1] (terminal), and one coupling block
    (`models/advection_diffusion.joint_ssm`; reference analog
    `/root/reference/src/spdes/shallow_water.jl:219-231`). Storing the
    full [N_t, bs, bs] BTD wastes N_t/4 x the memory — at Burgers N_x=800
    x 100 steps the f64 stack of while-loop copies reached 43 GB; these
    four blocks are ~85 MB.

    Exposes the operator surface Gauss-Newton needs (matvec, diagonal,
    dtype, shapes) plus `scaled_btd` to materialize the equilibrated f32
    BTD that feeds the factorization. Requires n == N * bs (ST layouts are
    exact; use pad_block for MXU alignment) and N >= 3.
    """

    d_first: jnp.ndarray  # [bs, bs]
    d_mid: jnp.ndarray
    d_last: jnp.ndarray
    off: jnp.ndarray  # block (t+1, t), constant over t
    N: int
    n: int

    def tree_flatten(self):
        return (self.d_first, self.d_mid, self.d_last, self.off), (
            self.N, self.n,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @classmethod
    def from_btd(cls, Q) -> "ToeplitzBTD":
        """Slice the distinct blocks out of a uniform BTD (structure is the
        CALLER's contract: diag[1] == diag[2..N-2], lower constant)."""
        return cls(Q.diag[0], Q.diag[1], Q.diag[-1], Q.lower[0], Q.N, Q.n)

    @property
    def bs(self):
        return self.d_mid.shape[0]

    @property
    def dtype(self):
        return self.d_mid.dtype

    def _check(self):
        if self.n != self.N * self.bs or self.N < 3:
            raise ValueError("ToeplitzBTD requires n == N*bs and N >= 3")

    def matvec(self, x):
        self._check()
        bs, N = self.bs, self.N
        xb = jnp.asarray(x).reshape(N, bs)
        y = jnp.einsum("ij,Nj->Ni", self.d_mid, xb)
        y = y.at[0].add((self.d_first - self.d_mid) @ xb[0])
        y = y.at[N - 1].add((self.d_last - self.d_mid) @ xb[N - 1])
        y = y.at[1:].add(jnp.einsum("ij,Nj->Ni", self.off, xb[:-1]))
        y = y.at[:-1].add(jnp.einsum("ji,Nj->Ni", self.off, xb[1:]))
        return y.reshape(-1)

    def diagonal(self):
        self._check()
        d = jnp.broadcast_to(
            jnp.diagonal(self.d_mid), (self.N, self.bs)
        )
        d = d.at[0].set(jnp.diagonal(self.d_first))
        d = d.at[self.N - 1].set(jnp.diagonal(self.d_last))
        return d.reshape(-1)

    def scaled_btd(self, dinv, dtype=jnp.float32) -> BTD:
        """Materialize D^{-1/2} Q D^{-1/2} as a full BTD in `dtype` — the
        per-block scaling varies along time, so this is the one place the
        [N, bs, bs] buffer exists (it is the factorization input)."""
        self._check()
        bs, N = self.bs, self.N
        db = jnp.asarray(dinv).reshape(N, bs).astype(dtype)
        mid = self.d_mid.astype(dtype)
        diag = mid[None] * db[:, :, None] * db[:, None, :]
        diag = diag.at[0].set(
            self.d_first.astype(dtype) * db[0][:, None] * db[0][None, :]
        )
        diag = diag.at[N - 1].set(
            self.d_last.astype(dtype) * db[N - 1][:, None] * db[N - 1][None, :]
        )
        lower = self.off.astype(dtype)[None] * db[1:, :, None] * db[:-1, None, :]
        return BTD(diag, lower, self.n)

    def nnz(self) -> int:
        return int(4 * self.d_mid.size)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BTDPattern:
    """Precomputed scatter of a fixed COO sparsity into BTD storage.

    `flat_idx[k]` addresses entry k of the COO values into a flat buffer
    [N*bs*bs + (N-1)*bs*bs]; entries in strictly-upper block positions are
    dropped (their mirrored lower entry carries the value), so the COO must
    describe the FULL symmetric matrix. Out-of-band entries raise at
    pattern-build time — structure violations never fail silently.

    BTDPattern is a pytree with `flat_idx` as a leaf: production patterns
    have ~1e8 entries, and passing them as jit ARGUMENTS (rather than
    closure constants) keeps them out of the serialized HLO — closure
    constants are inlined as literals, which blows past remote-compile size
    limits and bloats every executable. Use `to_device()` once and thread
    the pattern through the jitted function's signature.
    """

    n: int
    N: int
    bs: int
    flat_idx: np.ndarray  # int [nnz], == size -> dropped

    def tree_flatten(self):
        return (self.flat_idx,), (self.n, self.N, self.bs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(n=aux[0], N=aux[1], bs=aux[2], flat_idx=children[0])

    def to_device(self) -> "BTDPattern":
        """Move flat_idx to the device once (avoids per-call transfers)."""
        return BTDPattern(
            n=self.n, N=self.N, bs=self.bs, flat_idx=jax.device_put(self.flat_idx)
        )

    @property
    def diag_size(self) -> int:
        return self.N * self.bs * self.bs

    @property
    def total_size(self) -> int:
        return self.diag_size + max(self.N - 1, 0) * self.bs * self.bs

    def _split_idx(self):
        """Per-buffer indices: a single flat (2N-1) bs^2 buffer exceeds
        XLA's 32-bit index space at production sizes (Darcy N_xy=300:
        1.34e9 elements); diag and lower are scattered separately, each
        well under 2^31, with out-of-piece entries dropped."""
        ds = self.diag_size
        idx = jnp.asarray(self.flat_idx)
        idx_d = jnp.where(idx < ds, idx, ds).astype(jnp.int32)
        idx_l = jnp.where(idx >= ds, idx - ds, self.total_size).astype(jnp.int32)
        return idx_d, idx_l

    def scatter(self, values) -> BTD:
        """Scatter COO values (jit-traceable) into a fresh BTD."""
        vals = values.reshape(-1)
        idx_d, idx_l = self._split_idx()
        dbuf = jnp.zeros(self.diag_size, dtype=vals.dtype)
        dbuf = dbuf.at[idx_d].add(vals, mode="drop")
        lsize = max(self.N - 1, 0) * self.bs * self.bs
        lbuf = jnp.zeros(lsize, dtype=vals.dtype)
        lbuf = lbuf.at[idx_l].add(vals, mode="drop")
        diag = dbuf.reshape(self.N, self.bs, self.bs)
        lower = lbuf.reshape(max(self.N - 1, 0), self.bs, self.bs)
        return BTD(diag, lower, self.n)

    def scatter_into(self, init: BTD, values) -> BTD:
        """init + scatter(values) without fresh full-size buffers (XLA can
        alias init's storage)."""
        vals = values.reshape(-1).astype(init.diag.dtype)
        idx_d, idx_l = self._split_idx()
        dbuf = init.diag.reshape(-1).at[idx_d].add(vals, mode="drop")
        lbuf = init.lower.reshape(-1).at[idx_l].add(vals, mode="drop")
        diag = dbuf.reshape(self.N, self.bs, self.bs)
        lower = lbuf.reshape(max(self.N - 1, 0), self.bs, self.bs)
        return BTD(diag, lower, self.n)


def make_btd_pattern(
    rows: np.ndarray, cols: np.ndarray, n: int, bs: int | None = None
) -> BTDPattern:
    """Build the scatter pattern for COO structure (rows, cols) of an n x n
    symmetric matrix. If bs is None it is chosen from the bandwidth.

    Index arithmetic runs through the native structure engine
    (native/structure.cpp) when built — production A^T A patterns have ~1e8
    entries — with a NumPy fallback inside `btd_flat_index`.
    """
    from diffeqgmrfs_tpu.utils.native import btd_flat_index, coo_bandwidth

    rows = np.asarray(rows, dtype=np.int64).reshape(-1)
    cols = np.asarray(cols, dtype=np.int64).reshape(-1)
    if bs is None:
        bw = coo_bandwidth(rows, cols) + 1
        bs = choose_block_size(bw, n)
    N = max((n + bs - 1) // bs, 1)
    flat, n_bad = btd_flat_index(rows, cols, n, bs, N)
    if n_bad:
        d = np.abs(rows // bs - cols // bs)
        bad = np.argmax(d > 1)
        raise ValueError(
            f"entry ({rows[bad]},{cols[bad]}) outside block-tridiagonal band "
            f"(bs={bs}); increase block size"
        )
    if flat.max(initial=0) < np.iinfo(np.int32).max:
        flat = flat.astype(np.int32)
    return BTDPattern(n=n, N=N, bs=bs, flat_idx=flat)
