"""Conjugate-gradient solver with block-Jacobi preconditioning.

The iterative alternative to the BTD Cholesky — analog of the reference's
`CGSolverBlueprint()` (`/root/reference/src/spdes/shallow_water.jl:130`).
The preconditioner inverts the BTD diagonal blocks (one batched dense
Cholesky), which is exact when the matrix is block-diagonal and captures the
dominant coupling otherwise. Fully jit/vmap-able.

SCOPE (production guidance): CG is NOT a production path for the
conditioned-posterior / Gauss-Newton systems of the reference workloads.
Their condition numbers are set by the observation precisions
(1e8..1e18 on unit-scale priors, `_research/burgers_chen24.jl:101`):
block-Jacobi-preconditioned CG needs O(sqrt(cond)) ~ 1e4..1e9 iterations,
each costing a full operator matvec — while one BTD Cholesky factor +
two triangular sweeps is exact, O(N bs^3), and its factor is REUSED
across the mean solve, sampling backsolves, RBMC probes, Takahashi
variances, and refinement iterations of the same posterior. The direct
factor is also what the mixed-precision (f32 + refinement) and SRIF
square-root paths build on. CG remains correct and tested
(tests/test_models_extra.py::test_cg_matches_cholesky) for the regime the
reference itself uses it in — well-conditioned PRIOR applications
(shallow_water.jl's prior construction) — and as a building block for
future matrix-free preconditioned experiments; it is intentionally not
wired into any benchmark driver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from diffeqgmrfs_tpu.ops.btd import BTD


def block_jacobi_preconditioner(A: BTD):
    """-> function applying inv(blockdiag(A)) via cached block factors."""
    Ls = jnp.linalg.cholesky(A.diag)  # [N, bs, bs]
    N, bs = A.N, A.bs

    def apply(x):
        x = jnp.asarray(x)
        batch_shape = x.shape[:-1]
        k = 1
        for s in batch_shape:
            k *= s
        xb = x.reshape(k, x.shape[-1]).T  # [n, k]
        pad = N * bs - x.shape[-1]
        if pad:
            xb = jnp.pad(xb, ((0, pad), (0, 0)))
        xb = xb.reshape(N, bs, k)
        y = lax.linalg.triangular_solve(Ls, xb, left_side=True, lower=True)
        y = lax.linalg.triangular_solve(
            Ls, y, left_side=True, lower=True, transpose_a=True
        )
        y = y.reshape(N * bs, k)[: x.shape[-1]]
        return y.T.reshape(*batch_shape, x.shape[-1])

    return apply


def cg_solve(A: BTD, b, tol: float = 1e-10, maxiter: int = 1000, x0=None):
    """Solve A x = b by preconditioned CG on the BTD matvec."""
    M = block_jacobi_preconditioner(A)
    x, _ = jax.scipy.sparse.linalg.cg(
        A.matvec, jnp.asarray(b), x0=x0, tol=tol, maxiter=maxiter, M=M
    )
    return x
