"""Spatiotemporal advection-diffusion SPDE priors via implicit-Euler SSMs.

Analog of the reference engine's `AdvectionDiffusionSPDE{1}(κ=, α=, H=, γ=,
c=, τ=, spatial_spde=, initial_spde=)` + `ImplicitEulerSSM` + `joint_ssm`
(SURVEY.md §2.3; call sites `/root/reference/scripts/burgers/
solve_burgers_gmrf-fem.jl:95-106`, in-repo construction pattern
`src/spdes/shallow_water.jl:210-231`). The SPDE (Clarotto-style):

    du/dt + (1/c) [ (kappa^2 - div H grad)^alpha + gamma . grad ] u
        = (tau / sqrt(c)) dW_s(t),   W_s spatially colored by spatial_spde

FEM + implicit Euler gives the linear-Gaussian chain

    T(dt) x_{t+1} = M~ x_t + w_t,    T(dt) = M~ + dt K
    K = (1/c)(kappa^2 M~ + G_H + sum_d gamma_d B_d)
    w_t ~ N(0, (dt tau^2 / c) * M~ Q_s^{-1} M~)     (projected colored noise)

whose joint distribution over all timesteps is a GMRF with *block-tridiagonal*
precision — with noise precision P = (c / dt tau^2) M~^{-1} Q_s M~^{-1}:

    Q[0,0]   = Q_0 + M~ P M~
    Q[t,t]   = T'PT + M~PM~        (0 < t < T-1)
    Q[T-1,T-1] = T'PT
    Q[t+1,t] = -T'P M~

TPU-first: spatial operators live as dense [n_free, n_free] blocks (the BTD
blocks are dense anyway), so the whole prior construction is a handful of
GEMMs that jit-compiles and vmaps over instances — the advection speed gamma
is *traced* (it is the per-instance bulk speed,
`solve_burgers_gmrf-fem.jl:88`), unlike the reference which rebuilds sparse
matrices per instance on the host.

Constraints are hard-condensed to free dofs; `prescribed_noise` is accepted
for API parity (the reference soft-pins prescribed dofs with tiny noise,
`shallow_water.jl:203-207`) but exact affine constraints make it unnecessary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.discretization import FEMDiscretization
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.gmrf.gmrf import (
    GMRF,
    ConstrainedGMRF,
    ImplicitEulerConstantMeshSTGMRF,
)
from diffeqgmrfs_tpu.models.matern import (
    MaternSPDE,
    matern_spatial_dense,
    host_mass_stiffness,
    condense_matrix,
    condense_diag,
)
from diffeqgmrfs_tpu.ops.btd import BTD, ToeplitzBTD
from diffeqgmrfs_tpu.solvers.blueprints import DEFAULT_BLUEPRINT

import scipy.sparse as sp


@dataclass(frozen=True)
class AdvectionDiffusionSPDE:
    """Parameters of the spatiotemporal SPDE (see module docstring)."""

    d: int = 1
    kappa: float = 0.0
    alpha: int = 1
    H: object = None  # [d, d] diffusion tensor (defaults to identity)
    gamma: object = 0.0  # advection velocity [d] (may be traced)
    c: float = 1.0
    tau: float = 1.0
    spatial_spde: MaternSPDE | None = None
    initial_spde: MaternSPDE | None = None


@dataclass
class ImplicitEulerSSM:
    """Linear-Gaussian chain T(dt) x_{t+1} = M(dt) x_t + beta(dt) eps.

    API-parity analog of the reference `ImplicitEulerSSM(x0, G_fn, M_fn,
    M_inv_fn, beta, beta_inv, x0, ts)` (`src/spdes/shallow_water.jl:219-228`).
    All matrix-valued callables return dense [n, n] (or diagonal [n]) arrays
    on the free dof space.
    """

    x0: GMRF
    G_fn: Callable  # dt -> transition T(dt), dense
    M_fn: Callable  # dt -> M(dt), dense or diag
    M_inv_fn: Callable
    beta_fn: Callable  # dt -> noise sqrt-covariance factor (unused in joint)
    beta_inv_fn: Callable  # dt -> noise *precision* P(dt), dense
    ts: np.ndarray

    @property
    def N_t(self) -> int:
        return len(self.ts)


def _as_dense(A, n, dtype):
    A = jnp.asarray(A)
    if A.ndim == 1:
        return jnp.zeros((n, n), dtype=dtype).at[
            jnp.arange(n), jnp.arange(n)
        ].set(A.astype(dtype))
    return A.astype(dtype)


def joint_ssm(ssm: ImplicitEulerSSM, dtype=jnp.float64) -> BTD:
    """Assemble the joint (all-timestep) block-tridiagonal precision.

    Analog of the reference `joint_ssm` (`src/spdes/shallow_water.jl:230`),
    which takes arbitrary `ts` with per-step G(dt)/beta(dt)
    (`src/spdes/shallow_water.jl:210-230`). Uniform grids take a
    broadcast fast path (one set of distinct blocks — the Toeplitz
    structure `ops/btd.ToeplitzBTD` exploits); non-uniform grids build
    per-step (T_t, P_t) blocks:

        diag[0]     = Q_0 + M~ P_0 M~
        diag[t]     = T'_{t-1} P_{t-1} T_{t-1} + M~ P_t M~
        diag[Nt-1]  = T'_{Nt-2} P_{Nt-2} T_{Nt-2}
        lower[t]    = -T'_t P_t M~
    """
    ts = np.asarray(ssm.ts, dtype=np.float64)
    dts = np.diff(ts)
    N_t = len(ts)
    n = ssm.x0.n
    Q0 = ssm.x0.precision.to_dense().astype(dtype)

    def step_blocks(dt):
        T = _as_dense(ssm.G_fn(dt), n, dtype)
        M = _as_dense(ssm.M_fn(dt), n, dtype)
        P = _as_dense(ssm.beta_inv_fn(dt), n, dtype)
        PT = P @ T
        PM = P @ M
        return T.T @ PT, M.T @ PM, -(T.T @ PM)

    if np.allclose(dts, dts[0], rtol=1e-8):
        TPT, MPM, off = step_blocks(float(dts[0]))
        diag = jnp.broadcast_to(TPT + MPM, (N_t, n, n))
        diag = diag.at[0].set(Q0 + MPM)
        diag = diag.at[N_t - 1].set(TPT)
        lower = jnp.broadcast_to(off, (N_t - 1, n, n))
        return BTD(diag, lower, N_t * n)

    TPTs, MPMs, offs = zip(*(step_blocks(float(dt)) for dt in dts))
    diag = [Q0 + MPMs[0]]
    for t in range(1, N_t - 1):
        diag.append(TPTs[t - 1] + MPMs[t])
    diag.append(TPTs[-1])
    return BTD(jnp.stack(diag), jnp.stack(offs), N_t * n)


def discretize_advection_diffusion(
    spde: AdvectionDiffusionSPDE,
    disc: FEMDiscretization,
    ts,
    mean_offset=0.0,
    prescribed_noise: float = 1e-8,
    solver_blueprint=None,
    dtype=jnp.float64,
    pad_block: int | None = None,
):
    """FEM-discretize the spatiotemporal SPDE into an ST-GMRF prior.

    Analog of `GaussianMarkovRandomFields.discretize(spde, disc, ts;
    mean_offset=, prescribed_noise=)`
    (`scripts/burgers/solve_burgers_gmrf-fem.jl:106`).

    pad_block: pad the spatial free-dof block to a multiple of this value
    (e.g. 128 for MXU-aligned tiles); padded slots carry identity precision
    and zero mean and are invisible through the constrained reconstruction.
    """
    del prescribed_noise  # constraints are exact here (see module docstring)
    bp = solver_blueprint or DEFAULT_BLUEPRINT
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    has_constraints = len(affine.prescribed_dofs) > 0
    am = affine if has_constraints else None

    dim = disc.mesh.dim
    m, G = host_mass_stiffness(disc)
    H = np.asarray(spde.H) if spde.H is not None else np.eye(dim)
    if dim == 1:
        G_H_host = float(H.reshape(-1)[0]) * G
    else:
        # anisotropic diffusion term int grad(phi_i) . H grad(phi_j)
        # (declared library surface: `AdvectionDiffusionSPDE{D}` carries an
        # H tensor, `scripts/burgers/solve_burgers_gmrf-fem.jl:95-104`)
        G_H_host = host_anisotropic_stiffness(disc, H)
    Bs = [host_advection_matrix(disc, direction=d_) for d_ in range(dim)]
    if am is not None:
        G_H_host = condense_matrix(G_H_host, am)
        Bs = [condense_matrix(B_, am) for B_ in Bs]
        m = condense_diag(m, am)
    n = len(m)
    G_H = jnp.asarray(G_H_host.toarray(), dtype=dtype)
    B_dense = [jnp.asarray(B_.toarray(), dtype=dtype) for B_ in Bs]
    m = jnp.asarray(m, dtype=dtype)
    gamma = jnp.asarray(spde.gamma, dtype=dtype).reshape(-1)

    Q_s = matern_spatial_dense(spde.spatial_spde, disc, am).astype(dtype)
    Q_0 = matern_spatial_dense(spde.initial_spde, disc, am).astype(dtype)

    c, tau, kappa = float(spde.c), float(spde.tau), float(spde.kappa)
    diag_idx = jnp.arange(n)

    K = G_H
    for d_ in range(dim):
        K = K + gamma[d_] * B_dense[d_]
    K = K / c
    K = K.at[diag_idx, diag_idx].add((kappa**2) * m / c)
    if spde.alpha != 1:
        # K_diff^alpha via M~^{-1} lifting (not exercised by reference configs)
        for _ in range(int(spde.alpha) - 1):
            K = K @ ((K / m[:, None]))
    M_inv = 1.0 / m

    ts = np.asarray(ts, dtype=np.float64)
    dt0 = float(ts[1] - ts[0])

    def G_fn(dt):
        T = dt * K
        return T.at[diag_idx, diag_idx].add(m)

    def M_fn(dt):
        return m

    def M_inv_fn(dt):
        return M_inv

    def beta_inv_fn(dt):
        # P(dt) = (c / (dt tau^2)) M~^{-1} Q_s M~^{-1}
        return (c / (dt * tau**2)) * (M_inv[:, None] * Q_s * M_inv[None, :])

    def beta_fn(dt):
        raise NotImplementedError("joint assembly uses beta_inv (precision) form")

    x0 = GMRF(jnp.zeros(n, dtype=dtype), _dense_to_btd(Q_0), None, bp)
    ssm = ImplicitEulerSSM(x0, G_fn, M_fn, M_inv_fn, beta_fn, beta_inv_fn, ts)
    Q_joint = joint_ssm(ssm, dtype=dtype)

    N_t = len(ts)
    if pad_block is not None and n % pad_block:
        if not has_constraints:
            raise NotImplementedError(
                "pad_block requires a constrained discretization (the padded "
                "slots are hidden behind the affine reconstruction)"
            )
        bs_pad = -(-n // pad_block) * pad_block
        Q_joint = _pad_st_blocks(Q_joint, n, bs_pad)
        mask = jnp.concatenate(
            [jnp.ones(n, dtype), jnp.zeros(bs_pad - n, dtype)]
        )
        mu = jnp.tile(jnp.asarray(mean_offset, dtype=dtype) * mask, N_t)
        inner = ImplicitEulerConstantMeshSTGMRF(
            mu, Q_joint, None, bp, disc, N_t, ssm
        )
        return ConstrainedGMRF(inner, affine.replicate(N_t, stride=bs_pad))

    mu = jnp.full((N_t * n,), jnp.asarray(mean_offset, dtype=dtype))
    inner = ImplicitEulerConstantMeshSTGMRF(
        mu, Q_joint, None, bp, disc, N_t, ssm
    )
    if has_constraints:
        return ConstrainedGMRF(inner, affine.replicate(N_t))
    return inner


def _pad_st_blocks(Q: BTD, n: int, bs_pad: int) -> BTD:
    """Embed [N_t, n, n] ST blocks into [N_t, bs_pad, bs_pad] with identity
    precision on the padded slots."""
    N_t, pad = Q.N, bs_pad - n
    diag = jnp.pad(Q.diag, ((0, 0), (0, pad), (0, pad)))
    idx = jnp.arange(n, bs_pad)
    diag = diag.at[:, idx, idx].set(1.0)
    lower = jnp.pad(Q.lower, ((0, 0), (0, pad), (0, pad)))
    return BTD(diag, lower, N_t * bs_pad)


def _dense_to_btd(A: jnp.ndarray) -> BTD:
    n = A.shape[0]
    return BTD(A[None], jnp.zeros((0, n, n), dtype=A.dtype), n)


def st_prior_toeplitz(
    spde: AdvectionDiffusionSPDE,
    disc: FEMDiscretization,
    ts,
    mean_offset=0.0,
    pad_block: int | None = None,
    dtype=jnp.float64,
):
    """ST prior in DISTINCT-BLOCK (Toeplitz) form, never materializing the
    full [N_t, bs, bs] BTD: -> (mu_free, ToeplitzBTD, affine | None).

    The f64-BTD-free companion of `discretize_advection_diffusion` for the
    SRIF production pipeline: the four distinct blocks (d_first includes
    Q_0) are all a refinement operator or equilibration diagonal needs,
    and the square-root operands (`st_sqrt_ops`) carry the factorization.
    Requires a uniform time grid (the Toeplitz structure).
    """
    ts = np.asarray(ts, dtype=np.float64)
    dts = np.diff(ts)
    if not np.allclose(dts, dts[0], rtol=1e-8):
        raise NotImplementedError("Toeplitz form requires a uniform grid")
    dt = float(dts[0])
    N_t = len(ts)
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    has_constraints = len(affine.prescribed_dofs) > 0
    am = affine if has_constraints else None

    dim = disc.mesh.dim
    m, G = host_mass_stiffness(disc)
    H = np.asarray(spde.H) if spde.H is not None else np.eye(dim)
    if dim == 1:
        G_H_host = float(H.reshape(-1)[0]) * G
    else:
        G_H_host = host_anisotropic_stiffness(disc, H)
    Bs = [host_advection_matrix(disc, direction=d_) for d_ in range(dim)]
    if am is not None:
        G_H_host = condense_matrix(G_H_host, am)
        Bs = [condense_matrix(B_, am) for B_ in Bs]
        m = condense_diag(m, am)
    n = len(m)
    G_H = jnp.asarray(G_H_host.toarray(), dtype=dtype)
    B_dense = [jnp.asarray(B_.toarray(), dtype=dtype) for B_ in Bs]
    m_j = jnp.asarray(m, dtype=dtype)
    gamma = jnp.asarray(spde.gamma, dtype=dtype).reshape(-1)
    Q_s = matern_spatial_dense(spde.spatial_spde, disc, am).astype(dtype)
    Q_0 = matern_spatial_dense(spde.initial_spde, disc, am).astype(dtype)
    c, tau, kappa = float(spde.c), float(spde.tau), float(spde.kappa)
    if int(spde.alpha) != 1:
        raise NotImplementedError("Toeplitz form: alpha == 1 only")
    diag_idx = jnp.arange(n)
    K = G_H
    for d_ in range(dim):
        K = K + gamma[d_] * B_dense[d_]
    K = K / c
    K = K.at[diag_idx, diag_idx].add((kappa**2) * m_j / c)
    Minv = 1.0 / m_j
    T = dt * K
    T = T.at[diag_idx, diag_idx].add(m_j)
    P = (c / (dt * tau**2)) * (Minv[:, None] * Q_s * Minv[None, :])
    PT = P @ T
    TPT = T.T @ PT
    # M~ is diagonal: M P M and T'PM are row/col scalings
    MPM = m_j[:, None] * P * m_j[None, :]
    off = -(T.T @ P) * m_j[None, :]

    bs = n
    if pad_block is not None and n % pad_block:
        bs = -(-n // pad_block) * pad_block
        pad = bs - n

        def padded(Xd, identity):
            Y = jnp.zeros((bs, bs), dtype=dtype)
            Y = Y.at[:n, :n].set(Xd)
            if identity:
                idx = jnp.arange(n, bs)
                Y = Y.at[idx, idx].set(1.0)
            return Y

        d_first = padded(Q_0 + MPM, True)
        d_mid = padded(TPT + MPM, True)
        d_last = padded(TPT, True)
        off_p = padded(off, False)
        q_top = ToeplitzBTD(d_first, d_mid, d_last, off_p, N_t, N_t * bs)
        mask = jnp.concatenate(
            [jnp.ones(n, dtype), jnp.zeros(pad, dtype)]
        )
        mu = jnp.tile(jnp.asarray(mean_offset, dtype=dtype) * mask, N_t)
        return mu, q_top, (affine.replicate(N_t, stride=bs) if has_constraints else None)

    q_top = ToeplitzBTD(Q_0 + MPM, TPT + MPM, TPT, off, N_t, N_t * n)
    mu = jnp.full((N_t * n,), jnp.asarray(mean_offset, dtype=dtype))
    return mu, q_top, (affine.replicate(N_t) if has_constraints else None)


# ---------------------------------------------------------------------------
# ST-SRIF: sparse square root of the implicit-Euler joint precision
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class STSqrtOps:
    """Host-precomputed square-root operands of the spatiotemporal prior:
    stacked rows S with S^T S = Q_joint, for the SRIF windowed QR
    (ops/srif.py).

    The implicit-Euler joint precision (module docstring / `joint_ssm`) has
    a natural FILL-FREE sparse square root:

        S = [ Λ_0  on block 0 ]                      (Λ_0^T Λ_0 = Q_0)
            [ P^{1/2} (−M~ | T)  per step t ]        (blocks t, t+1)

    with P^{1/2} = sqrt(c/(dt τ²)) Λ_s M~^{-1} (Q_s = Λ_s^T Λ_s, lumped
    M~ diagonal) — so P^{1/2} M~ = sqrt(c/(dt τ²)) Λ_s exactly, and with
    T = M~ + dt K, K = (κ² M~ + G_H + γ B)/c, the per-step row block is

        left  (block t):   −s Λ_s                       s = sqrt(c/(dt τ²))
        right (block t+1):  s (1 + dt κ²/c) Λ_s + s (dt/c) Λ_s M~^{-1} G_H
                          + γ · s (dt/c) Λ_s M~^{-1} B

    The advection speed γ enters LINEARLY, so the step values are a static
    two-template combination `base + γ·gamma` evaluated in-trace — the f32
    windowed QR then covers the ST Gauss–Newton systems exactly as plain
    SRIF covers Darcy/elliptic, closing the fine-dt mixed-precision gap
    (Burgers sweep N_x>=200 x N_t=100, RESULTS.md). Uniform dt makes one
    template serve all steps. Reference semantics:
    `/root/reference/src/spdes/shallow_water.jl:210-231` (joint SSM),
    `scripts/burgers/solve_burgers_gmrf-fem.jl:95-107` (prior config).
    """

    lam0_plan: object  # ATAWindowPlan for the Λ_0 rows (window 0)
    lam0_vals: jnp.ndarray  # [r_0, K_0]
    step_plan: object  # ATAWindowPlan for all (N_t-1)*r_s step rows
    base_vals: jnp.ndarray  # [r_s, K] per-step template
    gamma_vals: jnp.ndarray  # [r_s, K] per-step template (γ coefficient)
    pad_plan: object = None  # identity rows on per-block padding slots
    pad_vals: jnp.ndarray = None
    n_steps: int = 0  # N_t - 1

    def tree_flatten(self):
        return (
            self.lam0_plan,
            self.lam0_vals,
            self.step_plan,
            self.base_vals,
            self.gamma_vals,
            self.pad_plan,
            self.pad_vals,
        ), (self.n_steps,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    def sqrt_ops(self, gamma):
        """SRIF operand list [(plan, vals), ...] at traced advection speed
        `gamma` (the per-instance bulk speed) — feed to `gauss_newton_solve
        (sqrt_ops=...)` together with the IC-observation operand."""
        g = jnp.asarray(gamma).reshape(-1)[0].astype(self.base_vals.dtype)
        v = self.base_vals + g * self.gamma_vals
        step_vals = jnp.tile(v, (self.n_steps, 1))
        ops = [(self.lam0_plan, self.lam0_vals), (self.step_plan, step_vals)]
        if self.pad_plan is not None:
            ops.append((self.pad_plan, self.pad_vals))
        return ops


def st_sqrt_ops(
    spde: AdvectionDiffusionSPDE,
    disc: FEMDiscretization,
    ts,
    pad_block: int | None = None,
    dtype=jnp.float32,
) -> STSqrtOps:
    """Build the ST square-root operands (see STSqrtOps). Host-side; uses
    only the STATIC fields of `spde` (gamma is ignored — it enters through
    `STSqrtOps.sqrt_ops(gamma)` in-trace)."""
    from diffeqgmrfs_tpu.models.matern import matern_sqrt_host
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan

    ts = np.asarray(ts, dtype=np.float64)
    dts = np.diff(ts)
    if not np.allclose(dts, dts[0], rtol=1e-8):
        raise NotImplementedError("st_sqrt_ops requires a uniform time grid")
    if int(spde.alpha) != 1:
        raise NotImplementedError(
            "st_sqrt_ops requires alpha == 1 (gamma enters nonlinearly "
            "through K^alpha otherwise)"
        )
    if disc.mesh.dim != 1:
        raise NotImplementedError("st_sqrt_ops: 1D spatial meshes only")
    dt = float(dts[0])
    N_t = len(ts)
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    am = affine if len(affine.prescribed_dofs) > 0 else None

    m, G = host_mass_stiffness(disc)
    B = host_advection_matrix(disc)
    if am is not None:
        G = condense_matrix(G, am)
        B = condense_matrix(B, am)
        m = condense_diag(m, am)
    n = len(m)
    bs = n
    if pad_block is not None and n % pad_block:
        bs = -(-n // pad_block) * pad_block
    H = np.asarray(spde.H) if spde.H is not None else np.eye(1)
    h = float(H.reshape(-1)[0])
    c, tau, kappa = float(spde.c), float(spde.tau), float(spde.kappa)
    s = np.sqrt(c / (dt * tau**2))

    Lam_s = matern_sqrt_host(spde.spatial_spde, disc, am)  # [r_s, n]
    Lam_0 = matern_sqrt_host(spde.initial_spde, disc, am)
    Minv = sp.diags(1.0 / m)
    LMG = (Lam_s @ Minv @ (h * G)).tocsr()
    LMB = (Lam_s @ Minv @ B).tocsr()

    W = 2 * bs

    def at_width(M, off):
        M = M.tocsr()
        return sp.csr_matrix(
            (M.data, M.indices + off, M.indptr), shape=(M.shape[0], W)
        )

    S_base = (
        at_width((-s) * Lam_s, 0)
        + at_width(s * (1.0 + dt * kappa**2 / c) * Lam_s + s * (dt / c) * LMG, bs)
    ).tocsr()
    S_gam = at_width(s * (dt / c) * LMB, bs).tocsr()
    S_base.sort_indices()
    S_gam.sort_indices()

    # union ELL structure with ALIGNED base/gamma value slots (scipy's add
    # prunes cancellations, so align by explicit (row, col) key lookup)
    U = (abs(S_base) + abs(S_gam)).tocsr()
    U.sort_indices()
    r_s = U.shape[0]
    counts = np.diff(U.indptr)
    K = int(counts.max())
    rr = np.repeat(np.arange(r_s, dtype=np.int64), counts)
    keys_U = rr * W + U.indices.astype(np.int64)

    def aligned(M):
        M = M.tocsr()
        M.sort_indices()
        mr = np.repeat(np.arange(r_s, dtype=np.int64), np.diff(M.indptr))
        keys_M = mr * W + M.indices.astype(np.int64)
        pos = np.searchsorted(keys_U, keys_M)
        assert np.array_equal(keys_U[pos], keys_M)
        out = np.zeros(U.nnz)
        out[pos] = M.data
        return out

    base_data = aligned(S_base)
    gam_data = aligned(S_gam)
    cols_tpl = np.zeros((r_s, K), dtype=np.int64)
    base_tpl = np.zeros((r_s, K))
    gam_tpl = np.zeros((r_s, K))
    valid = np.arange(K)[None, :] < counts[:, None]
    kk = np.arange(U.nnz) - np.repeat(U.indptr[:-1], counts)
    cols_tpl[rr, kk] = U.indices
    base_tpl[rr, kk] = base_data
    gam_tpl[rr, kk] = gam_data
    # padding slots: park on the row's first column (stays in-window)
    first = cols_tpl[:, 0]
    cols_tpl = np.where(valid, cols_tpl, first[:, None])

    n_total = N_t * bs
    t_off = (np.arange(N_t - 1, dtype=np.int64) * bs)[:, None, None]
    gcols = (cols_tpl[None] + t_off).reshape(-1, K)
    zero_slots = np.tile(~valid, (N_t - 1, 1))
    step_plan = make_ata_window_plan(gcols, n_total, bs, zero_slots=zero_slots)

    from diffeqgmrfs_tpu.fem.operators import RowOp
    from diffeqgmrfs_tpu.ops.srif import rowop_window_plan

    lam0 = RowOp.from_csr(Lam_0, dtype=dtype)
    lam0_plan = rowop_window_plan(lam0, n_total, bs)

    pad_plan = pad_vals = None
    if bs != n:
        pad = bs - n
        pj = np.arange(n, bs, dtype=np.int64)
        pcols = (
            (np.arange(N_t, dtype=np.int64) * bs)[:, None] + pj[None, :]
        ).reshape(-1, 1)
        pad_plan = make_ata_window_plan(pcols, n_total, bs)
        pad_vals = jnp.ones((N_t * pad, 1), dtype=dtype)

    return STSqrtOps(
        lam0_plan,
        lam0.vals,
        step_plan,
        jnp.asarray(base_tpl, dtype=dtype),
        jnp.asarray(gam_tpl, dtype=dtype),
        pad_plan,
        pad_vals,
        N_t - 1,
    )


def host_advection_matrix(
    disc: FEMDiscretization, direction: int = 0
) -> sp.csr_matrix:
    """Unit-speed advection matrix B[i,j] = ∫ φ_i ∂_{x_d} φ_j dΩ, host-side."""
    g = disc.geometry
    Be = np.einsum("cq,qi,cqj->cij", g.w_detJ, g.phi, g.grad[..., direction])
    return _scatter_cell_matrix(disc, Be)


def host_anisotropic_stiffness(
    disc: FEMDiscretization, H: np.ndarray
) -> sp.csr_matrix:
    """G_H[i,j] = ∫ ∇φ_i · H ∇φ_j dΩ for a constant SPD tensor H."""
    g = disc.geometry
    H = np.asarray(H, dtype=np.float64)
    Ge = np.einsum("cq,cqid,de,cqje->cij", g.w_detJ, g.grad, H, g.grad)
    return _scatter_cell_matrix(disc, Ge)


def _scatter_cell_matrix(disc: FEMDiscretization, Ae: np.ndarray) -> sp.csr_matrix:
    cd = disc.dof_handler.cell_dofs_field(disc.dof_handler.field_names[0])
    n = disc.ndofs
    nd = cd.shape[1]
    r = np.repeat(cd[:, :, None], nd, axis=2).reshape(-1)
    c = np.repeat(cd[:, None, :], nd, axis=1).reshape(-1)
    return sp.coo_matrix((Ae.reshape(-1), (r, c)), shape=(n, n)).tocsr()
