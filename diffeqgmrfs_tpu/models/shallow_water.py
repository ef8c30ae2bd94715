"""Linear shallow-water spatiotemporal SPDE prior (3-field h, u, v).

TPU-native analog of `/root/reference/src/spdes/shallow_water.jl`: the
linearized rotating shallow-water system

    dh/dt = -d/dx (H u) - d/dy (H v)
    du/dt = -g dh/dx + f v - k u
    dv/dt = -g dh/dy - f u - k v

assembled as a coupled 3-field FEM operator K plus per-field lumped mass M~
and stiffness G (`assemble_system!`, shallow_water.jl:17-122), a Matérn-like
spatial prior Q0 = ratio * K_m^T M~^{-1} K_m with K_m = kappa^2 M~ + G and
Gamma-function variance normalization (`:179-190`), and an implicit-Euler
SSM over the time grid whose joint precision is block-tridiagonal
(`:210-231`). Dofs are node-major interleaved (dof = node*3 + field), which
keeps everything banded; constraints are hard-condensed (the reference
soft-pins prescribed dofs with 1e-2 noise, `:172-175,203-207`).

Like the reference's version, this capability is not exercised by any
benchmark driver — it is library surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import gamma as gamma_fn, pi

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.discretization import FEMDiscretization
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.gmrf.gmrf import (
    GMRF,
    ConstrainedGMRF,
    ImplicitEulerConstantMeshSTGMRF,
)
from diffeqgmrfs_tpu.models.advection_diffusion import (
    ImplicitEulerSSM,
    joint_ssm,
    _dense_to_btd,
)
from diffeqgmrfs_tpu.solvers.blueprints import DEFAULT_BLUEPRINT


@dataclass(frozen=True)
class LinearShallowWaterSPDE:
    """Parameters (shallow_water.jl:5-15): H = depth field (callable or
    const), tau = noise scale, k = friction, f = Coriolis, g = gravity."""

    H: object = 1.0
    tau: float = 1.0
    k: float = 0.0
    f: float = 0.0
    g: float = 9.81


def _assemble_system_host(disc: FEMDiscretization, spde: LinearShallowWaterSPDE):
    """Host assembly of (K coupled, lumped mass diag, stiffness) on full dofs."""
    if tuple(sorted(disc.dof_handler.field_names)) != ("h", "u", "v"):
        raise ValueError("Expected fields: h, u, v")
    g = disc.geometry
    H_fn = spde.H if callable(spde.H) else (lambda x: np.full(x.shape[:-1], float(spde.H)))
    H_q = np.asarray(H_fn(g.qcoords))  # [nc, nq]
    w = g.w_detJ
    phi, grad = g.phi, g.grad
    nd = phi.shape[1]

    me_f = np.einsum("cq,qi,qj->cij", w, phi, phi)  # per-field mass
    se_f = np.einsum("cq,cqid,cqjd->cij", w, grad, grad)  # per-field stiffness
    zeros = np.zeros_like(me_f)

    # coupled blocks (shallow_water.jl:66-110); field order (h, u, v)
    k_hu = -np.einsum("cq,cq,cqi,qj->cij", w, H_q, grad[..., 0], phi)
    k_hv = -np.einsum("cq,cq,cqi,qj->cij", w, H_q, grad[..., 1], phi)
    k_uh = -spde.g * np.einsum("cq,cqi,qj->cij", w, grad[..., 0], phi)
    k_vh = -spde.g * np.einsum("cq,cqi,qj->cij", w, grad[..., 1], phi)
    k_uu = spde.k * me_f
    k_vv = spde.k * me_f
    k_uv = -spde.f * me_f
    k_vu = spde.f * me_f

    def block3(b):
        rows = [np.concatenate(r, axis=2) for r in b]
        return np.concatenate(rows, axis=1)

    ke = block3([[zeros, k_hu, k_hv], [k_uh, k_uu, k_uv], [k_vh, k_vu, k_vv]])
    me = block3([[me_f, zeros, zeros], [zeros, me_f, zeros], [zeros, zeros, me_f]])
    se = block3([[se_f, zeros, zeros], [zeros, se_f, zeros], [zeros, zeros, se_f]])

    cd = disc.dof_handler.cell_dofs  # [nc, 3 nd], layout [h..., u..., v...]
    n = disc.ndofs
    nd3 = cd.shape[1]
    r = np.repeat(cd[:, :, None], nd3, axis=2).reshape(-1)
    c = np.repeat(cd[:, None, :], nd3, axis=1).reshape(-1)
    K = sp.coo_matrix((ke.reshape(-1), (r, c)), shape=(n, n)).tocsr()
    S = sp.coo_matrix((se.reshape(-1), (r, c)), shape=(n, n)).tocsr()
    # HRZ-lumped coupled mass
    diag = np.einsum("cii->ci", me)
    cell_mass = me.sum(axis=(1, 2))
    diag = diag * (cell_mass / diag.sum(axis=1))[:, None]
    m = np.zeros(n)
    np.add.at(m, cd.reshape(-1), diag.reshape(-1))
    return K, m, S


def discretize_shallow_water(
    spde: LinearShallowWaterSPDE,
    disc: FEMDiscretization,
    ts,
    kappa_matern: float = 1.0,
    mean_offset: float = 0.0,
    solver_blueprint=None,
    dtype=jnp.float64,
):
    """`discretize(LinearShallowWaterSPDE, disc, ts)` analog
    (shallow_water.jl:124-242)."""
    bp = solver_blueprint or DEFAULT_BLUEPRINT
    affine = AffineMap.from_constraint_handler(disc.constraint_handler)
    has_constraints = len(affine.prescribed_dofs) > 0

    K, m, S = _assemble_system_host(disc, spde)
    if has_constraints:
        from diffeqgmrfs_tpu.models.matern import condense_matrix, condense_diag

        K = condense_matrix(K, affine)
        S = condense_matrix(S, affine)
        m = condense_diag(m, affine)
    n = len(m)

    # Matérn spatial prior (shallow_water.jl:177-196), nu = 2, d = 2
    K_m = sp.diags(kappa_matern**2 * m) + S
    Minv = sp.diags(1.0 / m)
    nu = 2
    sigma2_nat = gamma_fn(nu) / (gamma_fn(nu + 1) * 4 * pi * kappa_matern ** (2 * nu))
    ratio = sigma2_nat / 1.0
    Q0 = (ratio * (K_m.T @ Minv @ K_m)).toarray()

    m_j = jnp.asarray(m, dtype=dtype)
    K_j = jnp.asarray(K.toarray(), dtype=dtype)
    diag_idx = jnp.arange(n)
    tau = float(spde.tau)

    def G_fn(dt):
        T = dt * K_j
        return T.at[diag_idx, diag_idx].add(m_j)

    def M_fn(dt):
        return m_j

    def M_inv_fn(dt):
        return 1.0 / m_j

    def beta_inv_fn(dt):
        # beta(dt) = sqrt(dt) tau I  ->  P = 1/(dt tau^2) I   (:210-217)
        return jnp.full((n,), 1.0 / (dt * tau**2), dtype=dtype)

    x0 = GMRF(jnp.zeros(n, dtype=dtype), _dense_to_btd(jnp.asarray(Q0, dtype=dtype)), None, bp)
    ts = np.asarray(ts, dtype=np.float64)
    ssm = ImplicitEulerSSM(x0, G_fn, M_fn, M_inv_fn, None, beta_inv_fn, ts)
    Q_joint = joint_ssm(ssm, dtype=dtype)
    N_t = len(ts)
    mu = jnp.full((N_t * n,), float(mean_offset), dtype=dtype)
    inner = ImplicitEulerConstantMeshSTGMRF(mu, Q_joint, None, bp, disc, N_t, ssm)
    if has_constraints:
        return ConstrainedGMRF(inner, affine.replicate(N_t))
    return inner
