"""Burgers equation residual builders (FEM and collocation forms).

Analogs of `/root/reference/src/problems/burgers.jl` + the residual wiring in
`scripts/burgers/solve_burgers_gmrf-fem.jl:118-149` (implicit Euler),
`_research/burgers_chen24.jl:121-132,195-212` (Crank-Nicolson), and
`scripts/burgers/solve_burgers_gmrf-collocation.jl:163-192` (collocation).

All builders return an `f_and_J(w_full) -> (f, J: RowOp)` closure over the
FULL space-time dof vector, with prescribed test rows zeroed; the
Gauss-Newton optimizer condenses Jacobian columns through the prior's affine
constraints. Row block t (t = 1..N_t-1) holds the timestep residual

    M u_{t} - M u_{t-1} + dt [ nu G u_* + adv(u_*) ] = 0

with * = t for implicit Euler, * = averaged for Crank-Nicolson.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem.assembly import (
    assemble_mass,
    assemble_stiffness,
    assemble_advection_1d,
    CellOp,
)
from diffeqgmrfs_tpu.fem.operators import (
    RowOp,
    replicate_over_time,
    vstack_rowops,
)


def assemble_burgers_mass_diffusion_matrices(disc, lumping: bool = False):
    """(M, G) as RowOps on full dofs with prescribed rows zeroed — analog of
    `assemble_burgers_mass_diffusion_matrices`
    (`src/problems/burgers.jl:61-98`)."""
    prescribed = disc.constraint_handler.prescribed_dofs
    M = assemble_mass(disc, lumping=lumping).to_rowop()
    G = assemble_stiffness(disc).to_rowop()
    if len(prescribed):
        M = M.zero_rows(prescribed)
        G = G.zero_rows(prescribed)
    return M, G


def _st_rowop_from_batched_cellop(disc, Ke, ve, t_indices, N_t):
    """Scatter per-time element matrices into an ST RowOp + residual vector.

    Ke: [T', nc, nd, nd]; ve: [T', nc, nd]; rows of output = T' x ndofs
    spatial rows placed at time blocks t_indices (column side).
    """
    base = CellOp(
        disc.dof_handler.cell_dofs_field("u"),
        Ke[0],
        disc.ndofs,
    )
    cols_sp, slot, K = base.rowop_structure()
    nd = base.nd
    rows_flat = np.repeat(base.cell_dofs[:, :, None], nd, axis=2).reshape(-1)
    n = disc.ndofs

    def scatter_one(Ke_t, ve_t):
        vals = jnp.zeros((n, K), dtype=Ke_t.dtype)
        vals = vals.at[rows_flat, slot].add(Ke_t.reshape(-1))
        vec = jnp.zeros(n, dtype=ve_t.dtype).at[base.cell_dofs.reshape(-1)].add(
            ve_t.reshape(-1)
        )
        return vals, vec

    vals, vecs = jax.vmap(scatter_one)(Ke, ve)  # [T', n, K], [T', n]
    t_indices = np.asarray(list(t_indices), dtype=np.int64)
    cols = (cols_sp[None] + (t_indices * n)[:, None, None]).reshape(-1, K)
    op = RowOp(cols, vals.reshape(-1, K), n * N_t)
    return op, vecs.reshape(-1)


class BurgersFEMResidual:
    """Implicit-Euler (or Crank-Nicolson) FEM residual for 1D Burgers."""

    def __init__(self, disc, ts, nu, scheme: str = "implicit_euler"):
        self.disc = disc
        self.N_t = len(ts)
        self.nu = float(nu)
        self.dt = float(np.asarray(ts)[1] - np.asarray(ts)[0])
        self.scheme = scheme
        self.prescribed = disc.constraint_handler.prescribed_dofs
        self.row_mask = np.ones(disc.ndofs)
        if len(self.prescribed):
            self.row_mask[self.prescribed] = 0.0
        M, G = assemble_burgers_mass_diffusion_matrices(disc)
        N_t, dt, nu = self.N_t, self.dt, self.nu
        t_next = range(1, N_t)
        t_prev = range(0, N_t - 1)
        M_next = replicate_over_time(M, t_next, N_t)
        M_prev = replicate_over_time(M, t_prev, N_t)
        G_next = replicate_over_time(G, t_next, N_t)
        if scheme == "implicit_euler":
            # J_static = M_{t+1} - M_t + dt nu G_{t+1}
            # (`solve_burgers_gmrf-fem.jl:125`)
            self.J_static = M_next - M_prev + G_next.scale(dt * nu)
        elif scheme == "crank_nicolson":
            # J_static = M_{t+1} - M_t + dt nu 0.5 (G_{t+1} + G_t)
            # (`_research/burgers_chen24.jl:131`)
            G_prev = replicate_over_time(G, t_prev, N_t)
            self.J_static = M_next - M_prev + (G_next + G_prev).scale(0.5 * dt * nu)
        else:
            raise ValueError(scheme)
        self.n_rows = self.J_static.n_rows

    def f_and_J(self, w):
        """w: full ST dof vector [N_t * ndofs] -> (f, J)."""
        n = self.disc.ndofs
        W = jnp.asarray(w).reshape(self.N_t, n)
        mask = jnp.asarray(self.row_mask)
        if self.scheme == "implicit_euler":
            op = assemble_advection_1d(self.disc, W[1:])  # at t = 1..N_t-1
            J_adv, v_adv = _st_rowop_from_batched_cellop(
                self.disc, op.Ke, op.fe, range(1, self.N_t), self.N_t
            )
        else:
            op = assemble_advection_1d(self.disc, W)  # all t
            J_all, v_all = _st_rowop_from_batched_cellop(
                self.disc, op.Ke, op.fe, range(0, self.N_t), self.N_t
            )
            # rows t and t+1 averaged (`burgers_chen24.jl:195-212`)
            nr = self.N_t * n
            Jv = J_all.vals.reshape(self.N_t, n, -1)
            Jc = J_all.cols.reshape(self.N_t, n, -1)
            J_prev = RowOp(Jc[:-1].reshape(-1, Jc.shape[-1]),
                           Jv[:-1].reshape(-1, Jv.shape[-1]) * 0.5,
                           J_all.n_cols)
            J_next = RowOp(Jc[1:].reshape(-1, Jc.shape[-1]),
                           Jv[1:].reshape(-1, Jv.shape[-1]) * 0.5,
                           J_all.n_cols)
            J_adv = J_prev + J_next
            v = v_all.reshape(self.N_t, n)
            v_adv = (0.5 * (v[:-1] + v[1:])).reshape(-1)
        # zero prescribed test rows (`src/problems/burgers.jl:54-57`)
        full_mask = jnp.tile(mask, self.N_t - 1)
        J_adv = J_adv.scale_rows(full_mask)
        v_adv = v_adv * full_mask
        f = self.J_static.matvec(w) + self.dt * v_adv
        J = self.J_static + J_adv.scale(self.dt)
        return f, J


class BurgersCollocationResidual:
    """Pointwise collocation residual for 1D Burgers
    (`solve_burgers_gmrf-collocation.jl:163-192`)."""

    def __init__(self, disc, ts, nu, coll_points):
        from diffeqgmrfs_tpu.fem.operators import (
            evaluation_matrix,
            derivative_matrices,
            second_derivative_matrices,
        )

        self.N_t = len(ts)
        self.nu = float(nu)
        self.dt = float(np.asarray(ts)[1] - np.asarray(ts)[0])
        N_t = self.N_t
        A = evaluation_matrix(disc, coll_points)
        Dx = derivative_matrices(disc, coll_points, derivative_idcs=(0,))[0]
        Dxx = second_derivative_matrices(disc, coll_points, derivative_idcs=((0, 0),))[0]
        self.A_t = replicate_over_time(A, range(0, N_t - 1), N_t)
        self.A_tp1 = replicate_over_time(A, range(1, N_t), N_t)
        self.Dx_tp1 = replicate_over_time(Dx, range(1, N_t), N_t)
        self.Dxx_tp1 = replicate_over_time(Dxx, range(1, N_t), N_t)
        # J_static = A_{t+1} - A_t - dt nu Dxx_{t+1}
        self.J_static = self.A_tp1 - self.A_t - self.Dxx_tp1.scale(self.dt * self.nu)
        self.n_rows = self.J_static.n_rows

    def f_and_J(self, w):
        dt, nu = self.dt, self.nu
        Au = self.A_tp1.matvec(w)
        Du = self.Dx_tp1.matvec(w)
        f = (
            Au
            - self.A_t.matvec(w)
            + dt * Au * Du
            - dt * nu * self.Dxx_tp1.matvec(w)
        )
        J = self.J_static + (
            self.A_tp1.scale_rows(dt * Du) + self.Dx_tp1.scale_rows(dt * Au)
        )
        return f, J
