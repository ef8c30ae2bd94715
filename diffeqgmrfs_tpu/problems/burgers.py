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

from functools import lru_cache

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


def _test_row_fold(disc):
    """Galerkin test-row fold map for affine constraints.

    Returns (row_map [n] int, row_coef [n] float): assembly contributions
    with test index d land in row `row_map[d]` scaled by `row_coef[d]`.
    Free dofs map to themselves with coefficient 1; PERIODIC prescribed
    dofs fold into their master row with the constraint coefficient (the
    merged dof's test function is phi_m + c phi_p — zeroing the row
    instead drops the seam element's flux and breaks conservation at the
    periodic boundary, see BurgersForwardMarch); Dirichlet prescribed
    dofs (coefficient 0) drop, matching the reference's row zeroing
    (`/root/reference/src/problems/burgers.jl:54-57`)."""
    ch = disc.constraint_handler
    n = disc.ndofs
    row_map = np.arange(n, dtype=np.int32)
    row_coef = np.ones(n)
    pres = np.asarray(ch.prescribed_dofs)
    if len(pres) == 0:
        return row_map, row_coef
    s_col = np.asarray(ch.s_col)
    s_coef = np.asarray(ch.s_coef)
    free = np.asarray(ch.free_dofs)
    slot_to_full = np.full(int(s_col.max()) + 1, -1, dtype=np.int64)
    slot_to_full[s_col[free]] = free
    for p in pres:
        c = float(s_coef[p])
        if c == 0.0:
            row_coef[p] = 0.0
        else:
            m = slot_to_full[s_col[p]]
            assert m >= 0
            row_map[p] = m
            row_coef[p] = c
    return row_map, row_coef


@lru_cache(maxsize=64)
def _rowop_structure_rc(rows_bytes, cols_bytes, shape, ndofs):
    """Row-sparsity union for cell scatters whose TEST rows are remapped
    (folded) while trial columns stay: rows = row_map[cell_dofs],
    cols = cell_dofs. Same slot/pad conventions as
    `fem.assembly._rowop_structure`."""
    import scipy.sparse as sp

    rows_cell = np.frombuffer(rows_bytes, dtype=np.int32).reshape(shape)
    cols_cell = np.frombuffer(cols_bytes, dtype=np.int32).reshape(shape)
    nd = shape[1]
    r = np.repeat(rows_cell[:, :, None], nd, axis=2).reshape(-1)
    c = np.repeat(cols_cell[:, None, :], nd, axis=1).reshape(-1)
    M = sp.coo_matrix(
        (np.ones(len(r)), (r, c)), shape=(ndofs, ndofs)
    ).tocsr()
    M.sum_duplicates()
    counts = np.diff(M.indptr)
    K = int(counts.max())
    cols = np.zeros((ndofs, K), dtype=np.int64)
    for i in range(ndofs):
        ci = M.indices[M.indptr[i] : M.indptr[i + 1]]
        cols[i, : counts[i]] = ci
        if counts[i] < K:
            cols[i, counts[i] :] = ci[0] if counts[i] else i
    slot = np.argmax(cols[r] == c[:, None], axis=1)
    return cols, slot, K


def fold_rowop_rows(op: RowOp, row_map, row_coef) -> RowOp:
    """Fold prescribed test rows of an assembled RowOp into their masters:
    out[m] = op[m] + sum_p coef[p] * op[p]; prescribed/Dirichlet rows -> 0.
    Structure is widened by the folded rows' slots (static host-side)."""
    n = op.n_rows
    row_map = np.asarray(row_map)
    row_coef = np.asarray(row_coef)
    idx = np.arange(n)
    pres = np.where((row_map != idx) & (row_coef != 0.0))[0]
    self_mult = np.where(row_map == idx, row_coef, 0.0)
    if len(pres) == 0:
        return RowOp(op.cols, op.vals * jnp.asarray(
            self_mult, dtype=op.vals.dtype)[:, None], op.n_cols)
    # group folded rows by master
    order = np.argsort(row_map[pres], kind="stable")
    pres = pres[order]
    masters, start = np.unique(row_map[pres], return_index=True)
    counts = np.diff(np.append(start, len(pres)))
    F = int(counts.max())
    K = op.K
    src_row = np.repeat(idx[:, None], F, axis=1)  # self => coef 0, in-span
    src_coef = np.zeros((n, F))
    for m, s, cnt in zip(masters, start, counts):
        src_row[m, :cnt] = pres[s : s + cnt]
        src_coef[m, :cnt] = row_coef[pres[s : s + cnt]]
    cols2 = np.concatenate(
        [np.asarray(op.cols), np.asarray(op.cols)[src_row].reshape(n, F * K)],
        axis=1,
    )
    sm = jnp.asarray(self_mult, dtype=op.vals.dtype)
    sc = jnp.asarray(src_coef, dtype=op.vals.dtype)
    vals2 = jnp.concatenate(
        [op.vals * sm[:, None],
         (op.vals[src_row] * sc[:, :, None]).reshape(n, F * K)],
        axis=1,
    )
    return RowOp(cols2, vals2, op.n_cols)


def _st_rowop_from_batched_cellop(disc, Ke, ve, t_indices, N_t,
                                  row_map=None, row_coef=None):
    """Scatter per-time element matrices into an ST RowOp + residual vector.

    Ke: [T', nc, nd, nd]; ve: [T', nc, nd]; rows of output = T' x ndofs
    spatial rows placed at time blocks t_indices (column side). Optional
    (row_map, row_coef) fold test rows (Galerkin condensation of affine
    constraints, `_test_row_fold`)."""
    cell_dofs = disc.dof_handler.cell_dofs_field("u")
    n = disc.ndofs
    nd = cell_dofs.shape[1]
    if row_map is not None:
        rows_cell = np.asarray(row_map)[cell_dofs].astype(np.int32)
        rc = jnp.asarray(row_coef, dtype=Ke.dtype)[cell_dofs]  # [nc, nd]
        Ke = Ke * rc[None, :, :, None]
        ve = ve * rc[None, :, :]
        cols_sp, slot, K = _rowop_structure_rc(
            rows_cell.tobytes(),
            cell_dofs.astype(np.int32).tobytes(),
            cell_dofs.shape,
            n,
        )
    else:
        rows_cell = cell_dofs
        base = CellOp(cell_dofs, Ke[0], n)
        cols_sp, slot, K = base.rowop_structure()
    rows_flat = np.repeat(rows_cell[:, :, None], nd, axis=2).reshape(-1)
    vec_rows = rows_cell.reshape(-1)

    def scatter_one(Ke_t, ve_t):
        vals = jnp.zeros((n, K), dtype=Ke_t.dtype)
        vals = vals.at[rows_flat, slot].add(Ke_t.reshape(-1))
        vec = jnp.zeros(n, dtype=ve_t.dtype).at[vec_rows].add(
            ve_t.reshape(-1)
        )
        return vals, vec

    vals, vecs = jax.vmap(scatter_one)(Ke, ve)  # [T', n, K], [T', n]
    t_indices = np.asarray(list(t_indices), dtype=np.int64)
    cols = (cols_sp[None] + (t_indices * n)[:, None, None]).reshape(-1, K)
    op = RowOp(cols, vals.reshape(-1, K), n * N_t)
    return op, vecs.reshape(-1)


class BurgersFEMResidual:
    """Implicit-Euler (or Crank-Nicolson) FEM residual for 1D Burgers.

    `fold_rows` (default): affine-prescribed test rows fold into their
    master rows (proper Galerkin condensation S^T J S) instead of being
    zeroed. For Dirichlet problems the two coincide; for PERIODIC meshes
    zeroing loses the seam element's flux and the discrete dynamics drift
    O(1) from the truth on instances whose wave crosses the boundary
    (experiments/analysis/march_check.py; the marched trajectory error
    drops 0.80 -> 7.7e-3 at N_x=200 with the fold)."""

    def __init__(self, disc, ts, nu, scheme: str = "implicit_euler",
                 fold_rows: bool = True):
        self.disc = disc
        self.N_t = len(ts)
        self.nu = float(nu)
        self.dt = float(np.asarray(ts)[1] - np.asarray(ts)[0])
        self.scheme = scheme
        self.fold_rows = bool(fold_rows)
        self.prescribed = disc.constraint_handler.prescribed_dofs
        self.row_mask = np.ones(disc.ndofs)
        if len(self.prescribed):
            self.row_mask[self.prescribed] = 0.0
        if fold_rows:
            self._row_map, self._row_coef = _test_row_fold(disc)
            M = fold_rowop_rows(
                assemble_mass(disc).to_rowop(),
                self._row_map, self._row_coef,
            )
            G = fold_rowop_rows(
                assemble_stiffness(disc).to_rowop(),
                self._row_map, self._row_coef,
            )
        else:
            self._row_map = self._row_coef = None
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
                self.disc, op.Ke, op.fe, range(1, self.N_t), self.N_t,
                row_map=self._row_map, row_coef=self._row_coef,
            )
        else:
            op = assemble_advection_1d(self.disc, W)  # all t
            J_all, v_all = _st_rowop_from_batched_cellop(
                self.disc, op.Ke, op.fe, range(0, self.N_t), self.N_t,
                row_map=self._row_map, row_coef=self._row_coef,
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
        if not self.fold_rows:
            # zero prescribed test rows (`src/problems/burgers.jl:54-57`)
            full_mask = jnp.tile(mask, self.N_t - 1)
            J_adv = J_adv.scale_rows(full_mask)
            v_adv = v_adv * full_mask
        # (fold path: row_coef already dropped/folded prescribed rows)
        f = self.J_static.matvec(w) + self.dt * v_adv
        J = self.J_static + J_adv.scale(self.dt)
        return f, J


class BurgersForwardMarch:
    """Deterministic implicit-Euler FEM time march of 1D Burgers.

    Gauss-Newton warm start for the spatiotemporal MAP problem: starting
    from the IC-conditioned posterior's first time slice, march the SAME
    FEM discretization forward in time (per-step Newton on the spatial
    system). The resulting trajectory is within O(noise_fem^-1) of the
    joint MAP, so GN started there converges in a handful of steps where
    the reference's prior-mean start (`scripts/burgers/solve_burgers_gmrf-fem.jl:172-180`,
    x0 = mean(x_ic)) needs many more at fine resolution.

    The spatial system is small in 1D (n_free = 2 N_x for P2 periodic), so
    each Newton step solves a dense [n_free, n_free] system — one LU on
    the MXU per iteration; the march costs ~N_t * n_newton dense solves,
    negligible next to one windowed-QR GN step on the ST system.
    """

    def __init__(self, disc, ts, nu, n_newton: int = 4, substeps: int = 1,
                 scheme: str = "implicit_euler", fold_rows: bool = True):
        from diffeqgmrfs_tpu.gmrf.affine import AffineMap

        if scheme != "implicit_euler":
            raise NotImplementedError(scheme)
        self.disc = disc
        self.nu = float(nu)
        ts = np.asarray(ts)
        self.dt = float(ts[1] - ts[0])
        self.N_t = len(ts)
        self.n_newton = int(n_newton)
        self.substeps = int(substeps)
        self.fold_rows = bool(fold_rows)
        self.affine = AffineMap.from_constraint_handler(disc.constraint_handler)
        if fold_rows:
            # proper Galerkin condensation S^T J S / S^T r: periodic
            # prescribed test rows FOLD into their master rows (the merged
            # dof's test function is phi_m + phi_p). Row-ZEROING instead
            # drops the seam element's flux and breaks conservation at the
            # periodic boundary — the marched trajectory then drifts ~80%
            # from the FD truth on instances whose wave crosses the seam
            # (march_check.py, RESULTS.md round 2 continued). Dirichlet
            # rows drop naturally (s_coef = 0).
            from diffeqgmrfs_tpu.fem.assembly import (
                assemble_mass,
                assemble_stiffness,
            )

            M = assemble_mass(disc).to_rowop()
            G = assemble_stiffness(disc).to_rowop()
            self.row_mask = np.ones(disc.ndofs)
        else:
            M, G = assemble_burgers_mass_diffusion_matrices(disc)
            self.row_mask = np.ones(disc.ndofs)
            if len(disc.constraint_handler.prescribed_dofs):
                self.row_mask[disc.constraint_handler.prescribed_dofs] = 0.0
        self.M = M
        # static dense linear part at the SUBSTEP dt
        dt_s = self.dt / self.substeps
        self.A_lin = np.asarray((M + G.scale(dt_s * self.nu)).to_dense())
        # advection scatter structure (static)
        cell_dofs = disc.dof_handler.cell_dofs_field("u")
        nd = cell_dofs.shape[1]
        self._adv_rows = np.repeat(cell_dofs[:, :, None], nd, axis=2).reshape(-1)
        self._adv_cols = np.repeat(cell_dofs[:, None, :], nd, axis=1).reshape(-1)
        self._vec_rows = cell_dofs.reshape(-1)

    def step(self, u_prev_full):
        """One observation-grid implicit-Euler step (`substeps` internal
        implicit-Euler sub-intervals, each solved by Newton)."""
        from diffeqgmrfs_tpu.fem.assembly import assemble_advection_1d

        disc = self.disc
        dt_s = self.dt / self.substeps
        n = disc.ndofs
        aff = self.affine
        free = np.asarray(aff.free_dofs)
        s_col = np.asarray(aff.s_col)
        s_coef = np.asarray(aff.s_coef)
        dtype = jnp.asarray(u_prev_full).dtype
        A_lin = jnp.asarray(self.A_lin, dtype=dtype)
        mask = jnp.asarray(self.row_mask).astype(dtype)
        M_cast = self.M.astype(dtype)

        def newton_body(Mu_prev, v_free):
            # free_to_full promotes through f64 s_coef; pin the march dtype
            v_full = aff.free_to_full(v_free).astype(dtype)
            op = assemble_advection_1d(disc, v_full)
            J_adv = jnp.zeros((n, n), dtype=dtype).at[
                self._adv_rows, self._adv_cols
            ].add(op.Ke.reshape(-1).astype(dtype))
            v_adv = jnp.zeros(n, dtype=dtype).at[self._vec_rows].add(
                op.fe.reshape(-1).astype(dtype)
            )
            r = A_lin @ v_full - Mu_prev + dt_s * v_adv * mask
            J_full = A_lin + dt_s * J_adv * mask[:, None]
            # condense columns through the affine constraints (J @ S)
            nfp = aff.n_free_padded
            sc = jnp.asarray(s_coef, dtype=dtype)
            J_c = jnp.zeros((n, nfp), dtype=dtype).at[:, s_col].add(
                J_full * sc[None, :]
            )
            if self.fold_rows:
                # S^T J S and S^T r (Galerkin): seam rows accumulate
                J_sq = jnp.zeros((nfp, nfp), dtype=dtype).at[s_col].add(
                    sc[:, None] * J_c
                )
                r_c = jnp.zeros(nfp, dtype=dtype).at[s_col].add(sc * r)
                occ = np.zeros(nfp)
                occ[s_col[free]] = 1.0
                J_sq = J_sq + jnp.asarray(np.diag(1.0 - occ), dtype=dtype)
                dv = jnp.linalg.solve(J_sq, -r_c)
                return v_free + dv
            J_sq = J_c[free][:, s_col[free]]
            dv = jnp.linalg.solve(J_sq, -r[free])
            return v_free.at[s_col[free]].add(dv)

        def substep(u_prev, _):
            Mu_prev = M_cast.matvec(u_prev)
            v = jax.lax.fori_loop(
                0, self.n_newton,
                lambda _, vf: newton_body(Mu_prev, vf),
                aff.restrict(u_prev),
            )
            return aff.free_to_full(v).astype(dtype), None

        u, _ = jax.lax.scan(substep, u_prev_full, None, length=self.substeps)
        return u

    def trajectory(self, u0_full):
        """March N_t-1 steps: [N_t, ndofs] full-dof trajectory (scan)."""

        def f(u, _):
            u_next = self.step(u)
            return u_next, u_next

        _, W = jax.lax.scan(f, u0_full, None, length=self.N_t - 1)
        return jnp.concatenate([u0_full[None], W], axis=0)


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
