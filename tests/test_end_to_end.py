"""End-to-end integration tests: the three reference workload families at
small sizes, validated against analytic / independent numerical references
(SURVEY.md §4 test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.fem import (
    unit_square_discretization,
    uniform_unit_square_discretization,
    periodic_unit_interval_discretization,
    evaluation_matrix,
    Dirichlet,
    ConstraintHandler,
    spatial_to_spatiotemporal,
    replicate_over_time,
)
from diffeqgmrfs_tpu.gmrf import condition_on_observations, ConstrainedGMRF
from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern, AdvectionDiffusionSPDE, discretize_advection_diffusion
from diffeqgmrfs_tpu.problems import (
    EllipticCubicResidual,
    DarcyFEMObservations,
    BurgersFEMResidual,
)
from diffeqgmrfs_tpu.solvers import (
    GaussNewtonOptimizer,
    gauss_newton_solve,
    NewtonDecrementCriterion,
    StepNumberCriterion,
    OrCriterion,
)
from diffeqgmrfs_tpu.metrics import rel_err, rmse


def test_damped_gn_rejects_garbage_directions():
    """alpha=0 damping safeguard: a Newton direction from a broken solve
    (here: a WRONG-SIGN Jacobian — the stand-in for a factor beyond its
    f32 validity range, cf. the flagship N800x100 divergence where GN
    walked from a rel_err 1.75e-2 warm start to ~1.3) must be REJECTED
    when every backtracking candidate worsens the true MAP objective,
    leaving the iterate at the warm start, and the zeroed decrement must
    stop the loop immediately."""
    N = 8
    disc = unit_square_discretization(N, element_order=2)
    coords = np.asarray(disc.mesh.coords)
    qc = disc.geometry.qcoords

    def u_star(p):
        return np.sin(np.pi * p[..., 0]) * np.sin(np.pi * p[..., 1])

    rhs_q = 2 * np.pi**2 * u_star(qc) + u_star(qc) ** 3
    spde = MaternSPDE(d=2, range=0.3, smoothness=1)
    x = discretize_matern(spde, disc)
    bpts = coords[disc.mesh.node_sets["boundary"]]
    A_b = evaluation_matrix(disc, bpts)
    x_bc = condition_on_observations(x, A_b, 1e12, jnp.zeros(A_b.n_rows))
    prescribed = disc.dof_handler.node_dofs(
        "u", disc.mesh.node_sets["boundary"]
    )
    res = EllipticCubicResidual(disc, rhs_q, prescribed, alpha=1.0)
    crit = OrCriterion(
        [NewtonDecrementCriterion(1e-7), StepNumberCriterion(10)]
    )
    good = gauss_newton_solve(
        x_bc.mean(), x_bc.precision, res.f_and_J, 3e13,
        jnp.zeros(res.n_rows), x_bc.mean(), criterion=crit,
    )
    x_map = good.x_k

    def broken_f_and_J(w):
        f, J = res.f_and_J(w)
        return f, type(J)(J.cols, -3.0 * J.vals, J.n_cols)

    bad = gauss_newton_solve(
        x_bc.mean(), x_bc.precision, broken_f_and_J, 3e13,
        jnp.zeros(res.n_rows), x_map, criterion=crit, damping=True,
    )
    # iterate pinned at the warm start; the loop stops as soon as a step
    # is rejected (the f64 line search may legitimately accept one
    # phi-improving micro-step along the broken direction first)
    assert np.allclose(np.asarray(bad.x_k), np.asarray(x_map))
    assert int(bad.n_steps) <= 2


def test_elliptic_cubic_end_to_end():
    """-Delta u + u^3 = f, manufactured truth u* = sin(pi x) sin(pi y).

    Mini version of `_research/elliptic_chen24.jl`."""
    N = 12
    disc = unit_square_discretization(N, element_order=2)
    coords = np.asarray(disc.mesh.coords)

    def u_star(p):
        return np.sin(np.pi * p[..., 0]) * np.sin(np.pi * p[..., 1])

    qc = disc.geometry.qcoords
    rhs_q = 2 * np.pi**2 * u_star(qc) + u_star(qc) ** 3

    # prior + boundary conditioning (boundary values are 0 here)
    spde = MaternSPDE(d=2, range=0.3, smoothness=1)
    x = discretize_matern(spde, disc)
    bpts = coords[disc.mesh.node_sets["boundary"]]
    A_b = evaluation_matrix(disc, bpts)
    x_bc = condition_on_observations(x, A_b, 1e12, jnp.zeros(A_b.n_rows))

    prescribed = disc.dof_handler.node_dofs("u", disc.mesh.node_sets["boundary"])
    res = EllipticCubicResidual(disc, rhs_q, prescribed, alpha=1.0)

    result = gauss_newton_solve(
        x_bc.mean(),
        x_bc.precision,
        res.f_and_J,
        3e13,
        jnp.zeros(res.n_rows),
        x_bc.mean(),
        criterion=OrCriterion(
            [NewtonDecrementCriterion(1e-7), StepNumberCriterion(10)]
        ),
    )
    post = result.posterior()
    truth = u_star(coords)
    err = float(rel_err(post.mean(), jnp.asarray(truth)))
    assert err < 5e-3, err
    assert int(result.n_steps) >= 2


def darcy_classical_fem(disc, obs, coeff_mat):
    """Direct FEM solve of the Darcy system (analog of
    `scripts/darcy/solve_darcy_fem.jl:82-99`) as an independent reference."""
    A, f = obs(coeff_mat)
    Ad = np.asarray(A.to_dense())
    fd = np.asarray(f)
    ch = disc.constraint_handler
    free = ch.free_dofs
    K = Ad[np.ix_(free, free)]
    u = np.zeros(disc.ndofs)
    u[free] = np.linalg.solve(K, fd[free])
    return u


def test_darcy_gmrf_fem_end_to_end():
    """GMRF posterior mean ~= classical FEM solution at high obs precision.

    Mini version of `scripts/darcy/solve_darcy_gmrf-fem.jl`."""
    N_xy = 10
    disc = uniform_unit_square_discretization(N_xy, element_order=2)
    # synthetic piecewise-constant coefficient on a 21x21 grid
    gx = np.linspace(0, 1, 21)
    rng = np.random.default_rng(0)
    coeff = np.where(rng.normal(size=(21, 21)) > 0, 12.0, 3.0)

    spde = MaternSPDE(d=2, range=1 / np.sqrt(N_xy), smoothness=2)
    x = discretize_matern(spde, disc)
    assert isinstance(x, ConstrainedGMRF)

    obs = DarcyFEMObservations(
        disc, gx, gx, beta=1.0,
        prescribed_dofs=disc.constraint_handler.prescribed_dofs,
    )
    A, ys = obs(jnp.asarray(coeff))
    post = condition_on_observations(x, A, 1e8, ys)

    u_fem = darcy_classical_fem(disc, obs, jnp.asarray(coeff))
    err = float(rel_err(post.mean(), jnp.asarray(u_fem)))
    assert err < 1e-3, err

    # posterior std exists and boundary dofs have ~zero std
    s = np.asarray(post.std())
    assert np.all(np.isfinite(s))
    pres = disc.constraint_handler.prescribed_dofs
    assert np.max(s[pres]) < 1e-12


def fd_burgers_reference(ic, nu, ts, n_fd=256, sub=40):
    """Independent implicit FD solver for periodic 1D Burgers (the role the
    Rosenbrock23 solve plays in `scripts/plots/burger_priors.jl:127-159`)."""
    n = n_fd
    x = np.linspace(0, 1, n, endpoint=False)
    dx = 1.0 / n
    u = np.interp(x, np.linspace(0, 1, len(ic)), ic)
    dt_out = ts[1] - ts[0]
    dt = dt_out / sub  # CFL: max|u| dt / dx must stay < 1 (advection explicit)
    out = [u.copy()]
    I = np.eye(n)
    # (shift_p @ u)[i] = u[i+1], (shift_m @ u)[i] = u[i-1]
    shift_p = np.roll(I, 1, axis=1)
    shift_m = np.roll(I, -1, axis=1)
    L = nu * (shift_p - 2 * I + shift_m) / dx**2
    D1 = (shift_p - shift_m) / (2 * dx)
    for _ in range(len(ts) - 1):
        for _ in range(sub):
            # semi-implicit: diffusion implicit, advection explicit
            rhs = u - dt * u * (D1 @ u)
            u = np.linalg.solve(I - dt * L, rhs)
        out.append(u.copy())
    return x, np.stack(out)


def test_burgers_gmrf_fem_end_to_end():
    """Mini version of `scripts/burgers/solve_burgers_gmrf-fem.jl`:
    spatiotemporal adv-diff prior + IC conditioning + Gauss-Newton on the
    FEM residual, against an independent FD reference."""
    N_x = 48
    N_t = 25
    nu = 0.03
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    ts = np.linspace(0.0, 0.5, N_t)
    xs = np.linspace(0, 1, 65)
    ic = 0.8 + 0.4 * np.sin(2 * np.pi * xs)

    bulk = float(np.mean(ic))
    nu_m = 1.5
    kappa = np.sqrt(8 * nu_m) / np.sqrt(1 / N_x)
    c = 1.0 / nu
    spde = AdvectionDiffusionSPDE(
        d=1,
        kappa=0.0,
        alpha=1,
        gamma=jnp.asarray([-c * bulk]),
        c=c,
        tau=0.1 * np.sqrt(c),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
    )
    x = discretize_advection_diffusion(spde, disc, ts, mean_offset=bulk)

    A_ic = evaluation_matrix(disc, xs)
    A_ic = spatial_to_spatiotemporal(A_ic, 0, N_t)
    x_ic = condition_on_observations(x, A_ic, 1e8, jnp.asarray(ic))

    res = BurgersFEMResidual(disc, ts, nu, scheme="implicit_euler")
    result = gauss_newton_solve(
        x_ic.inner_gmrf.mean(),
        x_ic.inner_gmrf.precision,
        res.f_and_J,
        1e12,
        jnp.zeros(res.n_rows),
        x_ic.inner_gmrf.mean(),
        criterion=OrCriterion(
            [NewtonDecrementCriterion(1e-6), StepNumberCriterion(12)]
        ),
        affine=x_ic.affine,
    )
    post = result.posterior(affine=x_ic.affine)

    # evaluate on the FD grid at all times
    x_fd, u_fd = fd_burgers_reference(ic, nu, ts)
    E = evaluation_matrix(disc, x_fd)
    E_st = replicate_over_time(E, range(N_t), N_t)
    pred = np.asarray(E_st.matvec(post.mean())).reshape(N_t, len(x_fd))
    err = float(rel_err(jnp.asarray(pred[1:]), jnp.asarray(u_fd[1:])))
    assert err < 0.05, err
    # the IC slice stays near the data (the PDE-residual precision 1e12
    # outweighs the IC precision 1e8, so a small systematic shift is expected)
    err0 = float(rel_err(jnp.asarray(pred[0]), jnp.asarray(u_fd[0])))
    assert err0 < 0.03, err0
