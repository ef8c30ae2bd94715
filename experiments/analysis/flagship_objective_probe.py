"""Why does the flagship Burgers sweep (N_x=800 x N_t=100) diverge?

Queue J/K evidence: the forward-march warm start is ACCURATE at N800
(trajectory rel_err 1.75e-2, march_check.py) yet Gauss-Newton moves AWAY
from it — undamped to rel_err 3.9, damped to ~1.3 ~ the ic-only prior
mean. Two hypotheses:

  (a) OBJECTIVE problem: the MAP objective
        O(w) = ||w - mu_p||^2_Q + tau_ic ||A_ic w - ic||^2
                                + tau_fem ||f(w)||^2
      is prior-dominated at N800 (obs rows scale ~h, so tau_fem ||f||^2
      ~ h^2 falls 16x from N200 while Q grows with kappa ~ sqrt(N_x)) —
      GN faithfully minimizes O and O's minimum is near the prior mean.
  (b) SOLVER problem: the f32 SRIF Newton system at N800 is wrong
      (conditioning/bug) — O(march) is much lower than O(GN iterate),
      GN just fails to descend.

Discriminate by evaluating the three objective terms (no factorization
needed — Q matvec + residual eval only, CPU f64) at:
  * the prior mean (mean_offset = bulk),
  * the forward-march trajectory (the warm start GN abandons),
for N_x in {200, 800}. If O(march) << O(prior mean) at N800, the MAP
optimum is near the march and hypothesis (b) holds; if O(march) >
O(prior mean), the objective itself prefers the prior mean, (a).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from diffeqgmrfs_tpu.utils.experiment import select_backend

select_backend("cpu")

from diffeqgmrfs_tpu.datasets.burgers import BurgersDataset
from diffeqgmrfs_tpu.fem.discretization import (
    periodic_unit_interval_discretization,
)
from diffeqgmrfs_tpu.fem.operators import (
    evaluation_matrix,
    spatial_to_spatiotemporal,
)
from diffeqgmrfs_tpu.gmrf.affine import AffineMap
from diffeqgmrfs_tpu.models import MaternSPDE, AdvectionDiffusionSPDE
from diffeqgmrfs_tpu.models.advection_diffusion import st_prior_toeplitz
from diffeqgmrfs_tpu.problems.burgers import (
    BurgersFEMResidual,
    BurgersForwardMarch,
)
from diffeqgmrfs_tpu.metrics import rel_err

NOISE_IC, NOISE_FEM = 1e8, 1e12
PAD = 128


def probe(N_x, inst=0, substeps=2):
    ds = BurgersDataset.synthetic(n_instances=3, n_x=129, n_t=100)
    ts = np.asarray(ds.ts)
    disc = periodic_unit_interval_discretization(N_x, element_order=2)
    sol = np.asarray(ds.get_solution(inst))
    ic = sol[0]
    bulk = float(np.mean(ic))
    c = 1.0 / ds.nu
    gamma = -c * bulk
    nu_m = 1.5
    kappa = float(np.sqrt(8 * nu_m) / np.sqrt(1 / N_x))
    spde = AdvectionDiffusionSPDE(
        d=1, kappa=0.0, alpha=1, c=c, tau=0.1 * np.sqrt(c),
        gamma=jnp.asarray([gamma]),
        spatial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
        initial_spde=MaternSPDE(d=1, kappa=kappa, nu=nu_m),
    )
    N_t = len(ts)
    stride = None
    if disc.n_free % PAD:
        stride = -(-disc.n_free // PAD) * PAD
    affine_st = AffineMap.from_constraint_handler(
        disc.constraint_handler
    ).replicate(N_t, stride=stride)
    mu_p, q_top, _ = st_prior_toeplitz(
        spde, disc, ts, mean_offset=bulk, pad_block=PAD
    )
    res = BurgersFEMResidual(disc, ts, ds.nu, scheme="implicit_euler")
    E = evaluation_matrix(disc, np.asarray(ds.x_coords))
    A_ic = spatial_to_spatiotemporal(E, 0, N_t)

    # IC fit (march_check's overdetermined dense-grid least squares)
    x_fine = np.linspace(0.0, 1.0, 2049)
    E_fine = np.asarray(evaluation_matrix(disc, x_fine).to_dense())
    ic_fine = np.interp(x_fine, np.asarray(ds.x_coords), ic, period=1.0)
    u0, *_ = np.linalg.lstsq(E_fine, ic_fine, rcond=None)
    march = BurgersForwardMarch(disc, ts, ds.nu, substeps=substeps)
    W = np.asarray(
        jax.jit(march.trajectory)(jnp.asarray(u0, jnp.float32))
    ).astype(np.float64)  # [N_t, ndofs] full-dof trajectory
    E_dense = np.asarray(E.to_dense())
    e_march = rel_err((W @ E_dense.T).reshape(-1), sol.reshape(-1))

    mu_full = np.asarray(affine_st.free_to_full(mu_p))

    def objective(w_full):
        w_free = jnp.asarray(affine_st.restrict(jnp.asarray(w_full)))
        d = w_free - mu_p
        t_prior = float(d @ q_top.matvec(d))
        f, _ = res.f_and_J(jnp.asarray(w_full))
        t_fem = NOISE_FEM * float(jnp.vdot(f, f))
        r_ic = A_ic.matvec(jnp.asarray(w_full)) - jnp.asarray(ic)
        t_ic = NOISE_IC * float(jnp.vdot(r_ic, r_ic))
        return t_prior, t_ic, t_fem

    rows = {
        "prior_mean": objective(mu_full),
        "march": objective(W.reshape(-1)),
    }
    print(f"\n=== N_x={N_x} inst={inst} (march rel_err {e_march:.3e}, "
          f"kappa {kappa:.1f}, bulk {bulk:+.3f})")
    print(f"{'iterate':>12} {'prior':>12} {'ic':>12} {'fem':>12} "
          f"{'total':>12}")
    for name, (tp, ti, tf) in rows.items():
        print(f"{name:>12} {tp:12.4e} {ti:12.4e} {tf:12.4e} "
              f"{tp + ti + tf:12.4e}")
    return rows


def main():
    for N_x in ([int(a) for a in sys.argv[1:]] or [200, 800]):
        probe(N_x)


if __name__ == "__main__":
    main()
