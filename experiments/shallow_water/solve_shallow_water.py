"""Linear shallow-water ST posterior: wave propagation from an observed
initial height bump.

The reference ships `LinearShallowWaterSPDE` as library-only capability
(`/root/reference/src/spdes/shallow_water.jl` — "NOT exercised by any
in-repo script", SURVEY.md §2.1); this driver exercises the full pipeline
as an actual workload: 3-field (h, u, v) coupled FEM prior over a time
grid, conditioning on the initial height field (+ zero initial
velocities), posterior mean/std, and a dynamics-consistency metric — with
tight process noise the posterior mean trajectory must track the
deterministic implicit-Euler rollout of the SAME discrete operator from
the posterior's own initial state:

    x_{t+1} = (M + dt K)^{-1} M x_t        (shallow_water.jl:210-231)

Usage:
  python experiments/shallow_water/solve_shallow_water.py --backend cpu \
      --N_xy 6 --N_t 6
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from diffeqgmrfs_tpu.utils.experiment import (
    base_parser,
    finalize_args,
    select_backend,
    setup_logging,
)


def parse_cmd():
    p = base_parser("Linear shallow-water ST posterior")
    p.add_argument("--N_xy", type=int, default=6)
    p.add_argument("--N_t", type=int, default=6)
    p.add_argument("--T", type=float, default=0.3)
    p.add_argument("--tau", type=float, default=1e-3,
                   help="process noise scale (small = tight dynamics)")
    p.add_argument("--f", type=float, default=1.0, help="Coriolis")
    p.add_argument("--k", type=float, default=0.2, help="friction")
    p.add_argument("--noise_ic", type=float, default=1e8)
    p.add_argument("--n_obs", type=int, default=9,
                   help="observation grid resolution per axis at t=0")
    return finalize_args(p.parse_args())


def main():
    log = setup_logging()
    args = parse_cmd()
    log.info("devices: %s", select_backend(args.backend))

    import jax.numpy as jnp
    import diffeqgmrfs_tpu  # noqa: F401
    from diffeqgmrfs_tpu.fem import (
        TriangleMesh,
        FEMDiscretization,
        evaluation_matrix,
        spatial_to_spatiotemporal,
    )
    from diffeqgmrfs_tpu.models.shallow_water import (
        LinearShallowWaterSPDE,
        discretize_shallow_water,
        _assemble_system_host,
    )
    from diffeqgmrfs_tpu.gmrf import condition_on_observations
    from diffeqgmrfs_tpu.metrics import rel_err
    from diffeqgmrfs_tpu.utils.timers import PhaseTimers
    from diffeqgmrfs_tpu.utils.results import datadir, savename, tagsave

    params = dict(N_xy=args.N_xy, N_t=args.N_t, T=args.T, tau=args.tau)
    log.info("params: %s", params)
    to = PhaseTimers()

    with to("Setup"):
        mesh = TriangleMesh(0, 0, 1, 1, args.N_xy, args.N_xy, order=2)
        disc = FEMDiscretization(
            mesh, element_order=2, quad_degree=3, fields=("h", "u", "v")
        )
        spde = LinearShallowWaterSPDE(
            H=1.0, tau=args.tau, k=args.k, f=args.f, g=9.81
        )
        ts = np.linspace(0.0, args.T, args.N_t)
        x = discretize_shallow_water(spde, disc, ts, kappa_matern=2.0)
        n = x.precision.bs
        N_t = args.N_t

        # observations at t=0: height bump at a coarse grid + zero
        # velocities at the same points
        g1 = np.linspace(0.05, 0.95, args.n_obs)
        pts = np.stack(np.meshgrid(g1, g1, indexing="ij"), -1).reshape(-1, 2)
        h_obs = 0.2 * np.exp(
            -(((pts[:, 0] - 0.5) ** 2 + (pts[:, 1] - 0.5) ** 2) / 0.02)
        )
        ops = []
        for field, yv in (("h", h_obs), ("u", 0 * h_obs), ("v", 0 * h_obs)):
            E = evaluation_matrix(disc, pts, field=field)
            ops.append((spatial_to_spatiotemporal(E, 0, N_t), jnp.asarray(yv)))

    with to("Conditioning"):
        post = x
        for A, yv in ops:
            post = condition_on_observations(post, A, args.noise_ic, yv)
        mean = np.asarray(post.mean()).reshape(N_t, n)
        std = np.asarray(post.std())
        to.sync(jnp.asarray(mean[0, 0]))

    with to("Dynamics-consistency rollout"):
        K, m, S = _assemble_system_host(disc, spde)
        K = K.toarray()
        dt = float(ts[1] - ts[0])
        G = np.diag(m) + dt * K
        traj = [mean[0]]
        for _ in range(N_t - 1):
            traj.append(np.linalg.solve(G, m * traj[-1]))
        traj = np.asarray(traj)

    errs = [float(rel_err(mean[t], traj[t])) for t in range(N_t)]
    h_amp = [float(np.abs(mean[t][0::3]).max()) for t in range(N_t)]
    log.info("per-step dynamics rel_err: %s",
             " ".join(f"{e:.3e}" for e in errs))
    log.info("height amplitude decay: %s",
             " ".join(f"{a:.3e}" for a in h_amp))
    mean_err = float(np.mean(errs[1:]))
    log.info("mean dynamics rel_err (t>0) = %.4e; std norm %.3e",
             mean_err, float(np.linalg.norm(std)))

    out = dict(
        params,
        dynamics_rel_errs=errs,
        height_amplitudes=h_amp,
        std_norm=float(np.linalg.norm(std)),
        timers=to.as_dict(),
    )
    path = datadir(
        "sims", "shallow_water", savename(params, ext="json")
    )
    tagsave(path, out)
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
