"""Plotting helpers (matplotlib analogs of the reference's Makie recipes).

`plot_spatiotemporal_gmrf` mirrors the reference function of the same name
(`/root/reference/scripts/solve_burger.jl:275-283`): a panel of posterior
time slices with optional 2-std bands.
"""

from __future__ import annotations

import numpy as np


def plot_spatiotemporal_gmrf(
    x,
    disc,
    x_eval=None,
    compute_std: bool = True,
    n_panels: int = 6,
    data=None,
    save_path: str | None = None,
):
    """Plot time slices of a spatiotemporal GMRF posterior.

    x: (Constrained) ST-GMRF; disc: the spatial FEMDiscretization;
    x_eval: evaluation points (defaults to dof coordinates); data: optional
    [N_t, n_eval] reference trajectory overlay.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from diffeqgmrfs_tpu.fem.operators import evaluation_matrix, replicate_over_time

    inner = getattr(x, "inner_gmrf", x)
    N_t = inner.N_t
    if x_eval is None:
        x_eval = np.asarray(disc.mesh.coords[:, 0])
        x_eval = np.sort(x_eval)
    E = evaluation_matrix(disc, x_eval)
    E_st = replicate_over_time(E, range(N_t), N_t)
    mean = np.asarray(E_st.matvec(x.mean())).reshape(N_t, len(x_eval))
    if compute_std:
        std_dof = np.asarray(x.std()).reshape(N_t, -1)
        dof_x = np.asarray(disc.mesh.coords[:, 0])
        order = np.argsort(dof_x)

    t_idcs = np.linspace(0, N_t - 1, n_panels).astype(int)
    ncols = min(3, n_panels)
    nrows = (n_panels + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(3.6 * ncols, 2.6 * nrows), sharey=True
    )
    for ax, ti in zip(np.atleast_1d(axes).ravel(), t_idcs):
        ax.plot(x_eval, mean[ti], label="mean")
        if compute_std:
            s = np.interp(x_eval, dof_x[order], std_dof[ti][order])
            ax.fill_between(x_eval, mean[ti] - 2 * s, mean[ti] + 2 * s, alpha=0.3)
        if data is not None:
            ax.plot(x_eval, data[ti], "--", color="orange", label="data")
        ax.set_title(f"t index {ti}")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    return fig
