"""Peak-memory probe for the Darcy N300 conditioning program.

Queue J's N300 re-measurements (prefactor + split windows + 413 fix) died
with RESOURCE_EXHAUSTED on the 16 GB v5e where the pre-prefactor program
ran at ~31.8 s/instance.  This script rebuilds the driver's exact
conditioning program at a given N_xy on the CPU backend and prints

  * the static device-resident buffer sizes (prior operands, prefactor,
    window plans, observation operator), and
  * XLA's compiled memory analysis (argument/output/temp/peak bytes)

for prefactor ON vs OFF, so the HBM budget can be attributed without
burning a TPU slot.  CPU layouts differ from TPU in the details but a
multi-GB temp shows up on both.

Usage: python experiments/analysis/n300_mem_probe.py --N_xy 300
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import argparse

import numpy as np


def fmt(nbytes):
    return f"{nbytes / 2**30:.3f} GiB"


def tree_bytes(tree):
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N_xy", type=int, default=300)
    p.add_argument("--grid", type=int, default=241)
    p.add_argument("--prefactor", type=str, default="both",
                   choices=["on", "off", "both"])
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"  # the shell exports axon; hard-set
    from diffeqgmrfs_tpu.utils.config import enable_x64

    enable_x64()
    import jax
    import jax.numpy as jnp

    from diffeqgmrfs_tpu.fem.discretization import (
        uniform_unit_square_discretization,
    )
    from diffeqgmrfs_tpu.models import MaternSPDE, discretize_matern
    from diffeqgmrfs_tpu.problems import DarcyFEMObservations
    from diffeqgmrfs_tpu.gmrf.conditioning import condition_on_observations
    from diffeqgmrfs_tpu.ops.ata_windows import make_ata_window_plan
    from diffeqgmrfs_tpu.solvers import CholeskySolverBlueprint

    disc = uniform_unit_square_discretization(
        args.N_xy, element_order=2, use_dirichlet_bc=True
    )
    print(f"ndofs={disc.ndofs} free={disc.n_free}", flush=True)
    xc = np.linspace(0, 1, args.grid)
    spde = MaternSPDE(d=2, range=1 / np.sqrt(args.N_xy), smoothness=2)

    modes = (
        ["on", "off"] if args.prefactor == "both" else [args.prefactor]
    )
    for mode in modes:
        prior = discretize_matern(
            spde, disc, compact=True, packed=True, sqrt=True,
            sqrt_prefactor=(mode == "on"),
        )
        inner = prior.inner_gmrf if hasattr(prior, "inner_gmrf") else prior
        N, bs, n = inner.precision.N, inner.precision.bs, inner.precision.n
        print(f"\n=== prefactor {mode}: N={N} bs={bs} n={n}")
        for name in ("precision64", "sqrt32", "sqrt_plan", "sqrt_R32",
                     "q_pack_idx"):
            v = getattr(inner, name, None)
            if name == "q_pack_idx":
                v = getattr(inner, "q_pack_idx", None)
            if v is not None:
                print(f"  {name:12s} {fmt(tree_bytes(v))}")
        obs = DarcyFEMObservations(
            disc, xc, xc, beta=1.0, inflated_boundary=False,
            N_xy=args.N_xy,
            prescribed_dofs=disc.constraint_handler.prescribed_dofs,
        )
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            coeff0 = jnp.ones((args.grid, args.grid), dtype=jnp.float64)
            A0, _ = obs(coeff0)
            A0c = prior.affine.condense_rowop(A0)
        zs_A = np.asarray(prior.affine.s_coef)[A0.cols] == 0.0
        split = getattr(inner.sqrt_plan, "split", 1)
        pat = make_ata_window_plan(
            A0c.cols, n, bs, zero_slots=zs_A, split=split
        ).to_device()
        print(f"  a_plan       {fmt(tree_bytes(pat))} (split={split})")
        print(f"  A operand    {fmt(tree_bytes((A0.vals, A0.cols)))}")

        bp = CholeskySolverBlueprint(sqrt_factor=True)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            geom = obs.geom_arrays()
            st = obs.structure_arrays()

        def cond(pr, pt, g, s, coeff):
            A, ys = obs(coeff, geom=g, structure=s)
            post = condition_on_observations(
                pr, A, 1e8, ys, solver_blueprint=bp, pattern=pt
            )
            pin = post.inner_gmrf if hasattr(post, "inner_gmrf") else post
            return post.mean(), pin.factor

        lowered = jax.jit(cond).lower(prior, pat, geom, st, coeff0)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            print(f"  XLA memory analysis:")
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    print(f"    {k:30s} {fmt(v)}")
            tot = (
                getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
                + getattr(ma, "temp_size_in_bytes", 0)
            )
            print(f"    arg+out+temp                   {fmt(tot)}")
        del prior, inner, pat, lowered, compiled


if __name__ == "__main__":
    main()
