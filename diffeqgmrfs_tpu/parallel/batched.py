"""Batched instance solving: vmap over dataset instances + device sharding.

The reference loops over dataset instances serially
(`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:210-224`); here the
per-instance solve (which is one jitted XLA program) `vmap`s into batched
dense-block kernels — the scan over time/band blocks stays sequential but
every inner GEMM/POTRF/TRSM becomes a batched op that fills the MXU — and
shards the batch across the mesh's "dp" axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def batched_solver(solve_fn, mesh=None, donate: bool = False):
    """Wrap a per-instance solve into a jitted batched solver.

    solve_fn(*instance_args) -> pytree; returns run(batch_args) operating on
    leading-batch arrays, optionally sharded over mesh axis "dp".
    """
    vf = jax.vmap(solve_fn)
    if mesh is None:
        return jax.jit(vf)
    shard = NamedSharding(mesh, P("dp"))
    # jit ONCE here: re-invoking jax.jit(vf) per call would create a fresh
    # wrapper (and compile cache) per batch and recompile every time
    jf = jax.jit(vf)

    def run(*batch_args):
        batch_args = tuple(
            jax.device_put(jnp.asarray(a), shard) for a in batch_args
        )
        with mesh:
            return jf(*batch_args)

    return run


def run_in_batches(solve_fn, instance_arrays, batch_size: int, mesh=None):
    """Solve all instances in fixed-size batches (padding the tail).

    instance_arrays: tuple of arrays with leading instance dim. Returns the
    pytree of stacked results (padding removed).
    """
    n = instance_arrays[0].shape[0]
    runner = batched_solver(solve_fn, mesh=mesh)
    outs = []
    for start in range(0, n, batch_size):
        chunk = [a[start : start + batch_size] for a in instance_arrays]
        pad = batch_size - chunk[0].shape[0]
        if pad:
            chunk = [
                np.concatenate([c, np.repeat(c[-1:], pad, axis=0)], axis=0)
                for c in chunk
            ]
        out = runner(*[jnp.asarray(c) for c in chunk])
        if pad:
            out = jax.tree_util.tree_map(lambda x: x[:-pad], out)
        outs.append(out)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs
    )
