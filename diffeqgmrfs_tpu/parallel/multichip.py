"""Multi-chip sharding: device meshes, instance batching, time-axis sharding.

The reference has NO distributed runtime (SURVEY.md §2.4) — its only
parallelism is serial instance loops + BLAS threads. The TPU-native
equivalents built here:

* **DP (instances/samples)**: `vmap` over dataset instances, sharded over the
  mesh's "dp" axis — the primary chip-saturation axis (the analog of the
  reference's serial loop `scripts/darcy/solve_darcy_gmrf-fem.jl:210-224`).
* **SP (time axis)**: the ST-GMRF's block arrays [N_t, bs, bs] carry their
  time axis sharded over the mesh's "time" axis — assembly, matvec, A^T A
  scatter, and sampling noise are embarrassingly parallel over time blocks;
  the factorization sweep's loop-carried dependence crosses shard boundaries
  via XLA-inserted collectives (nearest-neighbor, the GMRF analog of ring
  attention; cf. SURVEY.md §5.7).

All sharding goes through `jax.sharding` + jit sharding constraints — XLA
inserts the collectives; no hand-written NCCL/MPI analog is needed.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def make_mesh(n_devices: int | None = None, time_axis: int | None = None) -> Mesh:
    """Build a ("dp", "time") mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if time_axis is None:
        # prefer a square-ish split, time axis at most 4
        time_axis = 1
        for t in (4, 2, 1):
            if n % t == 0:
                time_axis = t
                break
    dp = n // time_axis
    arr = np.array(devs).reshape(dp, time_axis)
    return Mesh(arr, axis_names=("dp", "time"))


def shard_btd(Q, mesh: Mesh):
    """Constrain a (possibly batched) BTD's block arrays so the time/block
    axis is sharded over "time" and any leading batch axis over "dp"."""
    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    from diffeqgmrfs_tpu.ops.btd import BTD

    nd = Q.diag.ndim
    if nd == 3:
        spec = P("time", None, None)
        rep = P(None, None, None)
    else:
        spec = P("dp", "time", None, None)
        rep = P("dp", None, None, None)
    t = mesh.shape["time"]
    # lower has N-1 blocks; an uneven count cannot shard on the time axis
    # (NamedSharding requires exact divisibility, and jit-level uneven
    # constraints are silently normalized to replicated). Warn loudly —
    # replicating lower costs t x its memory. For a truly distributed
    # layout use the explicitly-chunked halo-exchange path
    # (ops/dist_btd.py), which assigns lower rows per device chunk.
    if Q.lower.shape[-3] % t == 0:
        lower_spec = spec
    else:
        import warnings

        warnings.warn(
            f"shard_btd: lower has {Q.lower.shape[-3]} blocks, not divisible "
            f"by time axis {t} — replicating lower across the time axis "
            f"({t}x its memory). Use dist_btd for an exact distributed layout.",
            stacklevel=2,
        )
        lower_spec = rep
    return BTD(constrain(Q.diag, spec), constrain(Q.lower, lower_spec), Q.n)


def batch_sharding(mesh: Mesh):
    """Sharding for instance-batched arrays [B, ...]: batch over "dp"."""
    return NamedSharding(mesh, P("dp"))
