"""Test configuration: CPU backend with 8 virtual devices, float64.

Multi-device sharding tests run on a virtual CPU mesh, mirroring how the
driver validates `dryrun_multichip` (SURVEY.md §4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself even when JAX_PLATFORMS=cpu;
# updating the config after import reliably pins the local CPU backend
# (otherwise every op dispatches over the TPU tunnel at ~6 ms latency).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
