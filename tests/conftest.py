"""Test configuration: force an 8-virtual-device CPU mesh so that all
multi-chip sharding logic (DP gradient psum, VQ codebook-EMA psum, TP/SP
partition specs) is exercised without TPU hardware — the JAX-standard
stand-in for the reference's untestable NCCL/DDP path (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU-tunnel plugin (sitecustomize) appends itself to
# jax_platforms at interpreter start; force CPU back for tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
