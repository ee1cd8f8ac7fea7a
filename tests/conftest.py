"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on the single real TPU chip; tests validate numerics and
multi-chip sharding on host CPU (SURVEY.md §4 "Multi-node / distributed
testing" pattern: hardware-shaped things hide behind seams)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's site config force-registers the remote TPU ("axon")
# platform ahead of CPU regardless of JAX_PLATFORMS; every dispatch would
# then be a network roundtrip. Pin the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
