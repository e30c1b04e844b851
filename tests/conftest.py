"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Tests validate numerics and multi-chip sharding without TPU hardware; the driver
separately compile-checks the TPU path (see __graft_entry__.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered a TPU backend before
# this conftest runs; override at the config level (env vars alone are too late).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
