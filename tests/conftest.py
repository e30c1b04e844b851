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


import gc  # noqa: E402

import pytest  # noqa: E402


_HEAVY_MODULES = ("test_block",)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules(request):
    """Drop compiled executables + live buffers after the heaviest modules.

    The suite compiles hundreds of XLA:CPU programs; test_block's fused
    whole-segment programs are by far the largest, and letting them
    accumulate in one process crashed later modules' compiles (r5: flaky
    SIGSEGV/MemoryError in test_e2e when run AFTER test_block, each module
    green in isolation — native heap damage in XLA:CPU under that load).
    Clearing after the heavy modules keeps the process bounded without
    paying cross-module recompiles everywhere."""
    yield
    if not any(m in request.module.__name__ for m in _HEAVY_MODULES):
        return
    from isac_tpu.sim import block as _blk

    _blk._SEG_CACHE.clear()
    from isac_tpu.sim import cell as _cell

    _cell._SENSING_FNS.clear()
    jax.clear_caches()
    gc.collect()
