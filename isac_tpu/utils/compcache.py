"""Persistent XLA compilation cache (VERDICT r3 #7).

First-program compile latency on the axon relay is minutes-scale (186 s
measured for one BG1 Z=384 encoder, RELAY_NOTES.md); every driver bench
re-paid it inside fixed timeouts. Enabling jax's persistent compilation
cache makes the second process warm: compiled executables are keyed by HLO
fingerprint and reloaded from disk.

Call enable_persistent_cache() once, early (before the first jit dispatch),
from any entry point that benefits: bench.py stages, __graft_entry__, and
the test conftest. Idempotent; honours ISAC_TPU_COMPILE_CACHE to override
the location and ISAC_TPU_COMPILE_CACHE=0 to disable.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache. Returns the dir (or None
    when disabled via ISAC_TPU_COMPILE_CACHE=0)."""
    global _enabled
    env = os.environ.get("ISAC_TPU_COMPILE_CACHE")
    if env == "0":
        return None
    d = cache_dir or env or _DEFAULT_DIR
    import jax

    # TPU-only: XLA:CPU persists AOT code keyed WITHOUT host CPU features,
    # so a cache written on one machine can SIGILL on another (observed:
    # avx512 feature-set mismatch warnings when reloading). The minutes-scale
    # compiles this cache exists for are all relay/TPU programs anyway.
    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache everything, including fast-compiling programs: relay RTT and
    # repeated subprocess stages make even small compiles worth persisting
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return d
