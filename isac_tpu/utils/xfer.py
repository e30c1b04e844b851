"""Host->device transfer helpers for the axon TPU relay.

The relay rejects complex64 host->device transfers (UNIMPLEMENTED at fetch
of any consumer) while supporting complex arithmetic, complex HLO constants,
complex values BETWEEN programs, and even the FFT/linalg custom calls on
internally-built complex data (RELAY_NOTES.md: the r3 probe matrix that
isolated this). `asarray` is a drop-in for jnp.asarray that ships complex
arrays as two f32 transfers recombined by a tiny jitted program; all other
dtypes pass straight through.

Use it for any host-built array handed to a jitted function as an ARGUMENT.
np constants closed over INSIDE a jit are embedded in the executable and do
not need it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(re, im)


def _tpu_target() -> bool:
    dd = jax.config.jax_default_device
    return (dd.platform if dd is not None else jax.default_backend()) == "tpu"


def asarray(x, dtype=None) -> jnp.ndarray:
    """jnp.asarray with the complex-H2D relay workaround (TPU targets only).

    jax Arrays pass straight through (no device->host round trip), so call
    sites can wrap values that are sometimes host numpy, sometimes already
    on device (e.g. precoders from the host scheduler vs a device CSI path).
    """
    if isinstance(x, jax.Array) and dtype is None:
        return x
    a = np.asarray(x)
    if dtype is not None:
        a = a.astype(dtype)
    if a.dtype.kind == "c" and _tpu_target():
        a = a.astype(np.complex64)
        re = jnp.asarray(np.ascontiguousarray(a.real))
        im = jnp.asarray(np.ascontiguousarray(a.imag))
        return _combine(re, im)
    return jnp.asarray(a)
