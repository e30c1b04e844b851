"""DFTs as MXU matmuls — Cooley-Tukey two-stage factorization.

Two reasons this exists (RELAY_NOTES.md):
- TPU-idiomatic: a radix factored N = N1*N2 transform is two dense
  [N1 x N1] / [N2 x N2] matmul stages plus an elementwise twiddle — exactly
  the shape the MXU wants — instead of a serial FFT custom call.
- Insurance against relay FFT gaps: every jnp.fft call site in the
  OFDM/RDM/SRS paths routes through `fft_auto`/`ifft_auto`. The r3 probe
  matrix ultimately showed the relay's FFT custom call DOES work once the
  complex-H2D blocker (utils/xfer.py) is out of the way, so native jnp.fft
  is the default everywhere; set ISAC_TPU_MATMUL_DFT=1 to opt into the
  matmul form on TPU for measurement (CPU always uses jnp.fft, bit-exact).

Accuracy: complex64 two-stage keeps relative error ~1e-4..1e-3 up to
N = 4096 — far below the simulated noise floors (tests/test_dft.py).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _factor(n: int) -> tuple:
    """n = n1 * n2 with n1 <= n2, n1 maximal below sqrt(n) (n1 = 1 for primes)."""
    for n1 in range(int(math.isqrt(n)), 0, -1):
        if n % n1 == 0:
            return n1, n // n1
    return 1, n


@lru_cache(maxsize=64)
def _plan(n: int, inverse: bool):
    """(w1 [n1, n1], twiddle [n1, n2], w2 [n2, n2]) numpy complex64 constants;
    or (w, None, None) for the single-stage sizes."""
    sgn = 2j * np.pi if inverse else -2j * np.pi
    if n <= 512:
        k = np.arange(n)
        w = np.exp(sgn * np.outer(k, k) / n).astype(np.complex64)
        return w, None, None
    n1, n2 = _factor(n)
    if n1 == 1:  # prime: single dense matrix regardless of size
        k = np.arange(n)
        w = np.exp(sgn * np.outer(k, k) / n).astype(np.complex64)
        return w, None, None
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    w1 = np.exp(sgn * np.outer(k1, k1) / n1).astype(np.complex64)
    w2 = np.exp(sgn * np.outer(k2, k2) / n2).astype(np.complex64)
    tw = np.exp(sgn * np.outer(k1, k2) / n).astype(np.complex64)
    return w1, tw, w2


def fft_matmul(x: jnp.ndarray, n: int | None = None, axis: int = -1,
               inverse: bool = False) -> jnp.ndarray:
    """DFT along `axis` via MXU matmuls; matches jnp.fft.fft/ifft semantics
    (zero-pad or truncate to n; ifft scales by 1/n)."""
    ax = axis % x.ndim
    if ax != x.ndim - 1:
        x = jnp.moveaxis(x, ax, -1)
    m = x.shape[-1]
    if n is None:
        n = m
    if m < n:
        x = jnp.concatenate(
            [x, jnp.zeros((*x.shape[:-1], n - m), x.dtype)], axis=-1
        )
    elif m > n:
        x = x[..., :n]
    x = x.astype(jnp.complex64)
    w1, tw, w2 = _plan(n, inverse)
    if tw is None:
        out = jnp.einsum("...n,kn->...k", x, jnp.asarray(w1),
                         preferred_element_type=jnp.complex64)
    else:
        n1, n2 = w1.shape[0], w2.shape[0]
        xr = x.reshape(*x.shape[:-1], n1, n2)  # index n = a*n2 + b
        y = jnp.einsum("...ab,ka->...kb", xr, jnp.asarray(w1),
                       preferred_element_type=jnp.complex64)  # DFT over a
        y = y * jnp.asarray(tw)  # twiddle W_N^{k1 b}
        z = jnp.einsum("...kb,cb->...kc", y, jnp.asarray(w2),
                       preferred_element_type=jnp.complex64)  # DFT over b
        # X[k1 + n1*k2] = Z[k1, k2] -> flatten with k2 major
        out = jnp.swapaxes(z, -1, -2).reshape(*x.shape[:-1], n)
    if inverse:
        out = out / np.complex64(n)
    if ax != x.ndim - 1:
        out = jnp.moveaxis(out, -1, ax)
    return out


def _use_matmul() -> bool:
    """Opt-in: ISAC_TPU_MATMUL_DFT=1 forces the matmul form on TPU targets.

    r3 initially believed the relay rejected the FFT custom call; the probe
    matrix later isolated the real blocker to complex64 H2D transfers
    (utils/xfer.py), and native FFT works on internally-built complex data.
    The MXU-matmul form is kept as the measured alternative (it beats the
    custom call only if profiling says so) and as insurance for relays
    without the FFT custom call."""
    import os

    if os.environ.get("ISAC_TPU_MATMUL_DFT") != "1":
        return False
    dd = jax.config.jax_default_device
    platform = dd.platform if dd is not None else jax.default_backend()
    return platform == "tpu"


def fft_auto(x: jnp.ndarray, n: int | None = None, axis: int = -1) -> jnp.ndarray:
    """jnp.fft.fft, or the MXU matmul DFT when ISAC_TPU_MATMUL_DFT=1 on TPU."""
    if _use_matmul():
        return fft_matmul(x, n, axis, inverse=False)
    return jnp.fft.fft(x, n=n, axis=axis)


def ifft_auto(x: jnp.ndarray, n: int | None = None, axis: int = -1) -> jnp.ndarray:
    """jnp.fft.ifft, or the MXU matmul inverse DFT when ISAC_TPU_MATMUL_DFT=1 on TPU."""
    if _use_matmul():
        return fft_matmul(x, n, axis, inverse=True)
    return jnp.fft.ifft(x, n=n, axis=axis)
