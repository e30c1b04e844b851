"""Range-Doppler map via windowed 2D (I)FFT + matched-filter channel extraction.

TPU-native equivalent of +sensing/+estimation/fft2D.m:30-116.

Grid layout here is [n_ants, n_sym, n_sc] (the reference's [nSc, nSym, nAnts]
transposed for last-axis FFTs). Chain:
  H = rx * conj(tx)                      (element-wise matched filter, :37)
  H *= rngWin[sc] ; R = IFFT_sc(H)*sqrt(nIFFT)    (:40-44; range along sc)
  R *= dopWin[sc->range bins]            (:45)
  RDM = fftshift_dop(FFT_sym(R)/sqrt(nFFT))       (:46; Doppler centered)

Deviations from the reference (documented; see SURVEY §7.4 on quirks):
- the reference's bare `ifftshift(...)`/`fftshift(...)` shift ALL axes; the two
  calls cancel on the range/antenna axes and amount to a pre-FFT circular
  rotation of the symbol axis (a windowing artifact that only raises Doppler
  sidelobes). We apply the shift purely on the Doppler axis after the FFT,
  which is the intended processing.
- the reference applies the Doppler window `dopWin` built with length nIFFT
  along the *range-bin* axis (fft2D.m:145-147); we window the symbol axis
  before the Doppler FFT (the standard definition).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from isac_tpu.ops import dft

from isac_tpu.ops.sensing.radar_params import RadarDerived
from isac_tpu.utils.windows import window


@partial(jax.jit, static_argnames=("n_ifft", "n_fft", "win"))
def range_doppler_map(
    rx_grid: jnp.ndarray,
    tx_grid: jnp.ndarray,
    n_ifft: int,
    n_fft: int,
    win: str = "kaiser",
) -> jnp.ndarray:
    """[n_ants, n_sym, n_sc] x2 -> RDM [n_ants, n_ifft(range), n_fft(Doppler)]
    matching the reference's [nIFFT x nFFT x nAnts] layout per antenna.

    Doppler axis is fftshift-centered (bin k => velocity (k - n_fft/2) * vRes);
    range bin r => range r * rRes.
    """
    n_sym, n_sc = rx_grid.shape[-2:]
    h = rx_grid * jnp.conj(tx_grid)
    rng_win = jnp.asarray(window(win, n_sc), jnp.float32)
    dop_win = jnp.asarray(window(win, n_sym), jnp.float32)
    h = h * rng_win[None, None, :]
    r = dft.ifft_auto(h, n=n_ifft, axis=-1) * np.sqrt(n_ifft)  # range profile
    r = r * dop_win[None, :, None]
    rdm = dft.fft_auto(r, n=n_fft, axis=-2) / np.sqrt(n_fft)  # Doppler
    rdm = jnp.fft.fftshift(rdm, axes=-2)  # [n_ants, n_fft, n_ifft]
    return jnp.swapaxes(rdm, -1, -2)  # -> [n_ants, n_ifft(range), n_fft(Doppler)]


def rdm_power(rdm: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(rdm) ** 2
