"""CP-OFDM modulation/demodulation per TS 38.211 §5.3.1 (normal CP).

TPU-native equivalents of MATLAB nrOFDMModulate / nrOFDMDemodulate / nrOFDMInfo
(reference call sites: gNBPhy.m:599, uePhy.m, monoStaticSensing.m:16; SURVEY §2.9).

Conventions:
- resource grids are [..., n_sym, n_sc] (batch dims lead; FFT along the last axis);
  the reference's [nSc, nSym, nAnts] MATLAB layout maps to [nAnts, nSym, nSc].
- subcarrier k occupies FFT bin (k - n_sc//2) mod nfft (DC at grid center);
- modulate follows the MATLAB ifft scaling (1/N inside the IFFT), demodulate is
  the exact inverse, so the reference's amplitude law
  db2mag(P_dBm-30) * sqrt(nfft^2 / (n_sc * n_ants))   (gNBPhy.m:592)
  carries over unchanged;
- ragged per-symbol CP lengths are handled with precomputed (static-shape)
  gather index maps instead of per-symbol Python concatenation: a single gather
  builds the serialized waveform, which XLA fuses with the IFFT.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from isac_tpu.ops import dft

from isac_tpu.config.carrier import OFDMInfo


@lru_cache(maxsize=32)
def _modulate_index_maps(info: OFDMInfo, num_slots: int, first_slot: int):
    """(sym_idx, samp_idx) mapping output sample -> (symbol, intra-IFFT sample)."""
    sym_lens = info.symbol_lengths_slots(num_slots, first_slot).reshape(-1)
    cp_lens = info.cp_lengths_slots(num_slots, first_slot).reshape(-1)
    total = int(sym_lens.sum())
    sym_idx = np.repeat(np.arange(sym_lens.shape[0]), sym_lens)
    starts = np.concatenate([[0], np.cumsum(sym_lens)[:-1]])
    offset_in_sym = np.arange(total) - starts[sym_idx]
    # CP = tail of the IFFT output: sample = (offset - cp) mod nfft
    samp_idx = (offset_in_sym - cp_lens[sym_idx]) % info.nfft
    return sym_idx.astype(np.int32), samp_idx.astype(np.int32), total


@lru_cache(maxsize=32)
def _grid_bins(n_sc: int, nfft: int) -> np.ndarray:
    return ((np.arange(n_sc) - n_sc // 2) % nfft).astype(np.int32)


def ofdm_modulate(
    grid: jnp.ndarray, info: OFDMInfo, first_slot: int = 0
) -> jnp.ndarray:
    """grid [..., n_sym, n_sc] -> waveform [..., total_samples].

    n_sym must be a multiple of symbols_per_slot; `first_slot` fixes which
    symbols carry the long CP (absolute slot position in the frame).
    """
    *_, n_sym, n_sc = grid.shape
    if n_sym % info.symbols_per_slot:
        raise ValueError(f"n_sym {n_sym} not a multiple of {info.symbols_per_slot}")
    num_slots = n_sym // info.symbols_per_slot
    bins = _grid_bins(n_sc, info.nfft)
    x = jnp.zeros((*grid.shape[:-1], info.nfft), dtype=jnp.complex64)
    x = x.at[..., bins].set(grid.astype(jnp.complex64))
    time_syms = dft.ifft_auto(x, axis=-1)  # MATLAB ifft scaling (1/N)
    sym_idx, samp_idx, _ = _modulate_index_maps(info, num_slots, first_slot)
    return time_syms[..., jnp.asarray(sym_idx), jnp.asarray(samp_idx)]


def ofdm_demodulate(
    waveform: jnp.ndarray,
    info: OFDMInfo,
    n_sc: int,
    num_slots: int,
    first_slot: int = 0,
    cp_fraction: float = 0.55,
) -> jnp.ndarray:
    """waveform [..., total_samples] -> grid [..., num_slots*14, n_sc].

    The FFT window starts `floor(cp * (1 - cp_fraction))` samples into the CP
    (MATLAB nrOFDMDemodulate CyclicPrefixFraction semantics, default 0.55) and
    the resulting circular shift is de-rotated exactly per subcarrier, so
    demodulate(modulate(g)) == g in the absence of channel effects.
    """
    sym_lens = info.symbol_lengths_slots(num_slots, first_slot).reshape(-1)
    cp_lens = info.cp_lengths_slots(num_slots, first_slot).reshape(-1)
    n_sym = sym_lens.shape[0]
    starts = np.concatenate([[0], np.cumsum(sym_lens)[:-1]])
    early = np.floor(cp_lens * (1.0 - cp_fraction)).astype(np.int64)  # samples into CP
    win_start = starts + cp_lens - early
    gather = win_start[:, None] + np.arange(info.nfft)[None, :]  # [n_sym, nfft]
    total = int(sym_lens.sum())
    if waveform.shape[-1] < total:
        pad = total - waveform.shape[-1]
        waveform = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(0, pad)])
    windows = waveform[..., jnp.asarray(gather.astype(np.int32))]  # [..., n_sym, nfft]
    spec = dft.fft_auto(windows, axis=-1)
    bins = _grid_bins(n_sc, info.nfft)
    # phase de-rotation: starting `early` samples into the CP shifts the IFFT
    # output circularly by -early, i.e. FFT gives X_k * exp(-2pi j k early / N);
    # undo with exp(+2pi j k early / N).
    k = ((np.arange(n_sc) - n_sc // 2) % info.nfft).astype(np.float64)
    phase = np.exp(+2j * np.pi * np.outer(early, k) / info.nfft).astype(np.complex64)
    return spec[..., jnp.asarray(bins)] * jnp.asarray(phase)