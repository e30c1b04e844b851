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


def _cp_groups(info: OFDMInfo, num_slots: int, first_slot: int):
    """Uniform long/short-CP group structure, or None when it doesn't hold.

    Normal CP: the long CP lands on the first symbol of every half-subframe
    (group of symbols_per_subframe/2 symbols), the rest are short — when the
    requested span starts on a group boundary, modulate/demodulate reduce to
    static SLICES + reshapes per group instead of multi-MB gathers (r4 TPU
    profile: the windowing gather was 45 ms of the 55 ms sensing chain)."""
    sym_lens = info.symbol_lengths_slots(num_slots, first_slot).reshape(-1)
    cp_lens = info.cp_lengths_slots(num_slots, first_slot).reshape(-1)
    n_sym = sym_lens.shape[0]
    g = info.symbols_per_subframe // 2
    if n_sym % g:
        return None
    cp = cp_lens.reshape(-1, g)
    if not (np.all(cp[:, 0] == info.cp_long) and np.all(cp[:, 1:] == info.cp_short)):
        return None
    return g, int(cp_lens.sum() + n_sym * info.nfft)


def _grid_to_bins(grid: jnp.ndarray, n_sc: int, nfft: int) -> jnp.ndarray:
    """Centered grid -> FFT-bin layout via two slices + zero mid (no scatter)."""
    half = n_sc // 2
    zeros = jnp.zeros((*grid.shape[:-1], nfft - n_sc), jnp.complex64)
    return jnp.concatenate(
        [grid[..., half:].astype(jnp.complex64), zeros,
         grid[..., :half].astype(jnp.complex64)], axis=-1
    )


def _bins_to_grid(spec: jnp.ndarray, n_sc: int, nfft: int) -> jnp.ndarray:
    """FFT-bin layout -> centered grid (inverse of _grid_to_bins)."""
    half = n_sc // 2
    return jnp.concatenate(
        [spec[..., nfft - half:], spec[..., : n_sc - half]], axis=-1
    )


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
    x = _grid_to_bins(grid, n_sc, info.nfft)
    time_syms = dft.ifft_auto(x, axis=-1)  # MATLAB ifft scaling (1/N)
    groups = _cp_groups(info, num_slots, first_slot)
    if groups is not None:
        g, _ = groups
        nfft, cpl, cps = info.nfft, info.cp_long, info.cp_short
        lead = time_syms.shape[:-2]
        ts = time_syms.reshape(*lead, n_sym // g, g, nfft)
        first = jnp.concatenate(
            [ts[..., 0, nfft - cpl:], ts[..., 0, :]], axis=-1
        )  # [..., n_groups, cpl+nfft]
        rest = jnp.concatenate(
            [ts[..., 1:, nfft - cps:], ts[..., 1:, :]], axis=-1
        )  # [..., n_groups, g-1, cps+nfft]
        per_group = jnp.concatenate(
            [first, rest.reshape(*rest.shape[:-2], -1)], axis=-1
        )
        return per_group.reshape(*lead, -1)
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
    total = int(sym_lens.sum())
    if waveform.shape[-1] < total:
        pad = total - waveform.shape[-1]
        waveform = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(0, pad)])
    groups = _cp_groups(info, num_slots, first_slot)
    if groups is not None:
        # slice/reshape window extraction (no [n_sym, nfft] gather — it was
        # 45 ms of the 55 ms sensing chain on the relay, r4 profile)
        g, _ = groups
        nfft, cpl, cps = info.nfft, info.cp_long, info.cp_short
        lead = waveform.shape[:-1]
        s_group = cpl + (g - 1) * cps + g * nfft
        unit = cps + nfft
        wf = waveform[..., :total].reshape(*lead, n_sym // g, s_group)
        e_l = int(np.floor(cpl * (1.0 - cp_fraction)))
        e_s = int(np.floor(cps * (1.0 - cp_fraction)))
        first = wf[..., cpl - e_l : cpl - e_l + nfft][..., None, :]
        rest = wf[..., cpl + nfft :].reshape(*lead, n_sym // g, g - 1, unit)
        rest = rest[..., cps - e_s : cps - e_s + nfft]
        windows = jnp.concatenate([first, rest], axis=-2).reshape(
            *lead, n_sym, nfft
        )
    else:
        gather = win_start[:, None] + np.arange(info.nfft)[None, :]  # [n_sym, nfft]
        windows = waveform[..., jnp.asarray(gather.astype(np.int32))]
    spec = dft.fft_auto(windows, axis=-1)
    # phase de-rotation: starting `early` samples into the CP shifts the IFFT
    # output circularly by -early, i.e. FFT gives X_k * exp(-2pi j k early / N);
    # undo with exp(+2pi j k early / N).
    k = ((np.arange(n_sc) - n_sc // 2) % info.nfft).astype(np.float64)
    phase = np.exp(+2j * np.pi * np.outer(early, k) / info.nfft).astype(np.complex64)
    return _bins_to_grid(spec, n_sc, info.nfft) * jnp.asarray(phase)