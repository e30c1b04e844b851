"""Receiver DSP: DM-RS channel estimation, MMSE equalization, timing estimate.

Replaces MATLAB nrChannelEstimate / nrEqualizeMMSE / nrTimingEstimate +
skipWeakTimingOffset (reference: gNBPhy.m:916-949, uePhy.m:757-933,
skipWeakTimingOffset.m:10-24; SURVEY §2.9).

All functions are batched tensor ops: per-RE MIMO MMSE uses jnp.linalg.solve on
[..., L, L] blocks (small L, batched over sym x sc), LS estimation + OCC
decode + smoothing are gathers and depthwise convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ls_estimate_port(
    rx_grid: jnp.ndarray,  # [n_rx, n_sym, n_sc]
    ref_vals: np.ndarray,  # [n_pilot] complex, port's DM-RS values (w_f applied)
    sym_idx: np.ndarray,  # [n_dmrs_sym]
    sc_idx: np.ndarray,  # [n_pilot_sc] subcarrier indices (per DM-RS symbol)
) -> jnp.ndarray:
    """Raw LS at pilot REs: H_ls[n_rx, n_dmrs_sym, n_pilot_sc]."""
    pilots = rx_grid[:, jnp.asarray(sym_idx)][:, :, jnp.asarray(sc_idx)]
    ref = jnp.asarray(ref_vals.astype(np.complex64))
    return pilots * jnp.conj(ref)[None, None, :] / jnp.maximum(jnp.abs(ref) ** 2, 1e-12)


def occ2_decode(h_ls: jnp.ndarray) -> tuple:
    """Split FD-OCC-2 pair estimates: input [..., 2n] alternating k'=0/1 ->
    (port_even [..., n], port_odd [..., n]) — averages/differences over pairs."""
    e = h_ls[..., 0::2]
    o = h_ls[..., 1::2]
    return (e + o) / 2.0, (e - o) / 2.0


def smooth_freq(h: jnp.ndarray, window: int = 7) -> jnp.ndarray:
    """Moving-average over the last (subcarrier) axis — the reference's
    channel-estimate averaging window (gNBPhy.m:935 uses [0 7])."""
    if window <= 1:
        return h
    k = jnp.ones((window,), h.dtype) / window
    pad = window // 2
    hp = jnp.pad(h, [(0, 0)] * (h.ndim - 1) + [(pad, pad)], mode="edge")
    # depthwise 1D convolution via correlation over last axis
    def conv1d(x):
        return jnp.convolve(x, k, mode="valid")
    flat = hp.reshape(-1, hp.shape[-1])
    out = jax.vmap(conv1d)(flat)
    return out.reshape(*h.shape[:-1], -1)


def interp_to_grid(
    h_pilot: jnp.ndarray,  # [..., n_dmrs_sym, n_pilot_sc]
    pilot_sc: np.ndarray,  # [n_pilot_sc] subcarrier positions of estimates
    dmrs_syms: np.ndarray,  # [n_dmrs_sym]
    n_sym: int,
    n_sc: int,
) -> jnp.ndarray:
    """Linear interpolation over subcarriers + nearest/linear over symbols to the
    full grid [..., n_sym, n_sc]."""
    # frequency interpolation (linear, clamped ends) via precomputed weights
    sc = np.arange(n_sc)
    right = np.searchsorted(pilot_sc, sc)
    right = np.clip(right, 1, len(pilot_sc) - 1)
    left = right - 1
    x0, x1 = pilot_sc[left], pilot_sc[right]
    w = np.where(x1 > x0, (sc - x0) / np.maximum(x1 - x0, 1), 0.0)
    w = np.clip(w, 0.0, 1.0).astype(np.float32)
    hf = (
        h_pilot[..., jnp.asarray(left)] * (1.0 - jnp.asarray(w))
        + h_pilot[..., jnp.asarray(right)] * jnp.asarray(w)
    )  # [..., n_dmrs_sym, n_sc]
    # time interpolation: nearest DM-RS symbol (linear needs >= 2; use linear then)
    if len(dmrs_syms) == 1:
        return jnp.repeat(hf[..., :1, :], n_sym, axis=-2)
    syms = np.arange(n_sym)
    right_t = np.clip(np.searchsorted(dmrs_syms, syms), 1, len(dmrs_syms) - 1)
    left_t = right_t - 1
    t0, t1 = dmrs_syms[left_t], dmrs_syms[right_t]
    wt = np.clip((syms - t0) / np.maximum(t1 - t0, 1), 0.0, 1.0).astype(np.float32)
    ht = (
        hf[..., jnp.asarray(left_t), :] * (1.0 - jnp.asarray(wt))[..., :, None]
        + hf[..., jnp.asarray(right_t), :] * jnp.asarray(wt)[..., :, None]
    )
    return ht


def estimate_channel_dmrs(
    rx_grid: jnp.ndarray,  # [n_rx, n_sym, n_sc]
    slot: int,
    n_id: int,
    n_prb: int,
    prb_start: int,
    ports: tuple,
    dmrs_sym: tuple,
    freq_window: int = 7,
    prb_set: tuple | None = None,
):
    """Practical DM-RS channel estimator. prb_set overrides the contiguous
    (n_prb, prb_start) allocation for RBG-bitmap grants.

    Returns (H [n_sym, n_sc, n_rx, n_ports], noise_var scalar estimate).
    """
    from isac_tpu.ops.dmrs import (
        dmrs_re_indices,
        dmrs_re_indices_prbs,
        dmrs_sequence,
        dmrs_values_for_prbs,
    )

    n_rx, n_sym, n_sc = rx_grid.shape
    sym_idx = np.asarray(dmrs_sym)
    h_ports = []
    noise_acc = []
    for port in ports:
        if prb_set is not None:
            sc_idx = dmrs_re_indices_prbs(tuple(prb_set), port)
            refs = np.stack(
                [dmrs_values_for_prbs(slot, int(l), n_id, tuple(prb_set)) for l in sym_idx]
            )
        else:
            sc_idx = dmrs_re_indices(n_prb, prb_start, port)
            refs = np.stack(
                [dmrs_sequence(slot, int(l), n_id, n_prb, prb_start) for l in sym_idx]
            )  # [n_dmrs_sym, n_pilot]
        pilots = rx_grid[:, jnp.asarray(sym_idx)][:, :, jnp.asarray(sc_idx)]
        ls = pilots * jnp.conj(jnp.asarray(refs.astype(np.complex64)))[None]
        # per-port OCC decode over k' pairs (ports even: +, odd: -)
        e, o = ls[..., 0::2], ls[..., 1::2]
        h_pair = (e + o) / 2.0 if port % 2 == 0 else (e - o) / 2.0
        # noise estimate from the orthogonal (rejected) OCC branch
        rej = (e - o) / 2.0 if port % 2 == 0 else (e + o) / 2.0
        noise_acc.append(jnp.mean(jnp.abs(rej) ** 2))
        pair_sc = sc_idx[0::2] + 1  # pair center between the two REs
        h_s = smooth_freq(h_pair, freq_window)
        h_full = interp_to_grid(h_s, pair_sc, sym_idx, n_sym, n_sc)  # [n_rx, n_sym, n_sc]
        h_ports.append(h_full)
    h = jnp.stack(h_ports, axis=-1)  # [n_rx, n_sym, n_sc, n_ports]
    h = jnp.transpose(h, (1, 2, 0, 3))  # [n_sym, n_sc, n_rx, n_ports]
    # rejected-branch power contains noise + (for port pairs) cross-leakage;
    # with orthogonal OCC on a flat-enough channel it is a noise estimate.
    noise_var = jnp.mean(jnp.stack(noise_acc)) * 2.0  # per-RE complex noise power
    return h, noise_var


def mmse_equalize(
    rx_grid: jnp.ndarray,  # [n_rx, n_sym, n_sc]
    h: jnp.ndarray,  # [n_sym, n_sc, n_rx, n_layers]
    noise_var: jnp.ndarray | float,
):
    """Per-RE MMSE with bias correction.

    Returns (symbols [n_layers, n_sym, n_sc] unbiased estimates,
             sinr [n_layers, n_sym, n_sc] post-equalization SINR) —
    LLRs should use noise_var = 1/sinr.
    """
    n_rx, n_sym, n_sc = rx_grid.shape
    n_layers = h.shape[-1]
    y = jnp.transpose(rx_grid, (1, 2, 0))[..., None]  # [S, K, n_rx, 1]
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))  # [S, K, L, n_rx]
    a = jnp.einsum("...lr,...rm->...lm", hh, h)  # H^H H [S, K, L, L]
    nv = jnp.asarray(noise_var, a.real.dtype)
    a_reg = a + nv * jnp.eye(n_layers, dtype=a.dtype)
    rhs = jnp.einsum("...lr,...rm->...lm", hh, y)  # H^H y [S, K, L, 1]
    x = jnp.linalg.solve(a_reg, rhs)[..., 0]  # [S, K, L]
    # bias mu_l = [A^-1 H^H H]_ll ; SINR = mu/(1-mu)
    ainv_hh = jnp.linalg.solve(a_reg, a)  # [S, K, L, L]
    mu = jnp.clip(jnp.real(jnp.diagonal(ainv_hh, axis1=-2, axis2=-1)), 1e-6, 1.0 - 1e-6)
    sym = x / mu.astype(x.dtype)
    sinr = mu / (1.0 - mu)
    return jnp.transpose(sym, (2, 0, 1)), jnp.transpose(sinr, (2, 0, 1))


def timing_estimate(
    waveform: jnp.ndarray,  # [n_rx, n_samples]
    ref_waveform: jnp.ndarray,  # [n_samples_ref]
    max_offset: int,
    threshold: float = 5.5,
) -> jnp.ndarray:
    """Correlation timing estimate with the weak-peak skip rule
    (nrTimingEstimate + skipWeakTimingOffset.m: accept only if peak >= 5.5x mean)."""
    n = waveform.shape[-1]
    nfft = int(2 ** np.ceil(np.log2(n + ref_waveform.shape[-1])))
    wf = jnp.fft.fft(waveform, nfft, axis=-1)
    rf = jnp.fft.fft(ref_waveform, nfft)
    corr = jnp.abs(jnp.fft.ifft(wf * jnp.conj(rf)[None, :], axis=-1))
    mag = jnp.sum(corr, axis=0)[: max_offset + 1]
    peak = jnp.max(mag)
    offset = jnp.argmax(mag)
    ok = peak >= threshold * jnp.mean(mag)
    return jnp.where(ok, offset, 0)
