import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isac_tpu.ops import pathloss as pl
from isac_tpu.ops.cdl import (
    CDL_PROFILES,
    apply_channel_freq,
    build_cdl_link,
    cdl_frequency_response,
    subcarrier_freqs,
)
from isac_tpu.ops.channel_est import estimate_channel_dmrs, mmse_equalize, timing_estimate
from isac_tpu.ops.dmrs import dmrs_fill_grid, dmrs_re_indices, dmrs_sequence, dmrs_symbols

BS = np.array([0.0, 0.0, 30.0])
UT = np.array([200.0, 0.0, 1.5])


def test_fspl_value():
    # 3.5 GHz, 1 km: FSPL = 20log10(4 pi 1000 / 0.0857) ~ 103.3 dB
    v = pl.fspl(1000.0, 3.5e9)
    assert abs(v - (20 * np.log10(4 * np.pi * 1000 * 3.5e9 / 299792458.0))) < 1e-9
    assert 103 < v < 104


@pytest.mark.parametrize("model", ["UMa", "UMi", "RMa", "InH", "InF-SL", "fspl"])
def test_pathloss_models_sane(model):
    los = np.array(True)
    nlos = np.array(False)
    v_los = pl.pathloss(model, BS, UT, 3.5e9, los)
    v_nlos = pl.pathloss(model, BS, UT, 3.5e9, nlos)
    assert 60 < float(v_los) < 160
    assert float(v_nlos) >= float(v_los) - 1e-9
    # increases with distance
    far = pl.pathloss(model, BS, np.array([800.0, 0.0, 1.5]), 3.5e9, los)
    assert float(far) > float(v_los)


def test_uma_nlos_worse_and_freq_dependence():
    v1 = pl.pathloss_uma(BS, UT, 2e9, np.array(True))
    v2 = pl.pathloss_uma(BS, UT, 4e9, np.array(True))
    assert abs((v2 - v1) - 20 * np.log10(2)) < 0.5


@pytest.mark.parametrize("profile", list(CDL_PROFILES))
def test_cdl_profile_energy_and_doppler(profile):
    tx_pos = np.stack([np.zeros(4), np.arange(4) * 0.0428, np.zeros(4)], -1)
    rx_pos = np.stack([np.zeros(2), np.arange(2) * 0.0428, np.zeros(2)], -1)
    link = build_cdl_link(profile, 300.0, 3.5e9, tx_pos, rx_pos,
                          ue_velocity=np.array([10.0, 0, 0]), seed=0)
    # average channel power over time/frequency ~ 1 (profile normalized)
    t = np.linspace(0, 10e-3, 50)
    f = subcarrier_freqs(120, 30e3)
    h = np.asarray(cdl_frequency_response(link, t, f))
    p = np.mean(np.abs(h) ** 2)
    assert 0.2 < p < 5.0, f"{profile}: mean power {p}"
    # time variation exists when moving
    assert np.std(np.abs(h[:, 0, 0, 0])) > 1e-4
    # LOS profiles are Rician: less fading depth on the dominant tap
    if CDL_PROFILES[profile][6]:
        cv = np.std(np.abs(h)) / np.mean(np.abs(h))
        assert cv < 0.8


def test_cdl_frequency_selectivity_scales_with_ds():
    tx = np.zeros((1, 3))
    rx = np.zeros((1, 3))
    f = subcarrier_freqs(600, 30e3)
    h_small = np.asarray(cdl_frequency_response(
        build_cdl_link("CDL-A", 30.0, 3.5e9, tx, rx, seed=1), np.zeros(1), f))[0, :, 0, 0]
    h_large = np.asarray(cdl_frequency_response(
        build_cdl_link("CDL-A", 1000.0, 3.5e9, tx, rx, seed=1), np.zeros(1), f))[0, :, 0, 0]

    def coherence(h):
        c = np.abs(np.corrcoef(np.abs(h[:-50]), np.abs(h[50:]))[0, 1])
        return c

    assert coherence(h_small) > coherence(h_large)


def test_dmrs_sequence_and_indices():
    r = dmrs_sequence(3, 2, 41, 10)
    assert r.shape == (60,)
    np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-12)
    # deterministic
    np.testing.assert_array_equal(r, dmrs_sequence(3, 2, 41, 10))
    # indices: port 0 on even REs, port 2 on odd REs
    k0 = dmrs_re_indices(2, 0, 0)
    k2 = dmrs_re_indices(2, 0, 2)
    assert k0.tolist() == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22]
    assert (k2 - k0).tolist() == [1] * 12


def test_channel_estimation_and_mmse_recovers_flat_channel():
    """Known 2x1 channel, DM-RS estimate + MMSE equalize a data grid."""
    n_prb, n_sym = 24, 14
    n_sc = 12 * n_prb
    slot, nid = 0, 1
    rng = np.random.default_rng(0)
    ports = (0,)
    syms = dmrs_symbols("A", 1)
    tx = np.zeros((1, n_sym, n_sc), np.complex64)
    tx, mask = dmrs_fill_grid(tx, slot, nid, n_prb, 0, ports, syms)
    data = ((rng.integers(0, 2, (n_sym, n_sc)) * 2 - 1)
            + 1j * (rng.integers(0, 2, (n_sym, n_sc)) * 2 - 1)).astype(np.complex64) / np.sqrt(2)
    tx[0][~mask] = data[~mask]
    # channel: 2 rx ants, mild frequency selectivity
    k = np.arange(n_sc)
    h_true = np.stack([
        (1.0 + 0.3 * np.exp(-2j * np.pi * k / 600))[None, :].repeat(n_sym, 0),
        (0.7 * np.exp(1j * 0.5) * np.exp(-2j * np.pi * k / 900))[None, :].repeat(n_sym, 0),
    ])  # [2, n_sym, n_sc]
    sigma2 = 1e-3
    noise = (rng.standard_normal((2, n_sym, n_sc)) + 1j * rng.standard_normal((2, n_sym, n_sc))
             ) * np.sqrt(sigma2 / 2)
    rx = h_true * tx[0][None] + noise.astype(np.complex64)
    h_est, nvar = estimate_channel_dmrs(jnp.asarray(rx), slot, nid, n_prb, 0, ports, syms)
    assert h_est.shape == (n_sym, n_sc, 2, 1)
    h_err = np.asarray(h_est)[..., 0].transpose(2, 0, 1) - h_true
    rel = np.linalg.norm(h_err) / np.linalg.norm(h_true)
    assert rel < 0.06, f"channel estimate rel err {rel}"
    assert float(nvar) < 10 * sigma2
    eq, sinr = mmse_equalize(jnp.asarray(rx), h_est, float(nvar))
    eq = np.asarray(eq)[0]
    err = np.abs(eq[~mask] - data[~mask])
    assert np.mean(err**2) < 0.01
    assert float(np.median(np.asarray(sinr))) > 100  # ~>20 dB


def test_mmse_mimo_2layers():
    rng = np.random.default_rng(1)
    S, K, R, L = 4, 32, 4, 2
    h = (rng.standard_normal((S, K, R, L)) + 1j * rng.standard_normal((S, K, R, L))
         ).astype(np.complex64) / np.sqrt(2)
    x = (rng.standard_normal((L, S, K)) + 1j * rng.standard_normal((L, S, K))
         ).astype(np.complex64) / np.sqrt(2)
    y = np.einsum("skrl,lsk->rsk", h, x)
    sigma2 = 1e-4
    y = y + (rng.standard_normal(y.shape) + 1j * rng.standard_normal(y.shape)).astype(
        np.complex64) * np.sqrt(sigma2 / 2)
    eq, sinr = mmse_equalize(jnp.asarray(y), jnp.asarray(h), sigma2)
    rel = np.linalg.norm(np.asarray(eq) - x) / np.linalg.norm(x)
    assert rel < 0.05
    assert float(np.median(np.asarray(sinr))) > 50


def test_timing_estimate_finds_delay():
    rng = np.random.default_rng(2)
    ref = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(np.complex64)
    d = 37
    wave = np.concatenate([np.zeros(d, np.complex64), ref, np.zeros(100, np.complex64)])
    off = timing_estimate(jnp.asarray(wave[None]), jnp.asarray(ref), max_offset=100)
    assert int(off) == d
    # weak correlation -> skip to 0
    noise = (rng.standard_normal(700) + 1j * rng.standard_normal(700)).astype(np.complex64)
    off2 = timing_estimate(jnp.asarray(noise[None]), jnp.asarray(ref), max_offset=100)
    assert int(off2) == 0


def test_cdl_end_to_end_link_with_estimation():
    """CDL-D 1x2 SIMO link: DM-RS estimate + MMSE + QPSK slicing, zero symbol errors."""
    n_prb, n_sym, slot, nid = 24, 14, 0, 1
    n_sc = 12 * n_prb
    rng = np.random.default_rng(3)
    ports = (0,)
    syms = dmrs_symbols("A", 1)
    tx = np.zeros((1, n_sym, n_sc), np.complex64)
    tx, mask = dmrs_fill_grid(tx, slot, nid, n_prb, 0, ports, syms)
    qpsk = np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, (n_sym, n_sc))))
    tx[0][~mask] = qpsk[~mask].astype(np.complex64)
    link = build_cdl_link("CDL-D", 100.0, 3.5e9, np.zeros((1, 3)),
                          np.stack([np.zeros(2), np.arange(2) * 0.0428, np.zeros(2)], -1),
                          ue_velocity=1.0, seed=4)
    t_syms = np.arange(n_sym) * 3.6e-5
    f = subcarrier_freqs(n_sc, 30e3)
    h = cdl_frequency_response(link, t_syms, f)
    rx = apply_channel_freq(jnp.asarray(tx), h)
    sigma2 = 1e-3
    noise = (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)) * np.sqrt(sigma2 / 2)
    rx = rx + jnp.asarray(noise.astype(np.complex64))
    h_est, nvar = estimate_channel_dmrs(rx, slot, nid, n_prb, 0, ports, syms)
    eq, sinr = mmse_equalize(rx, h_est, float(nvar))
    eq = np.asarray(eq)[0][~mask]
    # QPSK hard decisions match
    dec = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.round((np.angle(eq) - np.pi / 4) / (np.pi / 2))))
    errs = np.sum(np.abs(dec - qpsk[~mask]) > 0.1)
    assert errs == 0, f"{errs} symbol errors"
