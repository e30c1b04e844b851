import jax.numpy as jnp
import numpy as np
import pytest

from isac_tpu.config.carrier import ofdm_info
from isac_tpu.ops.ofdm import ofdm_demodulate, ofdm_modulate


@pytest.mark.parametrize("n_rb,scs", [(24, 30), (52, 15), (273, 30)])
def test_roundtrip_exact(n_rb, scs):
    info = ofdm_info(n_rb, scs)
    rng = np.random.default_rng(0)
    n_sym = 14 * 2
    grid = (
        rng.standard_normal((2, n_sym, n_rb * 12)) + 1j * rng.standard_normal((2, n_sym, n_rb * 12))
    ).astype(np.complex64)
    wave = ofdm_modulate(jnp.asarray(grid), info)
    lens = info.symbol_lengths_slots(2)
    assert wave.shape == (2, int(lens.sum()))
    back = ofdm_demodulate(wave, info, n_rb * 12, num_slots=2)
    np.testing.assert_allclose(np.asarray(back), grid, atol=2e-4)


def test_roundtrip_cp_fraction_variants():
    info = ofdm_info(24, 30)
    rng = np.random.default_rng(1)
    grid = (rng.standard_normal((14, 288)) + 1j * rng.standard_normal((14, 288))).astype(
        np.complex64
    )
    wave = ofdm_modulate(jnp.asarray(grid), info)
    for frac in (0.0, 0.5, 1.0):
        back = ofdm_demodulate(wave, info, 288, num_slots=1, cp_fraction=frac)
        np.testing.assert_allclose(np.asarray(back), grid, atol=2e-4)


def test_integer_delay_shows_linear_phase():
    """A pure sample delay d gives per-subcarrier phase exp(-2pi j k d / nfft)."""
    info = ofdm_info(24, 30)
    rng = np.random.default_rng(2)
    n_sc = 288
    grid = (rng.standard_normal((14, n_sc)) + 1j * rng.standard_normal((14, n_sc))).astype(
        np.complex64
    )
    wave = np.asarray(ofdm_modulate(jnp.asarray(grid), info))
    d = 5  # < cp_short * cp_fraction margin
    delayed = np.concatenate([np.zeros(d, np.complex64), wave[:-d]])
    back = np.asarray(ofdm_demodulate(jnp.asarray(delayed), info, n_sc, num_slots=1, cp_fraction=1.0))
    k = (np.arange(n_sc) - n_sc // 2) % info.nfft
    expected = grid * np.exp(-2j * np.pi * k * d / info.nfft)[None, :]
    np.testing.assert_allclose(back, expected, atol=1e-3)


def test_long_cp_positions_mu1():
    info = ofdm_info(24, 30)
    lens = info.symbol_lengths_slots(4)
    # at mu=1 every slot starts with the long CP
    assert np.all(lens[:, 0] == info.nfft + info.cp_long)
    assert np.all(lens[:, 1:] == info.nfft + info.cp_short)


def test_waveform_power_convention():
    """MATLAB ifft scaling: E|x|^2 = (n_sc/nfft^2) * E|X|^2 — the reference's
    amplitude law db2mag(P-30)*sqrt(nfft^2/(n_sc*n_ants)) (gNBPhy.m:592) assumes it."""
    info = ofdm_info(273, 30)
    rng = np.random.default_rng(3)
    n_sc = 3276
    grid = (rng.standard_normal((14, n_sc)) + 1j * rng.standard_normal((14, n_sc))) / np.sqrt(2)
    wave = np.asarray(ofdm_modulate(jnp.asarray(grid.astype(np.complex64)), info))
    p_wave = np.mean(np.abs(wave) ** 2)
    expected = n_sc / info.nfft**2 * 1.0  # grid symbol power == 1
    assert abs(p_wave / expected - 1.0) < 0.05
