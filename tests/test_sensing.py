"""Sensing chain golden tests: synthetic point targets with known range/velocity/
angle must be recovered within the radar resolutions (SURVEY §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isac_tpu.config import CarrierConfig, GNBParams, ULA
from isac_tpu.config.carrier import ofdm_info
from isac_tpu.ops.ofdm import ofdm_modulate
from isac_tpu.ops.sensing import (
    apply_radar_channel,
    beamscan_doa,
    cfar_detect_map,
    derive_radar_params,
    fft_2d_estimate,
    get_rmse,
    make_cfar_config,
    mono_static_sensing,
    music_doa,
    mvdr_doa,
    range_doppler_map,
    roc_pd,
    spatial_covariance,
    steering_vector,
)
from isac_tpu.ops.sensing.cfar import CFARConfig, ca_threshold_factor
from isac_tpu.utils.geometry import SPEED_OF_LIGHT


def small_setup(num_slots=20, n_rb=51, pos=((120.0, 40.0, 1.5),), vel=(12.0,), rcs=(1.0,)):
    """Small-bandwidth cell (20 MHz / SCS 30) to keep CPU tests quick."""
    gnb = GNBParams(
        dl_bandwidth=20e6,
        ul_bandwidth=20e6,
        scs_khz=30,
        antenna=ULA(n_v=8, polarizations=1),
        tx_power_dbm=44.0,
    )
    carrier = gnb.carrier
    params = derive_radar_params(
        gnb, carrier, np.asarray(pos), np.asarray(rcs), np.asarray(vel), num_slots
    )
    return gnb, carrier, params


def test_radar_params_derivation():
    gnb, carrier, p = small_setup()
    # geometry: range/azimuth from relative position
    rel = np.array([120.0, 40.0, 1.5 - 30.0])
    assert abs(p.range_m[0] - np.linalg.norm(rel)) < 1e-9
    assert abs(p.azimuth_deg[0] - np.degrees(np.arctan2(40, 120))) < 1e-9
    # resolutions: rRes = c/(2*scs*nIFFT), rMax = c/(2*scs) (radarParams.m:69-72)
    scs = 30e3
    assert p.n_ifft == 1024  # 51 RB -> 612 sc -> 1024
    assert abs(p.r_res - SPEED_OF_LIGHT / (2 * scs * 1024)) < 1e-9
    assert abs(p.r_max - SPEED_OF_LIGHT / (2 * scs)) < 1e-9
    # SNR budget is monotonically decreasing in range
    _, _, p_far = small_setup(pos=((400.0, 0.0, 1.5),))
    assert p_far.snr_db[0] < p.snr_db[0]
    # steering vector: unit modulus, first element 1
    assert np.allclose(np.abs(p.steering), 1.0)
    assert np.allclose(p.steering[0], 1.0)


def test_ca_threshold_factor():
    # alpha = N (Pfa^{-1/N} - 1); N=24 for guard [2 2] training [1 1]
    cfg = CFARConfig(pfa=1e-9)
    assert cfg.num_training == 24
    assert abs(cfg.threshold_factor - 24 * ((1e-9) ** (-1 / 24) - 1)) < 1e-9


def test_cfar_detects_synthetic_peak():
    rng = np.random.default_rng(0)
    power = rng.exponential(1.0, (64, 64)).astype(np.float32)
    power[30, 40] = 500.0
    cfg = CFARConfig(pfa=1e-6, zone_rows=(5, 58), zone_cols=(5, 58), max_detections=4)
    det = np.asarray(cfar_detect_map(jnp.asarray(power), cfg))
    assert det[30, 40]
    assert det.sum() <= 3  # few false alarms at Pfa 1e-6 over ~3k cells


def test_rdm_point_target_bins():
    """A synthetic frequency-domain target signature lands in the right RDM bin."""
    gnb, carrier, p = small_setup()
    n_sym = 28
    n_sc = carrier.n_sc
    r_true, v_true = 150.0, 10.0
    lam = SPEED_OF_LIGHT / p.fc
    tau = 2 * r_true / SPEED_OF_LIGHT
    fd = 2 * v_true / lam
    scs = 30e3
    k = np.arange(n_sc)
    m = np.arange(n_sym)
    h = np.exp(-2j * np.pi * k[None, :] * scs * tau) * np.exp(
        2j * np.pi * m[:, None] * p.tsri * fd
    )
    tx = np.ones((1, n_sym, n_sc), np.complex64)
    rx = (tx[0] * h)[None].astype(np.complex64)
    rdm = np.asarray(range_doppler_map(jnp.asarray(rx), jnp.asarray(tx), p.n_ifft, p.n_fft))
    pw = np.abs(rdm[0]) ** 2
    r_bin, d_bin = np.unravel_index(np.argmax(pw), pw.shape)
    assert abs(r_bin * p.r_res - r_true) < 2 * p.r_res
    assert abs((d_bin - p.n_fft / 2) * p.v_res - v_true) < 2 * p.v_res


def test_end_to_end_sensing_chain():
    """Full chain: OFDM waveform -> echo channel -> demod -> RDM -> CFAR -> MUSIC."""
    gnb, carrier, p = small_setup(num_slots=8, pos=((150.0, 60.0, 1.5),), vel=(8.0,))
    info = carrier.ofdm
    n_sc = carrier.n_sc
    num_slots = 8
    rng = np.random.default_rng(1)
    # QPSK-filled DL grid on all slots (sensing accumulates DL waveform)
    grid = ((rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc)) * 2 - 1)
            + 1j * (rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc)) * 2 - 1)
            ).astype(np.complex64) / np.sqrt(2)
    amp = 10 ** ((gnb.tx_power_dbm - 30) / 20) * np.sqrt(info.nfft**2 / (n_sc * gnb.num_tx_ants))
    wave = np.asarray(ofdm_modulate(jnp.asarray(grid), info)) * amp
    # recompute radar params with the actual slot count
    p = derive_radar_params(gnb, carrier, np.array([[150.0, 60.0, 1.5]]),
                            np.array([1.0]), np.array([8.0]), num_slots)
    rx_grid = mono_static_sensing(
        jnp.asarray(wave.T), p, info, n_sc, num_slots, jax.random.PRNGKey(0)
    )
    est = fft_2d_estimate(rx_grid, jnp.asarray(grid) * amp, p, max_targets=2)
    rng_est = np.asarray(est["rngEst"])
    vel_est = np.asarray(est["velEst"])
    valid = np.asarray(est["valid"])
    assert valid.any(), "CFAR found no detections"
    truth_r = p.range_m[0]
    best = np.nanargmin(np.abs(rng_est - truth_r))
    # integer-sample delay quantization: ceil(2r/c/Ts)*Ts*c/2 - r <= c*Ts/2 ~ 2.4m @20MHz
    ts_quant = SPEED_OF_LIGHT / (2 * p.fs)
    assert abs(rng_est[best] - truth_r) < 2 * p.r_res + ts_quant
    assert abs(vel_est[best] - 8.0) < 2 * p.v_res
    # MUSIC azimuth
    azi = np.asarray(est["aziEst"])
    truth_az = p.azimuth_deg[0]
    assert np.nanmin(np.abs(azi - truth_az)) < 3.0
    # RMSE postprocessing reports a match
    rep = get_rmse({k: np.asarray(v) for k, v in est.items() if k != "rdm"}, p)
    assert rep["numMatched"] >= 1
    assert rep["rngRMSE"] < 2 * p.r_res + ts_quant


@pytest.mark.parametrize("method", ["music", "beamscan", "mvdr"])
def test_doa_methods_two_sources(method):
    """Two uncorrelated sources at known azimuths recovered by all DoA methods."""
    # two sources inside the unambiguous ULA sector (scan is +-60 deg)
    gnb, carrier, p = small_setup(pos=((100.0, -58.0, 1.5), (80.0, 67.0, 1.5)),
                                  vel=(5.0, -5.0), rcs=(1.0, 1.0))
    lam = SPEED_OF_LIGHT / p.fc
    az_true = np.array([-30.0, 40.0])
    a = steering_vector(gnb.antenna, lam, az_true, np.zeros(2))  # [n_ants, 2]
    rng = np.random.default_rng(2)
    n_snap = 512
    s = (rng.standard_normal((2, n_snap)) + 1j * rng.standard_normal((2, n_snap))) / np.sqrt(2)
    x = a @ s + 0.01 * (rng.standard_normal((a.shape[0], n_snap))
                        + 1j * rng.standard_normal((a.shape[0], n_snap)))
    ra = jnp.asarray((x @ x.conj().T / n_snap).astype(np.complex64))
    fn = {"music": music_doa, "beamscan": beamscan_doa, "mvdr": mvdr_doa}[method]
    kw = {"num_det_static": 2} if method == "music" else {}
    out = fn(ra, p, max_targets=3, **kw)
    az_est = np.asarray(out["azEst"])
    for t in az_true:
        assert np.nanmin(np.abs(az_est - t)) < 3.0, f"{method}: {az_est} vs {t}"


def test_doa_two_pol_ula():
    """Shipped-scenario antenna (8x2-pol ULA): co-located pol pairs must give an
    8-position aperture; azimuth recovered within the scan resolution (r1
    VERDICT Weak #2 regression test)."""
    gnb = GNBParams(
        dl_bandwidth=20e6, ul_bandwidth=20e6, scs_khz=30,
        antenna=ULA(n_v=8, polarizations=2), tx_power_dbm=44.0,
    )
    carrier = gnb.carrier
    p = derive_radar_params(
        gnb, carrier, np.array([[100.0, 58.0, 1.5]]), np.array([1.0]),
        np.array([5.0]), 8,
    )
    # steering: 16 entries but only n_v=8 distinct phase centers (pairs equal)
    lam = SPEED_OF_LIGHT / p.fc
    a = steering_vector(gnb.antenna, lam, np.array([25.0]), np.array([0.0]))
    assert a.shape[0] == 16
    np.testing.assert_allclose(a[0::2], a[1::2])
    az_true = 30.0
    a1 = steering_vector(gnb.antenna, lam, np.array([az_true]), np.array([0.0]))
    rng = np.random.default_rng(4)
    n_snap = 256
    s = (rng.standard_normal((1, n_snap)) + 1j * rng.standard_normal((1, n_snap))) / np.sqrt(2)
    x = a1 @ s + 0.01 * (
        rng.standard_normal((16, n_snap)) + 1j * rng.standard_normal((16, n_snap))
    )
    ra = jnp.asarray((x @ x.conj().T / n_snap).astype(np.complex64))
    out = music_doa(ra, p, max_targets=2, num_det_static=1)
    az_est = np.asarray(out["azEst"])
    assert np.nanmin(np.abs(az_est - az_true)) < 2.0, az_est
    # a ULA reports NaN elevation, never a fake 0
    assert np.all(~np.isfinite(np.asarray(out["elEst"])))


def test_ula_azimuth_mirror_folding():
    """A target behind the array's +-90 sector scores against the folded angle."""
    from isac_tpu.ops.sensing.metrics import _fold_ula_azimuth

    assert abs(_fold_ula_azimuth(135.0) - 45.0) < 1e-9
    assert abs(_fold_ula_azimuth(-135.0) - (-45.0)) < 1e-9
    assert abs(_fold_ula_azimuth(60.0) - 60.0) < 1e-9
    gnb, carrier, p = small_setup(pos=((-100.0, 100.0, 1.5),), vel=(5.0,))  # az=135
    est = {
        "rngEst": np.array([p.range_m[0]]),
        "velEst": np.array([5.0]),
        "aziEst": np.array([45.0]),  # the mirror estimate a ULA produces
        "eleEst": np.array([np.nan]),
    }
    rep = get_rmse(est, p)
    assert rep["numMatched"] == 1
    assert rep["aziRMSE"] < 1e-6
    assert np.isnan(rep["eleRMSE"])


def test_spatial_covariance_shape_and_hermitian():
    rng = np.random.default_rng(3)
    g = jnp.asarray((rng.standard_normal((4, 14, 24)) + 1j * rng.standard_normal((4, 14, 24))
                     ).astype(np.complex64))
    ra = np.asarray(spatial_covariance(g))
    assert ra.shape == (4, 4)
    np.testing.assert_allclose(ra, ra.conj().T, atol=1e-5)


def test_roc_pd_monotone():
    pd = roc_pd(np.array([0.0, 5.0, 10.0, 13.0, 20.0]), 1e-6)
    assert np.all(np.diff(pd) > 0)
    assert pd[0] < 0.05 and pd[-1] > 0.99
    # classic operating point: Pfa=1e-6, SNR=13 dB -> Pd ~ 0.9 (within a few %)
    assert abs(pd[3] - 0.90) < 0.06
