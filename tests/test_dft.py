"""Matmul-DFT (ops/dft.py) vs numpy FFT — exactness within complex64
two-stage tolerance across the sizes the OFDM/RDM/SRS paths use."""

import numpy as np
import pytest

from isac_tpu.ops.dft import fft_matmul


@pytest.mark.parametrize("n", [64, 97, 256, 1024, 2048, 4096, 3276, 612, 63])
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_numpy(n, inverse):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))).astype(
        np.complex64
    )
    ref = np.fft.ifft(x, axis=-1) if inverse else np.fft.fft(x, axis=-1)
    out = np.asarray(fft_matmul(x, axis=-1, inverse=inverse))
    scale = np.abs(ref).max() + 1e-9
    assert np.max(np.abs(out - ref)) / scale < 3e-3, (n, inverse)


def test_pad_truncate_and_axis():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((5, 100, 2)) + 1j * rng.standard_normal((5, 100, 2))).astype(
        np.complex64
    )
    # zero-pad to 256 along axis 1
    ref = np.fft.fft(x, n=256, axis=1)
    out = np.asarray(fft_matmul(x, n=256, axis=1))
    assert np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9) < 3e-3
    # truncate to 64
    ref = np.fft.ifft(x, n=64, axis=1)
    out = np.asarray(fft_matmul(x, n=64, axis=1, inverse=True))
    assert np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9) < 3e-3


def test_roundtrip():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 1024)) + 1j * rng.standard_normal((2, 1024))).astype(
        np.complex64
    )
    y = np.asarray(fft_matmul(fft_matmul(x), inverse=True))
    assert np.max(np.abs(y - x)) < 2e-3


def test_ofdm_roundtrip_under_matmul_dft():
    """Force the matmul path through the real OFDM mod/demod pair."""
    import jax.numpy as jnp

    from isac_tpu.config.params import GNBParams
    from isac_tpu.ops import dft, ofdm

    gnb = GNBParams()
    info = gnb.carrier.ofdm
    n_sc = gnb.carrier.n_sc
    rng = np.random.default_rng(2)
    grid = (
        rng.standard_normal((1, 14, n_sc)) + 1j * rng.standard_normal((1, 14, n_sc))
    ).astype(np.complex64)
    orig_fft, orig_ifft = dft.fft_auto, dft.ifft_auto
    dft.fft_auto = lambda x, n=None, axis=-1: dft.fft_matmul(x, n, axis, False)
    dft.ifft_auto = lambda x, n=None, axis=-1: dft.fft_matmul(x, n, axis, True)
    try:
        wave = ofdm.ofdm_modulate(jnp.asarray(grid), info)
        back = ofdm.ofdm_demodulate(wave, info, n_sc, num_slots=1)
    finally:
        dft.fft_auto, dft.ifft_auto = orig_fft, orig_ifft
    err = np.max(np.abs(np.asarray(back) - grid)) / (np.abs(grid).max() + 1e-9)
    assert err < 5e-3, err
