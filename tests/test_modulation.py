import jax.numpy as jnp
import numpy as np
import pytest

from isac_tpu.ops.modulation import (
    MODULATION_ORDERS,
    constellation,
    demodulate_llr,
    descramble_llr,
    hard_decision,
    modulate,
    scramble_bits,
)
from isac_tpu.utils.sequences import gold_sequence


@pytest.mark.parametrize("mod", ["BPSK", "QPSK", "16QAM", "64QAM", "256QAM"])
def test_unit_average_power(mod):
    pts = constellation(mod)
    assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-12


def test_qpsk_known_points():
    # 38.211 §5.1.3: bits 00 -> (1+1j)/sqrt(2), 11 -> (-1-1j)/sqrt(2)
    out = np.asarray(modulate(jnp.asarray([0, 0, 1, 1, 0, 1]), "QPSK"))
    np.testing.assert_allclose(out[0], (1 + 1j) / np.sqrt(2), atol=1e-7)
    np.testing.assert_allclose(out[1], (-1 - 1j) / np.sqrt(2), atol=1e-7)
    np.testing.assert_allclose(out[2], (1 - 1j) / np.sqrt(2), atol=1e-7)


def test_16qam_known_point():
    # bits 0000 -> (1+1j)/sqrt(10); 1010 -> (-3-3j)/sqrt(10)? b(0)=1 -> negative I.
    out = np.asarray(modulate(jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1]), "16QAM"))
    np.testing.assert_allclose(out[0], (1 + 1j) / np.sqrt(10), atol=1e-7)
    np.testing.assert_allclose(out[1], (-3 - 3j) / np.sqrt(10), atol=1e-7)


@pytest.mark.parametrize("mod", ["QPSK", "16QAM", "64QAM", "256QAM"])
def test_mod_demod_roundtrip_noiseless(mod):
    rng = np.random.default_rng(0)
    qm = MODULATION_ORDERS[mod]
    bits = rng.integers(0, 2, 256 * qm).astype(np.int8)
    sym = modulate(jnp.asarray(bits), mod)
    llr = demodulate_llr(sym, 0.1, mod)
    np.testing.assert_array_equal(np.asarray(hard_decision(llr)), bits)


def test_llr_sign_convention():
    # positive LLR for bit 0 (MATLAB nrSymbolDemodulate convention)
    sym = modulate(jnp.asarray([0, 0]), "QPSK")
    llr = np.asarray(demodulate_llr(sym, 1.0, "QPSK"))
    assert np.all(llr > 0)


def test_llr_scaling_with_noise_var():
    sym = modulate(jnp.asarray([0, 1]), "QPSK")
    llr1 = np.asarray(demodulate_llr(sym, 0.5, "QPSK"))
    llr2 = np.asarray(demodulate_llr(sym, 1.0, "QPSK"))
    np.testing.assert_allclose(llr1, 2 * llr2, rtol=1e-6)


def test_scrambling_roundtrip():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, 1000).astype(np.int8))
    c = gold_sequence(12345, 1000)
    scr = scramble_bits(bits, c)
    assert not np.array_equal(np.asarray(scr), np.asarray(bits))
    np.testing.assert_array_equal(np.asarray(scramble_bits(scr, c)), np.asarray(bits))
    # soft path: descrambled LLRs of scrambled bits decode to original
    sym = modulate(scr, "QPSK")
    llr = demodulate_llr(sym, 0.1, "QPSK")
    llr_descr = descramble_llr(llr, c)
    np.testing.assert_array_equal(np.asarray(hard_decision(llr_descr)), np.asarray(bits))
