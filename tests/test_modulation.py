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


def test_closed_form_matches_table_all_mods():
    """r4 perf rewrite: arithmetic Gray mapping and per-axis max-log demod
    must be numerically identical to the table-lookup / joint-distance
    formulations (the per-axis min split is exact for square Gray QAM)."""
    rng = np.random.default_rng(11)
    for mod, qm in MODULATION_ORDERS.items():
        bits = rng.integers(0, 2, 16 * 3 * qm).astype(np.int8)
        sym = np.asarray(modulate(jnp.asarray(bits), mod))
        # table reference
        idx = np.sum(bits.reshape(-1, qm) * (1 << (qm - 1 - np.arange(qm))), -1)
        ref = constellation(mod)[idx].astype(np.complex64)
        np.testing.assert_allclose(sym, ref, rtol=1e-6, atol=1e-6)
        # demod: joint-distance numpy reference
        rx = (ref + 0.1 * (rng.standard_normal(ref.shape)
                           + 1j * rng.standard_normal(ref.shape))).astype(np.complex64)
        nv = 0.02
        got = np.asarray(demodulate_llr(jnp.asarray(rx), nv, mod))
        pts = constellation(mod)
        labels = ((np.arange(1 << qm)[:, None] >> (qm - 1 - np.arange(qm))) & 1)
        d2 = np.abs(rx[:, None] - pts[None, :]) ** 2
        want = np.empty((rx.shape[0], qm), np.float32)
        for b in range(qm):
            d0 = np.min(np.where(labels[:, b] == 1, 1e30, d2), -1)
            d1 = np.min(np.where(labels[:, b] == 1, d2, 1e30), -1)
            want[:, b] = (d1 - d0) / nv
        np.testing.assert_allclose(got, want.reshape(-1), rtol=2e-4, atol=2e-4)


def test_modulate_scramble_fold_equivalence():
    """modulate(bits, scramble=c) must equal modulate(bits XOR c): the XOR
    folds into the Gray sign planes exactly ((1-2(b^c)) = (1-2b)(1-2c))."""
    rng = np.random.default_rng(4)
    for mod, qm in MODULATION_ORDERS.items():
        bits = rng.integers(0, 2, 12 * qm).astype(np.int8)
        c = rng.integers(0, 2, 12 * qm).astype(np.int8)
        a = np.asarray(modulate(jnp.asarray(bits ^ c), mod))
        b = np.asarray(modulate(jnp.asarray(bits), mod, scramble=jnp.asarray(c)))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_closed_form_gray_llr_equals_joint_maxlog():
    """The TPU-branch closed-form Gray fold (_gray_axis_llr_closed) must
    produce EXACTLY the joint-constellation max-log LLRs for every square
    QAM (r5: it replaces the [., 2^(Qm/2)] masked-min distance form on TPU;
    this pins the algebra: L_sign = (t+1)^2-(t-p)^2, Gray fold t <- D-|t|)."""
    import numpy as np

    from isac_tpu.ops.modulation import (
        MODULATION_ORDERS,
        _QAM_SCALE,
        _gray_axis_llr_closed,
        constellation,
    )

    rng = np.random.default_rng(5)
    for mod in ("QPSK", "16QAM", "64QAM", "256QAM"):
        qm = MODULATION_ORDERS[mod]
        a = _QAM_SCALE[qm]
        m = qm // 2
        # cover interior, boundaries, and far outside the constellation
        y = np.concatenate([
            rng.uniform(-1.2 * (2 ** m) * a, 1.2 * (2 ** m) * a, 4000),
            np.arange(-(2 ** m) - 2, (2 ** m) + 2 + 1) * a,  # exact levels
        ]).astype(np.float32)
        sym = (y + 1j * rng.permutation(y)).astype(np.complex64)
        pts = constellation(mod).astype(np.complex128)
        labels = (np.arange(1 << qm)[:, None] >> (qm - 1 - np.arange(qm))) & 1
        d2 = np.abs(sym[:, None].astype(np.complex128) - pts[None, :]) ** 2
        ref = np.stack([
            np.min(np.where(labels[:, b] == 1, d2, np.inf), axis=1)
            - np.min(np.where(labels[:, b] == 0, d2, np.inf), axis=1)
            for b in range(qm)
        ], axis=-1)
        li = np.asarray(_gray_axis_llr_closed(jnp.asarray(sym.real / a), m)) * a * a
        lq = np.asarray(_gray_axis_llr_closed(jnp.asarray(sym.imag / a), m)) * a * a
        got = np.stack([li, lq], axis=-1).reshape(len(sym), qm)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=mod)
