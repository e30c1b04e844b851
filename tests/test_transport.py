import jax.numpy as jnp
import numpy as np
import pytest

from isac_tpu.ops import transport
from isac_tpu.ops.modulation import demodulate_llr, hard_decision, modulate


def test_nr_tbs_known_values():
    # small allocation: 1 PRB, QPSK, R=0.3: Ninfo = 156*0.3*2 = 93.6 -> table
    tbs = transport.nr_tbs("QPSK", 1, 1, 156, 120 / 1024)
    assert tbs in transport.TBS_TABLE
    # monotonicity in PRBs and rate
    t1 = transport.nr_tbs("64QAM", 2, 50, 144, 0.5)
    t2 = transport.nr_tbs("64QAM", 2, 100, 144, 0.5)
    t3 = transport.nr_tbs("64QAM", 2, 100, 144, 0.8)
    assert t1 < t2 < t3
    # large TBS path: byte-aligned minus 24
    big = transport.nr_tbs("256QAM", 4, 273, 156, 0.92)
    assert (big + 24) % 8 == 0 and big > 100000
    # zero allocation
    assert transport.nr_tbs("QPSK", 1, 0, 156, 0.5) == 0


def test_sch_config_segmentation():
    # A small -> 1 CB, CRC16
    cfg = transport.sch_config(1000, 0.5, 2, 1, 3000)
    assert cfg.c == 1 and cfg.tb_crc == "16" and not cfg.cb_crc
    assert sum(cfg.e_per_cb) == 3000
    # A large -> multiple CBs with CRC24B
    cfg2 = transport.sch_config(20000, 0.7, 6, 2, 30000)
    assert cfg2.c > 1 and cfg2.cb_crc and cfg2.tb_crc == "24A"
    assert cfg2.bg == 1
    assert sum(cfg2.e_per_cb) == 30000
    assert all(e % (6 * 2) == 0 for e in cfg2.e_per_cb)
    # K' consistency: C*K' covers B + CB CRCs (within C-1 pad bits)
    b_prime = 20000 + 24 + 24 * cfg2.c
    assert 0 <= cfg2.c * cfg2.k_prime - b_prime < cfg2.c


@pytest.mark.parametrize("a,rate,qm_mod", [(352, 0.3, "QPSK"), (4000, 0.5, "16QAM")])
def test_sch_noiseless_roundtrip(a, rate, qm_mod):
    from isac_tpu.ops.modulation import MODULATION_ORDERS

    qm = MODULATION_ORDERS[qm_mod]
    g = int(np.ceil(a / rate / qm)) * qm
    cfg = transport.sch_config(a, rate, qm, 1, g)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, a).astype(np.int8))
    coded = transport.sch_encode(tb, cfg, rv=0)
    assert coded.shape == (g,)
    llr = (1.0 - 2.0 * coded.astype(jnp.float32)) * 8.0
    out, ok, bufs = transport.sch_decode(llr, cfg, rv=0, n_iter=12)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tb))


def test_sch_through_modulation_with_noise():
    a, rate, mod = 2000, 0.33, "QPSK"
    g = 6144
    cfg = transport.sch_config(a, rate, 2, 1, g)
    rng = np.random.default_rng(1)
    tb = jnp.asarray(rng.integers(0, 2, a).astype(np.int8))
    coded = transport.sch_encode(tb, cfg, rv=0)
    syms = modulate(coded, mod)
    sigma2 = 0.35
    noise = (rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape)) * np.sqrt(
        sigma2 / 2
    )
    llr = demodulate_llr(syms + noise.astype(np.complex64), sigma2, mod)
    out, ok, _ = transport.sch_decode(llr, cfg, rv=0, n_iter=12)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tb))


def test_sch_harq_retransmission_combining():
    """First TX at high noise fails; combining RV 3 retransmission succeeds."""
    a, mod = 3000, "QPSK"
    g = 4200  # rate ~0.72 — weak single shot
    cfg = transport.sch_config(a, 0.72, 2, 1, g)
    rng = np.random.default_rng(2)
    tb = jnp.asarray(rng.integers(0, 2, a).astype(np.int8))
    sigma2 = 0.8

    def rx(rv):
        coded = transport.sch_encode(tb, cfg, rv=rv)
        syms = modulate(coded, mod)
        noise = (rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape)
                 ) * np.sqrt(sigma2 / 2)
        return demodulate_llr(syms + noise.astype(np.complex64), sigma2, mod)

    out0, ok0, bufs = transport.sch_decode(rx(0), cfg, rv=0, n_iter=8)
    out1, ok1, bufs = transport.sch_decode(rx(3), cfg, rv=3, soft_buffers=bufs, n_iter=8)
    if not bool(ok1):
        out1, ok1, bufs = transport.sch_decode(rx(2), cfg, rv=2, soft_buffers=bufs, n_iter=8)
    assert bool(ok1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(tb))


def test_crc_catches_bad_decode():
    a = 1000
    cfg = transport.sch_config(a, 0.9, 2, 1, 1200)  # rate ~0.83+CRC: undecodable alone
    rng = np.random.default_rng(3)
    tb = jnp.asarray(rng.integers(0, 2, a).astype(np.int8))
    coded = transport.sch_encode(tb, cfg, rv=0)
    # garbage LLRs
    llr = jnp.asarray(rng.standard_normal(coded.shape).astype(np.float32)) * 4
    out, ok, _ = transport.sch_decode(llr, cfg, rv=0, n_iter=6)
    assert not bool(ok)
