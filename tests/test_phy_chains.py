"""End-to-end PDSCH/PUSCH link tests over CDL fading (BASELINE config #1 slice)."""

import jax.numpy as jnp
import numpy as np
import pytest

from isac_tpu.ops.cdl import apply_channel_freq, build_cdl_link, cdl_frequency_response, subcarrier_freqs
from isac_tpu.ops.csi import cqi_select, ri_select, sinr_to_cqi, ul_tpmi_select, SINR_TO_CQI_DL
from isac_tpu.ops.precoding import csirs_panel_dims, prg_indices, pusch_codebook, type1_codebook
from isac_tpu.phy.chains import SCHGrant, grant_tbs, sch_receive, sch_transmit


def ula_positions(n, spacing=0.5, fc=3.5e9):
    lam = 299792458.0 / fc
    return np.stack([np.zeros(n), np.arange(n) * spacing * lam, np.zeros(n)], -1)


def test_grant_tbs_reasonable():
    g = SCHGrant(n_prb=51, n_sc_grid=612, mcs=10, n_layers=1)
    tbs = grant_tbs(g)
    # 51 PRB, ~150 data REs/PRB, 16QAM R=0.33: ~ 51*150*4*0.33 ~ 10k bits
    assert 6000 < tbs < 14000


def test_pdsch_awgn_roundtrip_identity_channel():
    grant = SCHGrant(n_prb=24, n_sc_grid=288, mcs=5, n_layers=1, rnti=7)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, grant_tbs(grant)).astype(np.int8))
    port_grid, info = sch_transmit(tb, grant)
    assert port_grid.shape == (1, 14, 288)
    sigma2 = 0.02
    noise = (rng.standard_normal((2, 14, 288)) + 1j * rng.standard_normal((2, 14, 288))
             ).astype(np.complex64) * np.sqrt(sigma2 / 2)
    rx = jnp.concatenate([port_grid, 0.8 * port_grid]) + jnp.asarray(noise)
    out = sch_receive(rx, grant)
    assert bool(out["crc_ok"]) and out["tbs"] == tb.shape[0]
    np.testing.assert_array_equal(np.asarray(out["tb"]), np.asarray(tb))
    assert float(out["sinr_db"]) > 10


@pytest.mark.parametrize(
    "mcs,n_layers,profile,sigma2",
    [(4, 1, "CDL-D", 2e-3),  # LOS channel, rank 1
     (10, 2, "CDL-A", 1e-4)],  # rich scattering for spatial multiplexing
)
def test_pdsch_over_cdl_fading(mcs, n_layers, profile, sigma2):
    n_prb, n_sc = 24, 288
    grant = SCHGrant(n_prb=n_prb, n_sc_grid=n_sc, mcs=mcs, n_layers=n_layers, rnti=3, slot=2)
    rng = np.random.default_rng(1)
    tb = jnp.asarray(rng.integers(0, 2, grant_tbs(grant)).astype(np.int8))
    n_tx, n_rx = 4, 4
    # identity-ish precoding: first n_layers columns of a DFT
    w_full = np.fft.fft(np.eye(n_tx))[:, :n_layers] / np.sqrt(n_tx * n_layers)
    n_prg = n_prb // 2
    w = jnp.asarray(np.tile(w_full[None], (n_prg, 1, 1)).astype(np.complex64))
    port_grid, _ = sch_transmit(tb, grant, w=w)
    assert port_grid.shape == (n_tx, 14, n_sc)
    link = build_cdl_link(profile, 100.0, 3.5e9, ula_positions(n_tx), ula_positions(n_rx),
                          ue_velocity=1.0, seed=2)
    h = cdl_frequency_response(link, np.arange(14) * 3.6e-5, subcarrier_freqs(n_sc, 30e3))
    rx = apply_channel_freq(port_grid, h)
    noise = (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)
             ).astype(np.complex64) * np.sqrt(sigma2 / 2)
    out = sch_receive(rx + jnp.asarray(noise), grant)
    assert bool(out["crc_ok"]), f"BLER fail at sinr {float(out['sinr_db']):.1f} dB"
    np.testing.assert_array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_pusch_with_tpmi_precoding():
    grant = SCHGrant(n_prb=24, n_sc_grid=288, mcs=8, n_layers=1, rnti=9,
                     direction="UL", slot=4)
    rng = np.random.default_rng(3)
    tb = jnp.asarray(rng.integers(0, 2, grant_tbs(grant)).astype(np.int8))
    w = jnp.asarray(pusch_codebook(2, 1)[2])  # [1;1]/sqrt(2)
    port_grid, _ = sch_transmit(tb, grant, w=w)
    assert port_grid.shape == (2, 14, 288)
    link = build_cdl_link("CDL-D", 30.0, 3.5e9, ula_positions(2), ula_positions(4), seed=4)
    h = cdl_frequency_response(link, np.arange(14) * 3.6e-5, subcarrier_freqs(288, 30e3))
    rx = apply_channel_freq(port_grid, h)
    sigma2 = 1e-3
    noise = (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)
             ).astype(np.complex64) * np.sqrt(sigma2 / 2)
    out = sch_receive(rx + jnp.asarray(noise), grant)
    assert bool(out["crc_ok"])
    np.testing.assert_array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_harq_rv_retransmission_through_chain():
    """Failed first PDSCH at low SNR, success after RV-3 combining."""
    grant0 = SCHGrant(n_prb=16, n_sc_grid=192, mcs=20, n_layers=1)  # aggressive MCS
    rng = np.random.default_rng(5)
    tb = jnp.asarray(rng.integers(0, 2, grant_tbs(grant0)).astype(np.int8))
    sigma2 = 0.12

    def tx_rx(rv, bufs):
        g = SCHGrant(**{**grant0.__dict__, "rv": rv})
        pg, _ = sch_transmit(tb, g)
        noise = (rng.standard_normal((2, 14, 192)) + 1j * rng.standard_normal((2, 14, 192))
                 ).astype(np.complex64) * np.sqrt(sigma2 / 2)
        rx = jnp.concatenate([pg, pg * 0.9]) + jnp.asarray(noise)
        return sch_receive(rx, g, soft_buffers=bufs)

    out0 = tx_rx(0, None)
    out1 = tx_rx(3, out0["soft_buffers"])
    out2 = tx_rx(2, out1["soft_buffers"]) if not bool(out1["crc_ok"]) else out1
    assert bool(out2["crc_ok"])
    np.testing.assert_array_equal(np.asarray(out2["tb"]), np.asarray(tb))


def test_csi_selection_pipeline():
    """RI/PMI/CQI selection on a synthetic 4-port channel."""
    rng = np.random.default_rng(6)
    n_re, n_rx, n_ports = 64, 2, 4
    h = (rng.standard_normal((n_re, n_rx, n_ports)) + 1j * rng.standard_normal(
        (n_re, n_rx, n_ports))).astype(np.complex64) / np.sqrt(2)
    nvar = 0.01
    rank = int(ri_select(jnp.asarray(h), nvar, max_rank=2))
    assert rank in (1, 2)
    n1, n2 = csirs_panel_dims(n_ports)
    sb = np.repeat(np.arange(8), 8)
    rep = cqi_select(jnp.asarray(h), nvar, rank, n1, n2, subband_of_re=sb)
    cqi_sb = np.asarray(rep["cqi_sb"])
    assert cqi_sb.shape == (8,)
    assert np.all(cqi_sb >= 1) and np.all(cqi_sb <= 15)
    assert 1 <= int(rep["cqi_wb"]) <= 15
    # high SNR -> high CQI
    rep_hi = cqi_select(jnp.asarray(h), 1e-5, 1, n1, n2, subband_of_re=sb)
    assert int(rep_hi["cqi_wb"]) >= 13


def test_ul_tpmi_select_picks_matched_precoder():
    """Channel aligned with one codebook entry -> that TPMI wins."""
    cb = pusch_codebook(2, 1)  # [6, 2, 1]
    target = 3  # [1;-1]/sqrt(2)
    rng = np.random.default_rng(7)
    n_re = 32
    # H = u * w_target^H -> transmitting with w_target maximizes power
    u = (rng.standard_normal((n_re, 4, 1)) + 1j * rng.standard_normal((n_re, 4, 1)))
    h = (u @ cb[target].conj().T[None]).astype(np.complex64)
    tpmi, sinr_db = ul_tpmi_select(jnp.asarray(h), 0.01, 1)
    assert int(tpmi) == target
    assert float(sinr_db[0]) > 10


def test_sinr_to_cqi_table_edges():
    got = np.asarray(sinr_to_cqi(jnp.asarray([-10.0, -3.46, 1.54, 35.43, 40.0])))
    assert got.tolist() == [0, 1, 2, 15, 15]
    assert SINR_TO_CQI_DL.shape == (15,)


# ---------------------------------------------------------- waveform-domain rx


def _wave_setup(n_prb=8, mcs=8):
    from isac_tpu.config.carrier import CarrierConfig
    from isac_tpu.phy.chains import grant_tbs, sch_transmit

    carrier = CarrierConfig(fc_hz=3.5e9, bandwidth_hz=10e6, scs_khz=30,
                            n_cell_id=1, n_rb_override=n_prb,
                            nfft_override=256)
    info = carrier.ofdm
    g = SCHGrant(n_prb=n_prb, n_sc_grid=n_prb * 12, mcs=mcs, n_layers=1)
    rng = np.random.default_rng(5)
    tb = jnp.asarray(rng.integers(0, 2, grant_tbs(g)).astype(np.int8))
    pg, _ = sch_transmit(tb, g)  # 1 layer, identity precoder -> 1 port
    return carrier, info, g, tb, pg


def test_waveform_rx_timing_recovery_and_decode():
    """VERDICT r3 #8 (gNBPhy.m:916-935): an unknown integer sample delay is
    recovered by the correlation timing estimate and the aligned waveform
    decodes clean — the full waveform path phyRxBuffer->nrTimingEstimate->
    OFDM demod->receiver, exercised end-to-end."""
    from isac_tpu.ops.ofdm import ofdm_modulate
    from isac_tpu.phy.waveform_rx import (
        overlap_add, reference_waveform, waveform_receive)

    carrier, info, g, tb, pg = _wave_setup()
    wave = ofdm_modulate(pg, info)  # [1, N]
    delay = 37
    n_total = wave.shape[-1] + 128
    rng = np.random.default_rng(9)
    noise = jnp.asarray(
        ((rng.standard_normal((1, n_total)) + 1j * rng.standard_normal((1, n_total)))
         * 1e-3).astype(np.complex64))
    rx = overlap_add([wave], [delay], n_total) + noise
    ref = reference_waveform(g, info)
    out = waveform_receive(rx, g, info, ref, max_offset=128)
    assert int(out["timing_offset"]) == delay
    assert bool(out["crc_ok"])
    assert np.array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_waveform_rx_skip_weak_timing():
    """skipWeakTimingOffset.m: a correlation peak below 5.5x the mean is
    rejected -> offset 0 (noise-only buffer)."""
    from isac_tpu.phy.waveform_rx import reference_waveform, waveform_receive

    carrier, info, g, tb, pg = _wave_setup()
    rng = np.random.default_rng(3)
    n_total = info.slot_samples(0) + 128
    rx = jnp.asarray(
        ((rng.standard_normal((1, n_total)) + 1j * rng.standard_normal((1, n_total)))
         * 0.1).astype(np.complex64))
    ref = reference_waveform(g, info)
    out = waveform_receive(rx, g, info, ref, max_offset=128)
    assert int(out["timing_offset"]) == 0


def test_waveform_fd_equivalence_no_offset():
    """The engine's frequency-domain per-symbol model equals the waveform
    round trip when no timing offset/overlap exists (the documented FD
    deviation promoted to a tested invariant — VERDICT r3 #8 option B)."""
    import jax

    from isac_tpu.ops.ofdm import ofdm_demodulate, ofdm_modulate
    from isac_tpu.phy.chains import sch_receive

    carrier, info, g, tb, pg = _wave_setup()

    @jax.jit
    def roundtrip(p):
        return ofdm_demodulate(ofdm_modulate(p, info), info, g.n_sc_grid, 1)

    grid_td = roundtrip(pg)
    np.testing.assert_allclose(np.asarray(grid_td), np.asarray(pg),
                               rtol=2e-3, atol=2e-3)
    out_fd = sch_receive(jnp.asarray(pg), g, n_ldpc_iter=4)
    out_td = sch_receive(grid_td, g, n_ldpc_iter=4)
    assert bool(out_fd["crc_ok"]) and bool(out_td["crc_ok"])


def test_overlap_add_and_resample():
    """phyRxBuffer.m:137-228 primitives: overlapping packets sum sample-wise
    at their offsets; resampling preserves a bandlimited tone."""
    from isac_tpu.phy.waveform_rx import overlap_add, resample_linear

    a = jnp.ones((1, 16), jnp.complex64)
    b = jnp.ones((1, 8), jnp.complex64) * 2
    buf = np.asarray(overlap_add([a, b], [0, 8], 32))
    assert np.allclose(buf[0, :8], 1) and np.allclose(buf[0, 8:16], 3)
    assert np.allclose(buf[0, 16:24], 0)
    # clipping (VERDICT r4 Weak #5): a packet whose tail passes the buffer
    # end is cut, never aliased to the head (phyRxBuffer.m:169-228)
    c = jnp.ones((1, 16), jnp.complex64) * 5
    buf2 = np.asarray(overlap_add([c], [24], 32))
    assert np.allclose(buf2[0, :24], 0), buf2[0, :8]
    assert np.allclose(buf2[0, 24:], 5)
    # negative offset clips the packet head
    buf3 = np.asarray(overlap_add([c], [-8], 32))
    assert np.allclose(buf3[0, :8], 5) and np.allclose(buf3[0, 8:], 0)
    t = np.arange(64) / 64.0
    tone = np.exp(2j * np.pi * 3 * t).astype(np.complex64)
    up = np.asarray(resample_linear(jnp.asarray(tone), 1.0, 2.0))
    assert up.shape[-1] == 128
    t2 = np.arange(128) / 128.0
    np.testing.assert_allclose(up[4:-4], np.exp(2j * np.pi * 3 * t2)[4:-4],
                               atol=0.05)


def test_type1_multipanel_codebook_structure():
    """Multi-panel codebook (TS 38.214 §5.2.2.2.2 / dlPMISelect.m:1351-1773):
    valid-config gating, port counts, unit Frobenius norm, orthonormal columns
    for orthogonal-beam pairs, and the per-panel block phase structure."""
    from isac_tpu.ops.precoding import (
        MULTI_PANEL_CONFIGS,
        type1_multipanel_codebook,
    )

    with pytest.raises(ValueError):
        type1_multipanel_codebook(3, 2, 1, 1)  # not a T5.2.2.2.2-1 config
    with pytest.raises(ValueError):
        type1_multipanel_codebook(4, 2, 1, 1, codebook_mode=2)  # mode2 is Ng=2 only

    for ng, n1, n2 in sorted(MULTI_PANEL_CONFIGS)[:4]:
        for rank in (1, 2, 4):
            cb = type1_multipanel_codebook(ng, n1, n2, rank)
            p = 2 * ng * n1 * n2
            assert cb.shape[1:] == (p, rank)
            fro = np.linalg.norm(cb, axis=(1, 2))
            np.testing.assert_allclose(fro, 1.0, atol=1e-5)

    # (2,2,1) rank-1: block structure [v; phi_n v; phi_p v; phi_n phi_p v]
    cb = type1_multipanel_codebook(2, 2, 1, 1)
    assert cb.shape == (128, 8, 1)
    w = cb[:, :, 0] * np.sqrt(8)
    blocks = w.reshape(-1, 4, 2)  # [cw, block, element]
    # panel-2 pol-1 block = phi_p * panel-1 pol-1 block, |phi_p| = 1
    ratio = blocks[:, 2, :] / blocks[:, 0, :]
    np.testing.assert_allclose(np.abs(ratio), 1.0, atol=1e-5)
    np.testing.assert_allclose(ratio[:, 0], ratio[:, 1], atol=1e-5)
    # phi_n phi_p consistency: block3/block0 == (block1/block0)*(block2/block0)
    r1 = blocks[:, 1, 0] / blocks[:, 0, 0]
    r2 = blocks[:, 2, 0] / blocks[:, 0, 0]
    r3 = blocks[:, 3, 0] / blocks[:, 0, 0]
    np.testing.assert_allclose(r3, r1 * r2, atol=1e-5)

    # rank-2 columns from orthogonal beam pairs are orthonormal
    cb2 = type1_multipanel_codebook(2, 4, 1, 2)
    gram = np.einsum("cpk,cpl->ckl", np.conj(cb2), cb2)
    # beam-offset i13=0 pairs the SAME beam (columns differ only in pol sign);
    # those are orthogonal too because the pol co-phase flips sign
    np.testing.assert_allclose(gram[:, 0, 1], 0.0, atol=1e-5)

    # codebookMode 2 (Ng=2): independent panel-2 per-pol phases -> larger table
    cbm2 = type1_multipanel_codebook(2, 2, 1, 1, codebook_mode=2)
    assert cbm2.shape[0] == 2048  # 8 beams x 4 n0 x 2 n1 x 2 n2 x 4 p1 x 4 p2


def test_multipanel_pmi_select_recovers_matched_precoder():
    """A channel built FROM a multi-panel codeword must select (a codeword
    equivalent to) it, and mode-1 ng=2 must beat the single-panel codebook
    folded over the same 8 ports on a panel-phase-offset channel."""
    from isac_tpu.ops.csi import dl_pmi_select
    from isac_tpu.ops.precoding import type1_multipanel_codebook

    ng, n1, n2, rank = 2, 2, 1, 1
    cb = type1_multipanel_codebook(ng, n1, n2, rank)  # [128, 8, 1]
    target = 37
    rng = np.random.default_rng(11)
    n_re, n_rx = 24, 2
    # rx mixes the target codeword direction: h[re] = g[re] @ w^H
    g = (rng.standard_normal((n_re, n_rx, 1)) + 1j * rng.standard_normal(
        (n_re, n_rx, 1))).astype(np.complex64)
    h = jnp.asarray(g @ np.conj(cb[target]).transpose(1, 0)[None])
    pmi_wb, _, sinr = dl_pmi_select(h, 1e-3, rank, n1, n2, ng=ng)
    got = np.asarray(cb[int(pmi_wb)][:, 0])
    want = np.asarray(cb[target][:, 0])
    # equivalent up to a global phase (several indices give the same w)
    corr = np.abs(np.vdot(want, got)) / (np.linalg.norm(want) * np.linalg.norm(got))
    assert corr > 0.999


def test_panel_config_for_antenna_multipanel():
    from isac_tpu.config.params import UPA
    from isac_tpu.ops.precoding import panel_config_for_antenna

    # 2 horizontal panels of 2x1 cross-pol -> (2, 2, 1), 8 ports
    upa = UPA(n_v=1, n_h=2, n_pv=1, n_ph=2, polarizations=2)
    assert panel_config_for_antenna(upa) == (2, 2, 1)
    # single panel falls back to the single-panel dims
    upa1 = UPA(n_v=2, n_h=2, n_pv=1, n_ph=1, polarizations=2)
    assert panel_config_for_antenna(upa1) == (1, 2, 2)


def test_type1_singlepanel_mode2_codebook():
    """Single-panel codebookMode 2 (TS 38.214 T5.2.2.2.1-5/6,
    dlPMISelect.m:912-945/:1039-1082): index-space sizes, unit norm, and
    family consistency (every mode-2 rank-1 codeword is a beam/co-phase
    combination from the mode-1 family)."""
    from isac_tpu.ops.csi import dl_pmi_select
    from isac_tpu.ops.precoding import type1_codebook

    # rank 1, (N1,N2)=(4,1): 16 i2 x (N1*O1/2) i11 = 128 entries
    m2 = type1_codebook(4, 1, 1, codebook_mode=2)
    assert m2.shape == (128, 8, 1)
    np.testing.assert_allclose(np.linalg.norm(m2, axis=(1, 2)), 1.0, atol=1e-5)
    m1 = type1_codebook(4, 1, 1, codebook_mode=1)
    a = m2.reshape(m2.shape[0], -1)
    b = m1.reshape(m1.shape[0], -1)
    dist = np.abs(a[:, None, :] - b[None, :, :]).max(-1).min(-1)
    assert dist.max() < 1e-5  # subset of the mode-1 family
    # rank 2, (2,1): 8 i2 x 2 i13 x (N1*O1/2) i11 = 64 entries, orthogonal cols
    m2r2 = type1_codebook(2, 1, 2, codebook_mode=2)
    assert m2r2.shape == (64, 4, 2)
    gram = np.einsum("cpk,cpl->ckl", np.conj(m2r2), m2r2)
    np.testing.assert_allclose(gram[:, 0, 1], 0.0, atol=1e-5)
    # ranks 3+ are mode-independent (spec defines mode 2 for ranks 1-2)
    assert np.allclose(
        type1_codebook(4, 1, 3, codebook_mode=2), type1_codebook(4, 1, 3)
    )
    # the search accepts the mode-2 table
    rng = np.random.default_rng(3)
    h = (rng.standard_normal((16, 2, 8)) + 1j * rng.standard_normal(
        (16, 2, 8))).astype(np.complex64)
    pmi_wb, _, _ = dl_pmi_select(jnp.asarray(h), 0.01, 1, 4, 1, codebook_mode=2)
    assert 0 <= int(pmi_wb) < 128
