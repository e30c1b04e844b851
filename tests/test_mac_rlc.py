import numpy as np
import pytest

from isac_tpu.app.traffic import FTPTraffic, OnOffTraffic, VideoConferenceTraffic, VoIPTraffic
from isac_tpu.mac.harq import HarqState
from isac_tpu.mac.lcp import LCPState, LogicalChannel
from isac_tpu.mac.pdu import build_mac_pdu, bsr_index, long_bsr, parse_mac_pdu, short_bsr, subpdu
from isac_tpu.mac.scheduler import Scheduler
from isac_tpu.mac.tables import cqi_to_mcs, mcs_info, rbg_size
from isac_tpu.rlc.am import AMEntity
from isac_tpu.rlc.um import UMEntity


def test_mcs_tables():
    assert mcs_info(0)[0] == "QPSK" and abs(mcs_info(0)[1] - 120 / 1024) < 1e-9
    assert mcs_info(28)[0] == "64QAM" and abs(mcs_info(28)[1] - 948 / 1024) < 1e-9
    assert mcs_info(27, "qam256")[0] == "256QAM"
    assert cqi_to_mcs(15) == 28 and cqi_to_mcs(1) in (0, 1) and cqi_to_mcs(0) == 0
    assert rbg_size(273) == 16 and rbg_size(51) == 4 and rbg_size(51, 2) == 8


def test_harq_lifecycle():
    h = HarqState(2, 4)
    pid = h.free_process(0)
    assert pid == 0
    h.new_tx(0, pid, 1000, 10, 8, b"payload")
    assert h.pending[0, pid] and h.ndi[0, pid] == 1
    assert h.feedback(0, pid, ack=False) == "retx"
    assert h.need_retx[0, pid]
    rv = h.retx(0, pid)
    assert rv == 3  # RV sequence [0 3 2 1]
    assert h.feedback(0, pid, ack=True) == "ack"
    assert not h.pending[0, pid] and (0, pid) not in h.payload
    # drop after max retx
    h.new_tx(0, 1, 500, 5, 4, b"x")
    for _ in range(3):
        assert h.feedback(0, 1, False) in ("retx", "drop")
        if h.need_retx[0, 1]:
            h.retx(0, 1)
    assert h.feedback(0, 1, False) == "drop"


def test_lcp_two_rounds():
    lcp = LCPState()
    lcp.add(LogicalChannel(lcid=4, priority=1, pbr_bytes_per_ms=100, bsd_ms=10))
    lcp.add(LogicalChannel(lcid=5, priority=2, pbr_bytes_per_ms=100, bsd_ms=10))
    for _ in range(10):
        lcp.tick_1ms()  # fill buckets to 1000 each
    served = lcp.allocate(1500, {4: 2000, 5: 2000})
    # round 1: both served up to Bj (1000 + 500 leftover to round 2)
    assert served[4] + served[5] == 1500
    assert served[4] >= 1000  # priority 1 served first
    # round 2 splits leftover among hungry channels
    served2 = lcp.allocate(10000, {4: 3000, 5: 3000})
    assert served2[4] + served2[5] == 6000


def test_mac_pdu_roundtrip():
    sdus = [(4, b"hello world"), (5, bytes(300))]
    bsr = short_bsr(1, 5000)
    pdu = build_mac_pdu(sdus, 400, control=[bsr])
    assert len(pdu) == 400
    parsed = parse_mac_pdu(pdu)
    assert parsed["sdus"][0] == (4, b"hello world")
    assert parsed["sdus"][1][0] == 5 and len(parsed["sdus"][1][1]) == 300
    assert parsed["bsr"][0][0] == 1 and parsed["bsr"][0][1] >= 5000
    assert parsed["padding"] > 0
    # long BSR
    pdu2 = build_mac_pdu([], 20, control=[long_bsr({1: 100, 3: 99999})])
    p2 = parse_mac_pdu(pdu2)
    assert len(p2["bsr"]) == 2
    # bsr index monotone
    assert bsr_index(0) == 0 and bsr_index(10**7) == 31


def test_rlc_um_segmentation_roundtrip():
    tx, rx = UMEntity(), UMEntity()
    msgs = [bytes([i]) * (50 + 37 * i) for i in range(8)]
    for m in msgs:
        tx.enqueue_sdu(m)
    assert tx.buffer_status() > sum(len(m) for m in msgs)
    got = []
    # drain through small grants (forces segmentation)
    for _ in range(100):
        for pdu in tx.send_pdus(97):
            got.extend(rx.receive_pdu(pdu))
        if len(got) == len(msgs):
            break
    assert got == msgs
    assert tx.buffer_status() == 0


def test_rlc_um_reassembly_timer_drops_partial():
    tx, rx = UMEntity(t_reassembly_ms=5), UMEntity(t_reassembly_ms=5)
    tx.enqueue_sdu(bytes(500))
    pdus = tx.send_pdus(200)  # first segment only
    rx2 = UMEntity(t_reassembly_ms=5)
    rx2.receive_pdu(pdus[0])
    for _ in range(6):
        rx2.tick_1ms()
    assert rx2.stats.dropped == 1 and not rx2.rx_store


def test_rlc_am_retransmission_via_status():
    tx, rx = AMEntity(poll_pdu=4), AMEntity()
    msgs = [bytes([i]) * 100 for i in range(6)]
    for m in msgs:
        tx.enqueue_sdu(m)
    pdus = tx.send_pdus(10000)
    assert len(pdus) == 6
    delivered = []
    # drop PDU 2, deliver rest
    for i, p in enumerate(pdus):
        if i != 2:
            delivered.extend(rx.receive_pdu(p))
    assert delivered == msgs[:2]  # in-order delivery stalls at the gap
    status = rx.status_pdu()
    assert status is not None
    tx.receive_pdu(status)  # NACK for SN 2
    retx = tx.send_pdus(10000)
    assert len(retx) >= 1
    for p in retx:
        delivered.extend(rx.receive_pdu(p))
    assert delivered == msgs
    assert tx.stats.retx_pdus >= 1


def test_scheduler_strategies_allocate_all_rbgs():
    for strat in ("RR", "PF", "BestCQI"):
        s = Scheduler(n_ues=4, n_rb=51, strategy=strat)
        for ue in range(4):
            s.update_buffer(ue, "DL", 50000)
        grants = s.schedule_slot(0, "DL")
        assert grants, strat
        prbs = [p for g in grants for p in g.prb_set]
        assert len(prbs) == len(set(prbs))  # no double allocation
        assert len(prbs) == 51  # fully used
        for g in grants:
            assert g.tbs > 0 and 0 <= g.mcs <= 28


def test_scheduler_rr_fairness():
    s = Scheduler(n_ues=3, n_rb=24, strategy="RR")
    for ue in range(3):
        s.update_buffer(ue, "DL", 10**6)
    served = set()
    for slot in range(3):
        for g in s.schedule_slot(slot, "DL"):
            served.add(g.ue)
    assert served == {0, 1, 2}


def test_scheduler_bestcqi_prefers_good_channel():
    s = Scheduler(n_ues=2, n_rb=24, strategy="BestCQI")
    s.update_dl_csi(0, np.full(24, 15), 1, np.zeros(6))
    s.update_dl_csi(1, np.full(24, 3), 1, np.zeros(6))
    for ue in range(2):
        s.update_buffer(ue, "DL", 10**6)
    grants = s.schedule_slot(0, "DL")
    assert all(g.ue == 0 for g in grants)
    # and the good UE gets a high MCS
    assert grants[0].mcs >= 25


def test_scheduler_retransmission_first():
    s = Scheduler(n_ues=2, n_rb=24, strategy="PF")
    for ue in range(2):
        s.update_buffer(ue, "DL", 10**6)
    g0 = s.schedule_slot(0, "DL")
    victim = g0[0]
    assert s.harq_feedback(victim.ue, "DL", victim.harq_id, ack=False) == "retx"
    g1 = s.schedule_slot(1, "DL")
    retx = [g for g in g1 if g.is_retx]
    assert len(retx) == 1
    assert retx[0].ue == victim.ue and retx[0].rv == 3
    assert retx[0].mcs == victim.mcs and len(retx[0].prb_set) == len(victim.prb_set)


def test_scheduler_pf_ewma_moves_allocation():
    s = Scheduler(n_ues=2, n_rb=48, strategy="PF")
    s.update_dl_csi(0, np.full(48, 12), 1, np.zeros(12))
    s.update_dl_csi(1, np.full(48, 12), 1, np.zeros(12))
    for ue in range(2):
        s.update_buffer(ue, "DL", 10**7)
    counts = {0: 0, 1: 0}
    for slot in range(20):
        for g in s.schedule_slot(slot, "DL"):
            counts[g.ue] += len(g.prb_set)
            # ack everything to keep HARQ free
            s.harq_feedback(g.ue, "DL", g.harq_id, True)
    # equal channels + equal buffers -> roughly fair split
    ratio = counts[0] / max(counts[1], 1)
    assert 0.5 < ratio < 2.0, counts


def test_traffic_models_produce_packets():
    on = OnOffTraffic(1000, packet_size=125, seed=1)  # 1 Mbps -> 125 B/ms
    total = sum(len(p) for _ in range(100) for p in on.generate(1.0))
    assert 8000 < total < 16000  # ~12.5 kB over 100 ms
    voip = VoIPTraffic(seed=2)
    pkts = [p for _ in range(200) for p in voip.generate(1.0)]
    assert len(pkts) > 0 and all(len(p) == 40 for p in pkts)
    ftp = FTPTraffic(seed=3, reading_time_s=0.01)
    pkts = [p for _ in range(200) for p in ftp.generate(1.0)]
    assert len(pkts) > 0
    vc = VideoConferenceTraffic(seed=4)
    pkts = [p for _ in range(100) for p in vc.generate(1.0)]
    assert len(pkts) > 0


def test_rlc_am_tx_segmentation_roundtrip():
    """A big SDU segments across many small grants and reassembles in order
    (amEntity.m retransmitSegment:721 segmentation semantics)."""
    tx, rx = AMEntity(), AMEntity()
    sdu = bytes(range(256)) * 8  # 2048 B
    tx.enqueue_sdu(sdu)
    delivered = []
    for _ in range(40):
        for p in tx.send_pdus(120):
            delivered.extend(rx.receive_pdu(p))
    assert delivered == [sdu]
    # ack the transmission so the buffer drains
    rx.status_trigger = True
    tx.receive_pdu(rx.status_pdu())
    assert not tx.tx_buffer


def test_rlc_am_so_nack_retransmits_only_missing_range():
    """Losing one MIDDLE segment produces an SO-range NACK and the tx resends
    only that byte range (amEntity.m constructStatusPDU:1219-1311)."""
    tx, rx = AMEntity(), AMEntity()
    sdu = bytes([7]) * 900
    tx.enqueue_sdu(sdu)
    pdus = []
    for _ in range(10):
        pdus += tx.send_pdus(300)
    assert len(pdus) >= 3
    delivered = []
    for i, p in enumerate(pdus):
        if i != 1:  # drop the second segment
            delivered.extend(rx.receive_pdu(p))
    assert delivered == []
    rx.status_trigger = True
    status = rx.status_pdu()
    tx.receive_pdu(status)
    retx = tx.send_pdus(10000)
    assert len(retx) >= 1
    # the retransmission is a byte range, far smaller than the whole SDU
    assert sum(len(p) for p in retx) < len(sdu)
    for p in retx:
        delivered.extend(rx.receive_pdu(p))
    assert delivered == [sdu]
    assert tx.stats.retx_pdus >= 1


def test_rlc_am_lossy_channel_recovery_and_bounded_buffer():
    """Sustained traffic over a 20%-loss pipe: every SDU is eventually
    delivered in order and the tx window keeps draining (VERDICT #8 'bounded
    tx_buffer' criterion)."""
    import random

    rng = random.Random(7)
    a, b = AMEntity(poll_pdu=4, t_poll_retransmit_ms=3, t_status_prohibit_ms=1), AMEntity()
    msgs = [bytes([i % 256]) * rng.randint(20, 300) for i in range(60)]
    for m in msgs:
        a.enqueue_sdu(m)
    delivered = []
    for step in range(400):
        # a -> b data (lossy)
        for p in a.send_pdus(400):
            if rng.random() > 0.2:
                delivered.extend(b.receive_pdu(p))
        # b -> a status (lossless reverse link)
        sp = b.status_pdu()
        if sp is not None:
            a.receive_pdu(sp)
        a.tick_1ms()
        b.tick_1ms()
        if len(delivered) == len(msgs) and not a.tx_buffer:
            break
    assert delivered == msgs
    assert not a.tx_buffer  # fully acked -> bounded window
    assert a.stats.retx_pdus > 0 and b.stats.status_tx > 0


def test_rlc_am_status_truncation_sets_ack_sn_at_scan_stop():
    """ADVICE r2 #1: a truncated NACK scan must set ACK_SN to where the scan
    stopped (amEntity.m constructStatusPDU), not highest-seen+1 — otherwise
    missing SNs beyond the cap are implicitly ACKed and lost forever."""
    tx, rx = AMEntity(), AMEntity()
    msgs = [bytes([i % 256]) * 10 for i in range(50)]
    for m in msgs:
        tx.enqueue_sdu(m)
    pdus = tx.send_pdus(10**6)
    assert len(pdus) == 50
    # deliver only the last PDU: SNs 0..48 all missing (49 > 32-NACK cap)
    rx.receive_pdu(pdus[-1])
    status = rx.status_pdu()
    assert status is not None
    ack_sn = ((status[0] & 0xF) << 8) | status[1]
    assert ack_sn == 32  # scan stopped at the NACK cap
    assert rx.status_trigger  # remainder still owed
    tx.receive_pdu(status)
    # SNs >= 32 must NOT have been released from the tx buffer
    for sn in range(32, 49):
        assert sn in tx.tx_buffer, sn
    # after prohibit expires the rest is reported and everything recovers
    delivered = []
    for _ in range(40):
        for p in tx.send_pdus(10**6):
            delivered.extend(rx.receive_pdu(p))
        sp = rx.status_pdu()
        if sp is not None:
            tx.receive_pdu(sp)
        tx.tick_1ms()
        rx.tick_1ms()
        if len(delivered) == 50:
            break
    # SN 49 arrived pre-loop, so filling the gap delivers ALL 50 in order
    assert b"".join(delivered) == b"".join(msgs)


def test_rlc_am_status_respects_byte_budget():
    """ADVICE r2 #3: status_pdu(budget=N) never emits more than N bytes."""
    tx, rx = AMEntity(), AMEntity()
    for i in range(40):
        tx.enqueue_sdu(bytes([i]) * 10)
    pdus = tx.send_pdus(10**6)
    rx.receive_pdu(pdus[-1])  # 39 missing SNs
    status = rx.status_pdu(budget=12)
    assert status is not None and len(status) <= 12
    assert rx.status_trigger  # truncated -> trigger stays armed
    # ACK_SN == number of whole-SN NACKs that fit: (12-2)//2 = 5
    ack_sn = ((status[0] & 0xF) << 8) | status[1]
    assert ack_sn == 5
    # tiny budget: no PDU at all, trigger preserved
    rx2 = AMEntity()
    rx2.status_trigger = True
    assert rx2.status_pdu(budget=1) is None
    assert rx2.status_trigger


def test_rlc_am_retx_count_not_inflated_while_grant_starved():
    """ADVICE r2 #2: repeated NACKs for an SN already queued for retx must
    not advance retx_count toward the max_retx drop."""
    tx, rx = AMEntity(max_retx=3), AMEntity()
    tx.enqueue_sdu(b"x" * 50)
    pdus = tx.send_pdus(10**6)
    assert len(pdus) == 1
    # PDU lost; receiver learns of the gap via a later SN
    tx.enqueue_sdu(b"y" * 50)
    rx.receive_pdu(tx.send_pdus(10**6)[0])
    # 10 consecutive STATUSes NACKing SN 0 while tx gets no grant
    for _ in range(10):
        rx.status_trigger = True
        rx.status_prohibit = 0
        tx.receive_pdu(rx.status_pdu())
    assert tx.retx_count.get(0, 0) <= 1  # only the first NACK counted
    assert 0 in tx.tx_buffer  # never dropped
    # grant arrives: retransmission drains and delivery completes
    delivered = []
    for p in tx.send_pdus(10**6):
        delivered.extend(rx.receive_pdu(p))
    assert delivered == [b"x" * 50, b"y" * 50]


def test_rlc_am_nonoverlapping_nack_ranges_replace_queued_entry():
    """ADVICE r2 #4: a NACK for a different byte range of an SN already in
    the retx queue must update the queued ranges, not be suppressed."""
    tx = AMEntity()
    tx.enqueue_sdu(bytes(range(200)))
    tx.send_pdus(10**6)
    assert 0 in tx.tx_buffer
    # first STATUS: NACK range [0,49] of SN 0
    tx.retx_queue.append((0, 0, 49))
    tx.retx_count[0] = 1
    # later STATUS reports rng [100,199] missing instead
    status = bytes([0, 1,                      # ACK_SN = 1
                    0x80, 0, 0, 100, 0, 199])  # NACK SN 0 SO 100..199
    tx.receive_pdu(status)
    assert list(tx.retx_queue) == [(0, 100, 199)]
    assert tx.retx_count[0] == 1  # no double count: SN was already queued
