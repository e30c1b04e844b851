"""Pass-through PHY backend + observability surfaces (VERDICT #9).

The statistical PHY (gNBPassThroughPhy.m equivalent) must run a multi-frame
full-stack protocol simulation in seconds with no device work, and the logger
must expose the reference's RB-grid / CQI-grid / grant-log / BLER-log data
products (schedulingLogger.m:244-1328, gridVisualizer.m, phyLogger.m) plus a
Wireshark-readable MAC PCAP (gNBPhy.m logPackets:1082-1115)."""

import time

import numpy as np

from isac_tpu.config.params import (
    LogParams,
    SimulationParameters,
    TimeParams,
    assign_cell_parameters,
)
from isac_tpu.config.scenarios import open_street_map_city
from isac_tpu.metrics.logger import MacPcapWriter, SchedulingLogger
from isac_tpu.phy.passthrough import CQIWalk, cqi_required, passthrough_bler
from isac_tpu.sim.cell import CellSimulator


def _passthrough_sim(tmp_path=None, num_frames=10, **kw):
    sim = open_street_map_city(SimulationParameters())
    sim.time = TimeParams(num_frames=num_frames)
    sim.log = LogParams(
        enable_traces=True, rb_visualization=True, cqi_visualization=True
    )
    cells = assign_cell_parameters(sim)
    return CellSimulator(cells[0], phy_mode="passthrough", **kw)


def test_passthrough_ten_frames_in_seconds():
    cs = _passthrough_sim()
    t0 = time.perf_counter()
    res = cs.run()
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"pass-through took {dt:.1f}s for 10 frames"
    comm = res["communication"]
    # every UE served; link adaptation holds the statistical design point
    assert np.all(comm["ueDLThroughputMbps"] > 0), comm["ueDLThroughputMbps"]
    assert np.all(comm["ueULThroughputMbps"] > 0), comm["ueULThroughputMbps"]
    assert 0.0 < float(np.mean(comm["ueDLBLER"])) < 0.35, comm["ueDLBLER"]
    assert res["sensing"] is None  # no waveform exists in pass-through


def test_passthrough_logs_expose_grid_surfaces():
    cs = _passthrough_sim(num_frames=2)
    res = cs.run()
    logs = res["logs"]
    dl = logs["DL"]
    n_slots, n_rb = cs.num_slots, cs.n_rb
    assert dl["rbGrid"].shape == (n_slots, n_rb)
    assert dl["cqiGrid"].shape == (n_slots, cs.n_ues, n_rb)
    assert dl["slotBLER"].shape == (n_slots, cs.n_ues)
    # DL slots carry assignments; UL slots stay zero in the DL grid
    assert (dl["rbGrid"] > 0).any()
    ul_slots = [s for s in range(n_slots) if cs.tdd.slot_type(s) == "U"]
    assert not dl["rbGrid"][ul_slots].any()
    assert (logs["UL"]["rbGrid"][ul_slots] > 0).any()
    # grant log rows match the grids
    g0 = [g for g in logs["grants"] if g["dir"] == "DL"][0]
    assert dl["rbGrid"][g0["slot"], g0["prb0"]] == g0["ue"] + 1
    assert dl["mcsGrid"][g0["slot"], g0["prb0"]] == g0["mcs"] + 1
    # CQI grid forward-fills reports
    assert (dl["cqiGrid"][-1] > 0).all()


def test_full_phy_also_logs(tmp_path):
    from isac_tpu.config.scenarios import single_link

    sim = single_link(SimulationParameters())
    sim.log = LogParams(enable_traces=True)
    cells = assign_cell_parameters(sim)
    pcap = str(tmp_path / "mac.pcap")
    cs = CellSimulator(cells[0], n_rb_override=24, nfft_override=512,
                       pcap_path=pcap)
    res = cs.run()
    logs = res["logs"]
    assert (logs["DL"]["rbGrid"] > 0).any()
    assert len(logs["grants"]) > 0
    # PCAP: classic magic + ethernet linktype + >0 packets
    raw = open(pcap, "rb").read()
    assert raw[:4] == b"\xd4\xc3\xb2\xa1"
    assert cs.pcap.n_packets > 0
    assert b"mac-nr" in raw


def test_passthrough_bler_model_design_point():
    # MCS exactly matched to CQI -> BLER 0.1; one CQI of headroom -> 0.01;
    # a retransmission adds soft-combining gain
    mcs = 10
    cqi = cqi_required(mcs)
    assert abs(passthrough_bler(mcs, cqi, 1) - 0.1) < 1e-9
    assert abs(passthrough_bler(mcs, cqi + 1, 1) - 0.01) < 1e-9
    assert passthrough_bler(mcs, cqi, 2) < 0.01
    w = CQIWalk(2, 8, seed=1)
    r = w.report(0)
    assert r.shape == (8,) and 2 <= r[0] <= 15


def test_pcap_writer_roundtrip(tmp_path):
    p = str(tmp_path / "t.pcap")
    w = MacPcapWriter(p, tdd=True)
    w.write(b"\x01\x02\x03", rnti=17, ueid=0, harq_id=3, frame=1, slot=4,
            is_dl=True, t_s=0.0105)
    w.save()
    raw = open(p, "rb").read()
    assert len(raw) > 24 + 16  # global header + one record header + packet
    # find the mac-nr signature and check tag fields follow
    i = raw.index(b"mac-nr")
    assert raw[i + 6] == 2  # radioType TDD
    assert raw[i + 7] == 1  # direction DL
    assert raw[i + 8] == 3  # rntiType C-RNTI


def test_scheduling_logger_direct():
    sl = SchedulingLogger(n_slots=4, n_ues=2, n_rb=8)
    sl.log_grant(0, "DL", ue=1, prb_set=(0, 1, 2), mcs=5, tbs=100, rv=0,
                 harq_id=0, n_layers=1, is_retx=False)
    sl.log_crc(0, "DL", 1, ok=False)
    sl.log_crc(1, "DL", 1, ok=True)
    sl.log_csi(2, "DL", 0, np.full(8, 9))
    out = sl.finalize()
    assert list(out["DL"]["rbGrid"][0, :4]) == [2, 2, 2, 0]
    assert out["DL"]["slotBLER"][0, 1] == 1.0
    assert out["DL"]["slotBLER"][1, 1] == 0.0
    assert np.isnan(out["DL"]["slotBLER"][3, 0])
    assert (out["DL"]["cqiGrid"][2:, 0] == 9).all()
    assert (out["DL"]["cqiGrid"][:2, 0] == 0).all()


def test_result_persist_replay(tmp_path):
    """VERDICT r4 Missing #4: save_result/load_result round-trip the full
    result dict (the reference's MAT-file save, cellSimulation.m:204-277) and
    viz.save_all replays the saved file into BYTE-identical figures
    (postSimVisualization.m parity)."""
    from isac_tpu import viz
    from isac_tpu.config.scenarios import single_link
    from isac_tpu.metrics import load_result, save_result

    sim = single_link(SimulationParameters())
    sim.log = LogParams(enable_traces=True)
    cells = assign_cell_parameters(sim)
    cs = CellSimulator(cells[0], n_rb_override=24, nfft_override=512)
    res = cs.run()

    path = save_result(res, str(tmp_path / "result"))
    loaded = load_result(path)
    comm_l, comm_r = loaded["communication"], res["communication"]
    for k in ("ueDLThroughputMbps", "ueULBLER", "achievedSEDL"):
        assert np.array_equal(np.asarray(comm_l[k]), np.asarray(comm_r[k])), k
    assert loaded["logs"]["grants"][0]["mcs"] == res["logs"]["grants"][0]["mcs"]
    if res.get("sensing") is not None:
        assert np.array_equal(
            np.asarray(loaded["sensing"]["estimates"]["rngEst"]),
            np.asarray(res["sensing"]["estimates"]["rngEst"]), equal_nan=True)
        assert loaded["sensing"]["params"]["__dataclass__"] == "RadarDerived"

    live = viz.save_all(res, str(tmp_path / "live"))
    replay = viz.save_all(path, str(tmp_path / "replay"))
    assert len(live) == len(replay) and len(live) >= 4
    for a, b in zip(live, replay):
        assert open(a, "rb").read() == open(b, "rb").read(), (a, b)
