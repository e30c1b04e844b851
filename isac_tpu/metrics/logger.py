"""Scheduling / PHY observability — TPU-native schedulingLogger + phyLogger +
gridVisualizer data products + MAC PCAP capture.

Capability parity (SURVEY §2.8/§5.5, VERDICT missing #6):
- per-slot RB-assignment grid and CQI grids, the arrays behind
  +visualizationTools/gridVisualizer.m:363-1045
- grant log (slot, ue, dir, mcs, prbs, tbs, rv, harq, crc) matching
  +communication/+scheduling/schedulingLogger.m getGrantLogs:1075
- per-slot DL/UL BLER logs matching +phyLayer/phyLogger.m logBLERStats:206
- MAC PDU capture in Wireshark's UDP-framed "mac-nr" encapsulation, the
  reference's nrPCAPWriter path (gNBPhy.m enablePacketLogging:403-419,
  logPackets:1082-1115)

Everything is host-side numpy (these are per-slot scalars/rows — the device
hot path never touches them)."""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


class SchedulingLogger:
    """Per-slot scheduling + link-quality log surfaces.

    Arrays:
    - rb_grid[dir][slot, rb]   = ue + 1 of the scheduled UE (0 = unused)
    - mcs_grid[dir][slot, rb]  = MCS + 1 (0 = unused)
    - cqi_grid[dir][slot, ue, rb] = last reported CQI per RB (CQI visualizer)
    - bler[dir][slot, ue, 0:2] = (block errors, blocks) that slot
    - grants: list of grant-log dicts (schedulingLogger.m getGrantLogs)
    """

    def __init__(self, n_slots: int, n_ues: int, n_rb: int):
        self.n_slots, self.n_ues, self.n_rb = n_slots, n_ues, n_rb
        dims = {"DL": None, "UL": None}
        self.rb_grid = {d: np.zeros((n_slots, n_rb), np.int16) for d in dims}
        self.mcs_grid = {d: np.zeros((n_slots, n_rb), np.int16) for d in dims}
        self.cqi_grid = {d: np.zeros((n_slots, n_ues, n_rb), np.int8) for d in dims}
        self.bler = {d: np.zeros((n_slots, n_ues, 2), np.int32) for d in dims}
        self.grants: list = []

    def log_grant(self, slot: int, direction: str, ue: int, prb_set, mcs: int,
                  tbs: int, rv: int, harq_id: int, n_layers: int, is_retx: bool,
                  sym_start: int = 0, n_sym: int = 14):
        if slot >= self.n_slots:
            return
        prbs = np.asarray(list(prb_set), np.int64)
        self.rb_grid[direction][slot, prbs] = ue + 1
        self.mcs_grid[direction][slot, prbs] = mcs + 1
        self.grants.append({
            "slot": slot, "dir": direction, "ue": ue, "mcs": mcs,
            "n_prb": int(prbs.size), "prb0": int(prbs[0]) if prbs.size else -1,
            "tbs": tbs, "rv": rv, "harq_id": harq_id, "n_layers": n_layers,
            "is_retx": bool(is_retx), "sym_start": sym_start, "n_sym": n_sym,
        })

    def log_crc(self, slot: int, direction: str, ue: int, ok: bool):
        if slot >= self.n_slots:
            return
        row = self.bler[direction][slot, ue]
        row[1] += 1
        if not ok:
            row[0] += 1

    def log_csi(self, slot: int, direction: str, ue: int, cqi_rb: np.ndarray):
        """Record the CQI report that the scheduler now acts on; forward-fill
        so the grid shows the CQI in force at every slot (gridVisualizer
        semantics)."""
        if slot >= self.n_slots:
            return
        self.cqi_grid[direction][slot:, ue, :] = np.asarray(cqi_rb, np.int8)[
            None, : self.n_rb
        ]

    def finalize(self) -> dict:
        """Log surfaces for post-sim replay (schedulingLogger getRBGridsInfo
        :651 / getMACMetrics:506 / phyLogger getBLERLogs:257)."""
        out = {"grants": self.grants}
        for d in ("DL", "UL"):
            err = self.bler[d][..., 0].astype(np.float64)
            tot = self.bler[d][..., 1].astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                slot_bler = np.where(tot > 0, err / np.maximum(tot, 1), np.nan)
            out[d] = {
                "rbGrid": self.rb_grid[d],
                "mcsGrid": self.mcs_grid[d],
                "cqiGrid": self.cqi_grid[d],
                "slotBLER": slot_bler,  # [n_slots, n_ues], NaN where idle
                "blockErrors": self.bler[d][..., 0],
                "blocks": self.bler[d][..., 1],
            }
        return out


# --------------------------------------------------------------------- PCAP

# Wireshark UDP-framed NR MAC encapsulation (epan/dissectors/packet-mac-nr.h):
# payload = "mac-nr" signature, radioType, direction, rntiType, then optional
# TLV tags, then PAYLOAD_TAG + MAC PDU. The heuristic dissector matches the
# signature on any UDP port.
_MAC_NR_SIG = b"mac-nr"
_RADIO_FDD, _RADIO_TDD = 1, 2
_DIR_UL, _DIR_DL = 0, 1
_RNTI_C = 3
_TAG_PAYLOAD = 0x01
_TAG_RNTI = 0x02
_TAG_UEID = 0x03
_TAG_HARQID = 0x06
_TAG_FRAME_SLOT = 0x07


class MacPcapWriter:
    """Minimal classic-pcap writer of MAC PDUs over synthetic Eth/IP/UDP:9999
    in the mac-nr UDP framing (the nrPCAPWriter equivalent; Wireshark opens
    the file directly)."""

    LINKTYPE_ETHERNET = 1

    def __init__(self, path: str, tdd: bool = True):
        self.path = path
        self.radio = _RADIO_TDD if tdd else _RADIO_FDD
        self._buf = bytearray()
        # global header: magic, v2.4, tz 0, sigfigs 0, snaplen, ethernet
        self._buf += struct.pack(
            "<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, self.LINKTYPE_ETHERNET
        )
        self.n_packets = 0

    def _encap(self, framed: bytes) -> bytes:
        udp = struct.pack(">HHHH", 9999, 9999, 8 + len(framed), 0) + framed
        ip_len = 20 + len(udp)
        ip = struct.pack(
            ">BBHHHBBH4s4s", 0x45, 0, ip_len, 0, 0, 64, 17, 0,
            b"\x7f\x00\x00\x01", b"\x7f\x00\x00\x01",
        ) + udp
        eth = b"\x00" * 12 + b"\x08\x00" + ip
        return eth

    def write(self, pdu: bytes, rnti: int, ueid: int, harq_id: int,
              frame: int, slot: int, is_dl: bool, t_s: float = 0.0):
        framed = bytearray(_MAC_NR_SIG)
        framed += bytes([self.radio, _DIR_DL if is_dl else _DIR_UL, _RNTI_C])
        framed += bytes([_TAG_RNTI]) + struct.pack(">H", rnti & 0xFFFF)
        framed += bytes([_TAG_UEID]) + struct.pack(">H", ueid & 0xFFFF)
        framed += bytes([_TAG_HARQID, harq_id & 0xFF])
        framed += bytes([_TAG_FRAME_SLOT]) + struct.pack(
            ">HH", frame & 0xFFFF, slot & 0xFFFF
        )
        framed += bytes([_TAG_PAYLOAD]) + pdu
        pkt = self._encap(bytes(framed))
        sec, usec = int(t_s), int((t_s % 1.0) * 1e6)
        self._buf += struct.pack("<IIII", sec, usec, len(pkt), len(pkt)) + pkt
        self.n_packets += 1

    def save(self):
        with open(self.path, "wb") as f:
            f.write(self._buf)
