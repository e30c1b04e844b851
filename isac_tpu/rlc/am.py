"""RLC Acknowledged Mode per TS 38.322 (ref: +rlcLayer/amEntity.m:324-1854).

Host-side state machine: tx/rx windows, polling (pollPDU/pollByte/
t-PollRetransmit), STATUS PDU with ACK_SN + NACK_SN list, retransmission
queue, t-StatusProhibit. AMD PDU (12-bit SN):
  [D/C=1 | P | SI(2) | SN(12)] (2 bytes) [+ SO (2 bytes) for non-first segments]
STATUS PDU: [D/C=0 | CPT=000 | ACK_SN(12)] + per-NACK [NACK_SN(12) ...].

Deviation (documented): segment-offset NACK ranges are not encoded — a NACK
retransmits the whole SDU (the reference's retransmitSegment:721 path resends
segments; whole-SDU retx is a conservative superset).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass


SI_FULL, SI_FIRST, SI_LAST, SI_MIDDLE = 0, 1, 2, 3


@dataclass
class AMStats:
    tx_sdus: int = 0
    tx_pdus: int = 0
    tx_bytes: int = 0
    retx_pdus: int = 0
    rx_pdus: int = 0
    rx_sdus: int = 0
    rx_bytes: int = 0
    status_tx: int = 0
    status_rx: int = 0


class AMEntity:
    def __init__(
        self,
        sn_bits: int = 12,
        poll_pdu: int = 8,
        poll_byte: int = 25000,
        t_poll_retransmit_ms: int = 45,
        t_status_prohibit_ms: int = 5,
        t_reassembly_ms: int = 35,
        max_retx: int = 8,
    ):
        self.sn_mod = 1 << sn_bits
        self.poll_pdu = poll_pdu
        self.poll_byte = poll_byte
        self.t_poll_retx = t_poll_retransmit_ms
        self.t_status_prohibit = t_status_prohibit_ms
        self.t_reassembly = t_reassembly_ms
        self.max_retx = max_retx
        # TX state
        self.tx_queue: deque = deque()  # new SDUs
        self.tx_next = 0
        self.tx_next_ack = 0
        self.tx_buffer: dict = {}  # sn -> sdu bytes (unacked)
        self.retx_queue: deque = deque()  # sns to retransmit
        self.retx_count: dict = {}
        self.pdu_since_poll = 0
        self.byte_since_poll = 0
        self.poll_retx_timer = -1
        # RX state
        self.rx_next = 0
        self.rx_store: dict = {}  # sn -> sdu bytes (out of order)
        self.status_trigger = False
        self.status_prohibit = 0
        self.rx_highest = 0
        self.stats = AMStats()

    # ------------------------------------------------------------------- TX

    def enqueue_sdu(self, sdu: bytes):
        self.tx_queue.append(sdu)
        self.stats.tx_sdus += 1

    def buffer_status(self) -> int:
        n = sum(len(s) + 2 for s in self.tx_queue)
        n += sum(len(self.tx_buffer[sn]) + 2 for sn in self.retx_queue if sn in self.tx_buffer)
        return n

    def _window_ok(self, sn: int) -> bool:
        return ((sn - self.tx_next_ack) % self.sn_mod) < self.sn_mod // 2

    def send_pdus(self, grant_bytes: int) -> list:
        """Retransmissions first (amEntity.m retx context :1073), then new data."""
        pdus = []
        budget = int(grant_bytes)
        while self.retx_queue and budget > 4:
            sn = self.retx_queue[0]
            sdu = self.tx_buffer.get(sn)
            if sdu is None:
                self.retx_queue.popleft()
                continue
            if len(sdu) + 2 > budget:
                break
            self.retx_queue.popleft()
            pdus.append(self._amd_pdu(sn, sdu, poll=self._poll_due(len(sdu))))
            budget -= len(sdu) + 2
            self.stats.retx_pdus += 1
        while self.tx_queue and budget > 4 and self._window_ok(self.tx_next):
            sdu = self.tx_queue[0]
            if len(sdu) + 2 > budget:
                break  # (no segmentation on AM tx in this round — whole SDUs)
            self.tx_queue.popleft()
            sn = self.tx_next
            self.tx_next = (self.tx_next + 1) % self.sn_mod
            self.tx_buffer[sn] = sdu
            pdus.append(self._amd_pdu(sn, sdu, poll=self._poll_due(len(sdu))))
            budget -= len(sdu) + 2
        self.stats.tx_pdus += len(pdus)
        self.stats.tx_bytes += sum(len(p) for p in pdus)
        return pdus

    def _poll_due(self, n_bytes: int) -> bool:
        """pollPDU / pollByte triggers (amEntity.m getPollStatus:809)."""
        self.pdu_since_poll += 1
        self.byte_since_poll += n_bytes
        if self.pdu_since_poll >= self.poll_pdu or self.byte_since_poll >= self.poll_byte:
            self.pdu_since_poll = 0
            self.byte_since_poll = 0
            self.poll_retx_timer = self.t_poll_retx
            return True
        return False

    def _amd_pdu(self, sn: int, sdu: bytes, poll: bool) -> bytes:
        b0 = 0x80 | (0x40 if poll else 0) | (SI_FULL << 4) | ((sn >> 8) & 0xF)
        return bytes([b0, sn & 0xFF]) + sdu

    # ------------------------------------------------------------------- RX

    def receive_pdu(self, pdu: bytes) -> list:
        """AMD or STATUS PDU in; returns delivered SDUs."""
        if pdu[0] & 0x80:  # AMD data
            self.stats.rx_pdus += 1
            poll = bool(pdu[0] & 0x40)
            sn = ((pdu[0] & 0xF) << 8) | pdu[1]
            self.rx_store[sn] = pdu[2:]
            if poll:
                self.status_trigger = True
            delivered = []
            while self.rx_next in self.rx_store:
                sdu = self.rx_store.pop(self.rx_next)
                delivered.append(sdu)
                self.rx_next = (self.rx_next + 1) % self.sn_mod
                self.stats.rx_sdus += 1
                self.stats.rx_bytes += len(sdu)
            dist = (sn - self.rx_next) % self.sn_mod
            if 0 < dist < self.sn_mod // 2:
                self.status_trigger = True  # gap detected
            return delivered
        # STATUS PDU (amEntity.m decodeStatusPDU:1311)
        self.stats.status_rx += 1
        ack_sn = ((pdu[0] & 0xF) << 8) | pdu[1]
        nacks = []
        i = 2
        while i + 1 < len(pdu):
            nacks.append(((pdu[i] & 0xF) << 8) | pdu[i + 1])
            i += 2
        self._handle_status(ack_sn, nacks)
        return []

    def _handle_status(self, ack_sn: int, nacks: list):
        """Release acked SDUs; queue NACKed for retx (updateRetransmissionContext:1073)."""
        nack_set = set(nacks)
        sn = self.tx_next_ack
        while sn != ack_sn:
            if sn not in nack_set:
                self.tx_buffer.pop(sn, None)
                self.retx_count.pop(sn, None)
            sn = (sn + 1) % self.sn_mod
        self.tx_next_ack = min(
            nacks, default=ack_sn,
            key=lambda s: (s - self.tx_next_ack) % self.sn_mod,
        ) if nacks else ack_sn
        for sn in nacks:
            if sn in self.tx_buffer:
                c = self.retx_count.get(sn, 0) + 1
                self.retx_count[sn] = c
                if c <= self.max_retx and sn not in self.retx_queue:
                    self.retx_queue.append(sn)
                elif c > self.max_retx:
                    self.tx_buffer.pop(sn, None)  # maxRetx reached -> drop
        self.poll_retx_timer = -1

    def status_pdu(self) -> bytes | None:
        """Emit STATUS if triggered and not prohibited (constructStatusPDU:1219)."""
        if not self.status_trigger or self.status_prohibit > 0:
            return None
        self.status_trigger = False
        self.status_prohibit = self.t_status_prohibit
        # ACK_SN = next expected beyond highest received contiguous span
        pending = sorted(
            s for s in self.rx_store
            if 0 < (s - self.rx_next) % self.sn_mod < self.sn_mod // 2
        )
        ack_sn = ((pending[-1] + 1) % self.sn_mod) if pending else self.rx_next
        nacks = []
        sn = self.rx_next
        while sn != ack_sn and len(nacks) < 32:
            if sn not in self.rx_store:
                nacks.append(sn)
            sn = (sn + 1) % self.sn_mod
        out = bytes([((ack_sn >> 8) & 0xF), ack_sn & 0xFF])
        for n in nacks:
            out += bytes([(n >> 8) & 0xF, n & 0xFF])
        self.stats.status_tx += 1
        return out

    def tick_1ms(self):
        if self.status_prohibit > 0:
            self.status_prohibit -= 1
        if self.poll_retx_timer > 0:
            self.poll_retx_timer -= 1
            if self.poll_retx_timer == 0:
                # t-PollRetransmit expiry: retransmit highest unacked (pollRetransmitTimerExpiry:860)
                if self.tx_buffer:
                    sn = max(
                        self.tx_buffer,
                        key=lambda s: (s - self.tx_next_ack) % self.sn_mod,
                    )
                    if sn not in self.retx_queue:
                        self.retx_queue.append(sn)
