"""Per-cell ISAC simulation engine — TPU-native cellSimulation equivalent.

Capability parity with +simulation/cellSimulation.m:1-281 (SURVEY §2.7, §3.2):
per-slot TDD loop driving APP traffic -> RLC UM -> MAC (LCP, scheduler, HARQ,
BSR, CSI feedback loops with k1 timing) -> PHY (PDSCH/PUSCH chains over CDL
fading + TR 38.901 pathloss) -> metrics, with the accumulated DL waveform
feeding the mono-static sensing post-pass (radar echo -> 2D-FFT RDM -> CFAR ->
MUSIC -> RMSE, cellSimulation.m:189-202).

TPU-first redesign vs. the reference's object-per-node callback web:
- control plane (scheduler/RLC/HARQ bookkeeping, byte-level PDUs) runs on host;
  the data plane (LDPC, (de)modulation, channel application, equalization,
  CSI selection, sensing FFTs) is jax on device with static per-grant shapes.
- the channel is applied in the frequency domain per OFDM symbol
  (ops/cdl.py rationale) in noise-normalized units: per-RE noise variance is
  1.0 and signal amplitudes are sqrt(per-RE SNR) from the link budget, so
  receiver noise estimation operates exactly as on real waveforms.
- CSI is measured from the true channel at CSI-RS/SRS RE positions plus
  estimation noise at the link's per-RE SNR, instead of re-demodulating pilot
  waveforms (documented deviation; the reference's nrChannelEstimate output is
  equivalent to truth + noise at these SNRs).
- out-of-band control (grants, BSR, CSI reports, ACK/NACK) has guaranteed
  delivery with slot-accurate timing, exactly like the reference's
  packetDistribution out-of-band bus (gNBMAC.m:8-17).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from isac_tpu.utils import xfer

from isac_tpu.app.traffic import make_traffic
from isac_tpu.config.carrier import CarrierConfig
from isac_tpu.config.params import CellParams
from isac_tpu.mac.lcp import LCPState, LogicalChannel
from isac_tpu.mac.pdu import build_mac_pdu, parse_mac_pdu
from isac_tpu.mac.scheduler import Grant, Scheduler
from isac_tpu.metrics.kpi import CellMetrics, peak_spectral_efficiency
from isac_tpu.metrics.logger import MacPcapWriter, SchedulingLogger
from isac_tpu.phy.passthrough import CQIWalk, passthrough_crc
from isac_tpu.ops.cdl import (
    _freq_response_jit,
    apply_channel_freq,
    build_cdl_link,
    freq_phases,
    subcarrier_freqs,
    time_phases,
)
from isac_tpu.parallel.links import stack_links
from isac_tpu.ops.csi import (
    SINR_TO_CQI_UL,
    cqi_select,
    ri_select,
    sinr_to_cqi,
    subband_size,
    ul_tpmi_select,
)
from isac_tpu.ops.csirs import (
    csirs_estimate_fdm,
    csirs_estimate_ports,
    csirs_fdm_reserved,
    csirs_fill_fdm,
    csirs_fill_grid,
)
from isac_tpu.ops.pathloss import pathloss as pathloss_db
from isac_tpu.ops.precoding import (
    panel_config_for_antenna,
    pusch_codebook,
    type1_codebook,
    type1_multipanel_codebook,
)
from isac_tpu.ops.srs import srs_estimate_ports, srs_fill_grid
from isac_tpu.ops.sensing import (
    derive_radar_params,
    fft_2d_estimate,
    get_rmse,
    make_cfar_config,
    mono_static_sensing,
    music_2d_estimate,
)
from isac_tpu.ops.ofdm import ofdm_modulate
from isac_tpu.phy.chains import (
    SCHGrant,
    grant_tbs,
    sch_receive,
    sch_receive_batch,
    sch_transmit,
    sch_transmit_batch,
)
from isac_tpu.rlc.am import AMEntity
from isac_tpu.rlc.um import UMEntity
from isac_tpu.utils.geometry import BOLTZMANN, db2pow

DEFAULT_LCID = 4  # setRLCChannelConfig.m:1-33 — single LC, LCID 4, LCG 1

# module-level cache of compiled sensing post-pass programs, keyed by the
# full chain configuration (see run_sensing)
_SENSING_FNS: dict = {}


def _radar_params_digest(params) -> str:
    """Content digest of a RadarDerived (its arrays/scalars shape the traced
    sensing program; instances hash by id, so a value digest keys the cache)."""
    import dataclasses
    import hashlib

    h = hashlib.sha1()
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        if isinstance(v, np.ndarray):
            h.update(f.name.encode())
            h.update(np.ascontiguousarray(v).tobytes())
        else:
            h.update(f"{f.name}={v!r}".encode())
    return h.hexdigest()

# The slot path must be EAGER-FREE: every device op lives inside a jitted
# program (TPU-idiomatic, and the axon TPU backend rejects eager dispatch).
_add_jit = jax.jit(lambda a, b: a + b)
_take_jit = jax.jit(lambda x, i: x[i])

from functools import partial as _partial

_BIT_W = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.float32)


@_partial(jax.jit, static_argnames=("bits",))
def _pack_jit(xs, bits=()):
    """Flatten leaves into one f32 vector; leaves flagged in `bits` are
    BIT-PACKED 8:1 first (each f32 carries one exact byte 0..255) — TB bit
    tensors dominated the packed fetch (4 B/bit over a ~55 MB/s relay link,
    r5 budget probe: 0.54 s of a 2.1 s frame was fetch)."""
    out = []
    for i, v in enumerate(xs):
        flat = jnp.ravel(v).astype(jnp.float32)
        if i in bits:
            pad = (-flat.shape[0]) % 8
            if pad:
                flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.float32)])
            flat = flat.reshape(-1, 8) @ jnp.asarray(_BIT_W)
        out.append(flat)
    return jnp.concatenate(out)


def _unpack_flat(flat: np.ndarray, shapes: list, bit_flags: list | None) -> list:
    """Decode a _pack_jit vector back into per-leaf numpy arrays."""
    bits = (tuple(i for i, b in enumerate(bit_flags) if b)
            if bit_flags else ())
    out, off = [], 0
    for i, shape in enumerate(shapes):
        n = int(np.prod(shape)) if shape else 1
        if i in bits:
            nb = (n + 7) // 8
            by = np.rint(flat[off : off + nb]).astype(np.uint8)
            vals = np.unpackbits(by)[:n].astype(np.float32)
            out.append(vals.reshape(shape))
            off += nb
        else:
            out.append(flat[off : off + n].reshape(shape))
            off += n
    return out


def _fetch_packed(leaves: list, bit_flags: list | None = None) -> list:
    """ONE device->host round trip for a list of device arrays (any dtypes
    representable exactly in f32: bools, small ints, f32). The axon relay
    charges a ~27 ms fixed RTT per fetch (RELAY_NOTES.md r4); per-leaf
    np.asarray calls made a 5-UE CSI slot cost ~15 RTTs. Returns numpy
    arrays in input order (original shapes, f32 — callers cast). Leaves with
    bit_flags[i]=True are {0,1} tensors shipped bit-packed (8x smaller) and
    transparently unpacked here."""
    if not leaves:
        return []
    bits = (tuple(i for i, b in enumerate(bit_flags) if b)
            if bit_flags else ())
    flat = np.asarray(_pack_jit(tuple(leaves), bits=bits))
    return _unpack_flat(flat, [x.shape for x in leaves], bit_flags)

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n_sc", "n_rx", "n_tx"))
def _h_slot_jit(ft, ff, c2, n_sc, n_rx, n_tx):
    h = _freq_response_jit(ft, ff, c2)
    return h.reshape(h.shape[0], 14, n_sc, n_rx, n_tx)


@_partial(jax.jit, static_argnames=("n_sc", "n_rx", "n_tx"))
def _h_slot_dev_jit(nu, sym_t, t0, ff, c2, n_sc, n_rx, n_tx):
    """_h_slot_jit with the slow-time phases computed ON DEVICE from the ray
    Dopplers (nu [L, R] f32, uploaded once) and the slot time scalar.

    Replaces the per-slot host time_phases + complex H2D (4-6 relay client
    calls per slot — the engine's non-fetch time was dominated by per-call
    overhead, r4 instrumentation). f32 phase: nu*t < 1e2 cycles over a
    frame, so the error vs the host float64 path is ~1e-5 rad — used on the
    TPU backend only, keeping CPU (and the golden trace) bit-identical."""
    ang = np.float32(2.0 * np.pi) * nu[:, None, :] * (t0 + sym_t)[None, :, None]
    ft = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    h = _freq_response_jit(ft, ff, c2)
    return h.reshape(h.shape[0], 14, n_sc, n_rx, n_tx)


@_partial(jax.jit, static_argnames=("n_sym",))
def _sen_slice_jit(port_grid, amp, n_sym):
    return port_grid[:, :n_sym, :] * amp


@_partial(jax.jit, static_argnames=("sym",))
def _meas_noise_jit(h_all, ue, sc, amp, key, sym):
    """fast_csi truth-channel sampling + estimation noise in ONE program
    (the former eager slice/mul/add chain poisons buffers on the relay)."""
    h = h_all[ue, sym][sc] * amp
    kr, ki = jax.random.split(key)
    noise = (
        jax.random.normal(kr, h.shape, jnp.float32)
        + 1j * jax.random.normal(ki, h.shape, jnp.float32)
    ).astype(jnp.complex64) * np.float32(np.sqrt(0.5))
    return h + noise


@jax.jit
def _rx_all_dl_jit(port_grid, h_all, amp, key):
    """Every UE's received grid in one fused dispatch.

    port_grid [n_tx, 14, K], h_all [n_ues, 14, K, n_rx, n_tx], amp [n_ues]
    -> [n_ues, n_rx, 14, K] incl. unit-variance noise."""
    r = jnp.einsum("tsk,lskat->lask", port_grid, h_all,
                   preferred_element_type=jnp.complex64)
    r = r * amp[:, None, None, None]
    kr, ki = jax.random.split(key)
    noise = (
        jax.random.normal(kr, r.shape, jnp.float32)
        + 1j * jax.random.normal(ki, r.shape, jnp.float32)
    ).astype(jnp.complex64) * np.float32(np.sqrt(0.5))
    return r + noise


@jax.jit
def _rx_all_dl_ext_jit(port_grid, h_all, amp, ext, key):
    """_rx_all_dl_jit + an external (inter-cell) interference term ext
    [n_ues, n_rx, 14, K], summed pre-noise (phyRxBuffer-style co-channel
    superposition across cells)."""
    r = jnp.einsum("tsk,lskat->lask", port_grid, h_all,
                   preferred_element_type=jnp.complex64)
    r = r * amp[:, None, None, None] + ext
    kr, ki = jax.random.split(key)
    noise = (
        jax.random.normal(kr, r.shape, jnp.float32)
        + 1j * jax.random.normal(ki, r.shape, jnp.float32)
    ).astype(jnp.complex64) * np.float32(np.sqrt(0.5))
    return r + noise


@jax.jit
def _rx_ul_batch_jit(grids_tuple, h_all, ue_idx, amp, key):
    """Per-grant UL channel application in one dispatch.

    grids_tuple: per-grant [n_ue_ants, 14, K] (stacked inside the program);
    h_all [n_ues, 14, K, n_rx, n_tx] indexed by ue_idx [G]; amp [G]
    -> [G, n_rx, 14, K] incl. noise."""
    grids = jnp.stack(grids_tuple)
    h_sel = h_all[ue_idx]
    r = jnp.einsum("gtsk,gskat->gask", grids, h_sel,
                   preferred_element_type=jnp.complex64)
    r = r * amp[:, None, None, None]
    kr, ki = jax.random.split(key)
    noise = (
        jax.random.normal(kr, r.shape, jnp.float32)
        + 1j * jax.random.normal(ki, r.shape, jnp.float32)
    ).astype(jnp.complex64) * np.float32(np.sqrt(0.5))
    return r + noise


@jax.jit
def _rx_ul_batch_ext_jit(grids_tuple, h_all, ue_idx, amp, ext, key):
    """_rx_ul_batch_jit + an external (inter-cell) UL interference term ext
    [n_rx, 14, K] — other cells' co-channel uplinks superposed at this gNB,
    seen identically by every grant's receiver (one physical antenna array).
    Exceeds the reference, which models no UL interference at all
    (networkSimulation.m parfeval isolation)."""
    grids = jnp.stack(grids_tuple)
    h_sel = h_all[ue_idx]
    r = jnp.einsum("gtsk,gskat->gask", grids, h_sel,
                   preferred_element_type=jnp.complex64)
    r = r * amp[:, None, None, None] + ext[None]
    kr, ki = jax.random.split(key)
    noise = (
        jax.random.normal(kr, r.shape, jnp.float32)
        + 1j * jax.random.normal(ki, r.shape, jnp.float32)
    ).astype(jnp.complex64) * np.float32(np.sqrt(0.5))
    return r + noise


@jax.jit
def _srs_rx_sum_jit(grids, h_all, ue_idx, amps, key):
    """Summed co-channel SRS reception (grids [U, ants, 14, K] through each
    sounding UE's channel, superposed at the gNB) + noise, one dispatch."""
    h_sel = h_all[ue_idx]
    r = jnp.einsum("gtsk,gskat->ask", grids * amps[:, None, None, None], h_sel,
                   preferred_element_type=jnp.complex64)
    kr, ki = jax.random.split(key)
    noise = (
        jax.random.normal(kr, r.shape, jnp.float32)
        + 1j * jax.random.normal(ki, r.shape, jnp.float32)
    ).astype(jnp.complex64) * np.float32(np.sqrt(0.5))
    return r + noise


def _ul_tx_batch(items):
    """Vmapped per-grant UL transmit for one layout group (stacked grids)."""
    return sch_transmit_batch(
        [tb for _, _, tb, _ in items],
        [sg for _, sg, _, _ in items],
        [w for _, _, _, w in items],
        reduce_sum=False,
    )


def _due_leaves(entries: list) -> tuple:
    """Device leaves + bit-pack flags for a list of deferred entries, in the
    exact order _consume_due unpacks them (shared by the boundary fetch and
    the segment pre-pack path)."""
    leaves: list = []
    flags: list = []  # True = {0,1} tensor, ships bit-packed 8:1
    packed_shares: list = []
    for e in entries:
        kind = e["kind"]
        if kind in ("dl", "ul"):
            sh = e["share"]
            if sh["np"] is None and not any(s is sh for s in packed_shares):
                packed_shares.append(sh)
                outs = sh["outs"]
                leaves += [outs["crc_ok"], outs["tb"], outs["sinr_db"]]
                flags += [False, True, False]
        elif kind == "csi":
            leaves.append(e["rank_dev"])
            flags.append(False)
            for rep in e["reports"]:
                leaves += [rep["cqi_sb"], rep["pmi_sb"]]
                flags += [False, False]
        elif kind == "srs":
            leaves.append(e["rank_dev"])
            flags.append(False)
            for tpmi, sdb in e["cands"]:
                leaves += [tpmi, sdb]
                flags += [False, False]
    return leaves, flags


def prepack_due(sim) -> None:
    """Eagerly pack each future due slot's fetch vector ON DEVICE (async
    dispatch, ~2 ms client call) so the protocol boundary pays a single
    np.asarray round trip (~29 ms) instead of pack-dispatch + fetch
    (~53 ms measured — r5 fetch probe). Safe: _materialize_due verifies the
    entry set still matches before using a prepacked vector."""
    by_due: dict = {}
    for e in sim._deferred:
        by_due.setdefault(e["due"], []).append(e)
    for d, es in by_due.items():
        pp = sim._prepacked.get(d)
        if pp is not None and pp["ids"] == tuple(map(id, es)):
            continue  # unchanged since last segment
        leaves, flags = _due_leaves(es)
        if not leaves:
            continue
        bits = tuple(i for i, b in enumerate(flags) if b)
        sim._prepacked[d] = {
            "ids": tuple(map(id, es)),
            "packed": _pack_jit(tuple(leaves), bits=bits),
            "shapes": [x.shape for x in leaves],
            "flags": flags,
        }


@dataclass
class _PendingFeedback:
    due_slot: int
    kind: str  # 'harq_dl' | 'csi'
    ue: int
    payload: dict


class CellSimulator:
    """One cell: gNB + UEs + targets. `run()` executes the full timeline."""

    def __init__(
        self,
        cell: CellParams,
        seed: int = 0,
        n_rb_override: int | None = None,
        nfft_override: int | None = None,
        n_ldpc_iter: int = 6,
        rlc_mode: str = "UM",
        enable_sensing: bool = True,
        doa_method: str = "music",
        fast_csi: bool = False,
        phy_mode: str = "full",
        pcap_path: str | None = None,
        mesh=None,
        mesh_time_axis: str = "time",
        block_slots: int = 0,
    ):
        self.cell = cell
        gnb = cell.gnb
        self.carrier = CarrierConfig(
            fc_hz=gnb.dl_carrier_freq,
            bandwidth_hz=gnb.dl_bandwidth,
            scs_khz=gnb.scs_khz,
            n_cell_id=gnb.cell_id,
            n_rb_override=n_rb_override,
            nfft_override=nfft_override,
        )
        self.info = self.carrier.ofdm
        self.tdd = gnb.tdd
        # FDD (schedulerEntity.m selectULSlotsToBeScheduledFDD:1482-1617):
        # paired spectrum, both directions active every slot. The r2 engine
        # silently mapped FDD to all-DL (VERDICT r2 Missing #3).
        self.fdd = gnb.duplex_mode == "FDD"
        self.symbol_sched = gnb.scheduling_type == "symbol"
        self.tti = cell.scheduling.tti_granularity
        if self.symbol_sched and self.tti not in (2, 4, 7):
            raise ValueError(f"tti_granularity must be 2/4/7, got {self.tti}")
        self.n_rb = self.carrier.n_rb
        self.n_sc = self.carrier.n_sc
        self._slots_per_ms = self.carrier.slots_per_frame // 10
        self.n_ues = cell.ue_positions.shape[0]
        self.num_slots = cell.num_slots
        self.n_ldpc_iter = n_ldpc_iter
        # pass-through PHY (gNBPassThroughPhy.m): statistical CRC, no
        # waveform — no grid exists to feed the radar, so sensing is off
        self.passthrough = phy_mode == "passthrough"
        if phy_mode not in ("full", "passthrough"):
            raise ValueError(f"phy_mode must be 'full'|'passthrough', got {phy_mode!r}")
        self.enable_sensing = (
            enable_sensing and cell.target_positions.shape[0] > 0 and not self.passthrough
        )
        self.doa_method = doa_method
        # optional device mesh: run_sensing uses the time-block-sharded
        # distributed-DFT RDM over it (SURVEY §5.7)
        self.mesh = mesh
        self.mesh_time_axis = mesh_time_axis
        self._seed = seed
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.default_rng(seed)

        self.n_tx = gnb.num_tx_ants
        self.n_ue_ants = cell.ue.num_ants
        lam = self.carrier.wavelength
        self.gnb_elems = gnb.antenna.element_positions(lam)
        # UE antenna: small ULA at 0.5 lambda (ueParameters.m geometry)
        ue_ant_y = np.arange(self.n_ue_ants) * 0.5 * lam
        self.ue_elems = np.stack(
            [np.zeros(self.n_ue_ants), ue_ant_y, np.zeros(self.n_ue_ants)], -1
        )

        # ---------------- link budget (noise-normalized units) ----------------
        # Per-RE noise power N = k * Teq * SCS; per-RE signal power at the
        # receiver P_re * 10^((G_rx - PL)/10). Grids carry amplitude
        # sqrt(SNR_re) so receiver-side noise has unit variance.
        scs_hz = gnb.scs_khz * 1e3
        pl = pathloss_db(
            cell.pathloss.model,
            np.asarray(gnb.position),
            cell.ue_positions,
            gnb.dl_carrier_freq,
            cell.ue_los,
        )  # [n_ues]
        if cell.pathloss.shadow_fading:
            # per-link log-normal shadowing (PathlossParams.shadow_fading was
            # declared-but-dead in r2 — VERDICT r2 Weak #5)
            sf_rng = np.random.default_rng(cell.pathloss.seed * 997 + gnb.cell_id)
            pl = pl + sf_rng.normal(0.0, cell.pathloss.shadow_sigma_db, pl.shape)
        self.pathloss_db = pl

        def teq(nf_db, t_k):
            return t_k + 290.0 * (db2pow(nf_db) - 1.0)

        n_re_dl = BOLTZMANN * teq(cell.ue.noise_figure_db, cell.ue.temperature_k) * scs_hz
        n_re_ul = BOLTZMANN * teq(gnb.noise_figure_db, gnb.temperature_k) * scs_hz
        p_dl_re = db2pow(gnb.tx_power_dbm - 30.0) / self.n_sc  # W per RE
        self.p_ul_w = db2pow(cell.ue.tx_power_dbm - 30.0)
        g_dl = db2pow(cell.ue.rx_gain_db - pl)  # [n_ues]
        g_ul = db2pow(gnb.rx_gain_db - pl)
        self.amp_dl = np.sqrt(p_dl_re * g_dl / n_re_dl).astype(np.float32)  # [n_ues]
        # UL amplitude depends on the granted bandwidth: P_ue / (12 * n_prb)
        self._g_ul_over_n = g_ul / n_re_ul
        self.n_re_ul = n_re_ul

        # ---------------- CDL fading links (host-precomputed constants) -------
        profiles = [
            cell.cdl.delay_profile if cell.ue_los[u] else "CDL-A" for u in range(self.n_ues)
        ]  # updateCDLModels.m: LoS -> CDL-D(config), NLoS -> CDL-A
        ue_speed = cell.cdl.max_doppler_shift_hz * lam  # fd = v / lambda
        self.links_dl = [
            build_cdl_link(
                profiles[u], cell.cdl.delay_spread_ns, gnb.dl_carrier_freq,
                self.gnb_elems, self.ue_elems, ue_velocity=ue_speed,
                seed=cell.cdl.seed * 1000 + u,
            )
            for u in range(self.n_ues)
        ]
        self.links_ul = [
            build_cdl_link(
                profiles[u], cell.cdl.delay_spread_ns, gnb.ul_carrier_freq,
                self.ue_elems, self.gnb_elems, ue_velocity=ue_speed,
                seed=cell.cdl.seed * 1000 + 500 + u,
            )
            for u in range(self.n_ues)
        ]
        self.freqs = subcarrier_freqs(self.n_sc, scs_hz)
        self._sym_t = (
            self.info.symbol_starts(1, 0).astype(np.float64) / self.info.sample_rate
        )  # intra-slot symbol times [14]
        # stacked ray tensors: ONE fused device contraction per slot computes
        # every UE's H (the reference steps one nrCDLChannel per UE per slot)
        self._h_cache: dict = {}
        self._bl = {}
        for d, links in (("DL", self.links_dl), ("UL", self.links_ul)):
            bl = stack_links(links)
            L, n_rx, n_tx2, R = bl.coeff.shape
            self._bl[d] = {
                "ff": xfer.asarray(freq_phases(bl.tau, self.freqs)),  # [L, K, R]
                "c2": xfer.asarray(
                    bl.coeff.transpose(0, 3, 1, 2).reshape(L, R, n_rx * n_tx2)
                ),
                "nu": bl.nu,
                "nu_dev": jnp.asarray(bl.nu.astype(np.float32)),  # uploaded once
                "shape": (n_rx, n_tx2),
            }
        self._sym_t_dev = jnp.asarray(self._sym_t.astype(np.float32))
        # device-side slow-time phases on TPU only (see _h_slot_dev_jit)
        self._h_dev_path = jax.default_backend() == "tpu"

        # ---------------- protocol state --------------------------------------
        sch = cell.scheduling
        self.scheduler = Scheduler(
            self.n_ues,
            self.n_rb,
            strategy=sch.strategy,
            mcs_table=sch.mcs_table,
            rbg_config=sch.rbg_size_config,
            n_harq=gnb.num_harq,
            pf_weight=sch.pf_moving_avg_weight,
            max_rb_per_ue=sch.rb_allocation_limit_dl,
            slot_duration_s=self.carrier.slot_duration_s,
            max_rank=min(4, self.n_ue_ants, self.n_tx),
        )
        mk_rlc = (lambda: AMEntity()) if rlc_mode == "AM" else (lambda: UMEntity())
        # TWO-ENDED bearer per UE (the r1 loopback shared one object between
        # TX and RX — VERDICT #8 / ADVICE #2): the gNB-end entity transmits DL
        # SDUs and receives UL PDUs + DL STATUS; the UE-end entity the reverse
        # (amEntity objects per node, +rlcLayer/amEntity.m:324).
        self.rlc_gnb = [mk_rlc() for _ in range(self.n_ues)]
        self.rlc_ue = [mk_rlc() for _ in range(self.n_ues)]
        self.lcp_dl = [self._mk_lcp() for _ in range(self.n_ues)]
        self.lcp_ul = [self._mk_lcp() for _ in range(self.n_ues)]
        tp = cell.traffic
        self.traffic_dl = [
            make_traffic(tp.model, True, tp, tp.seed * 100 + u) for u in range(self.n_ues)
        ]
        self.traffic_ul = [
            make_traffic(tp.model, False, tp, tp.seed * 100 + 50 + u)
            for u in range(self.n_ues)
        ]
        self.pending: list[_PendingFeedback] = []
        self.rx_soft_bufs: dict = {}  # ('DL'|'UL', ue, harq_id) -> decoder buffers
        self.sb_size = subband_size(self.n_rb)
        self._sb_of_re = (np.arange(self.n_rb) // self.sb_size).astype(np.int64)
        # jitted CSI/SRS report composites: rank + every candidate-rank report
        # in ONE program (the r2 eager op chains were the engine's second
        # biggest host cost after per-grant dispatch)
        # rank cap = min(4, UE rx ants, gNB ports) — uePhy.m:899-906 caps at
        # 4; the r2-r4 engines clamped at 2 (VERDICT r4 Weak #4). The L<=2
        # MMSE fast plane path still serves the default 2-rx UEs; L in {3,4}
        # routes through the closed-form Hermitian inverse (ops/channel_est).
        _max_rank = min(4, self.n_ue_ants, self.n_tx)
        _sb = self._sb_of_re
        # multi-panel UPAs report against the Type-1 multi-panel codebook
        # (dlPMISelect.m:345, TS 38.214 §5.2.2.2.2); others single-panel
        _ng, _n1, _n2 = panel_config_for_antenna(gnb.antenna)

        def _csi_all(h):
            rank = ri_select(h, 1.0, max_rank=_max_rank)
            reports = tuple(
                cqi_select(h, 1.0, r, _n1, _n2, subband_of_re=_sb, ng=_ng)
                for r in range(1, _max_rank + 1)
            )
            return rank, reports

        def _srs_all(h):
            rank = ri_select(h, 1.0, max_rank=_max_rank)
            cands = tuple(
                ul_tpmi_select(h, 1.0, r, subband_of_re=_sb)
                for r in range(1, _max_rank + 1)
            )
            return rank, cands

        self._csi_all_jit = jax.jit(_csi_all)
        self._srs_all_jit = jax.jit(_srs_all)
        self.ng, self.n1, self.n2 = _ng, _n1, _n2
        self.fast_csi = fast_csi
        # PDSCH rate-matches around the transmitted CSI-RS REs on CSI-RS slots.
        # <=4 tx ports: the spec-shaped row-5 resource (setupCSIRS.m, TS 38.211
        # row 5: CDM-FD2 over symbols l0/l0+1) — the r2 engine left the 38.211
        # rows dead and always used the FDM layout (VERDICT r2 Weak #6).
        self.csirs_row5 = self.n_tx <= 4
        if self.csirs_row5:
            self.csirs_reserved = ((5, 0), (5, 1), (6, 0), (6, 1))
        else:
            self.csirs_reserved = csirs_fdm_reserved(self.n_tx)
        self.csi_period = max(
            int(round(sch.csi_report_period_ms * 1e-3 / self.carrier.slot_duration_s)), 1
        )
        self.bsr_period = sch.bsr_periodicity_slots
        self.srs_due = [3 + u // 4 for u in range(self.n_ues)]  # setupSRS.m offsets

        # ---------------- sensing accumulation --------------------------------
        if self.enable_sensing:
            # senTxGrid accumulation (gNBPhy.m:604-612): zeros on UL slots.
            # Kept ON DEVICE per DL slot (no per-slot host copy/sync — the r2
            # np.asarray here was one of the engine's blocking round-trips).
            self._sen_slots: dict = {}  # slot -> [n_tx, n_sym, n_sc] device
            self._sen_amp_law = np.float32(
                10 ** ((gnb.tx_power_dbm - 30) / 20.0)
            )  # * sqrt(nfft^2/(n_sc*n_tx)) applied lazily (needs info)
        # segment-fused execution (VERDICT r4 #1): run blocks of up to
        # `block_slots` slots of data plane as ONE dispatched program with one
        # packed fetch at the protocol-due boundary. 0/1 = per-slot dispatch.
        self.block_slots = int(block_slots)
        self._seg_fns: dict = {}  # segment signature -> jitted fused program
        self._prepacked: dict = {}  # due slot -> pre-packed fetch vector
        self._deferred: list = []  # device-side results awaiting their due slot
        self.metrics = CellMetrics(
            n_ues=self.n_ues,
            bandwidth_hz=gnb.dl_bandwidth,
            duration_s=self.num_slots * self.carrier.slot_duration_s,
        )
        # observability surfaces (schedulingLogger/phyLogger/gridVisualizer)
        self.sched_log = SchedulingLogger(self.num_slots, self.n_ues, self.n_rb)
        self.pcap = (
            MacPcapWriter(pcap_path, tdd=gnb.duplex_mode == "TDD")
            if pcap_path
            else None
        )
        self._cqi_walk = (
            CQIWalk(self.n_ues, self.n_rb, seed=seed + 17) if self.passthrough else None
        )

    # ------------------------------------------------------------------ setup

    def _mk_lcp(self) -> LCPState:
        st = LCPState()
        st.add(LogicalChannel(lcid=DEFAULT_LCID, priority=1))
        return st

    def _next_ul_slot(self, slot: int, min_gap: int = 2) -> int:
        """Earliest UL slot >= slot + min_gap (k1 semantics,
        schedulerEntity.m:2148-2171). FDD: every slot carries UL."""
        if self.fdd:
            return slot + min_gap
        for s in range(slot + min_gap, slot + min_gap + 2 * self.tdd.periodicity):
            if self.tdd.slot_type(s) == "U":
                return s
        return slot + min_gap

    def _ttis(self, n_sym_avail: int) -> list:
        """Slot -> TTI split for symbol-based scheduling with granularity
        {2,4,7} (proportionalFair.m:115-384). Slot-based: one full-length TTI.
        Sub-2-symbol tails are dropped (no room for DM-RS + data)."""
        if not self.symbol_sched:
            return [(0, n_sym_avail)]
        out = []
        s = 0
        while s < n_sym_avail:
            n = min(self.tti, n_sym_avail - s)
            if n >= 2:
                out.append((s, n))
            s += n
        return out

    def _slot_key(self, slot: int, salt: int) -> jax.Array:
        """Deterministic per-(slot, salt) PRNG key derived ON HOST (the r2
        fold_in chain cost two eager device dispatches per draw)."""
        ss = np.random.SeedSequence([self._seed, slot, salt])
        return jnp.asarray(ss.generate_state(2).astype(np.uint32))

    # ------------------------------------------------------------- channel ops

    def _h_slot(self, slot: int, direction: str) -> jnp.ndarray:
        """All-UE channel for one slot, [L, 14, n_sc, n_rx, n_tx] (cached)."""
        key = (slot, direction)
        if key not in self._h_cache:
            if len(self._h_cache) > 4:
                self._h_cache.clear()
            b = self._bl[direction]
            n_rx, n_tx = b["shape"]
            if self._h_dev_path:
                # phases built on device from the once-uploaded Dopplers:
                # one dispatch, no per-slot complex H2D
                self._h_cache[key] = _h_slot_dev_jit(
                    b["nu_dev"], self._sym_t_dev,
                    np.float32(slot * self.carrier.slot_duration_s),
                    b["ff"], b["c2"], self.n_sc, n_rx, n_tx,
                )
            else:
                t = slot * self.carrier.slot_duration_s + self._sym_t
                ft = xfer.asarray(time_phases(b["nu"], t))  # [L, 14, R]
                self._h_cache[key] = _h_slot_jit(
                    ft, b["ff"], b["c2"], self.n_sc, n_rx, n_tx
                )
        return self._h_cache[key]

    def _h_dl(self, ue: int, slot: int) -> jnp.ndarray:
        return self._h_slot(slot, "DL")[ue]

    def _h_ul(self, ue: int, slot: int) -> jnp.ndarray:
        return self._h_slot(slot, "UL")[ue]

    def _noise(self, shape, key) -> jnp.ndarray:
        kr, ki = jax.random.split(key)
        return (
            jax.random.normal(kr, shape, jnp.float32)
            + 1j * jax.random.normal(ki, shape, jnp.float32)
        ).astype(jnp.complex64) * np.float32(np.sqrt(0.5))

    # ---------------------------------------------------------------- MAC/RLC

    def _rlc_buffer(self, rlc) -> int:
        """Buffer-status incl. a pending AM STATUS PDU (it needs grant bytes
        on the reverse link even when no data waits)."""
        n = rlc.buffer_status()
        if getattr(rlc, "status_trigger", False):
            n += 16
        return n

    def _build_tb(self, ue: int, direction: str, tbs_bits: int,
                  grant: Grant | None = None) -> tuple:
        """LCP + RLC PDUs + MAC multiplexing -> (tb_bits int8 array, sdu_bytes).

        The transmitting end's AM STATUS PDU (acknowledging the REVERSE
        direction's data) rides first in-band on the same logical channel —
        the reference's control-PDU-over-the-bearer path."""
        tb_bytes = tbs_bits // 8
        rlc = (self.rlc_gnb if direction == "DL" else self.rlc_ue)[ue]
        lcp = (self.lcp_dl if direction == "DL" else self.lcp_ul)[ue]
        # conservative MAC subheader reserve: 3 bytes per ~1400-byte PDU + slack
        budget = max(tb_bytes - 3 * (2 + tb_bytes // 1400) - 2, 0)
        pdus = []
        if budget > 4 and hasattr(rlc, "status_pdu"):
            # budget-bounded STATUS (the reference passes remainingGrant into
            # constructStatusPDU); status_pdu truncates ACK_SN-correctly and
            # keeps the trigger armed for the remainder, so the grant can
            # never be overrun by an SO-NACK-heavy STATUS.
            sp = rlc.status_pdu(budget=budget)
            if sp is not None:
                pdus.append(sp)
                budget -= len(sp)
        served = lcp.allocate(budget, {DEFAULT_LCID: rlc.buffer_status()})
        if budget > 0:
            pdus += rlc.send_pdus(served.get(DEFAULT_LCID, 0))
        sdus = [(DEFAULT_LCID, p) for p in pdus]
        pdu = build_mac_pdu(sdus, tb_bytes)
        if self.pcap is not None and grant is not None:
            # nrPCAPWriter path (gNBPhy.m logPackets:1082-1115)
            self.pcap.write(
                pdu, rnti=grant.rnti, ueid=ue, harq_id=grant.harq_id,
                frame=grant.slot // self.carrier.slots_per_frame,
                slot=grant.slot % self.carrier.slots_per_frame,
                is_dl=direction == "DL",
                t_s=grant.slot * self.carrier.slot_duration_s,
            )
        if direction == "DL":
            # the gNB sees its own queues instantly (node.m RLC<->MAC glue);
            # without this, each later TTI in the slot re-grants the drained
            # backlog and pads the TB
            self.scheduler.update_buffer(ue, "DL", self._rlc_buffer(rlc))
        bits = np.unpackbits(np.frombuffer(pdu, np.uint8))[:tbs_bits]
        # host array: batched transmit stacks TBs on host, ONE device transfer
        return bits.astype(np.int8), sum(len(p) for p in pdus)

    def _deliver_tb(self, ue: int, direction: str, tb_bits: np.ndarray):
        """Receiver MAC/RLC at the PEER end: parse PDU, reassemble SDUs (and
        dispatch in-band STATUS to the entity's TX side), count goodput."""
        by = np.packbits(np.asarray(tb_bits, np.uint8))
        parsed = parse_mac_pdu(bytes(by.tobytes()))
        rlc = (self.rlc_ue if direction == "DL" else self.rlc_gnb)[ue]
        for lcid, pdu in parsed["sdus"]:
            for sdu in rlc.receive_pdu(pdu):
                self.metrics.on_sdu_delivered(direction, ue, len(sdu))

    def _tick_1ms(self, ms: float = 1.0):
        """APP traffic generation + RLC/LCP timers (node.m advanceTimer:359-384)."""
        for u in range(self.n_ues):
            for pkt in self.traffic_dl[u].generate(ms):
                self.rlc_gnb[u].enqueue_sdu(pkt)
            for pkt in self.traffic_ul[u].generate(ms):
                self.rlc_ue[u].enqueue_sdu(pkt)
            self.lcp_dl[u].tick_1ms()
            self.lcp_ul[u].tick_1ms()
            self.rlc_gnb[u].tick_1ms()
            self.rlc_ue[u].tick_1ms()
            # gNB sees its own DL RLC queues directly (node.m RLC<->MAC glue)
            self.scheduler.update_buffer(u, "DL", self._rlc_buffer(self.rlc_gnb[u]))

    # --------------------------------------------------------------- feedback

    def _collect_due(self, slot: int):
        """Pop due deferred entries and list their device leaves (for the
        single packed fetch). A network driver collects EVERY cell's leaves
        first and fetches them together — one RTT per slot for the whole
        network instead of one per cell."""
        due = [e for e in self._deferred if e["due"] <= slot]
        if not due:
            return [], [], []
        self._deferred = [e for e in self._deferred if e["due"] > slot]
        leaves, flags = _due_leaves(due)
        return due, leaves, flags

    def _materialize_due(self, slot: int):
        """Sync device-side results whose protocol due slot has arrived.

        The r2 engine forced a host<->device round-trip per grant inside the
        slot loop (`bool(out['crc_ok'])`); here every CRC/CSI/SRS result stays
        an async device value until the slot its feedback would reach the
        scheduler anyway (k1 for DL HARQ, next slot for UL / SRS), so the
        device pipeline runs ahead of the host control plane. ONE packed
        device->host fetch covers every due result this slot (the relay's
        ~27 ms per-fetch RTT made per-entry np.asarray calls the engine's
        dominant cost — r4 slope profile)."""
        due, leaves, flags = self._collect_due(slot)
        if not due:
            return
        pp = self._prepacked.get(slot)
        if pp is not None and pp["ids"] == tuple(map(id, due)):
            # segment pre-pack hit: one round trip, no pack dispatch
            host = iter(_unpack_flat(np.asarray(pp["packed"]),
                                     pp["shapes"], pp["flags"]))
        else:
            host = iter(_fetch_packed(leaves, flags))
        if self._prepacked:
            self._prepacked = {d: v for d, v in self._prepacked.items()
                               if d > slot}
        self._consume_due(slot, due, host)

    def _consume_due(self, slot: int, due: list, host):
        unpacked_shares: list = []
        for e in due:  # unpack mirrors the pack loop's interleaved order
            kind = e["kind"]
            if kind in ("dl", "ul"):
                sh = e["share"]
                if sh["np"] is None and not any(s is sh for s in unpacked_shares):
                    unpacked_shares.append(sh)
                    sh["np"] = {
                        "crc_ok": next(host) > 0.5,
                        "tb": np.rint(next(host)).astype(np.int8),
                        "sinr_db": next(host),
                    }
            elif kind == "csi":
                e["rank_host"] = int(np.rint(next(host)).reshape(-1)[0])
                e["reports_host"] = [
                    {"cqi_sb": np.rint(next(host)).astype(np.int64),
                     "pmi_sb": np.rint(next(host)).astype(np.int64)}
                    for _ in e["reports"]
                ]
            elif kind == "srs":
                e["rank_host"] = int(np.rint(next(host)).reshape(-1)[0])
                e["cands_host"] = [
                    (int(np.rint(next(host)).reshape(-1)[0]), next(host))
                    for _ in e["cands"]
                ]
        for e in due:
            kind = e["kind"]
            if kind in ("dl", "ul"):
                g, share, i = e["g"], e["share"], e["i"]
                d = "DL" if kind == "dl" else "UL"
                ok = bool(share["np"]["crc_ok"][i])
                self.metrics.on_crc(d, g.ue, g.tbs, ok)
                self.sched_log.log_crc(g.slot, d, g.ue, ok)
                bkey = (d, g.ue, g.harq_id)
                if ok:
                    self._deliver_tb(g.ue, d, share["np"]["tb"][i])
                    self.rx_soft_bufs.pop(bkey, None)
                else:
                    # device slice only on NACK (rare at the design BLER)
                    self.rx_soft_bufs[bkey] = _take_jit(
                        share["outs"]["soft_buffers"], i
                    )
                res = self.scheduler.harq_feedback(g.ue, d, g.harq_id, ok)
                if res == "drop":
                    self.metrics.on_harq_drop(d, g.ue)
                    self.rx_soft_bufs.pop(bkey, None)
                if self.cell.log.enable_traces:
                    self.metrics.log_slot(
                        g.slot, dir=d, ue=g.ue, mcs=g.mcs, n_prb=len(g.prb_set),
                        tbs=g.tbs, crc=ok,
                        sinr_db=float(share["np"]["sinr_db"][i]), rv=g.rv,
                    )
            elif kind == "csi":
                rank = e["rank_host"]
                rep = e["reports_host"][rank - 1]
                cqi_rb = rep["cqi_sb"][self._sb_of_re]
                self.scheduler.update_dl_csi(
                    e["ue"], cqi_rb, rank, rep["pmi_sb"]
                )
                self.sched_log.log_csi(slot, "DL", e["ue"], cqi_rb)
            elif kind == "srs":
                rank = e["rank_host"]
                tpmi, sinr_db_sb = e["cands_host"][rank - 1]
                # host-side threshold map (the fetched SINR is numpy now; an
                # eager device op here would poison the relay session)
                cqi_sb = np.sum(
                    sinr_db_sb[..., None] >= SINR_TO_CQI_UL[None, :], axis=-1
                ).astype(np.int64)
                cqi_rb = cqi_sb[self._sb_of_re]
                self.scheduler.update_ul_csi(e["ue"], cqi_rb, rank, tpmi)
                self.sched_log.log_csi(slot, "UL", e["ue"], cqi_rb)

    def _process_due(self, slot: int):
        due = [p for p in self.pending if p.due_slot <= slot]
        self.pending = [p for p in self.pending if p.due_slot > slot]
        for p in due:
            if p.kind == "harq_dl":
                res = self.scheduler.harq_feedback(
                    p.ue, "DL", p.payload["harq_id"], p.payload["ack"]
                )
                if res == "drop":
                    self.metrics.on_harq_drop("DL", p.ue)
                    self.rx_soft_bufs.pop(("DL", p.ue, p.payload["harq_id"]), None)
            elif p.kind == "csi":
                self.scheduler.update_dl_csi(
                    p.ue, p.payload["cqi_rb"], p.payload["rank"], p.payload["pmi_sb"]
                )
                self.sched_log.log_csi(slot, "DL", p.ue, p.payload["cqi_rb"])

    # ------------------------------------------------------------------- CSI

    def _queue_csi(self, ue: int, slot: int, h_meas: jnp.ndarray):
        """rank/PMI/CQI selection on a per-PRB channel measurement [n_rb, n_rx,
        n_ports] (cqiSelect/riSelect/dlPMISelect tail). All candidate-rank
        reports are ENQUEUED on device now (async); the report is synced and
        handed to the scheduler at its out-of-band due slot (ueMAC.m:747-768),
        so no host round-trip happens inside the slot loop."""
        rank_dev, reports = self._csi_all_jit(h_meas)
        self._deferred.append({
            "due": self._next_ul_slot(slot), "kind": "csi", "ue": ue,
            "rank_dev": rank_dev, "reports": reports,
        })

    def _csirs_measure(self, ue: int, slot: int):
        """fast_csi path: measured channel = truth at CSI-RS REs + estimation
        noise at the per-RE SNR (the r1 bootstrap shortcut, kept behind the
        fast_csi flag)."""
        sc = np.arange(self.n_rb) * 12 + 6
        h_meas = _meas_noise_jit(
            self._h_slot(slot, "DL"), ue, jnp.asarray(sc),
            np.float32(self.amp_dl[ue]), self._slot_key(slot, 1000 + ue), 2,
        )
        self._queue_csi(ue, slot, h_meas)

    def _csirs_measure_rx(self, ue: int, rx_all: jnp.ndarray, slot: int):
        """UE-side CSI-RS measurement from the RECEIVED grid (uePhy.m:757-933):
        LS at the transmitted FDM CSI-RS REs -> rank/PMI/CQI. rx_all is the
        all-UE tensor; the per-UE selection happens inside the program."""
        if self.csirs_row5:
            h_meas, _ = csirs_estimate_ports(
                rx_all, slot % self.carrier.slots_per_frame,
                self.cell.gnb.cell_id, self.n_rb, row=5, ue_index=ue,
            )
        else:
            h_meas = csirs_estimate_fdm(
                rx_all, slot % self.carrier.slots_per_frame,
                self.cell.gnb.cell_id, self.n_rb, self.n_tx, ue_index=ue,
            )
        self._queue_csi(ue, slot, h_meas)

    def _srs_csi_update(self, ue: int, slot: int, h_meas: jnp.ndarray):
        """Defer like _queue_csi: UL CSI reaches the scheduler one slot after
        the sounding slot (gNB-local processing delay), synced then."""
        rank_dev, cands = self._srs_all_jit(h_meas)
        self._deferred.append({
            "due": slot + 1, "kind": "srs", "ue": ue,
            "rank_dev": rank_dev, "cands": cands,
        })

    def _srs_measure(self, ue: int, slot: int):
        """fast_csi path: truth + noise at sampled SRS REs."""
        sc = np.arange(0, self.n_sc, 12)  # sampled comb positions (1 per PRB)
        amp = np.sqrt(self.p_ul_w / (self.n_sc / 4.0) * self._g_ul_over_n[ue]).astype(
            np.float32
        )
        h_meas = _meas_noise_jit(  # [K, n_rx=gnb, n_tx=ue]
            self._h_slot(slot, "UL"), ue, jnp.asarray(sc), amp,
            self._slot_key(slot, 2000 + ue), 13,
        )
        self._srs_csi_update(ue, slot, h_meas)

    def _plan_srs(self, ues: list) -> dict:
        """Host-built SRS grids + amplitudes for the sounding UEs (setupSRS.m
        comb offsets; no device dispatch)."""
        grids = []
        amps = []
        for u in ues:
            g = np.zeros((self.n_ue_ants, 14, self.n_sc), np.complex64)
            g, _ = srs_fill_grid(g, self.n_rb, symbol=13, comb=4, comb_offset=u % 4)
            grids.append(g)
            amps.append(np.sqrt(self.p_ul_w / (self.n_sc / 4.0) * self._g_ul_over_n[u]))
        return {"ues": list(ues), "grids": np.stack(grids),
                "amps": np.asarray(amps, np.float32)}

    def _srs_slot(self, slot: int, ues: list):
        """Transmitted-SRS path (gNBPhy.m srsRxProcessing:983-1062): every
        sounding UE's comb-4 SRS rides symbol 13 (distinct comb offsets keep
        up to 4 UEs orthogonal, setupSRS.m); the gNB receives the SUM and
        estimates each UE from its comb (delay-domain port separation +
        per-PRB averaging, ops/srs.py)."""
        plan = self._plan_srs(ues)
        rx = _srs_rx_sum_jit(
            xfer.asarray(plan["grids"]), self._h_slot(slot, "UL"),
            np.asarray(ues, np.int32), plan["amps"],
            self._slot_key(slot, 2500),
        )
        for u in ues:
            h_prb, _ = srs_estimate_ports(
                rx, self.n_rb, self.n_ue_ants, symbol=13, comb=4,
                comb_offset=u % 4, per_prb=True,
            )  # [n_rb, n_rx_gnb, n_ue_ports]
            self._srs_csi_update(u, slot, h_prb)

    # ----------------------------------------------------------------- grants

    def _dl_precoder(self, grant: Grant) -> jnp.ndarray:
        """Per-canonical-PRG precoders from the reported subband PMI
        (selectRankAndPrecodingMatrixDL, schedulerEntity.m:2482-2546).

        PRGs pair the grant's ALLOCATED PRBs in sorted order (the compact-grid
        convention, phy/chains.py); each PRG uses the PMI of the subband its
        first PRB falls in. No report yet -> layer-to-port identity."""
        if not grant.pmi_sb:
            return np.eye(self.n_tx, grant.n_layers, dtype=np.complex64)
        if self.ng > 1:
            cb = type1_multipanel_codebook(self.ng, self.n1, self.n2, grant.n_layers)
        else:
            cb = type1_codebook(self.n1, self.n2, grant.n_layers)
        pmi_sb = np.asarray(grant.pmi_sb, np.int64) % cb.shape[0]
        prbs = np.asarray(grant.prb_set, np.int64)
        first_prb = prbs[0::2]  # canonical PRG anchors
        prg_to_sb = np.minimum(first_prb // self.sb_size, len(pmi_sb) - 1)
        return cb[pmi_sb[prg_to_sb]]  # host [n_prg, n_ports, L]

    def _sch_grant(self, g: Grant, n_sym: int, reserved: tuple = ()) -> SCHGrant:
        return SCHGrant(
            rnti=g.rnti,
            n_id=self.cell.gnb.cell_id,
            slot=g.slot % self.carrier.slots_per_frame,
            prb_set=tuple(g.prb_set),
            n_prb=len(g.prb_set),
            sym_start=g.sym_start,
            n_sym=n_sym,
            mcs_table=self.scheduler.mcs_table,
            mcs=g.mcs,
            n_layers=g.n_layers,
            rv=g.rv,
            n_sc_grid=self.n_sc,
            direction=g.direction,
            reserved_per_prb=reserved,
        )

    # -------------------------------------------------------------- slot steps

    def _prepare_tx(self, g: Grant, harq, n_sym: int, reserved: tuple = ()):
        """Resolve the exact grant layout + TB payload for one grant.

        The scheduler's TBS uses the reference's DM-RS overhead approximation
        (sendMACPDU, gNBMAC.m:869); here it is reconciled with the exact RE
        layout so the transport chain always sees a consistent size. Returns
        (sch_grant, tb) or None if the grant is infeasible (e.g. a retx whose
        stored TB cannot fit the new layout — dropped, HARQ freed)."""
        stored = harq.payload.get((g.ue, g.harq_id))
        if g.is_retx and stored is not None:
            g.n_layers = stored["n_layers"]
            g.pmi_sb = stored.get("pmi_sb", g.pmi_sb)
            g.tpmi = stored.get("tpmi", g.tpmi)
        sg = self._sch_grant(g, n_sym, reserved)
        true_tbs = grant_tbs(sg)
        if true_tbs <= 0:
            if not g.is_retx:
                # the scheduler already claimed the process — free it or it
                # leaks forever (no feedback is ever queued; ADVICE r1 #5)
                harq.feedback(g.ue, g.harq_id, ack=True)
            return None
        if g.is_retx and stored is not None:
            if int(stored["tb"].shape[0]) != true_tbs:
                # layout changed across slot formats; abandon this HARQ process
                harq.feedback(g.ue, g.harq_id, ack=True)
                self.rx_soft_bufs.pop((g.direction, g.ue, g.harq_id), None)
                self.metrics.on_harq_drop(g.direction, g.ue)
                return None
            g.tbs = true_tbs
            return sg, stored["tb"]
        g.tbs = true_tbs
        harq.tbs[g.ue, g.harq_id] = true_tbs
        tb, _ = self._build_tb(g.ue, g.direction, true_tbs, grant=g)
        harq.payload[(g.ue, g.harq_id)] = {
            "tb": tb, "n_layers": g.n_layers, "pmi_sb": g.pmi_sb, "tpmi": g.tpmi,
        }
        return sg, tb

    def _passthrough_slot(self, slot: int, direction: str, n_sym: int):
        """Statistical PHY slot (gNBPassThroughPhy.m): same scheduler/HARQ/RLC
        path, CRC by Bernoulli draw from the CQI/MCS margin, zero device work."""
        grants = self.scheduler.schedule_slot(slot, direction, n_sym=n_sym)
        harq = self.scheduler.harq_dl if direction == "DL" else self.scheduler.harq_ul
        for g in grants:
            prep = self._prepare_tx(g, harq, n_sym)
            if prep is None:
                continue
            _, tb = prep
            self.metrics.on_tx(direction, g.ue, g.tbs, g.is_retx)
            self.sched_log.log_grant(
                slot, direction, g.ue, g.prb_set, g.mcs, g.tbs, g.rv,
                g.harq_id, g.n_layers, g.is_retx,
            )
            u = self.scheduler.ues[g.ue]
            cqi = u.dl_cqi_rb if direction == "DL" else u.ul_cqi_rb
            avg_cqi = float(np.mean(cqi[list(g.prb_set)]))
            ok = passthrough_crc(
                self.rng, g.mcs, avg_cqi,
                int(harq.tx_count[g.ue, g.harq_id]), self.scheduler.mcs_table,
            )
            self.metrics.on_crc(direction, g.ue, g.tbs, ok)
            self.sched_log.log_crc(slot, direction, g.ue, ok)
            if ok:
                self._deliver_tb(g.ue, direction, np.asarray(tb))
            if direction == "DL":
                self.pending.append(
                    _PendingFeedback(
                        due_slot=self._next_ul_slot(slot), kind="harq_dl",
                        ue=g.ue, payload={"harq_id": g.harq_id, "ack": ok},
                    )
                )
            else:
                res = self.scheduler.harq_feedback(g.ue, "UL", g.harq_id, ok)
                if res == "drop":
                    self.metrics.on_harq_drop("UL", g.ue)

    def _dl_slot(self, slot: int, n_sym: int, csi_slot: bool = False):
        """Single-cell DL slot = tx phase then rx phase (no interference)."""
        st = self._dl_tx_phase(slot, n_sym, csi_slot)
        if st is not None:
            self._dl_rx_phase(slot, csi_slot, st)

    def _dl_tx_phase(self, slot: int, n_sym: int, csi_slot: bool = False):
        """Schedule + build this cell's transmitted port grid.

        Returns a state dict {groups, port_grid, n_sym} for _dl_rx_phase, or
        None when the slot carries nothing (passthrough handles itself). Split
        so a network driver can collect EVERY co-channel cell's grid before
        any receiver runs — the inter-cell interference step the reference's
        parfeval isolation structurally cannot do (networkSimulation.m:44-55).
        """
        plan = self._plan_dl(slot, n_sym, csi_slot)
        if plan is None:
            return None
        return self._apply_dl_tx(plan)

    def _plan_dl(self, slot: int, n_sym: int, csi_slot: bool = False):
        """HOST half of the DL tx phase: scheduling, TB building, CSI-RS grid
        construction — no device dispatch. Returns a plan dict consumed either
        by _apply_dl_tx (per-slot jits) or by the fused segment program
        (sim/block.py), or None for passthrough (handled inline)."""
        if self.passthrough:
            self._passthrough_slot(slot, "DL", n_sym)
            if csi_slot:
                # emulated CQI variation (uePassThroughPhy.m), via the normal
                # out-of-band report path with k1 latency
                for u in range(self.n_ues):
                    self.pending.append(
                        _PendingFeedback(
                            due_slot=self._next_ul_slot(slot), kind="csi", ue=u,
                            payload={
                                "cqi_rb": self._cqi_walk.report(u), "rank": 1,
                                "pmi_sb": np.zeros(max(self.n_rb // 4, 1), np.int32),
                            },
                        )
                    )
            return None
        harq = self.scheduler.harq_dl
        reserved = self.csirs_reserved if (csi_slot and not self.fast_csi) else ()
        # group same-layout grants -> ONE vmapped XLA program per signature
        # (VERDICT r2 #2; the reference's serial UE loop cellSimulation.m:161).
        # Symbol-based scheduling splits the slot into TTIs (proportionalFair.m
        # :115-384); each TTI is scheduled separately, all grants share the
        # slot grid (disjoint symbol ranges -> disjoint layouts).
        groups: dict = {}
        for ss, ns in self._ttis(n_sym):
            for g in self.scheduler.schedule_slot(slot, "DL", n_sym=ns, sym_start=ss):
                prep = self._prepare_tx(g, harq, ns, reserved)
                if prep is None:
                    continue
                sg, tb = prep
                w = self._dl_precoder(g)
                wk = "wideband" if w.ndim == 2 else "prg"
                groups.setdefault((sg.layout_key(), wk), []).append((g, sg, tb, w))
                self.metrics.on_tx("DL", g.ue, g.tbs, g.is_retx)
                self.sched_log.log_grant(
                    slot, "DL", g.ue, g.prb_set, g.mcs, g.tbs, g.rv, g.harq_id,
                    g.n_layers, g.is_retx, sym_start=ss, n_sym=ns,
                )
        csirs_np = None
        if csi_slot and not self.fast_csi:
            if self.csirs_row5:
                g0 = np.zeros((self.n_tx, 14, self.n_sc), np.complex64)
                g0, _ = csirs_fill_grid(
                    g0, slot % self.carrier.slots_per_frame,
                    self.cell.gnb.cell_id, self.n_rb, row=5,
                )
                csirs_np = g0
            else:
                csirs_np = csirs_fill_fdm(
                    slot % self.carrier.slots_per_frame, self.cell.gnb.cell_id,
                    self.n_rb, self.n_tx, self.n_sc,
                )
        return {"slot": slot, "n_sym": n_sym, "csi_slot": csi_slot,
                "groups": groups, "csirs_np": csirs_np}

    def _sen_amp(self, n_sym: int) -> np.float32:
        """Sensing accumulation amplitude law (gNBPhy.m:592)."""
        return self._sen_amp_law * np.float32(
            np.sqrt(self.info.nfft**2 / (self.n_sc * self.n_tx))
        )

    def _apply_dl_tx(self, plan: dict):
        """DEVICE half of the DL tx phase, per-slot jit dispatch path."""
        slot, n_sym, csi_slot = plan["slot"], plan["n_sym"], plan["csi_slot"]
        groups = plan["groups"]
        port_grid = None
        for items in groups.values():
            if len(items) == 1:
                g, sg, tb, w = items[0]
                grid_u, _ = sch_transmit(tb, sg, w=w)
            else:
                grid_u = sch_transmit_batch(
                    [tb for _, _, tb, _ in items],
                    [sg for _, sg, _, _ in items],
                    [w for _, _, _, w in items],
                )
            port_grid = grid_u if port_grid is None else _add_jit(port_grid, grid_u)

        if plan["csirs_np"] is not None:
            # transmit the CSI-RS through the same grid: PDSCH rate-matches
            # around it (reserved REs), the UEs estimate from it, and — unlike
            # the reference's pure-PDSCH radar illumination — the sensing
            # accumulator gets beam-independent full-rank port excitation
            # (uePhy.m:757-933; gNBPhy.m:583-588)
            csirs = xfer.asarray(plan["csirs_np"])  # host complex -> relay-safe
            port_grid = csirs if port_grid is None else _add_jit(port_grid, csirs)

        if port_grid is None:
            if csi_slot and self.fast_csi:  # truth-based CSI needs no grid
                for u in range(self.n_ues):
                    self._csirs_measure(u, slot)
            return None
        if self.enable_sensing:
            # accumulate ON DEVICE with the reference amplitude law
            # (gNBPhy.m:592); no host copy until the sensing post-pass
            self._sen_slots[slot] = _sen_slice_jit(
                port_grid, self._sen_amp(n_sym), n_sym
            )
        return {"groups": groups, "port_grid": port_grid, "n_sym": n_sym}

    def _dl_rx_phase(self, slot: int, csi_slot: bool, st: dict,
                     ext: jnp.ndarray | None = None):
        """Receive every UE's grid (serving signal + optional external
        interference term `ext` [n_ues, n_rx, 14, n_sc], e.g. other cells'
        co-channel DL — phyRxBuffer.m:224-225 summation generalized across
        cells) and decode this cell's grants."""
        groups, port_grid = st["groups"], st["port_grid"]
        # ALL UEs' received grids in ONE dispatch: the slot channel tensor is
        # already all-UE ([L, 14, K, rx, tx]); einsum + noise fuse on device
        if ext is None:
            rx_all = _rx_all_dl_jit(
                port_grid,
                self._h_slot(slot, "DL"),
                jnp.asarray(self.amp_dl),
                self._slot_key(slot, 7),
            )  # [n_ues, n_rx, 14, n_sc]
        else:
            rx_all = _rx_all_dl_ext_jit(
                port_grid,
                self._h_slot(slot, "DL"),
                jnp.asarray(self.amp_dl),
                ext,
                self._slot_key(slot, 7),
            )

        for items in groups.values():
            gs = [g for g, _, _, _ in items]
            sgs = [sg for _, sg, _, _ in items]
            bufs = [
                self.rx_soft_bufs.get(("DL", g.ue, g.harq_id)) if g.is_retx else None
                for g in gs
            ]
            outs = sch_receive_batch(
                rx_all, sgs, bufs, n_ldpc_iter=self.n_ldpc_iter,
                rx_indices=[g.ue for g in gs],
            )
            # results stay on device until the ACK/NACK due slot
            # (ueMAC.m:590-613 k1 timing == the earliest the host needs them)
            share = {"outs": outs, "np": None}
            for i, g in enumerate(gs):
                self._deferred.append({
                    "due": self._next_ul_slot(slot), "kind": "dl", "g": g,
                    "share": share, "i": i,
                })

        if csi_slot:
            # every UE measures CSI this slot, granted or not
            for u in range(self.n_ues):
                if self.fast_csi:
                    self._csirs_measure(u, slot)
                else:
                    self._csirs_measure_rx(u, rx_all, slot)

    def _ul_slot(self, slot: int, n_sym: int):
        """Single-cell UL slot = tx phase then rx phase (no interference)."""
        st = self._ul_tx_phase(slot, n_sym)
        if st is not None:
            self._ul_rx_phase(slot, st)

    def _ul_tx_phase(self, slot: int, n_sym: int):
        """Schedule + build every granted UE's UL port grid.

        Returns {groups, all_items, all_grids} for _ul_rx_phase, or None.
        Split (like the DL tx/rx phases) so a network driver can collect
        every co-channel cell's UL transmissions before any gNB receives —
        enabling inter-cell UL interference, which the reference does not
        model at all (networkSimulation.m:44-55 parfeval isolation)."""
        plan = self._plan_ul(slot, n_sym)
        if plan is None:
            return None
        return self._apply_ul_tx(plan)

    def _plan_ul(self, slot: int, n_sym: int):
        """HOST half of the UL tx phase: scheduling + TB building, no device
        dispatch. Returns {slot, groups} or None (nothing granted /
        passthrough handled inline)."""
        if self.passthrough:
            self._passthrough_slot(slot, "UL", n_sym)
            return None
        harq = self.scheduler.harq_ul
        groups: dict = {}
        for ss, ns in self._ttis(n_sym):
            for g in self.scheduler.schedule_slot(slot, "UL", n_sym=ns, sym_start=ss):
                prep = self._prepare_tx(g, harq, ns)
                if prep is None:
                    continue
                sg, tb = prep
                self.metrics.on_tx("UL", g.ue, g.tbs, g.is_retx)
                self.sched_log.log_grant(
                    slot, "UL", g.ue, g.prb_set, g.mcs, g.tbs, g.rv, g.harq_id,
                    g.n_layers, g.is_retx, sym_start=ss, n_sym=ns,
                )
                cb = pusch_codebook(self.n_ue_ants, g.n_layers)
                w = cb[g.tpmi % cb.shape[0]]  # host
                groups.setdefault(sg.layout_key(), []).append((g, sg, tb, w))
        if not groups:
            return None
        return {"slot": slot, "groups": groups}

    def _apply_ul_tx(self, plan: dict):
        """DEVICE half of the UL tx phase, per-slot jit dispatch path."""
        groups = plan["groups"]
        # per-grant port grids (vmapped within a layout group), then ONE
        # stacked channel+noise dispatch over all granted UEs
        all_items, all_grids = [], []
        for items in groups.values():
            if len(items) == 1:
                g, sg, tb, w = items[0]
                grid_u, _ = sch_transmit(tb, sg, w=w)
                grids = [grid_u]
            else:
                grids = list(_ul_tx_batch(items))
            all_items.extend(items)
            all_grids.extend(grids)
        return {"groups": groups, "all_items": all_items, "all_grids": all_grids}

    def _ul_rx_phase(self, slot: int, st: dict, ext: jnp.ndarray | None = None):
        """Receive all granted uplinks (+ optional external co-channel UL
        interference ext [n_rx, 14, n_sc]) and decode."""
        groups, all_items, all_grids = st["groups"], st["all_items"], st["all_grids"]
        h_all = self._h_slot(slot, "UL")
        ue_idx = np.asarray([g.ue for g, _, _, _ in all_items], np.int32)
        # UE power concentrates on the granted PRBs (P_ue / n_alloc_re)
        amps = np.asarray(
            [
                np.sqrt(self.p_ul_w / (12.0 * len(g.prb_set)) * self._g_ul_over_n[g.ue])
                for g, _, _, _ in all_items
            ],
            np.float32,
        )
        if ext is None:
            rx_all = _rx_ul_batch_jit(
                tuple(all_grids), h_all, ue_idx, amps, self._slot_key(slot, 9)
            )  # [n_grants, n_rx, 14, n_sc]
        else:
            rx_all = _rx_ul_batch_ext_jit(
                tuple(all_grids), h_all, ue_idx, amps, ext, self._slot_key(slot, 9)
            )
        pos = 0
        for items in groups.values():
            gs = [g for g, _, _, _ in items]
            sgs = [sg for _, sg, _, _ in items]
            bufs = [
                self.rx_soft_bufs.get(("UL", g.ue, g.harq_id)) if g.is_retx else None
                for g in gs
            ]
            outs = sch_receive_batch(
                rx_all, sgs, bufs, n_ldpc_iter=self.n_ldpc_iter,
                rx_indices=list(range(pos, pos + len(gs))),
            )
            pos += len(gs)
            # UL CRC is gNB-local (gNBMAC handleULRxResult): one-slot
            # processing delay before it shapes the next scheduling decision
            share = {"outs": outs, "np": None}
            for i, g in enumerate(gs):
                self._deferred.append({
                    "due": slot + 1, "kind": "ul", "g": g,
                    "share": share, "i": i,
                })

    # --------------------------------------------------------------- sensing

    def run_sensing(self) -> dict:
        """Post-pass: accumulated DL waveform -> echo -> RDM -> CFAR -> DoA ->
        RMSE (cellSimulation.m:189-202, §3.5)."""
        cell = self.cell
        params = derive_radar_params(
            cell.gnb,
            self.carrier,
            cell.target_positions,
            np.asarray(cell.target.rcs_m2, np.float64),
            np.asarray(cell.target.velocity_ms, np.float64),
            self.num_slots,
        )
        # est_algorithm is WIRED (radar.m:19; the reference ignores it at
        # cellSimulation.m:197 — deliberate fix per SURVEY §7.4 #8)
        algo = cell.gnb.radar.est_algorithm.upper()
        if algo not in ("FFT", "MUSIC"):
            raise ValueError(f"est_algorithm must be FFT|MUSIC, got {algo!r}")
        cfg = make_cfar_config(params)
        starts = tuple(sorted(self._sen_slots))
        widths = tuple(int(self._sen_slots[st].shape[1]) for st in starts)
        los = np.asarray(cell.target_los, bool)
        key = self._slot_key(10**6, 0)
        doa = self.doa_method
        info, n_tx, n_sc, n_slots = self.info, self.n_tx, self.n_sc, self.num_slots
        # ONE jitted program: grid reassembly -> OFDM -> echo -> (RDM ->
        # CFAR | 2D-MUSIC) -> DoA. No eager device op anywhere in the chain.
        # The program is MODULE-cached by configuration (r5: the per-call
        # closure re-traced the whole chain on every instance/call — 1.3 s
        # of the 2.1 s engine frame on the relay) and takes the noise key as
        # an ARGUMENT so it is seed-independent.
        cache_key = None
        fn = None
        if self.mesh is None:
            cache_key = (algo, doa, n_tx, n_sc, n_slots, starts, widths,
                         info.nfft, tuple(np.asarray(los).tolist()),
                         _radar_params_digest(params))
            fn = _SENSING_FNS.get(cache_key)
        if fn is None:
            rdm_fn = None
            if self.mesh is not None and algo == "FFT":
                # distributed DFT over symbol blocks (time axis of the mesh);
                # psum-reduced, bit-identical to the serial map
                from isac_tpu.parallel.time_blocks import range_doppler_map_sharded

                rdm_fn = range_doppler_map_sharded(
                    self.mesh, n_slots * 14, n_sc,
                    params.n_ifft, params.n_fft, axis=self.mesh_time_axis,
                )

            @jax.jit
            def _sensing_chain(grids, key_):
                tx_grid = jnp.zeros((n_tx, n_slots * 14, n_sc), jnp.complex64)
                for (st, wdt), g in zip(zip(starts, widths), grids):
                    tx_grid = tx_grid.at[:, st * 14 : st * 14 + wdt, :].set(g)
                tx_wave = ofdm_modulate(tx_grid, info).T  # [N, n_tx]
                rx_grid = mono_static_sensing(
                    tx_wave, params, info, n_sc, n_slots, key_, target_los=los,
                )
                if algo == "MUSIC":
                    return music_2d_estimate(rx_grid, tx_grid, params,
                                             doa_method=doa)
                rdm = rdm_fn(rx_grid, tx_grid) if rdm_fn is not None else None
                return fft_2d_estimate(rx_grid, tx_grid, params, cfg,
                                       doa_method=doa, rdm=rdm)

            fn = _sensing_chain
            if cache_key is not None:
                if len(_SENSING_FNS) > 64:
                    _SENSING_FNS.clear()
                _SENSING_FNS[cache_key] = fn

        est = fn(tuple(self._sen_slots[st] for st in starts), key)
        # ONE packed fetch of the estimate fields get_rmse needs (its
        # per-field np.asarray cost one ~27 ms relay RTT each)
        small = [k for k in ("rngEst", "velEst", "aziEst", "eleEst")
                 if k in est]
        host_vals = _fetch_packed([est[k] for k in small])
        est_host = dict(est)
        est_host.update(dict(zip(small, host_vals)))
        rmse = get_rmse(est_host, params)
        return {"estimates": est, "rmse": rmse, "params": params}

    # ------------------------------------------------------------- slot pieces

    def _slot_begin(self, slot: int, skip_materialize: bool = False) -> dict:
        """Timers, due feedback, slot typing, SRS counters — the per-slot
        prologue a network driver runs per cell before any tx phase.

        skip_materialize: the network driver has already materialized this
        cell's due results through the cross-cell batched fetch
        (SyncNetworkRunner._materialize_all — one RTT per slot for the
        whole network)."""
        if slot % self._slots_per_ms == 0:
            self._tick_1ms()
        if not skip_materialize:
            self._materialize_due(slot)
        self._process_due(slot)
        stype = "D" if self.fdd else self.tdd.slot_type(slot)
        ul_capable = self.fdd or stype in ("U", "S")
        # CSI-RS period [5 2] (setupCSIRS.m): DL slots with slot % 5 == 2
        csi_slot = stype == "D" and slot % self.csi_period == 2 % self.csi_period
        # periodic SRS (setupSRS.m): staggered per-UE counters, distinct
        # comb offsets keep up to 4 simultaneous sounders orthogonal
        sounding: list = []
        if ul_capable:
            for u in range(self.n_ues):
                self.srs_due[u] -= 1
                if self.srs_due[u] <= 0:
                    sounding.append(u)
                    self.srs_due[u] = 8
        return {"stype": stype, "ul_capable": ul_capable,
                "csi_slot": csi_slot, "sounding": sounding}

    def _dl_syms(self, info: dict) -> int:
        """DL symbols available this slot (0 = no DL)."""
        if self.fdd or info["stype"] == "D":
            return 14
        if info["stype"] == "S" and self.tdd.num_dl_syms >= 4:
            return self.tdd.num_dl_syms
        return 0

    def _ul_syms(self, info: dict) -> int:
        """UL symbols available this slot (0 = no UL). PUSCH avoids the SRS
        symbol when someone sounds (proportionalFair.m SRS-reserved-symbol
        avoidance, :115-384)."""
        if self.fdd or info["stype"] == "U":
            return 13 if (info["sounding"] and not self.fast_csi) else 14
        return 0

    def _slot_finish(self, slot: int, info: dict):
        """UL slot work + BSR + SRS — the per-slot epilogue."""
        n_ul = self._ul_syms(info)
        if n_ul:
            self._ul_slot(slot, n_ul)
        self._slot_epilogue(slot, info)

    def _slot_epilogue(self, slot: int, info: dict):
        """BSR + SRS (after any UL rx phase — a network driver calls this
        once cross-cell UL interference has been applied)."""
        self._epilogue_bsr(slot, info)
        sounding = info["sounding"]
        if sounding:
            self._epilogue_srs(slot, sounding)

    def _epilogue_bsr(self, slot: int, info: dict):
        """BSR host updates (ueMAC.m bsrTx:1102)."""
        if info["ul_capable"]:
            for u in range(self.n_ues):
                if slot % self.bsr_period == 0 or self.scheduler.ues[u].ul_buffer == 0:
                    self.scheduler.update_buffer(
                        u, "UL", self._rlc_buffer(self.rlc_ue[u])
                    )

    def _epilogue_srs(self, slot: int, sounding: list):
        if sounding:
            if self.passthrough:
                for u in sounding:  # emulated UL CQI walk
                    cqi = self._cqi_walk.report(u)
                    self.scheduler.update_ul_csi(u, cqi, 1, 0)
                    self.sched_log.log_csi(slot, "UL", u, cqi)
            elif self.fast_csi:
                for u in sounding:
                    self._srs_measure(u, slot)
            else:
                self._srs_slot(slot, sounding)

    def finalize(self) -> dict:
        """Flush deferred results and assemble the result dict (the tail of
        run(); a network driver calls it after the lockstep slot loop)."""
        self._materialize_due(self.num_slots + 10**6)
        self._process_due(self.num_slots + 10**6)
        qm_max = 8 if self.scheduler.mcs_table == "qam256" else 6
        dl_ratio = 1.0 if self.fdd else self.tdd.dl_ratio()
        ul_ratio = 1.0 if self.fdd else 1.0 - self.tdd.dl_ratio()
        comm = self.metrics.finalize(
            peak_se_dl=peak_spectral_efficiency(
                min(4, self.n_ue_ants, self.n_tx), qm_max, dl_ratio
            ),
            peak_se_ul=peak_spectral_efficiency(
                min(4, self.n_ue_ants, self.n_tx), qm_max, ul_ratio
            ),
        )
        sensing = self.run_sensing() if self.enable_sensing else None
        if self.pcap is not None:
            self.pcap.save()
        out = {"communication": comm, "sensing": sensing, "cell": self.cell.name}
        if (
            self.cell.log.enable_traces
            or self.cell.log.cqi_visualization
            or self.cell.log.rb_visualization
        ):
            out["logs"] = self.sched_log.finalize()
        return out

    # ------------------------------------------------------------------- run

    def run(self, start_slot: int = 0, stop_slot: int | None = None,
            finalize: bool = True):
        """Main slot loop (cellSimulation.m:147-187) + sensing post-pass.

        start_slot/stop_slot bound the loop for checkpoint/resume
        (SURVEY §5.4: the reference has no checkpointing; block-carried state
        makes slot boundaries natural checkpoints)."""
        stop = self.num_slots if stop_slot is None else stop_slot
        # block_slots >= 2: multi-slot segments up to the feedback-due
        # boundary; == 1: slot-fused dispatch (the whole slot's data plane as
        # one program — far smaller compile-signature space than multi-slot
        # segments, still ~10x fewer relay client calls than per-slot jits)
        if self.block_slots >= 1 and not self.passthrough:
            self._run_blocks(start_slot, stop)
        else:
            for slot in range(start_slot, stop):
                info = self._slot_begin(slot)
                n_dl = self._dl_syms(info)
                if n_dl:
                    st = self._dl_tx_phase(slot, n_dl, csi_slot=info["csi_slot"])
                    if st is not None:
                        self._dl_rx_phase(slot, info["csi_slot"], st)
                self._slot_finish(slot, info)
        if finalize:
            return self.finalize()
        return None

    # -------------------------------------------------- segment-fused blocks

    def _has_deferred_due(self, slot: int) -> bool:
        return any(e["due"] <= slot for e in self._deferred) or any(
            p.due_slot <= slot for p in self.pending
        )

    def _plan_slot(self, slot: int, info: dict) -> dict:
        """HOST control plane for one slot in block mode: scheduling, TB
        building, BSR, SRS grid construction — mirrors the per-slot order
        (_dl_tx_phase host half -> _ul_tx_phase host half -> epilogue) with
        zero device dispatch."""
        n_dl = self._dl_syms(info)
        n_ul = self._ul_syms(info)
        p = {"slot": slot, "n_dl": n_dl, "n_ul": n_ul,
             "csi": info["csi_slot"], "dl": None, "ul": None, "srs": None}
        if n_dl:
            p["dl"] = self._plan_dl(slot, n_dl, info["csi_slot"])
        if n_ul:
            p["ul"] = self._plan_ul(slot, n_ul)
        self._epilogue_bsr(slot, info)
        if info["sounding"]:
            p["srs"] = (
                {"ues": list(info["sounding"]), "fast": True}
                if self.fast_csi else self._plan_srs(info["sounding"])
            )
        return p

    def _plan_min_due(self, p: dict) -> int:
        """Earliest protocol due slot the plan's device results will carry —
        the segment must END before it (the slot loop would have fetched
        there; block mode keeps identical feedback timing)."""
        s = p["slot"]
        dues = []
        if p["dl"] is not None and (p["dl"]["groups"] or p["csi"]):
            dues.append(self._next_ul_slot(s))
        if p["ul"] is not None:
            dues.append(s + 1)
        if p["srs"] is not None:
            dues.append(s + 1)
        return min(dues) if dues else 10**9

    def _run_blocks(self, start: int, stop: int):
        """Block-mode slot loop: host control plane runs ahead until the next
        feedback-due boundary, then the whole segment's data plane executes
        as ONE fused jitted program (sim/block.py). Feedback timing, PRNG
        keys, and per-slot numerics are identical to the per-slot loop —
        verified bit-exactly by tests/test_block.py."""
        from isac_tpu.sim import block as _blk

        slot = start
        while slot < stop:
            plans: list = []
            horizon = 10**9
            while slot < stop and len(plans) < self.block_slots:
                if plans and (horizon <= slot or self._has_deferred_due(slot)):
                    break
                info = self._slot_begin(slot)
                p = self._plan_slot(slot, info)
                plans.append(p)
                horizon = min(horizon, self._plan_min_due(p))
                slot += 1
            _blk.dispatch_segment(self, plans)

    # --------------------------------------------------------- checkpointing

    _CKPT_FIELDS = (
        "scheduler", "rlc_gnb", "rlc_ue", "lcp_dl", "lcp_ul",
        "traffic_dl", "traffic_ul", "pending", "_deferred", "rx_soft_bufs",
        "srs_due", "metrics", "sched_log",
    )

    def checkpoint(self, next_slot: int) -> dict:
        """Host-serializable snapshot of ALL carried simulation state at a
        slot boundary (SURVEY §5.4; the reference persists results only).

        Device-resident values (deferred CRC/CSI results, HARQ soft buffers,
        accumulated sensing slots) are pulled to host numpy — a value copy,
        not a semantic change: their protocol due slots are part of the
        snapshot and fire identically after restore. The result pickles."""
        import copy
        import pickle

        memo: dict = {}

        def to_host(obj):
            oid = id(obj)
            if oid in memo:
                return memo[oid]
            if isinstance(obj, jax.Array):
                out = np.asarray(obj)
            elif isinstance(obj, dict):
                out = {}
                memo[oid] = out
                out.update({k: to_host(v) for k, v in obj.items()})
                return out
            elif isinstance(obj, (list, tuple)):
                out = type(obj)(to_host(v) for v in obj)
            else:
                out = obj
            memo[oid] = out
            return out

        state = {"next_slot": next_slot, "seed": self._seed,
                 "cell_name": self.cell.name}
        for f in self._CKPT_FIELDS:
            state[f] = to_host(getattr(self, f))
        state["_sen_slots"] = (
            to_host(self._sen_slots) if self.enable_sensing else None
        )
        # round-trip through pickle so callers can also persist the blob
        return pickle.loads(pickle.dumps(copy.deepcopy(state)))

    def restore(self, state: dict):
        """Load a checkpoint() snapshot into a freshly constructed simulator
        of the SAME configuration; continue with
        run(start_slot=state['next_slot'])."""
        if state["cell_name"] != self.cell.name or state["seed"] != self._seed:
            raise ValueError("checkpoint belongs to a different cell/seed")
        for f in self._CKPT_FIELDS:
            setattr(self, f, state[f])
        if self.enable_sensing and state["_sen_slots"] is not None:
            self._sen_slots = state["_sen_slots"]
        return state["next_slot"]
