"""PDSCH / PUSCH full chains: transport + scrambling + modulation + layers +
precoding + DM-RS, and the matching receivers.

TPU-native equivalents of the reference's populatePDSCH/populatePUSCH +
phyRxProcessing paths (gNBPhy.m:775-830, 866-981; uePhy.m:671-933; SURVEY §2.5).
RE allocation masks and gather indices are precomputed host-side per grant
(static shapes); device code is pure tensor ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from isac_tpu.ops import transport
from isac_tpu.ops.channel_est import estimate_channel_dmrs, mmse_equalize
from isac_tpu.ops.dmrs import dmrs_fill_grid_prbs, dmrs_symbols
from isac_tpu.ops.modulation import (
    MODULATION_ORDERS,
    demodulate_llr,
    descramble_llr,
    modulate,
    pdsch_scrambling_cinit,
    pusch_scrambling_cinit,
    scramble_bits,
)
from isac_tpu.ops.precoding import prg_precode
from isac_tpu.mac.tables import mcs_info
from isac_tpu.utils.sequences import gold_sequence


@dataclass(frozen=True, eq=False)
class SCHGrant:
    """Static per-grant config shared by PDSCH and PUSCH chains."""

    rnti: int = 1
    n_id: int = 1  # cell / scrambling identity
    slot: int = 0
    prb_start: int = 0
    n_prb: int = 51
    sym_start: int = 0
    n_sym: int = 14
    mcs: int = 10
    mcs_table: str = "qam64"
    n_layers: int = 1
    dmrs_add_pos: int = 1
    rv: int = 0
    n_sc_grid: int = 612  # full carrier width
    direction: str = "DL"  # 'DL' | 'UL'
    reserved_sc: tuple = ()  # extra reserved (symbol, subcarrier) pairs, e.g. CSI-RS
    prb_set: tuple = ()  # non-contiguous allocation (RBG bitmap); overrides start/n_prb

    @property
    def prbs(self) -> tuple:
        if self.prb_set:
            return tuple(self.prb_set)
        return tuple(range(self.prb_start, self.prb_start + self.n_prb))

    @property
    def modulation(self) -> str:
        return mcs_info(self.mcs, self.mcs_table)[0]

    @property
    def code_rate(self) -> float:
        return mcs_info(self.mcs, self.mcs_table)[1]

    @property
    def qm(self) -> int:
        return MODULATION_ORDERS[self.modulation]


def dmrs_ports(n_layers: int) -> tuple:
    """Layer -> DM-RS antenna port mapping.

    Layers 1-2 use ports (0, 2) — one per CDM group, on DISJOINT combs — so
    co-scheduled layers never share an FD-OCC pair and channel estimation has
    zero cross-layer leakage (spec-valid: ports 1000+1002; both CDM groups'
    REs are data-blocked anyway with numCDMGroupsWithoutData=2, so the pilot
    separation is free). Ranks 3-4 add the OCC partners (1, 3).
    """
    return ((0,), (0, 2), (0, 2, 1), (0, 2, 1, 3))[n_layers - 1]


@lru_cache(maxsize=512)
def grant_layout(grant: SCHGrant):
    """Host-precomputed RE layout: (data_sym_idx, data_sc_idx [N], dmrs_syms,
    n_data_re, tbs, sch_cfg)."""
    dsyms = dmrs_symbols("A", grant.dmrs_add_pos)
    prbs = grant.prbs
    n_prb = len(prbs)
    ports = dmrs_ports(grant.n_layers)
    tmp = np.zeros((max(grant.n_layers, 1), 14, grant.n_sc_grid), np.complex64)
    _, dmrs_mask = dmrs_fill_grid_prbs(tmp, 0, grant.n_id, prbs, ports, dsyms)
    alloc = np.zeros((14, grant.n_sc_grid), bool)
    for p in prbs:
        alloc[grant.sym_start : grant.sym_start + grant.n_sym, 12 * p : 12 * p + 12] = True
    data_mask = alloc & ~dmrs_mask
    for s, k in grant.reserved_sc:
        data_mask[s, k] = False
    sym_idx, sc_idx = np.nonzero(data_mask)
    n_re = sym_idx.shape[0]
    n_re_per_prb = n_re // n_prb
    tbs = transport.nr_tbs(
        grant.modulation, grant.n_layers, n_prb, n_re_per_prb, grant.code_rate
    )
    g = n_re * grant.qm * grant.n_layers
    cfg = transport.sch_config(tbs, grant.code_rate, grant.qm, grant.n_layers, g)
    return sym_idx.astype(np.int32), sc_idx.astype(np.int32), dsyms, n_re, tbs, cfg


def grant_tbs(grant: SCHGrant) -> int:
    return grant_layout(grant)[4]


def _scrambling_seq(grant: SCHGrant, g: int) -> np.ndarray:
    if grant.direction == "DL":
        cinit = pdsch_scrambling_cinit(grant.rnti, 0, grant.n_id)
    else:
        cinit = pusch_scrambling_cinit(grant.rnti, grant.n_id)
    return gold_sequence(cinit, g)


def layer_map(d: jnp.ndarray, n_layers: int) -> jnp.ndarray:
    """Codeword symbols [..., n] -> layers [..., L, n/L] (TS 38.211 §7.3.1.3)."""
    n = d.shape[-1]
    return jnp.swapaxes(d.reshape(*d.shape[:-1], n // n_layers, n_layers), -1, -2)


def layer_demap(x: jnp.ndarray) -> jnp.ndarray:
    """[..., L, m] -> codeword [..., L*m]."""
    return jnp.swapaxes(x, -1, -2).reshape(*x.shape[:-2], -1)


def sch_transmit(
    tb_bits: jnp.ndarray,
    grant: SCHGrant,
    w: jnp.ndarray | None = None,
    prg_size: int = 2,
    extra_grid: jnp.ndarray | None = None,
):
    """TB -> precoded antenna-port grid [n_ports, 14, n_sc_grid].

    w: [n_prg, n_ports, n_layers] PRG precoders (PDSCH) or [n_ports, n_layers]
    wideband TPMI matrix (PUSCH). None = identity (layers == ports).
    DM-RS rides the same precoder (NR antenna-port convention).
    extra_grid: optional pre-filled port-domain content (e.g. CSI-RS) to add.
    """
    sym_idx, sc_idx, dsyms, n_re, tbs, cfg = grant_layout(grant)
    coded = transport.sch_encode(tb_bits, cfg, grant.rv)
    scr = scramble_bits(coded, _scrambling_seq(grant, cfg.g))
    d = modulate(scr, grant.modulation)  # [n_re * L]
    x = layer_map(d, grant.n_layers)  # [L, n_re]
    layer_grid = jnp.zeros((grant.n_layers, 14, grant.n_sc_grid), jnp.complex64)
    layer_grid = layer_grid.at[:, jnp.asarray(sym_idx), jnp.asarray(sc_idx)].set(x)
    # DM-RS per layer (antenna-port domain = layer domain pre-precoding)
    dm = np.zeros((grant.n_layers, 14, grant.n_sc_grid), np.complex64)
    dm, _ = dmrs_fill_grid_prbs(
        dm, grant.slot, grant.n_id, grant.prbs, dmrs_ports(grant.n_layers), dsyms,
    )
    layer_grid = layer_grid + jnp.asarray(dm)
    if w is None:
        port_grid = layer_grid
    elif w.ndim == 2:
        port_grid = jnp.einsum("pl,lsk->psk", w, layer_grid,
                               preferred_element_type=jnp.complex64)
    else:
        # full-width grid: absolute PRG ids; w covers ceil(n_rb_total/prg_size)
        port_grid = prg_precode(layer_grid, w, 0, prg_size)
    if extra_grid is not None:
        port_grid = port_grid + extra_grid
    return port_grid, {"tbs": tbs, "g": cfg.g, "cfg": cfg}


def sch_receive(
    rx_grid: jnp.ndarray,  # [n_rx, 14, n_sc_grid]
    grant: SCHGrant,
    soft_buffers: jnp.ndarray | None = None,
    n_ldpc_iter: int = 6,
    prg_size: int = 2,
):
    """Receiver: DM-RS channel estimate (effective channel incl. precoder) ->
    MMSE -> LLR -> descramble -> SCH decode.

    Returns dict: tb, crc_ok, soft_buffers, sinr_db (mean post-eq), noise_var.
    """
    sym_idx, sc_idx, dsyms, n_re, tbs, cfg = grant_layout(grant)
    # estimation-noise vs tracking-bias tradeoff: the scheduled MCS is the
    # receiver's SNR proxy. High MCS needs low estimation bias -> per-bundle
    # DFT (trigonometric) fit from raw pilots; low MCS needs noise averaging
    # -> pair decode + window-7 smoothing + linear interpolation.
    use_dft = grant.mcs >= 8
    # DL uses PRG-bundled precoding: the effective channel is discontinuous at
    # PRG boundaries, so estimation must not mix pilots across bundles. UL
    # precoding is wideband (single TPMI matrix) — no bundling constraint.
    bundle = prg_size * 12 if grant.direction == "DL" else None
    h, nvar = estimate_channel_dmrs(
        rx_grid, grant.slot, grant.n_id, grant.n_prb, grant.prb_start,
        dmrs_ports(grant.n_layers), dsyms, prb_set=grant.prbs,
        freq_window=1 if use_dft else 7, bundle_sc=bundle,
        interp="dft" if use_dft else "linear",
    )
    eq, sinr = mmse_equalize(rx_grid, h, nvar)
    data = eq[:, jnp.asarray(sym_idx), jnp.asarray(sc_idx)]  # [L, n_re]
    re_sinr = sinr[:, jnp.asarray(sym_idx), jnp.asarray(sc_idx)]
    llr = demodulate_llr(data, 1.0 / jnp.maximum(re_sinr, 1e-9), grant.modulation)
    # codeword bit (j*L + l)*Qm + b <-> layer l, RE j, bit b (TS 38.211 §7.3.1.3)
    llr = _relayer_llrs(llr.reshape(-1), grant.n_layers, grant.qm, n_re)
    llr = descramble_llr(llr, _scrambling_seq(grant, cfg.g))
    llr = jnp.clip(llr, -60.0, 60.0)
    tb, ok, bufs = transport.sch_decode(llr, cfg, grant.rv, soft_buffers, n_iter=n_ldpc_iter)
    mean_sinr_db = 10.0 * jnp.log10(jnp.maximum(jnp.mean(re_sinr), 1e-9))
    return {
        "tb": tb, "crc_ok": ok, "soft_buffers": bufs,
        "sinr_db": mean_sinr_db, "noise_var": nvar, "tbs": tbs,
    }


def _relayer_llrs(llr_flat: jnp.ndarray, n_layers: int, qm: int, n_re: int) -> jnp.ndarray:
    """Reorder per-layer LLR blocks into codeword order.

    Input is layer-major [L, n_re*Qm] flattened; codeword order interleaves
    layers per symbol: position ((j*L + l)*Qm + b).
    """
    x = llr_flat.reshape(n_layers, n_re, qm)
    return jnp.transpose(x, (1, 0, 2)).reshape(-1)
