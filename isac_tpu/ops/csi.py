"""CSI measurement/selection: RI, PMI, CQI (DL via CSI-RS; UL via SRS/TPMI).

TPU-native equivalents of the reference's ported MathWorks helpers:
- riSelect.m:1-531 (rank by per-rank capacity)
- dlPMISelect.m:1-1887 (Type-1 codebook search maximizing SINR)
- cqiSelect.m:1-1244 (per-RE SINR -> subband/wideband CQI via BLER-0.1 table)
- pmiSelect.m:28-66 + precodedSINR.m + sinrPerSubband.m (UL TPMI from SRS)
- setupSINRtoCQIMappingTable.m:1-14 (the hard-coded SINR thresholds)
- subbandSize.m (TS 38.214 T5.2.1.4-2; we take the FIRST valid size, not the
  reference's random pick — documented deviation, SURVEY §7.4 #8)

The codebook searches are batched einsums over [codeword, RE] — no per-RE loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from isac_tpu.ops.precoding import (
    pusch_codebook,
    type1_codebook,
    type1_multipanel_codebook,
)

# SINR (dB) thresholds for CQI 1..15 at BLER 0.1 (setupSINRtoCQIMappingTable.m:7-11)
SINR_TO_CQI_DL = np.array(
    [-3.46, 1.54, 6.54, 11.05, 13.54, 16.04, 17.54, 20.04, 22.04, 24.43,
     26.93, 27.43, 29.43, 32.43, 35.43]
)
SINR_TO_CQI_UL = SINR_TO_CQI_DL - 2.0

# TS 38.214 Table 5.2.2.1-2 (CQI table 1): (modulation, coderate*1024)
CQI_TABLE = [
    None,
    ("QPSK", 78), ("QPSK", 120), ("QPSK", 193), ("QPSK", 308), ("QPSK", 449),
    ("QPSK", 602), ("16QAM", 378), ("16QAM", 490), ("16QAM", 616), ("64QAM", 466),
    ("64QAM", 567), ("64QAM", 666), ("64QAM", 772), ("64QAM", 873), ("64QAM", 948),
]


def subband_size(n_prb: int) -> int:
    """TS 38.214 Table 5.2.1.4-2 — first valid value (deterministic)."""
    if n_prb < 24:
        return n_prb  # wideband only
    if n_prb <= 72:
        return 4
    if n_prb <= 144:
        return 8
    return 16


def sinr_to_cqi(sinr_db: jnp.ndarray, table: np.ndarray = SINR_TO_CQI_DL) -> jnp.ndarray:
    """Highest CQI whose threshold <= SINR (0 = out of range)."""
    t = jnp.asarray(table, jnp.float32)
    return jnp.sum(sinr_db[..., None] >= t, axis=-1).astype(jnp.int32)


def precoded_sinr(h: jnp.ndarray, w: jnp.ndarray, nvar: float) -> jnp.ndarray:
    """Post-MMSE SINR per layer for precoded channel.

    h [..., n_rx, n_ports], w [n_cw, n_ports, n_layers] ->
    sinr [n_cw, ..., n_layers] (linear). LMMSE formulation of precodedSINR.m.

    Numerically stable variant: SINR_l = 1/[(I + Hᴴ_eff H_eff / nvar)⁻¹]_ll - 1.
    (The textbook mu/(1-mu) form cancels catastrophically in float32 above
    ~60 dB SNR — the inverse diagonal is read directly instead.)
    """
    heff = jnp.einsum("...rp,cpl->c...rl", h, w, preferred_element_type=jnp.complex64)
    hh = jnp.conj(jnp.swapaxes(heff, -1, -2))
    a = jnp.einsum("...lr,...rm->...lm", hh, heff) / nvar
    n_layers = w.shape[-1]
    eye = jnp.eye(n_layers, dtype=a.dtype)
    b = a + eye
    # closed-form Hermitian inverse (L <= 4): fuses on the VPU, and the
    # batched-LU custom call is rejected by the axon TPU relay
    from isac_tpu.ops.channel_est import _small_hermitian_inverse

    binv = _small_hermitian_inverse(b)
    d = jnp.clip(jnp.real(jnp.diagonal(binv, axis1=-2, axis2=-1)), 1e-12, 1.0)
    sinr = 1.0 / d - 1.0
    return jnp.where(jnp.isfinite(sinr), jnp.maximum(sinr, 0.0), 0.0)


def ri_select(h: jnp.ndarray, nvar: float, max_rank: int = 4) -> jnp.ndarray:
    """Rank by per-rank Shannon capacity on the channel singular values
    (riSelect.m approach). h [n_re, n_rx, n_tx] -> rank scalar (1-based).

    Singular values come from the rx-side Gram matrix; for n_rx <= 2 (every
    shipped UE config) the eigenvalues are analytic — no SVD/eig custom call
    (which the VPU hates and the axon TPU relay rejects)."""
    n_rx = h.shape[-2]
    if n_rx <= 2 <= h.shape[-1]:
        g = jnp.einsum("...rt,...st->...rs", h, jnp.conj(h))  # H H^H [.., rx, rx]
        if n_rx == 1:
            s = jnp.sqrt(jnp.maximum(jnp.real(g[..., 0, 0]), 0.0))[..., None]
        else:
            tr = jnp.real(g[..., 0, 0] + g[..., 1, 1])
            det = jnp.real(
                g[..., 0, 0] * g[..., 1, 1] - g[..., 0, 1] * g[..., 1, 0]
            )
            disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
            e1 = jnp.maximum(tr / 2.0 + disc, 0.0)
            e2 = jnp.maximum(tr / 2.0 - disc, 0.0)
            s = jnp.sqrt(jnp.stack([e1, e2], axis=-1))  # descending
    else:
        # n_rx > 2: eigenvalues of the rx-side Gram (Hermitian 3x3/4x4) are
        # the squared singular values. jnp.linalg.eigvalsh executes on the
        # axon relay when its input is built on device (RELAY_NOTES r4 probe
        # matrix — unlike the SVD custom call) and is the better TPU
        # formulation regardless (tiny-batch SVD wastes the VPU).
        g = jnp.einsum("...rt,...st->...rs", h, jnp.conj(h))
        ev = jnp.linalg.eigvalsh(g)  # ascending, real
        s = jnp.sqrt(jnp.maximum(ev[..., ::-1], 0.0))  # descending
    max_rank = min(max_rank, h.shape[-1], h.shape[-2])
    caps = []
    for r in range(1, max_rank + 1):
        # equal power split across r layers
        cap = jnp.sum(jnp.log2(1.0 + (s[..., :r] ** 2) / (r * nvar)), axis=-1)
        caps.append(jnp.mean(cap))
    return jnp.argmax(jnp.stack(caps)) + 1


def dl_pmi_select(
    h: jnp.ndarray,  # [n_re, n_rx, n_ports] channel estimates at CSI-RS REs
    nvar: float,
    rank: int,
    n1: int,
    n2: int,
    subband_of_re: np.ndarray | None = None,  # [n_re] subband id (None = wideband)
    ng: int = 1,
    codebook_mode: int = 1,
):
    """Type-1 codebook search maximizing sum capacity (dlPMISelect.m analogue).

    ng > 1 searches the multi-panel codebook (TS 38.214 §5.2.2.2.2,
    dlPMISelect.m:345) over the same einsum machinery; codebook_mode selects
    codebookMode 1 or 2 for either family.

    Returns (pmi_wideband, pmi_per_subband [n_sb], sinr_per_subband [n_sb, rank]).
    """
    if ng > 1:
        cb = jnp.asarray(
            type1_multipanel_codebook(ng, n1, n2, rank, codebook_mode=codebook_mode)
        )
    else:
        cb = jnp.asarray(
            type1_codebook(n1, n2, rank, codebook_mode=codebook_mode)
        )  # [n_cw, P, rank]
    sinr = precoded_sinr(h, cb, nvar)  # [n_cw, n_re, rank]
    cap = jnp.sum(jnp.log2(1.0 + sinr), axis=-1)  # [n_cw, n_re]
    if subband_of_re is None:
        metric = jnp.mean(cap, axis=-1)
        best = jnp.argmax(metric)
        return best, best[None], jnp.mean(sinr[best], axis=0, keepdims=True)
    sb = np.asarray(subband_of_re)
    n_sb = int(sb.max()) + 1
    oneh = np.zeros((n_sb, sb.shape[0]), np.float32)
    oneh[sb, np.arange(sb.shape[0])] = 1.0
    counts = oneh.sum(axis=1, keepdims=True)
    oneh = oneh / np.maximum(counts, 1.0)
    sb_cap = jnp.einsum("se,ce->cs", jnp.asarray(oneh), cap)  # [n_cw, n_sb]
    pmi_sb = jnp.argmax(sb_cap, axis=0)  # [n_sb]
    pmi_wb = jnp.argmax(jnp.mean(sb_cap, axis=-1))
    sb_sinr = jnp.einsum("se,cel->csl", jnp.asarray(oneh), sinr)
    sinr_sel = jnp.take_along_axis(sb_sinr, pmi_sb[None, :, None], axis=0)[0]
    return pmi_wb, pmi_sb, sinr_sel


def cqi_select(
    h: jnp.ndarray,  # [n_re, n_rx, n_ports]
    nvar: float,
    rank: int,
    n1: int,
    n2: int,
    subband_of_re: np.ndarray | None = None,
    ng: int = 1,
):
    """CQI from post-precoding SINR (cqiSelect.m analogue).

    Returns dict: rank, pmi_wb, pmi_sb, cqi_wb, cqi_sb [n_sb], sinr_db_sb.
    """
    pmi_wb, pmi_sb, sinr_sb = dl_pmi_select(h, nvar, rank, n1, n2, subband_of_re, ng=ng)
    # layer-average effective SINR per subband (EESM-lite: arithmetic in dB domain)
    sinr_db = 10.0 * jnp.log10(jnp.maximum(jnp.mean(sinr_sb, axis=-1), 1e-9))
    cqi_sb = sinr_to_cqi(sinr_db, SINR_TO_CQI_DL)
    cqi_wb = sinr_to_cqi(10.0 * jnp.log10(jnp.maximum(jnp.mean(jnp.mean(sinr_sb, -1)), 1e-9)))
    return {
        "rank": rank,
        "pmi_wb": pmi_wb,
        "pmi_sb": pmi_sb,
        "cqi_wb": cqi_wb,
        "cqi_sb": cqi_sb,
        "sinr_db_sb": sinr_db,
    }


def ul_tpmi_select(
    h: jnp.ndarray,  # [n_re, n_rx, n_ue_ports] channel from SRS
    nvar: float,
    rank: int,
    subband_of_re: np.ndarray | None = None,
):
    """UL TPMI via PUSCH codebook (pmiSelect.m:28-66).

    Returns (tpmi, sinr_db_per_subband [n_sb])."""
    n_ports = h.shape[-1]
    cb = jnp.asarray(pusch_codebook(n_ports, rank))
    sinr = precoded_sinr(h, cb, nvar)  # [n_cw, n_re, rank]
    cap = jnp.sum(jnp.log2(1.0 + sinr), axis=-1)
    metric = jnp.mean(cap, axis=-1)
    tpmi = jnp.argmax(metric)
    sel = sinr[tpmi]  # [n_re, rank]
    if subband_of_re is None:
        sinr_db = 10.0 * jnp.log10(jnp.maximum(jnp.mean(sel), 1e-9))[None]
        return tpmi, sinr_db
    sb = np.asarray(subband_of_re)
    n_sb = int(sb.max()) + 1
    oneh = np.zeros((n_sb, sb.shape[0]), np.float32)
    oneh[sb, np.arange(sb.shape[0])] = 1.0
    oneh = oneh / np.maximum(oneh.sum(1, keepdims=True), 1.0)
    sb_sinr = jnp.einsum("se,el->sl", jnp.asarray(oneh), sel)
    return tpmi, 10.0 * jnp.log10(jnp.maximum(jnp.mean(sb_sinr, -1), 1e-9))
