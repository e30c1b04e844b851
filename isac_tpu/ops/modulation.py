"""Symbol modulation / soft demodulation / scrambling per TS 38.211 §5.1-5.2.

TPU-native equivalent of MATLAB nrSymbolModulate / nrSymbolDemodulate and the
scrambling steps inside nrPDSCH / nrPUSCH (SURVEY §2.9). Bit order is MSB-first
per modulation symbol, exactly as in 38.211 §5.1.2-§5.1.6.

Demapping is max-log LLR over the constellation (distance matrix formulation:
a [N, M] elementwise op + per-bit masked min — fully vectorized, no per-RE loops).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

MODULATION_ORDERS = {"BPSK": 1, "QPSK": 2, "16QAM": 4, "64QAM": 6, "256QAM": 8}


@lru_cache(maxsize=8)
def constellation(mod: str) -> np.ndarray:
    """Constellation points indexed by the MSB-first bit label (complex128 [2^Qm])."""
    qm = MODULATION_ORDERS[mod]
    labels = np.arange(1 << qm)
    bits = ((labels[:, None] >> (qm - 1 - np.arange(qm))[None, :]) & 1).astype(np.float64)
    if mod == "BPSK":  # 38.211 §5.1.2
        b = bits[:, 0]
        pts = ((1 - 2 * b) + 1j * (1 - 2 * b)) / np.sqrt(2)
    elif mod == "QPSK":  # §5.1.3
        pts = ((1 - 2 * bits[:, 0]) + 1j * (1 - 2 * bits[:, 1])) / np.sqrt(2)
    elif mod == "16QAM":  # §5.1.4
        i = (1 - 2 * bits[:, 0]) * (2 - (1 - 2 * bits[:, 2]))
        q = (1 - 2 * bits[:, 1]) * (2 - (1 - 2 * bits[:, 3]))
        pts = (i + 1j * q) / np.sqrt(10)
    elif mod == "64QAM":  # §5.1.5
        i = (1 - 2 * bits[:, 0]) * (4 - (1 - 2 * bits[:, 2]) * (2 - (1 - 2 * bits[:, 4])))
        q = (1 - 2 * bits[:, 1]) * (4 - (1 - 2 * bits[:, 3]) * (2 - (1 - 2 * bits[:, 5])))
        pts = (i + 1j * q) / np.sqrt(42)
    elif mod == "256QAM":  # §5.1.6
        i = (1 - 2 * bits[:, 0]) * (
            8 - (1 - 2 * bits[:, 2]) * (4 - (1 - 2 * bits[:, 4]) * (2 - (1 - 2 * bits[:, 6])))
        )
        q = (1 - 2 * bits[:, 1]) * (
            8 - (1 - 2 * bits[:, 3]) * (4 - (1 - 2 * bits[:, 5]) * (2 - (1 - 2 * bits[:, 7])))
        )
        pts = (i + 1j * q) / np.sqrt(170)
    else:
        raise ValueError(mod)
    return pts


@lru_cache(maxsize=8)
def _bit_labels(mod: str) -> np.ndarray:
    qm = MODULATION_ORDERS[mod]
    labels = np.arange(1 << qm)
    return ((labels[:, None] >> (qm - 1 - np.arange(qm))[None, :]) & 1).astype(np.float32)


_QAM_SCALE = {2: 1.0 / np.sqrt(2), 4: 1.0 / np.sqrt(10),
              6: 1.0 / np.sqrt(42), 8: 1.0 / np.sqrt(170)}


def _axis_level(s: jnp.ndarray) -> jnp.ndarray:
    """Gray PAM level from sign planes s[..., m] (s = 1-2b, MSB first):
    level = s0*(2^(m-1) - s1*(2^(m-2) - ... - s_{m-1})) — the nested form of
    38.211 §5.1.3-§5.1.6, evaluated arithmetically on the VPU (no gather)."""
    m = s.shape[-1]
    if m == 1:
        return s[..., 0]
    t = 2.0 - s[..., m - 1]
    for j in range(m - 2, 0, -1):
        t = float(1 << (m - j)) - s[..., j] * t
    return s[..., 0] * t


def modulate(bits: jnp.ndarray, mod: str, scramble: jnp.ndarray | None = None) -> jnp.ndarray:
    """bits [..., n*Qm] in {0,1} -> symbols [..., n] complex64.

    Closed-form Gray mapping (even bit planes -> I, odd -> Q) instead of a
    2^Qm-entry table gather: the gather was the transmit chain's hottest op
    on TPU (11.6 ms of a 36 ms 273-PRB 4-link slot; r4 profile) — the
    arithmetic form is pure fused VPU work.

    scramble: optional Gold sequence [..., n*Qm]; XOR folds into the sign
    planes exactly ((1-2(b^c)) == (1-2b)(1-2c)), so scrambling costs one
    fused multiply instead of an int32 XOR pass over G bits."""
    qm = MODULATION_ORDERS[mod]
    *lead, nb = bits.shape
    if nb % qm:
        raise ValueError(f"{nb} bits not a multiple of Qm={qm}")
    groups = bits.reshape(*lead, nb // qm, qm).astype(jnp.float32)
    s = 1.0 - 2.0 * groups
    if scramble is not None:
        sc = scramble.reshape(*scramble.shape[:-1], nb // qm, qm).astype(jnp.float32)
        s = s * (1.0 - 2.0 * sc)
    if mod == "BPSK":  # §5.1.2: both axes carry the single bit
        lvl = s[..., 0] * np.float32(1.0 / np.sqrt(2))
        return (lvl + 1j * lvl).astype(jnp.complex64)
    i_lvl = _axis_level(s[..., 0::2])
    q_lvl = _axis_level(s[..., 1::2])
    scale = np.float32(_QAM_SCALE[qm])
    return ((i_lvl * scale) + 1j * (q_lvl * scale)).astype(jnp.complex64)


@lru_cache(maxsize=8)
def _axis_levels(qm: int):
    """All 2^(Qm/2) PAM levels of one axis + their bit labels (MSB first).
    Returns (levels [L] f32 — already 1/sqrt(norm) scaled, labels [L, m])."""
    m = qm // 2
    combos = np.arange(1 << m)
    bits = ((combos[:, None] >> (m - 1 - np.arange(m))[None, :]) & 1).astype(np.float64)
    s = 1.0 - 2.0 * bits
    if m == 1:
        lvl = s[:, 0]
    else:
        t = 2.0 - s[:, m - 1]
        for j in range(m - 2, 0, -1):
            t = float(1 << (m - j)) - s[:, j] * t
        lvl = s[:, 0] * t
    return (lvl * _QAM_SCALE[qm]).astype(np.float32), bits.astype(np.float32)


def _gray_axis_llr_closed(t: jnp.ndarray, m: int) -> jnp.ndarray:
    """EXACT max-log LLRs for one Gray-PAM axis in closed form.

    t: observation in UNSCALED level units (levels are the odd integers
    +-1..+-(2^m-1)); returns [..., m], positive for bit 0. Per stage the
    sign-bit max-log value is (t+1)^2 - (t-p)^2 with p the nearest positive
    odd level = clip(2*floor(|t|/2)+1, 1, 2D-1), extended by odd symmetry;
    the Gray fold t <- D - |t| recurses to the next bit. Pure elementwise
    floor/clip/multiply — no [., 2^(m/2)] distance tensor, no masked mins —
    and EQUAL to the masked-min form (test_modulation closed-form test).

    Evaluated as a TPU replacement for demodulate_llr's masked-min form in
    r5 and REJECTED on measurement: the floor/sign/clip chains lowered
    SLOWER than the distance-tensor mins on the relay (pdsch 243 -> 198
    Mbps). Kept as the documented reference algebra + exactness test."""
    outs = []
    d = float(1 << (m - 1))
    for _ in range(m):
        a = jnp.abs(t)
        if d == 1.0:
            outs.append(4.0 * t)  # single level +-1: (t+1)^2-(t-1)^2
        else:
            p = jnp.clip(2.0 * jnp.floor(a / 2.0) + 1.0, 1.0, 2.0 * d - 1.0)
            lmag = 2.0 * a * (1.0 + p) + 1.0 - p * p
            outs.append(jnp.sign(t) * lmag)
        t = d - a
        d /= 2.0
    return jnp.stack(outs, axis=-1)


def demodulate_llr(
    symbols: jnp.ndarray, noise_var: jnp.ndarray | float, mod: str
) -> jnp.ndarray:
    """Max-log LLRs, positive for bit=0 (MATLAB nrSymbolDemodulate convention).

    symbols [..., n], noise_var broadcastable to symbols -> llr [..., n*Qm].

    Per-axis formulation: for square Gray QAM each bit depends on only one
    axis, and min over the joint constellation splits as min_I + min_Q, so
    the cross-axis term cancels in the LLR difference — EXACTLY the same
    max-log values as the joint [n, 2^Qm] distance matrix at 2^(Qm/2) the
    work (256QAM: 16 levels instead of 256 points)."""
    qm = MODULATION_ORDERS[mod]
    if mod == "BPSK":  # both axes carry bit 0: joint 2-point form
        pts = jnp.asarray(constellation(mod), dtype=jnp.complex64)
        d2 = jnp.abs(symbols[..., None] - pts) ** 2
        llr = (d2[..., 1] - d2[..., 0])[..., None]  # label 1 minus label 0
    else:
        levels, labels = _axis_levels(qm)
        lv = jnp.asarray(levels)
        big = jnp.asarray(1e30, jnp.float32)
        di = (symbols.real[..., None] - lv) ** 2  # [..., n, L]
        dq = (symbols.imag[..., None] - lv) ** 2
        per_bit = []
        for j in range(qm // 2):  # unrolled: Qm/2 <= 4
            mask1 = jnp.asarray(labels[:, j] == 1)
            for d in (di, dq):  # bit 2j from I, bit 2j+1 from Q
                d0 = jnp.min(jnp.where(mask1, big, d), axis=-1)
                d1 = jnp.min(jnp.where(mask1, d, big), axis=-1)
                per_bit.append(d1 - d0)
        # per_bit order is [b0(I), b1(Q), b2(I), ...] — already interleaved
        llr = jnp.stack(per_bit, axis=-1)  # [..., n, Qm]
    nv = jnp.broadcast_to(
        jnp.maximum(jnp.asarray(noise_var, llr.dtype), 1e-10), symbols.shape
    )
    llr = llr / nv[..., None]
    return llr.reshape(*symbols.shape[:-1], symbols.shape[-1] * qm)


def scramble_bits(bits: jnp.ndarray, c_seq: np.ndarray | jnp.ndarray) -> jnp.ndarray:
    """b XOR c. c_seq precomputed Gold sequence (same length)."""
    return jnp.bitwise_xor(bits.astype(jnp.int32), jnp.asarray(c_seq, jnp.int32)).astype(
        bits.dtype
    )


def descramble_llr(llr: jnp.ndarray, c_seq: np.ndarray | jnp.ndarray) -> jnp.ndarray:
    """Soft descrambling: flip LLR sign where c=1."""
    sign = 1.0 - 2.0 * jnp.asarray(c_seq, llr.dtype)
    return llr * sign


def pdsch_scrambling_cinit(rnti: int, q: int, n_id: int) -> int:
    """TS 38.211 §7.3.1.1: c_init = rnti*2^15 + q*2^14 + n_id."""
    return (rnti << 15) + (q << 14) + n_id


def pusch_scrambling_cinit(rnti: int, n_id: int) -> int:
    """TS 38.211 §6.3.1.1 (non-UCI): c_init = rnti*2^15 + n_id."""
    return (rnti << 15) + n_id


def hard_decision(llr: jnp.ndarray) -> jnp.ndarray:
    """LLR > 0 => bit 0 (positive-for-zero convention)."""
    return (llr < 0).astype(jnp.int8)
