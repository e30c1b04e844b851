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


def modulate(bits: jnp.ndarray, mod: str) -> jnp.ndarray:
    """bits [..., n*Qm] in {0,1} -> symbols [..., n] complex64."""
    qm = MODULATION_ORDERS[mod]
    *lead, nb = bits.shape
    if nb % qm:
        raise ValueError(f"{nb} bits not a multiple of Qm={qm}")
    groups = bits.reshape(*lead, nb // qm, qm).astype(jnp.int32)
    weights = jnp.asarray(1 << (qm - 1 - np.arange(qm)), dtype=jnp.int32)
    idx = jnp.sum(groups * weights, axis=-1)
    table = jnp.asarray(constellation(mod), dtype=jnp.complex64)
    return table[idx]


def demodulate_llr(
    symbols: jnp.ndarray, noise_var: jnp.ndarray | float, mod: str
) -> jnp.ndarray:
    """Max-log LLRs, positive for bit=0 (MATLAB nrSymbolDemodulate convention).

    symbols [..., n], noise_var broadcastable to symbols -> llr [..., n*Qm].
    """
    qm = MODULATION_ORDERS[mod]
    pts = jnp.asarray(constellation(mod), dtype=jnp.complex64)  # [M]
    labels = _bit_labels(mod)  # np [M, Qm]
    d2 = jnp.abs(symbols[..., None] - pts) ** 2  # [..., n, M]
    big = jnp.asarray(1e30, d2.dtype)
    per_bit = []
    for b in range(qm):  # unrolled: Qm <= 8; keeps peak memory at [..., n, M]
        mask1 = jnp.asarray(labels[:, b] == 1)
        d0 = jnp.min(jnp.where(mask1, big, d2), axis=-1)
        d1 = jnp.min(jnp.where(mask1, d2, big), axis=-1)
        per_bit.append(d1 - d0)
    llr = jnp.stack(per_bit, axis=-1)  # [..., n, Qm]
    nv = jnp.broadcast_to(jnp.maximum(jnp.asarray(noise_var, d2.dtype), 1e-10), symbols.shape)
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
