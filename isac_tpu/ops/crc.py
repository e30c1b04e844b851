"""TS 38.212 §5.1 CRC attachment — TPU-native formulation.

The reference gets CRC handling implicitly from nrDLSCH/nrULSCH (SURVEY.md §2.9).
Here CRC is expressed as a GF(2) *linear map*: crc(m)_t = sum_i m_i * B[i, t] mod 2,
where column i of B is (x^{n-1-i+L} mod g). B is precomputed host-side for the
(static) message length — the on-device CRC is then a single [1,n]x[n,L] matmul
followed by mod-2, which maps straight onto the MXU. Integer-exact in float32 for
n < 2^24 bits.

Remainder sequences x^k mod g are generated with the same sparse GF(2)
doubling trick as the Gold sequences (isac_tpu.utils.sequences._extend_lfsr).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from isac_tpu.utils.sequences import _extend_lfsr

# Generator polynomials g(x) = x^L + sum_{j in taps} x^j  (TS 38.212 §5.1)
CRC_POLYS = {
    "24A": (24, (23, 18, 17, 14, 11, 10, 7, 6, 5, 4, 3, 1, 0)),
    "24B": (24, (23, 6, 5, 1, 0)),
    "24C": (24, (23, 21, 20, 17, 15, 13, 12, 8, 4, 2, 1, 0)),
    "16": (16, (12, 5, 0)),
    "11": (11, (10, 9, 5, 0)),
    "6": (6, (5, 0)),
}


def crc_length(kind: str) -> int:
    return CRC_POLYS[kind][0]


@lru_cache(maxsize=64)
def crc_matrix(kind: str, n_bits: int) -> np.ndarray:
    """B s.t. crc(m) = (m @ B) mod 2 for an n_bits message, uint8 [n_bits, L].

    crc(m) = remainder of m(x) * x^L mod g(x) with m_0 the highest-degree
    coefficient (MSB-first bit order, matching 38.212 §5.1).
    """
    L, taps = CRC_POLYS[kind]
    # e_k = x^k mod g satisfies e_k = XOR_{j in taps} e_{k - (L - j)}; bootstrap
    # with e_0..e_{L-1} = unit vectors. Bit t of e_k is sequence column t.
    lags = tuple(sorted(taps))  # lag (L - j) rewritten: x[n+L] = XOR_j x[n+j]
    init = np.eye(L, dtype=np.uint8)
    seqs = _extend_lfsr(init, n_bits + L, lags, degree=L)  # [n_bits+L, L]
    # message bit i multiplies x^{n-1-i+L}
    idx = n_bits - 1 - np.arange(n_bits) + L
    return seqs[idx]  # [n_bits, L]


def crc_compute_np(bits: np.ndarray, kind: str) -> np.ndarray:
    """Host-side CRC of an MSB-first bit vector (uint8). Returns L bits MSB-first."""
    B = crc_matrix(kind, int(bits.shape[-1]))
    r = (bits.astype(np.int64) @ B.astype(np.int64)) % 2
    L = crc_length(kind)
    # e_k bit t corresponds to coefficient of x^t; MSB-first output = reversed
    return r[..., ::-1].astype(np.uint8)[..., :L]


def crc_compute(bits: jnp.ndarray, kind: str) -> jnp.ndarray:
    """On-device CRC as a float32 matmul (exact for n < 2^24). bits [..., n] in {0,1}."""
    n = bits.shape[-1]
    B = jnp.asarray(crc_matrix(kind, n)[:, ::-1], dtype=jnp.float32)  # MSB-first cols
    s = jnp.dot(bits.astype(jnp.float32), B, preferred_element_type=jnp.float32)
    return jnp.mod(jnp.round(s), 2.0).astype(bits.dtype)


def crc_attach(bits: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Append CRC parity bits: [..., n] -> [..., n+L]."""
    return jnp.concatenate([bits, crc_compute(bits, kind)], axis=-1)


def crc_check(bits_with_crc: jnp.ndarray, kind: str) -> jnp.ndarray:
    """True where the CRC passes. bits_with_crc [..., n+L] -> bool [...]."""
    L = crc_length(kind)
    payload, rx_crc = bits_with_crc[..., :-L], bits_with_crc[..., -L:]
    calc = crc_compute(payload, kind)
    return jnp.all(rx_crc == calc, axis=-1)


def crc_bitserial_reference(bits: np.ndarray, kind: str) -> np.ndarray:
    """Slow bit-serial long division — golden reference for tests only."""
    L, taps = CRC_POLYS[kind]
    g = np.zeros(L + 1, dtype=np.uint8)
    g[0] = 1  # x^L term, MSB-first
    for j in taps:
        g[L - j] = 1
    buf = np.concatenate([bits.astype(np.uint8), np.zeros(L, dtype=np.uint8)])
    for i in range(len(bits)):
        if buf[i]:
            buf[i : i + L + 1] ^= g
    return buf[-L:]
