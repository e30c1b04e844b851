"""Slow-time (Doppler) axis sharding for the sensing range-Doppler map.

The reference accumulates the FULL simulation's DL grid in memory and FFTs the
whole symbol axis at the end (gNBPhy.m:604-612, fft2D.m:44-46) —
O(total-samples) memory. SURVEY §5.7 designates this the sequence-parallel
analogue: shard OFDM-symbol blocks across devices, keep the per-block
reciprocal-filter product and range IFFT local, and realize the slow-time FFT
as a LOCAL DFT matmul against the block's twiddle columns followed by a psum —
no device ever materializes the full symbol axis, and the reduction rides ICI.

    RDM[., d] = sum_m W[d, m] r[., m]  =  sum_blocks ( W[:, block] @ r_block )
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from isac_tpu.ops import dft
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from isac_tpu.utils.windows import window


def range_doppler_map_sharded(
    mesh: Mesh,
    n_sym: int,
    n_sc: int,
    n_ifft: int,
    n_fft: int,
    axis: str = "time",
    win: str = "kaiser",
):
    """Build the sharded RDM: fn(rx_grid, tx_grid) with BOTH grids sharded on
    the symbol axis ([n_ants, n_sym/d, n_sc] per shard). Output RDM
    [n_ants, n_ifft, n_fft] is replicated (psum-reduced).

    Matches ops.sensing.rdm.range_doppler_map bit-for-bit in layout and
    normalization (Doppler axis fftshift-centered).
    """
    n_dev = mesh.shape[axis]
    assert n_sym % n_dev == 0, (n_sym, n_dev)
    block = n_sym // n_dev
    rng_win = jnp.asarray(window(win, n_sc), jnp.float32)
    dop_win_full = np.asarray(window(win, n_sym), np.float64)
    # DFT matrix columns for each symbol, fftshift folded in:
    # rdm[d] = sum_m exp(-2j pi ((d - n_fft/2) mod n_fft) m / n_fft) r[m]
    d_idx = (np.arange(n_fft) + n_fft // 2) % n_fft  # output row -> DFT bin
    m_idx = np.arange(n_sym)
    w_full = np.exp(-2j * np.pi * np.outer(d_idx, m_idx) / n_fft) / np.sqrt(n_fft)
    w_full = (w_full * dop_win_full[None, :]).astype(np.complex64)  # [n_fft, n_sym]
    if n_sym > n_fft:
        # fft(x, n=n_fft) TRUNCATES to the first n_fft samples; match it
        # (never hit in practice: n_fft = 2^nextpow2(n_sym), radarParams.m:74)
        w_full[:, n_fft:] = 0.0
    w_dev = jnp.asarray(w_full.reshape(n_fft, n_dev, block).transpose(1, 0, 2))

    def step(rx_b, tx_b, w_b):
        # local reciprocal filter + range IFFT over the (unsharded) sc axis
        h = rx_b * jnp.conj(tx_b) * rng_win[None, None, :]
        r = dft.ifft_auto(h, n=n_ifft, axis=-1) * np.sqrt(n_ifft)  # [a, blk, n_ifft]
        # local Doppler partial: [n_fft, blk] @ [a, blk, n_ifft] -> [a, n_ifft, n_fft]
        part = jnp.einsum(
            "dm,amr->ard", w_b[0], r, preferred_element_type=jnp.complex64
        )
        return jax.lax.psum(part, axis)

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def call(rx_grid, tx_grid):
        return jitted(rx_grid, tx_grid, w_dev)

    return call
