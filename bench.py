"""Benchmark harness — run on the ambient JAX backend (TPU under axon).

Times the two hot paths at reference scale (100 MHz / 273 PRB @ SCS 30,
+scenarios/openStreetMapCity.m:59-67):
  (a) full PDSCH link chain (transport encode -> QAM -> PRG precode -> CDL
      channel -> DM-RS estimate -> MMSE -> LDPC min-sum decode), batched over
      4 links — reports decoded info bits/s and RE samples/s;
  (b) mono-static sensing chain (echo synthesis -> OFDM demod -> windowed
      2D-FFT RDM -> CA-CFAR) at nIFFT 4096 — reports RDMs/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The reference publishes no benchmark numbers (BASELINE.md: published = {});
vs_baseline is therefore reported against the r2 recorded value when present
in BENCH_r02.json-style history, else 1.0.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time_it(fn, n_iter=5):
    out = fn()
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    jax_block(out)
    return (time.perf_counter() - t0) / n_iter


def jax_block(out):
    import jax

    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )


def bench_pdsch(n_prb=273, n_links=4, mcs=19, n_layers=2):
    import __graft_entry__ as ge
    from isac_tpu.parallel.links import make_sharded_link_step

    g, args, tbs = ge._example_link_batch(n_prb=n_prb, n_links=n_links, mcs=mcs,
                                          n_layers=n_layers)
    fn, _ = make_sharded_link_step(g, mesh=None)
    dt = _time_it(lambda: fn(*args))
    info_bits = tbs * n_links
    n_samples = n_links * 2 * 14 * n_prb * 12  # rx REs processed
    return {
        "pdsch_slot_s": dt,
        "pdsch_info_mbps": info_bits / dt / 1e6,
        "pdsch_re_msamples_s": n_samples / dt / 1e6,
        "tbs": tbs,
    }


def bench_sensing(n_prb=273, num_slots=20):
    import jax
    import jax.numpy as jnp

    from isac_tpu.config.params import GNBParams, ULA
    from isac_tpu.ops.ofdm import ofdm_modulate
    from isac_tpu.ops.sensing import (
        cfar_detect_map,
        derive_radar_params,
        make_cfar_config,
        mono_static_sensing,
        range_doppler_map,
    )

    gnb = GNBParams(antenna=ULA(n_v=8, polarizations=2))
    carrier = gnb.carrier
    info = carrier.ofdm
    n_sc = carrier.n_sc
    p = derive_radar_params(
        gnb, carrier, np.array([[120.0, 40.0, 1.5]]), np.array([1.0]),
        np.array([7.0]), num_slots,
    )
    rng = np.random.default_rng(0)
    grid = (
        (rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc)) * 2 - 1)
        + 1j * (rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc)) * 2 - 1)
    ).astype(np.complex64) / np.sqrt(2)
    amp = 10 ** ((gnb.tx_power_dbm - 30) / 20) * np.sqrt(
        info.nfft**2 / (n_sc * gnb.num_tx_ants)
    )
    tx_grid = jnp.asarray(grid) * np.float32(amp)
    tx_wave = (ofdm_modulate(tx_grid, info).T).block_until_ready()
    cfg = make_cfar_config(p)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chain(wave, tx_g, k):
        rx_grid = mono_static_sensing(wave, p, info, n_sc, num_slots, k)
        rdm = range_doppler_map(rx_grid, tx_g, p.n_ifft, p.n_fft)
        power = jnp.abs(rdm) ** 2
        det = cfar_detect_map(power, cfg)
        return det.sum()

    dt = _time_it(lambda: chain(tx_wave, tx_grid, key))
    return {
        "sensing_chain_s": dt,
        "rdm_per_s": 1.0 / dt,
        "n_ifft": p.n_ifft,
        "n_fft": p.n_fft,
    }


def main():
    import jax

    extra = {"backend": jax.default_backend(), "n_devices": len(jax.devices())}
    try:
        extra.update(bench_pdsch())
    except Exception as e:  # never leave the driver without a JSON line
        extra["pdsch_error"] = repr(e)[:200]
    try:
        extra.update(bench_sensing())
    except Exception as e:
        extra["sensing_error"] = repr(e)[:200]
    value = extra.get("pdsch_info_mbps", 0.0)
    print(
        json.dumps(
            {
                "metric": "pdsch_chain_info_rate",
                "value": round(float(value), 3),
                "unit": "Mbps",
                "vs_baseline": 1.0,  # reference publishes no numbers (BASELINE.md)
                "extra": {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in extra.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
