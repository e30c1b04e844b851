"""Sensing stack: radar params, echo channel, RDM, CFAR, DoA, metrics.

Top-level `fft_2d_estimate` mirrors +sensing/+estimation/fft2D.m's role: RDM ->
per-antenna CA-CFAR -> union -> range/velocity estimates -> MUSIC DoA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from isac_tpu.ops.sensing.cfar import (
    CFARConfig,
    cfar_detect_map,
    cfar_extract_detections,
    detections_to_estimates,
    make_cfar_config,
)
from isac_tpu.ops.sensing.doa import (
    beamscan_doa,
    music_2d,
    music_doa,
    mvdr_doa,
    spatial_covariance,
)
from isac_tpu.ops.sensing.echo import apply_radar_channel, mono_static_sensing
from isac_tpu.ops.sensing.metrics import get_rmse, roc_pd
from isac_tpu.ops.sensing.radar_params import RadarDerived, derive_radar_params, steering_vector
from isac_tpu.ops.sensing.rdm import range_doppler_map, rdm_power

__all__ = [
    "CFARConfig", "cfar_detect_map", "cfar_extract_detections", "detections_to_estimates",
    "make_cfar_config", "beamscan_doa", "music_2d", "music_doa", "mvdr_doa",
    "spatial_covariance", "apply_radar_channel", "mono_static_sensing", "get_rmse",
    "roc_pd", "RadarDerived", "derive_radar_params", "steering_vector",
    "range_doppler_map", "rdm_power", "fft_2d_estimate", "music_2d_estimate",
]


def fft_2d_estimate(
    rx_grid: jnp.ndarray,
    tx_grid: jnp.ndarray,
    params: RadarDerived,
    cfg: CFARConfig | None = None,
    doa_method: str = "music",
    max_targets: int = 4,
    rdm: jnp.ndarray | None = None,
):
    """Full 2D-FFT estimation chain (fft2D.m:30-116).

    `rdm` injects a precomputed range-Doppler map (e.g. the mesh-sharded
    distributed-DFT one, parallel/time_blocks.py) in place of the serial map.

    rx_grid/tx_grid: [n_ants, n_sym, n_sc]. Returns dict with rngEst/velEst/
    aziEst/eleEst [K] (NaN-masked), valid [K], plus the RDM for inspection.

    Per-antenna CFAR maps are OR-combined (fft2D.m:59-99 loops antennas and
    unions estimates); peak extraction runs on the max-over-antennas power.
    """
    if cfg is None:
        cfg = make_cfar_config(params)
    if rdm is None:
        rdm = range_doppler_map(rx_grid, tx_grid, params.n_ifft, params.n_fft)
    power = jnp.abs(rdm) ** 2  # [n_ants, R, C]
    det_maps = cfar_detect_map(power, cfg)  # batched over antennas
    det_union = jnp.any(det_maps, axis=0)
    pmax = jnp.max(power, axis=0)
    dets = cfar_extract_detections(pmax, det_union, cfg)
    est = detections_to_estimates(dets, params)
    num_det = jnp.sum(dets["valid"].astype(jnp.int32))
    ra = spatial_covariance(rx_grid)
    if doa_method == "music":
        doa = music_doa(ra, params, max_targets=max_targets, num_detections=num_det)
    elif doa_method == "beamscan":
        doa = beamscan_doa(ra, params, max_targets=max_targets)
    elif doa_method == "mvdr":
        doa = mvdr_doa(ra, params, max_targets=max_targets)
    else:
        raise ValueError(f"unknown doa method '{doa_method}'")
    est["aziEst"] = doa["azEst"]
    est["eleEst"] = doa["elEst"]
    est["doa_valid"] = doa["valid"]
    est["rdm"] = rdm
    return est


def music_2d_estimate(
    rx_grid: jnp.ndarray,
    tx_grid: jnp.ndarray,
    params: RadarDerived,
    doa_method: str = "music",
    max_targets: int = 4,
):
    """Full range/velocity/DoA MUSIC chain (music2D.m:56-123) — the
    est_algorithm='MUSIC' alternative the reference configures but never
    wires (radar.m:19 vs cellSimulation.m:197, fixed deliberately per SURVEY
    §7.4 #8).

    Element-wise channel H = rx .* conj(tx) of antenna 0 (music2D.m:66-69);
    range/velocity spectra from its subcarrier/symbol correlation matrices;
    DoA from the spatial covariance exactly as in fft_2d_estimate."""
    ch = rx_grid[0] * jnp.conj(tx_grid[0])  # [n_sym, n_sc], first antenna
    est = music_2d(ch, params, max_targets=max_targets)
    ra = spatial_covariance(rx_grid)
    if doa_method == "music":
        doa = music_doa(ra, params, max_targets=max_targets)
    elif doa_method == "beamscan":
        doa = beamscan_doa(ra, params, max_targets=max_targets)
    elif doa_method == "mvdr":
        doa = mvdr_doa(ra, params, max_targets=max_targets)
    else:
        raise ValueError(f"unknown doa method '{doa_method}'")
    est["aziEst"] = doa["azEst"]
    est["eleEst"] = doa["elEst"]
    est["doa_valid"] = doa["valid"]
    return est
