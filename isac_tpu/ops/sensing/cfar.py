"""2D CA-CFAR detection — vectorized sliding windows, fixed-capacity outputs.

TPU-native equivalent of +sensing/+detection/cfar2D.m:1-39 +
phased.CFARDetector2D('CA', Pfa-auto threshold, guard [2 2], training [1 1]).

Design: the per-CUT training-cell mean is two box sums (outer minus inner
window) computed with lax.reduce_window — O(1) per cell, fully parallel —
instead of the System-object per-CUT loop. Detections are returned as a
boolean map plus a top-K extraction (fixed capacity, mask-padded), which is
the XLA-compatible replacement for the reference's variable-length detection
index matrix (SURVEY §7.4 hard part #5).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from isac_tpu.ops.sensing.radar_params import RadarDerived


def ca_threshold_factor(pfa: float, num_training: int) -> float:
    """CA-CFAR scale: alpha = N (Pfa^(-1/N) - 1) (exponential noise)."""
    n = float(num_training)
    return n * (pfa ** (-1.0 / n) - 1.0)


@dataclass(frozen=True)
class CFARConfig:
    """Detector + CUT zone (cfar2D.m output struct)."""

    guard: tuple = (2, 2)
    training: tuple = (1, 1)
    pfa: float = 1e-9
    zone_rows: tuple = (0, 0)  # inclusive range-bin window (CUT zone)
    zone_cols: tuple = (0, 0)  # inclusive Doppler-bin window
    max_detections: int = 16

    @property
    def num_training(self) -> int:
        gr, gc = self.guard
        tr, tc = self.training
        outer = (2 * (gr + tr) + 1) * (2 * (gc + tc) + 1)
        inner = (2 * gr + 1) * (2 * gc + 1)
        return outer - inner

    @property
    def threshold_factor(self) -> float:
        return ca_threshold_factor(self.pfa, self.num_training)


def make_cfar_config(params: RadarDerived, max_detections: int = 16) -> CFARConfig:
    """CUT zone from the configured range/velocity detection area (cfar2D.m:13-24)."""
    rng_grid = np.arange(params.n_ifft) * params.r_res
    dop_grid = (np.arange(params.n_fft) - params.n_fft / 2) * params.v_res
    (rmin, rmax), (vmin, vmax) = params.cfar_zone
    r0 = int(np.argmin(np.abs(rng_grid - rmin)))
    r1 = int(np.argmin(np.abs(rng_grid - rmax)))
    c0 = int(np.argmin(np.abs(dop_grid - vmin)))
    c1 = int(np.argmin(np.abs(dop_grid - vmax)))
    return CFARConfig(
        pfa=params.pfa,
        zone_rows=(r0, r1),
        zone_cols=(c0, c1),
        max_detections=max_detections,
    )


def _box_sum(x: jnp.ndarray, half_r: int, half_c: int) -> jnp.ndarray:
    """Sum over a (2*half_r+1) x (2*half_c+1) window centered per cell (zero pad)."""
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 2) + (2 * half_r + 1, 2 * half_c + 1),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )


@partial(jax.jit, static_argnames=("cfg",))
def cfar_detect_map(power: jnp.ndarray, cfg: CFARConfig) -> jnp.ndarray:
    """power [..., R, C] -> bool detection map [..., R, C] restricted to the CUT zone."""
    gr, gc = cfg.guard
    tr, tc = cfg.training
    outer = _box_sum(power, gr + tr, gc + tc)
    inner = _box_sum(power, gr, gc)
    noise = (outer - inner) / cfg.num_training
    det = power > cfg.threshold_factor * noise
    r, c = power.shape[-2:]
    rows = jnp.arange(r)[:, None]
    cols = jnp.arange(c)[None, :]
    zone = (
        (rows >= cfg.zone_rows[0])
        & (rows <= cfg.zone_rows[1])
        & (cols >= cfg.zone_cols[0])
        & (cols <= cfg.zone_cols[1])
    )
    return det & zone


@partial(jax.jit, static_argnames=("cfg",))
def cfar_extract_detections(power: jnp.ndarray, det_map: jnp.ndarray, cfg: CFARConfig):
    """Top-K detections by peak power with local-max suppression.

    power/det_map [R, C] -> dict of row [K], col [K], peak [K], valid [K] (bool).
    Local-max suppression keeps one detection per peak (the reference instead
    reports every CFAR-crossing cell and dedups estimates by value).
    """
    local_max = power >= jax.lax.reduce_window(
        power, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    metric = jnp.where(det_map & local_max, power, -jnp.inf).reshape(-1)
    peak, idx = jax.lax.top_k(metric, cfg.max_detections)
    valid = jnp.isfinite(peak)
    c = power.shape[-1]
    return {
        "row": idx // c,
        "col": idx % c,
        "peak": jnp.where(valid, peak, 0.0),
        "valid": valid,
    }


def detections_to_estimates(dets: dict, params: RadarDerived) -> dict:
    """Detection bins -> range/velocity (fft2D.m:77-82): rng = row * rRes,
    vel = (col - nFFT/2) * vRes."""
    rng = dets["row"].astype(jnp.float32) * params.r_res
    vel = (dets["col"].astype(jnp.float32) - params.n_fft / 2) * params.v_res
    return {
        "rngEst": jnp.where(dets["valid"], rng, jnp.nan),
        "velEst": jnp.where(dets["valid"], vel, jnp.nan),
        "peak": dets["peak"],
        "valid": dets["valid"],
    }
