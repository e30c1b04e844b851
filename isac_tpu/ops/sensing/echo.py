"""Mono-static multi-target radar echo channel.

TPU-native equivalent of +sensing/+channelModels/basicRadarChannel.m:1-76 and
+sensing/monoStaticSensing.m:1-23.

Re-design (baseband-equivalent, MXU-formulated — not a loop-per-target port):
the reference upconverts to fc, integer-shifts, applies Doppler, rank-1 steers
per target, sums, adds noise, downconverts. The carrier round trip reduces to a
constant phase exp(-2j pi fc * s*Ts) per target (kept in float64 host-side;
float32 could not represent fc*t at 3.5 GHz). On device the echo is:

    q      = wave @ A_tx            [N, T]   (steering projection, one matmul)
    q_t[n] = q[n - s_t] * c_t * exp(2j pi fd_t n Ts)   (gather + phase ramp)
    rx     = q_shift @ A_rx^T + AWGN(N0)     [N, n_ants]  (second matmul)

with c_t = LSF_t * exp(-2j pi fc s_t Ts), zero for NLoS targets
(basicRadarChannel.m:58-59). Delay is an integer-sample zero-fill shift
(ceil(2r/c/Ts), :42) exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from isac_tpu.config.carrier import OFDMInfo
from isac_tpu.ops.ofdm import ofdm_demodulate
from isac_tpu.ops.sensing.radar_params import RadarDerived
from isac_tpu.utils.geometry import SPEED_OF_LIGHT


def radar_echo_constants(params: RadarDerived, target_los: np.ndarray | None = None):
    """Host-side per-target constants: (shift_samples[T], phase_const[T],
    doppler_hz[T], A[n_ants, T])."""
    ts = 1.0 / params.fs
    path_delay = 2.0 * params.range_m / SPEED_OF_LIGHT
    shift = np.ceil(path_delay / ts).astype(np.int64)  # (:22)
    lam = SPEED_OF_LIGHT / params.fc
    fd = 2.0 * params.velocity_ms / lam  # (:25)
    c = params.large_scale_fading * np.exp(-2j * np.pi * params.fc * shift * ts)
    if target_los is not None:
        c = np.where(np.asarray(target_los, bool), c, 0.0)
    return shift, c.astype(np.complex128), fd, params.steering


def apply_radar_channel(
    tx_wave: jnp.ndarray,
    params: RadarDerived,
    key: jax.Array,
    target_los: np.ndarray | None = None,
    add_noise: bool = True,
) -> jnp.ndarray:
    """tx_wave [N, n_ants] -> rx echo [N, n_ants] (baseband)."""
    n, n_ants = tx_wave.shape
    shift, cconst, fd, steer = radar_echo_constants(params, target_los)
    t_count = shift.shape[0]
    if t_count == 0:
        rx = jnp.zeros_like(tx_wave)
    else:
        a = jnp.asarray(steer, jnp.complex64)  # [n_ants, T]
        q = jnp.dot(tx_wave, a, preferred_element_type=jnp.complex64)  # [N, T]
        # integer zero-fill delay per target: the shifts are HOST constants,
        # so each is a static zero-pad + slice (the former [N, T]
        # take_along_axis gather lowers poorly on TPU — r4 profile)
        cols = []
        for t in range(t_count):
            s = int(shift[t])
            col = q[:, t]
            if s > 0:
                col = jnp.concatenate(
                    [jnp.zeros((s,), col.dtype), col[: n - s]])
            cols.append(col)
        q_shift = jnp.stack(cols, axis=1)
        n_idx = jax.lax.broadcasted_iota(jnp.int32, (n, t_count), 0)
        # Doppler ramp on the post-shift sample clock (reference applies the ramp
        # from t=0 after shifting: basicRadarChannel.m:43-45)
        ts = 1.0 / params.fs
        phase = (2.0 * np.pi) * jnp.asarray((fd * ts).astype(np.float32))[None, :] * n_idx.astype(
            jnp.float32
        )
        ramp = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        q_shift = q_shift * ramp * jnp.asarray(cconst, jnp.complex64)[None, :]
        rx = jnp.dot(q_shift, a.T, preferred_element_type=jnp.complex64)  # [N, n_ants]
    if add_noise:
        sigma = np.sqrt(params.n0 / 2.0)
        kr, ki = jax.random.split(key)
        noise = sigma * (
            jax.random.normal(kr, rx.shape, jnp.float32)
            + 1j * jax.random.normal(ki, rx.shape, jnp.float32)
        )
        rx = rx + noise.astype(jnp.complex64)
    return rx


def mono_static_sensing(
    tx_wave: jnp.ndarray,
    params: RadarDerived,
    info: OFDMInfo,
    n_sc: int,
    num_slots: int,
    key: jax.Array,
    target_los: np.ndarray | None = None,
) -> jnp.ndarray:
    """tx waveform -> echo grid [n_ants, n_sym, n_sc] (monoStaticSensing.m:1-23).

    tx_wave is [N, n_ants] (the accumulated DL waveform, zeros on UL slots)."""
    rx = apply_radar_channel(tx_wave, params, key, target_los)
    return ofdm_demodulate(rx.T, info, n_sc, num_slots)
