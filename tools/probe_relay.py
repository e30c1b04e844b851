"""One-probe-per-process relay op-support bisection (RELAY_NOTES.md protocol).

The axon relay wedges the client session after any failed program, so each
probe must run in its own process. Usage:

    python tools/probe_relay.py <stage>      # run one probe, print OK/err
    python tools/probe_relay.py --all        # run every stage, each in a
                                             # subprocess; print the matrix

Each stage builds the minimal slice of the bench_pdsch / bench_sensing input
pipeline up to one suspect op, executes it, and FETCHES an f32 scalar (the
only reliable execution fence on the relay).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _fetch(x):
    import jax
    import jax.numpy as jnp

    s = jax.jit(lambda v: jnp.sum(jnp.abs(v)).astype(jnp.float32))(x)
    return float(np.asarray(s))


def stage_xfer_roundtrip():
    """xfer.asarray of a complex array -> abs-sum fetch."""
    from isac_tpu.utils import xfer

    a = (np.arange(12) + 1j * np.arange(12)).astype(np.complex64).reshape(3, 4)
    return _fetch(xfer.asarray(a))


def stage_freq_response():
    """batched_frequency_response (CDL ray contraction) -> fetch."""
    from isac_tpu.ops.cdl import build_cdl_link, subcarrier_freqs
    from isac_tpu.parallel.links import batched_frequency_response, stack_links

    lam = 3e8 / 3.5e9
    etx = np.stack([np.zeros(4), np.arange(4) * 0.5 * lam, np.zeros(4)], -1)
    erx = np.stack([np.zeros(2), np.arange(2) * 0.5 * lam, np.zeros(2)], -1)
    links = [build_cdl_link("CDL-A", 300.0, 3.5e9, etx, erx, ue_velocity=0.4, seed=i)
             for i in range(2)]
    bl = stack_links(links)
    t = np.arange(14) * (5e-4 / 14)
    h = batched_frequency_response(bl, t, subcarrier_freqs(48, 30e3), scale=3.0)
    return _fetch(h)


def _tiny_link(n_prb=4, n_links=2, mcs=10, n_layers=2):
    import __graft_entry__ as ge

    return ge._example_link_batch(n_prb=n_prb, n_links=n_links, mcs=mcs,
                                  n_layers=n_layers)


def stage_example_inputs():
    """Full _example_link_batch input build -> fetch sums of each input."""
    g, (tb, w, h, noise), tbs = _tiny_link()
    return _fetch(tb.astype("float32")) + _fetch(w) + _fetch(h) + _fetch(noise)


def stage_transmit():
    """sch_transmit (encode+QAM+precode) alone -> fetch grid abs-sum."""
    import jax

    from isac_tpu.phy.chains import sch_transmit

    g, (tb, w, h, noise), tbs = _tiny_link()

    @jax.jit
    def f(tb_, w_):
        grid, _ = sch_transmit(tb_[0], g, w=w_[0])
        return grid

    return _fetch(f(tb, w))


def stage_channel_apply():
    """transmit -> channel einsum -> +noise (no receive) -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.phy.chains import sch_transmit

    g, (tb, w, h, noise), tbs = _tiny_link()

    @jax.jit
    def f(tb_, w_, h_, ns_):
        grid, _ = sch_transmit(tb_[0], g, w=w_[0])
        rx = jnp.einsum("tsk,skat->ask", grid, h_[0],
                        preferred_element_type=jnp.complex64)
        return rx + ns_[0]

    return _fetch(f(tb, w, h, noise))


def stage_receive():
    """Full one-link chain incl. sch_receive -> fetch sinr+crc."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.phy.chains import sch_receive, sch_transmit

    g, (tb, w, h, noise), tbs = _tiny_link()

    @jax.jit
    def f(tb_, w_, h_, ns_):
        grid, _ = sch_transmit(tb_[0], g, w=w_[0])
        rx = jnp.einsum("tsk,skat->ask", grid, h_[0],
                        preferred_element_type=jnp.complex64) + ns_[0]
        out = sch_receive(rx, g, n_ldpc_iter=2)
        return jnp.sum(out["sinr_db"]) + jnp.sum(out["crc_ok"].astype(jnp.float32))

    return float(np.asarray(f(tb, w, h, noise)))


def stage_vmap_link():
    """make_sharded_link_step (vmapped full chain) -> fetch."""
    import jax.numpy as jnp

    from isac_tpu.parallel.links import make_sharded_link_step

    g, (tb, w, h, noise), tbs = _tiny_link()
    fn, _ = make_sharded_link_step(g, mesh=None)
    out = fn(tb, w, h, noise)
    return float(np.asarray(
        jnp.sum(out["sinr_db"]) + jnp.sum(out["crc_ok"].astype(jnp.float32))))


def stage_scan_link():
    """The bench's fenced scan over the vmapped chain (tiny shapes)."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.parallel.links import make_sharded_link_step
    from isac_tpu.utils import xfer

    g, (tb, w, h, noise), tbs = _tiny_link()
    fn, _ = make_sharded_link_step(g, mesh=None)
    rng = np.random.default_rng(1)
    n_steps = 2
    tb_s = jnp.asarray(rng.integers(0, 2, (n_steps, *tb.shape)).astype(np.int8))
    ns_s = xfer.asarray(
        ((rng.standard_normal((n_steps, *noise.shape))
          + 1j * rng.standard_normal((n_steps, *noise.shape))) * np.sqrt(0.5)
         ).astype(np.complex64))

    @jax.jit
    def run(xs):
        def body(acc, x):
            tb_i, ns_i = x
            out = fn(tb_i, w, h, ns_i)
            return acc + jnp.sum(out["sinr_db"]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    return float(np.asarray(run((tb_s, ns_s))))


def stage_sensing_prep():
    """bench_sensing's prep (scale + OFDM modulate) -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.config.params import GNBParams, ULA
    from isac_tpu.ops.ofdm import ofdm_modulate
    from isac_tpu.utils import xfer

    gnb = GNBParams(antenna=ULA(n_v=2, polarizations=2))
    carrier = gnb.carrier
    info = carrier.ofdm
    n_sc = carrier.n_sc
    rng = np.random.default_rng(0)
    grid = ((rng.integers(0, 2, (gnb.num_tx_ants, 2 * 14, n_sc)) * 2 - 1)
            + 1j * (rng.integers(0, 2, (gnb.num_tx_ants, 2 * 14, n_sc)) * 2 - 1)
            ).astype(np.complex64) / np.sqrt(2)

    @jax.jit
    def prep(g):
        gs = g * jnp.complex64(2.0)
        return ofdm_modulate(gs, info).T

    return _fetch(prep(xfer.asarray(grid)))


def stage_sensing_echo():
    """mono_static_sensing on tiny shapes -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.config.params import GNBParams, ULA
    from isac_tpu.ops.ofdm import ofdm_modulate
    from isac_tpu.ops.sensing import derive_radar_params, mono_static_sensing
    from isac_tpu.utils import xfer

    gnb = GNBParams(antenna=ULA(n_v=2, polarizations=2))
    carrier = gnb.carrier
    info = carrier.ofdm
    n_sc = carrier.n_sc
    num_slots = 2
    p = derive_radar_params(gnb, carrier, np.array([[120.0, 40.0, 1.5]]),
                            np.array([1.0]), np.array([7.0]), num_slots)
    rng = np.random.default_rng(0)
    grid = ((rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc)) * 2 - 1)
            + 1j * rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc))
            ).astype(np.complex64)

    @jax.jit
    def prep(g):
        return ofdm_modulate(g, info).T

    tx_wave = prep(xfer.asarray(grid))
    key = np.array([7, 0], np.uint32)
    import jax.numpy as jnp

    @jax.jit
    def echo(wave, k):
        return mono_static_sensing(wave, p, info, n_sc, num_slots, k)

    rx_grid = echo(tx_wave, jnp.asarray(key))
    return _fetch(rx_grid)


def stage_sensing_rdm():
    """range_doppler_map + CFAR on tiny internally-built data -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.ops.sensing import range_doppler_map
    from isac_tpu.ops.sensing.cfar import cfar_detect_map  # noqa: F401

    @jax.jit
    def f(xr, xi):
        rx = jax.lax.complex(xr, xi)
        tx = jax.lax.complex(xi, xr)
        rdm = range_doppler_map(rx, tx, 64, 32)
        return jnp.sum(jnp.abs(rdm) ** 2).astype(jnp.float32)

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((2, 28, 48)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((2, 28, 48)).astype(np.float32))
    return float(np.asarray(f(xr, xi)))


def stage_eigh_internal():
    """complex eigh on an internally-built hermitian matrix -> fetch (DoA)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(xr, xi):
        a = jax.lax.complex(xr, xi)
        r = a @ a.conj().T + 16 * jnp.eye(a.shape[0], dtype=a.dtype)
        w, v = jnp.linalg.eigh(r)
        return jnp.sum(w).astype(jnp.float32) + jnp.sum(jnp.abs(v)).astype(jnp.float32)

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((16, 40)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((16, 40)).astype(np.float32))
    return float(np.asarray(f(xr, xi)))


def stage_int8_scan():
    """int8 inputs under scan (bench tb_s pattern) -> fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xs):
        def body(acc, x):
            return acc + jnp.sum(x.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    xs = jnp.asarray(np.ones((3, 8, 16), np.int8))
    return float(np.asarray(run(xs)))


def stage_uint32_scan():
    """uint32 key xs under lax.scan + jax.random inside the body -> fetch."""
    import jax
    import jax.numpy as jnp

    keys = jnp.asarray(np.stack([np.array([7, i], np.uint32) for i in range(3)]))

    @jax.jit
    def run(ks):
        def body(acc, k):
            kr, ki = jax.random.split(k)  # legacy raw uint32[2] key, as in bench
            return acc + jnp.sum(jax.random.normal(kr, (8,), jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), ks)
        return acc

    return float(np.asarray(run(keys)))


def stage_complex_scan():
    """Device-built complex xs under lax.scan, trivial body -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.utils import xfer

    rng = np.random.default_rng(0)
    xs = xfer.asarray((rng.standard_normal((3, 8, 16))
                       + 1j * rng.standard_normal((3, 8, 16))).astype(np.complex64))

    @jax.jit
    def run(xs_):
        def body(acc, x):
            return acc + jnp.sum(jnp.abs(x)).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs)))


def stage_tuple_scan():
    """Tuple (int8, f32) xs under lax.scan -> fetch."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(np.ones((3, 8), np.int8))
    b = jnp.asarray(np.ones((3, 4), np.float32))

    @jax.jit
    def run(xs_):
        def body(acc, x):
            xa, xb = x
            return acc + jnp.sum(xa.astype(jnp.float32)) + jnp.sum(xb), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run((a, b))))


def stage_closure_scan():
    """Scan whose body closes over a device-built complex array -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.utils import xfer

    rng = np.random.default_rng(0)
    h = xfer.asarray((rng.standard_normal((8, 16))
                      + 1j * rng.standard_normal((8, 16))).astype(np.complex64))
    xs = jnp.asarray(np.ones((3, 8), np.float32))

    @jax.jit
    def run(xs_):
        def body(acc, x):
            v = jnp.sum(jnp.abs(h * x.astype(jnp.complex64)[:, None]))
            return acc + v.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs)))


def stage_receive_scan():
    """Scan over the one-link receive chain (no vmap) -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.phy.chains import sch_receive, sch_transmit
    from isac_tpu.utils import xfer

    g, (tb, w, h, noise), tbs = _tiny_link()
    rng = np.random.default_rng(1)
    n_steps = 2
    ns_s = xfer.asarray(
        ((rng.standard_normal((n_steps, *noise.shape))
          + 1j * rng.standard_normal((n_steps, *noise.shape))) * np.sqrt(0.5)
         ).astype(np.complex64))

    @jax.jit
    def run(xs):
        def body(acc, ns_i):
            grid, _ = sch_transmit(tb[0], g, w=w[0])
            rx = jnp.einsum("tsk,skat->ask", grid, h[0],
                            preferred_element_type=jnp.complex64) + ns_i[0]
            out = sch_receive(rx, g, n_ldpc_iter=2)
            return acc + jnp.sum(out["sinr_db"]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    return float(np.asarray(run(ns_s)))


def stage_while_in_scan():
    """lax.while_loop nested inside lax.scan -> fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xs):
        def body(acc, x):
            def cond(c):
                i, v = c
                return (i < 5) & (jnp.sum(v) < 1e6)

            def step(c):
                i, v = c
                return i + 1, v * 1.5 + x

            _, v = jax.lax.while_loop(cond, step, (jnp.int32(0), x))
            return acc + jnp.sum(v), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    xs = jnp.asarray(np.ones((3, 8), np.float32))
    return float(np.asarray(run(xs)))


def stage_decode_in_scan():
    """Flooding LDPC decode (early_exit while_loop) inside a scan -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.ops import ldpc

    code = ldpc.lifted_code(1, 16)
    rng = np.random.default_rng(3)
    llr = jnp.asarray(rng.standard_normal((2, 1, code.n_full)).astype(np.float32))

    @jax.jit
    def run(xs):
        def body(acc, x):
            hard, ok = ldpc.decode(x, 1, 16, n_iter=3, early_exit=True)
            return acc + jnp.sum(hard.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    return float(np.asarray(run(llr)))


def stage_chanest_scan():
    """DM-RS estimate + MMSE under scan -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.ops.channel_est import estimate_channel_canonical, mmse_equalize
    from isac_tpu.phy.chains import _dmrs_refs, _layout, dmrs_ports
    from isac_tpu.utils import xfer

    g, (tb, w, h, noise), tbs = _tiny_link()
    lay = _layout(g.layout_key())
    refs = xfer.asarray(_dmrs_refs(g, lay["dsyms"]))
    ports = dmrs_ports(g.n_layers)
    rng = np.random.default_rng(1)
    n_steps = 2
    n_sc_c = g.n_prb * 12
    xs = xfer.asarray(
        ((rng.standard_normal((n_steps, 2, 14, n_sc_c))
          + 1j * rng.standard_normal((n_steps, 2, 14, n_sc_c)))
         ).astype(np.complex64))

    @jax.jit
    def run(xs_):
        def body(acc, rx_c):
            hh, nvar = estimate_channel_canonical(
                rx_c, refs, ports, lay["dsyms"], g.n_prb, n_basis=3, prg_prbs=2)
            eq, sinr = mmse_equalize(rx_c, hh, nvar)
            return acc + jnp.sum(sinr).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs)))


def stage_decode_chain_scan():
    """sch_decode (rate_recover + layered Pallas + CRC) under scan -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.phy.chains import _layout
    from isac_tpu.ops import transport

    g, (tb, w, h, noise), tbs = _tiny_link()
    lay = _layout(g.layout_key())
    cfg = lay["cfg"]
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((2, cfg.g)).astype(np.float32) * 4)

    @jax.jit
    def run(xs_):
        def body(acc, llr):
            tb_, ok, bufs = transport.sch_decode(llr, cfg, 0, None, n_iter=2)
            return acc + jnp.sum(tb_.astype(jnp.float32)) + ok.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs)))


def stage_chanest_only_scan():
    """estimate_channel_canonical alone under scan -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.ops.channel_est import estimate_channel_canonical
    from isac_tpu.phy.chains import _dmrs_refs, _layout, dmrs_ports
    from isac_tpu.utils import xfer

    g, (tb, w, h, noise), tbs = _tiny_link()
    lay = _layout(g.layout_key())
    refs = xfer.asarray(_dmrs_refs(g, lay["dsyms"]))
    ports = dmrs_ports(g.n_layers)
    rng = np.random.default_rng(1)
    n_sc_c = g.n_prb * 12
    xs = xfer.asarray(
        ((rng.standard_normal((2, 2, 14, n_sc_c))
          + 1j * rng.standard_normal((2, 2, 14, n_sc_c)))
         ).astype(np.complex64))

    @jax.jit
    def run(xs_):
        def body(acc, rx_c):
            hh, nvar = estimate_channel_canonical(
                rx_c, refs, ports, lay["dsyms"], g.n_prb, n_basis=3, prg_prbs=2)
            return acc + (jnp.sum(jnp.abs(hh)) + jnp.sum(nvar)).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs)))


def stage_mmse_only_scan():
    """mmse_equalize alone under scan (random h/nvar) -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.ops.channel_est import mmse_equalize
    from isac_tpu.utils import xfer

    rng = np.random.default_rng(1)
    n_sc_c = 48
    xs = xfer.asarray(
        ((rng.standard_normal((2, 2, 14, n_sc_c))
          + 1j * rng.standard_normal((2, 2, 14, n_sc_c)))
         ).astype(np.complex64))
    hh = xfer.asarray(
        ((rng.standard_normal((2, 14, n_sc_c, 2, 2))
          + 1j * rng.standard_normal((2, 14, n_sc_c, 2, 2)))
         ).astype(np.complex64))

    @jax.jit
    def run(xs_):
        def body(acc, rx_c):
            eq, sinr = mmse_equalize(rx_c, hh[0], jnp.float32(0.1))
            return acc + jnp.sum(sinr).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs)))


def stage_closure_arg_scan():
    """Same as closure_scan but the complex array enters as a jit ARG -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.utils import xfer

    rng = np.random.default_rng(0)
    h = xfer.asarray((rng.standard_normal((8, 16))
                      + 1j * rng.standard_normal((8, 16))).astype(np.complex64))
    xs = jnp.asarray(np.ones((3, 8), np.float32))

    @jax.jit
    def run(xs_, h_):
        def body(acc, x):
            v = jnp.sum(jnp.abs(h_ * x.astype(jnp.complex64)[:, None]))
            return acc + v.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs, h)))


def stage_np_const_scan():
    """np complex constant embedded in a scan body -> fetch."""
    import jax
    import jax.numpy as jnp

    const = (np.arange(16) + 1j * np.arange(16)).astype(np.complex64).reshape(4, 4)
    xs = jnp.asarray(np.ones((3, 4), np.float32))

    @jax.jit
    def run(xs_):
        def body(acc, x):
            v = jnp.sum(jnp.abs(jnp.asarray(const) * x.astype(jnp.complex64)[:, None]))
            return acc + v.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    return float(np.asarray(run(xs)))


def stage_receive_scan_args():
    """receive chain under scan with w/h/refs as jit ARGS -> fetch."""
    import jax
    import jax.numpy as jnp

    from isac_tpu.phy.chains import sch_receive, sch_transmit
    from isac_tpu.utils import xfer

    g, (tb, w, h, noise), tbs = _tiny_link()
    rng = np.random.default_rng(1)
    n_steps = 2
    ns_s = xfer.asarray(
        ((rng.standard_normal((n_steps, *noise.shape))
          + 1j * rng.standard_normal((n_steps, *noise.shape))) * np.sqrt(0.5)
         ).astype(np.complex64))

    @jax.jit
    def run(xs, w_, h_):
        def body(acc, ns_i):
            grid, _ = sch_transmit(tb[0], g, w=w_[0])
            rx = jnp.einsum("tsk,skat->ask", grid, h_[0],
                            preferred_element_type=jnp.complex64) + ns_i[0]
            out = sch_receive(rx, g, n_ldpc_iter=2)
            return acc + jnp.sum(out["sinr_db"]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    return float(np.asarray(run(ns_s, w, h)))


def _d2h(dtype):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda: (jnp.arange(8, dtype=jnp.float32),
                         jnp.arange(8).astype(dtype)))
    a, b = f()
    np.asarray(a)
    return float(np.asarray(b).astype(np.float64).sum())


def stage_d2h_bool():
    """bool device->host fetch."""
    import jax.numpy as jnp

    return _d2h(jnp.bool_)


def stage_d2h_int8():
    import jax.numpy as jnp

    return _d2h(jnp.int8)


def stage_d2h_int32():
    import jax.numpy as jnp

    return _d2h(jnp.int32)


STAGES = [
    "xfer_roundtrip", "freq_response", "example_inputs", "transmit",
    "channel_apply", "receive", "vmap_link", "scan_link",
    "sensing_prep", "sensing_echo", "sensing_rdm", "eigh_internal",
    "int8_scan", "uint32_scan", "complex_scan", "tuple_scan",
    "closure_scan", "receive_scan", "while_in_scan", "decode_in_scan", "chanest_scan", "decode_chain_scan", "chanest_only_scan", "mmse_only_scan", "closure_arg_scan", "np_const_scan", "receive_scan_args", "d2h_bool", "d2h_int8", "d2h_int32",
]


def main():
    if len(sys.argv) >= 2 and sys.argv[1] != "--all":
        name = sys.argv[1]
        try:
            v = globals()[f"stage_{name}"]()
            print(json.dumps({"stage": name, "ok": True, "value": float(v)}))
        except Exception as e:
            print(json.dumps({"stage": name, "ok": False,
                              "err": repr(e)[:300]}))
        return
    results = {}
    for name in STAGES:
        try:
            p = subprocess.run([sys.executable, __file__, name],
                               capture_output=True, text=True, timeout=900)
            line = None
            for ln in reversed(p.stdout.strip().splitlines()):
                try:
                    line = json.loads(ln)
                    break
                except Exception:
                    continue
            results[name] = line or {"ok": False, "err": (
                p.stderr.strip().splitlines() or ["no output"])[-1][:200]}
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "err": "timeout"}
        print(f"{name}: {results[name]}", flush=True)
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(f"\n{n_ok}/{len(STAGES)} stages OK")


if __name__ == "__main__":
    main()
