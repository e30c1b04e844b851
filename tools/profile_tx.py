"""Fenced sub-stage profile of the 273-PRB PDSCH chain on the current
backend (r5 sequel to the r4 budget in RELAY_NOTES.md).

Each stage is timed with bench.py's two-point fenced scan (median of 3), so
numbers are marginal per-step seconds with the relay RTT excluded. Run:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_tx.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from isac_tpu.utils.compcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from bench import _fenced_scan  # noqa: E402
from isac_tpu.ops import transport  # noqa: E402
from isac_tpu.ops.modulation import demodulate_llr, descramble_llr, modulate  # noqa: E402
from isac_tpu.phy import chains  # noqa: E402
from isac_tpu.ops.channel_est import estimate_channel_canonical, mmse_equalize  # noqa: E402

N_PRB, N_LINKS, MCS, L = 273, 4, 19, 2


def main():
    print("backend", jax.default_backend(), flush=True)
    g, (tb, w, h, noise), tbs = ge._example_link_batch(
        n_prb=N_PRB, n_links=N_LINKS, mcs=MCS, n_layers=L)
    lay = chains._layout(g.layout_key())
    cfg = lay["cfg"]
    seq = jnp.asarray(np.stack([chains._scrambling_seq(g, cfg.g)] * N_LINKS))
    from isac_tpu.utils import xfer
    refs = xfer.asarray(np.stack([chains._dmrs_refs(g, lay["dsyms"])] * N_LINKS))
    prbs = jnp.asarray(np.stack([np.asarray(g.prbs, np.int32)] * N_LINKS))
    rv = jnp.asarray(np.zeros(N_LINKS, np.int32))
    rng = np.random.default_rng(0)
    n_steps = 6
    tb_s = jnp.asarray(rng.integers(0, 2, (n_steps, *tb.shape)).astype(np.int8))

    mod = g.modulation

    def fsum(x):
        return jnp.sum(jnp.real(x).astype(jnp.float32) * 1e-6)

    stages = {}

    def stage(name, step, consts=()):
        dt, fixed, _, spread = _fenced_scan(step, tb_s, n_steps, consts=consts)
        stages[name] = dt
        print(f"{name:24s} {dt*1e3:8.3f} ms  (fixed {fixed*1e3:.1f} ms, "
              f"spread {spread:.2f})", flush=True)

    # (1) encode only
    stage("encode", lambda tb_i: fsum(
        jax.vmap(lambda t: transport.sch_encode(t, cfg, jnp.int32(0)))(tb_i)))

    # (2) encode + scramble/modulate
    def enc_mod(tb_i, seq_):
        def one(t, s):
            return fsum(modulate(transport.sch_encode(t, cfg, jnp.int32(0)),
                                 mod, scramble=s))
        return jnp.sum(jax.vmap(one)(tb_i, seq_))
    stage("encode+mod", enc_mod, consts=(seq,))

    # (3) full transmit (grid + precode + place)
    fn_tx = chains._make_tx_fn(g.layout_key(), "prg", False, True)

    def tx_full(tb_i, seq_, refs_, w_):
        def one(t, s, r, ww):
            return fsum(fn_tx(t, s, r, prbs[0], jnp.int32(0), ww, None))
        return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_, w_))
    stage("tx_full", tx_full, consts=(seq, refs, w))

    # (4) tx + channel + noise
    def tx_chan(tb_i, seq_, refs_, w_, h_, ns_):
        def one(t, s, r, ww, hh, nn):
            grid = fn_tx(t, s, r, prbs[0], jnp.int32(0), ww, None)
            rx = jnp.einsum("tsk,skat->ask", grid, hh,
                            preferred_element_type=jnp.complex64) + nn
            return fsum(rx)
        return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_, w_, h_, ns_))
    ns = xfer.asarray(((rng.standard_normal((N_LINKS, 2, 14, N_PRB * 12))
                        + 1j * rng.standard_normal((N_LINKS, 2, 14, N_PRB * 12)))
                       * np.sqrt(0.5)).astype(np.complex64))
    stage("tx+chan", tx_chan, consts=(seq, refs, w, h, ns))

    # (5) + channel estimate
    ports = chains.dmrs_ports(L)
    n_basis = 6

    def mk_rx(upto):
        def rx_part(tb_i, seq_, refs_, w_, h_, ns_):
            def one(t, s, r, ww, hh, nn):
                grid = fn_tx(t, s, r, prbs[0], jnp.int32(0), ww, None)
                rx = jnp.einsum("tsk,skat->ask", grid, hh,
                                preferred_element_type=jnp.complex64) + nn
                rc = jax.lax.dynamic_slice(
                    rx, (0, 0, 0), (rx.shape[0], rx.shape[1], 12 * N_PRB))
                hh2, nv = estimate_channel_canonical(
                    rc, r, ports, lay["dsyms"], N_PRB, n_basis=n_basis,
                    prg_prbs=2)
                if upto == "est":
                    return fsum(hh2) + nv
                eq, sinr = mmse_equalize(rc, hh2, nv)
                if upto == "mmse":
                    return fsum(eq) + fsum(sinr)
                ds = jnp.asarray(np.asarray(lay["data_syms"], np.int32))
                data = eq[:, ds, :].reshape(eq.shape[0], lay["n_re"])
                re_sinr = sinr[:, ds, :].reshape(sinr.shape[0], lay["n_re"])
                llr = demodulate_llr(data, 1.0 / jnp.maximum(re_sinr, 1e-9), mod)
                llr = chains._relayer_llrs(llr.reshape(-1), L, g.qm, lay["n_re"])
                llr = descramble_llr(llr, s)
                llr = jnp.clip(llr, -60.0, 60.0)
                if upto == "demod":
                    return jnp.sum(llr) * 1e-6
                tb2, ok, _ = transport.sch_decode(llr, cfg, jnp.int32(0),
                                                  None, n_iter=6)
                return fsum(ok.astype(jnp.float32)) + fsum(tb2[:64])
            return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_, w_, h_, ns_))
        return rx_part

    for upto in ("est", "mmse", "demod", "full"):
        stage(f"chain->{upto}", mk_rx(upto), consts=(seq, refs, w, h, ns))

    print({k: round(v * 1e3, 3) for k, v in stages.items()})


if __name__ == "__main__":
    main()
