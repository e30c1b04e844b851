"""Prototype scatter-free DM-RS + broadcast PRG precode vs current forms."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from isac_tpu.utils.compcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from bench import _fenced_scan
from isac_tpu.ops import transport
from isac_tpu.ops.modulation import modulate
from isac_tpu.phy import chains

N_PRB, N_LINKS, MCS, L = 273, 4, 19, 2
print("backend", jax.default_backend(), flush=True)
g, (tb, w, h, noise), tbs = ge._example_link_batch(
    n_prb=N_PRB, n_links=N_LINKS, mcs=MCS, n_layers=L)
lay = chains._layout(g.layout_key())
cfg = lay["cfg"]
seq = jnp.asarray(np.stack([chains._scrambling_seq(g, cfg.g)] * N_LINKS))
from isac_tpu.utils import xfer
refs = xfer.asarray(np.stack([chains._dmrs_refs(g, lay["dsyms"])] * N_LINKS))
rng = np.random.default_rng(0)
n_steps = 6
tb_s = jnp.asarray(rng.integers(0, 2, (n_steps, *tb.shape)).astype(np.int8))
mod = g.modulation
ports = chains.dmrs_ports(L)
n_sc_c = lay["n_sc_c"]; dsyms = lay["dsyms"]
data_syms = lay["data_syms"]
n_prb = N_PRB

def fsum(x): return jnp.sum(jnp.real(x).astype(jnp.float32) * 1e-6)

def dmrs_rows_interleave(refs_, ports_, n_sc_c_):
    """[n_ports, n_dsym, n_sc_c] DM-RS symbol ROWS without scatter: comb-2
    interleave via stack+reshape (values at delta::2)."""
    npr = n_sc_c_ // 12
    occ = np.tile(np.array([1.0, -1.0], np.float32), 3 * npr)
    out = []
    for port in ports_:
        delta = port // 2
        vals = refs_ if port % 2 == 0 else refs_ * jnp.asarray(occ)
        z = jnp.zeros_like(vals)
        pair = (vals, z) if delta == 0 else (z, vals)
        row = jnp.stack(pair, axis=-1).reshape(*vals.shape[:-1], n_sc_c_)
        out.append(row)
    return jnp.stack(out)  # [P, n_dsym, n_sc_c]

def rows_from(x, dmrs_rows):
    xd = x.reshape(L, len(data_syms), n_sc_c)
    pos = {s2: i for i, s2 in enumerate(data_syms)}
    dpos = {s2: i for i, s2 in enumerate(dsyms)}
    rows = [xd[:, pos[s2]] if s2 in pos else dmrs_rows[:, dpos[s2], :]
            for s2 in range(14)]
    return jnp.stack(rows, axis=1)

def prg_bcast(lgr, ww):
    n_sc = lgr.shape[-1]
    w_sc = jnp.repeat(ww, 24, axis=0)[:n_sc]  # [K, P, L]
    out = 0.0
    for l in range(L):
        out = out + jnp.transpose(w_sc[:, :, l])[:, None, :] * lgr[l][None]
    return out

def stage(name, step, consts=()):
    dt, fx, _, sp = _fenced_scan(step, tb_s, n_steps, consts=consts)
    print(f"{name:24s} {dt*1e3:7.3f} ms (spread {sp:.2f})", flush=True)

def v1(tb_i, seq_, refs_, w_):
    def one(t, s, r, ww):
        d = modulate(transport.sch_encode(t, cfg, jnp.int32(0)), mod, scramble=s)
        x = chains.layer_map(d, L)
        dmrs = chains._dmrs_port_grid(r, ports, n_sc_c, dsyms)
        xd = x.reshape(L, len(data_syms), n_sc_c)
        pos = {s2: i for i, s2 in enumerate(data_syms)}
        rows = [xd[:, pos[s2]] if s2 in pos else dmrs[:, s2, :] for s2 in range(14)]
        lgr = jnp.stack(rows, axis=1)
        return fsum(chains._prg_precode_canonical(lgr, ww))
    return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_, w_))
stage("current (scatter+einsum)", v1, consts=(seq, refs, w))

def v2(tb_i, seq_, refs_, w_):
    def one(t, s, r, ww):
        d = modulate(transport.sch_encode(t, cfg, jnp.int32(0)), mod, scramble=s)
        x = chains.layer_map(d, L)
        dr = dmrs_rows_interleave(r, ports, n_sc_c)
        lgr = rows_from(x, dr)
        return fsum(chains._prg_precode_canonical(lgr, ww))
    return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_, w_))
stage("interleave dmrs", v2, consts=(seq, refs, w))

def v3(tb_i, seq_, refs_, w_):
    def one(t, s, r, ww):
        d = modulate(transport.sch_encode(t, cfg, jnp.int32(0)), mod, scramble=s)
        x = chains.layer_map(d, L)
        dr = dmrs_rows_interleave(r, ports, n_sc_c)
        lgr = rows_from(x, dr)
        return fsum(prg_bcast(lgr, ww))
    return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_, w_))
stage("interleave+bcast-precode", v3, consts=(seq, refs, w))

# numeric equivalence check
def both(t, s, r, ww):
    d = modulate(transport.sch_encode(t, cfg, jnp.int32(0)), mod, scramble=s)
    x = chains.layer_map(d, L)
    dmrs = chains._dmrs_port_grid(r, ports, n_sc_c, dsyms)
    xd = x.reshape(L, len(data_syms), n_sc_c)
    pos = {s2: i for i, s2 in enumerate(data_syms)}
    rows = [xd[:, pos[s2]] if s2 in pos else dmrs[:, s2, :] for s2 in range(14)]
    lgr1 = jnp.stack(rows, axis=1)
    a = chains._prg_precode_canonical(lgr1, ww)
    dr = dmrs_rows_interleave(r, ports, n_sc_c)
    lgr2 = rows_from(x, dr)
    b = prg_bcast(lgr2, ww)
    return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(lgr1 - lgr2))
mx = jax.jit(both)(tb_s[0, 0], seq[0], refs[0], w[0])
print("max diff precode/grid:", float(mx[0]), float(mx[1]), flush=True)
