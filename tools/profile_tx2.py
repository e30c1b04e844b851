"""Micro-profile of the transmit grid build (dmrs scatter vs rest)."""
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

def fsum(x): return jnp.sum(jnp.real(x).astype(jnp.float32) * 1e-6)

def stage(name, step, consts=()):
    dt, fx, _, sp = _fenced_scan(step, tb_s, n_steps, consts=consts)
    print(f"{name:20s} {dt*1e3:7.3f} ms (spread {sp:.2f})", flush=True)

# base: encode+mod+layer_map
def base(tb_i, seq_):
    def one(t, s):
        d = modulate(transport.sch_encode(t, cfg, jnp.int32(0)), mod, scramble=s)
        return fsum(chains.layer_map(d, L))
    return jnp.sum(jax.vmap(one)(tb_i, seq_))
stage("enc+mod+layer", base, consts=(seq,))

# + dmrs grid (scatter form)
def dm(tb_i, seq_, refs_):
    def one(t, s, r):
        d = modulate(transport.sch_encode(t, cfg, jnp.int32(0)), mod, scramble=s)
        x = chains.layer_map(d, L)
        dmrs = chains._dmrs_port_grid(r, ports, n_sc_c, dsyms)
        return fsum(x) + fsum(dmrs)
    return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_))
stage("+dmrs(scatter)", dm, consts=(seq, refs))

# + row stack (lg)
def lg_f(tb_i, seq_, refs_):
    def one(t, s, r):
        d = modulate(transport.sch_encode(t, cfg, jnp.int32(0)), mod, scramble=s)
        x = chains.layer_map(d, L)
        dmrs = chains._dmrs_port_grid(r, ports, n_sc_c, dsyms)
        xd = x.reshape(L, len(data_syms), n_sc_c)
        pos = {s2: i for i, s2 in enumerate(data_syms)}
        rows = [xd[:, pos[s2]] if s2 in pos else dmrs[:, s2, :] for s2 in range(14)]
        return fsum(jnp.stack(rows, axis=1))
    return jnp.sum(jax.vmap(one)(tb_i, seq_, refs_))
stage("+rowstack", lg_f, consts=(seq, refs))

# + prg precode
wdev = w
def pc(tb_i, seq_, refs_, w_):
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
stage("+prg_precode", pc, consts=(seq, refs, wdev))
