"""Prototype rx-side rewrites (273 PRB, 4 links): channel-apply einsum vs
fused multiply-reduce; demod masked-min vs closed-form Gray max-log."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from isac_tpu.utils.compcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from bench import _fenced_scan
from isac_tpu.ops.modulation import _axis_levels, MODULATION_ORDERS
from isac_tpu.phy import chains

N_PRB, N_LINKS, L = 273, 4, 2
n_tx, K = 16, N_PRB * 12
print("backend", jax.default_backend(), flush=True)
g_, (tb, w, h, noise), _ = ge._example_link_batch(
    n_prb=N_PRB, n_links=N_LINKS, mcs=19, n_layers=L)
n_steps = 6
keys = jnp.asarray(np.stack([np.array([11, i], np.uint32) for i in range(n_steps)]))

def stage(name, step, consts=()):
    dt, fx, _, sp = _fenced_scan(step, keys, n_steps, consts=consts)
    print(f"{name:26s} {dt*1e3:7.3f} ms (spread {sp:.2f})", flush=True)

def mk_grid(k):
    kr, ki = jax.random.split(k)
    return (jax.random.normal(kr, (N_LINKS, n_tx, 14, K), jnp.float32)
            + 1j * jax.random.normal(ki, (N_LINKS, n_tx, 14, K), jnp.float32)
            ).astype(jnp.complex64)

def chan_einsum(k, h_):
    grid = mk_grid(k)
    rx = jax.vmap(lambda gg, hh: jnp.einsum("tsk,skat->ask", gg, hh,
                                            preferred_element_type=jnp.complex64))(grid, h_)
    return jnp.sum(jnp.real(rx)) * 1e-6
stage("chan einsum", chan_einsum, consts=(h,))

def chan_bcast(k, h_):
    grid = mk_grid(k)
    def one(gg, hh):
        # hh [S,K,a,t] -> [a,t,S,K]; fused mul + reduce over t
        ht = jnp.transpose(hh, (2, 3, 0, 1))
        return jnp.sum(ht * gg[None], axis=1)  # [a,S,K]
    rx = jax.vmap(one)(grid, h_)
    return jnp.sum(jnp.real(rx)) * 1e-6
stage("chan bcast-reduce", chan_bcast, consts=(h,))

def chan_bcast_pre(k, ht_):
    grid = mk_grid(k)
    rx = jax.vmap(lambda gg, hh: jnp.sum(hh * gg[None], axis=1))(grid, ht_)
    return jnp.sum(jnp.real(rx)) * 1e-6
ht = jax.jit(lambda x: jnp.transpose(x, (0, 3, 4, 1, 2)))(h)  # [L,a,t,S,K]
stage("chan bcast (pre-T h)", chan_bcast_pre, consts=(ht,))

# equivalence
gg0 = mk_grid(keys[0])
a_ = jax.jit(lambda gg, hh: jnp.einsum("tsk,skat->ask", gg, hh,
             preferred_element_type=jnp.complex64))(gg0[0], h[0])
b_ = jax.jit(lambda gg, hh: jnp.sum(jnp.transpose(hh, (2,3,0,1)) * gg[None], axis=1))(gg0[0], h[0])
print("chan max|diff|:", float(jnp.max(jnp.abs(a_ - b_))),
      " max|a|:", float(jnp.max(jnp.abs(a_))), flush=True)

# ---- demod variants on [L, n_re] symbols
n_re = lay_n = chains._layout(g_.layout_key())["n_re"]
qm = 6
def mk_sym(k):
    kr, ki = jax.random.split(k)
    return ((jax.random.normal(kr, (N_LINKS, L, n_re), jnp.float32)
             + 1j * jax.random.normal(ki, (N_LINKS, L, n_re), jnp.float32))
            * 0.5).astype(jnp.complex64)

from isac_tpu.ops.modulation import demodulate_llr
def demod_cur(k):
    sym = mk_sym(k)
    llr = demodulate_llr(sym, 0.1, "64QAM")
    return jnp.sum(llr) * 1e-6
stage("demod masked-min", demod_cur)

def gray_pam_llr(y, m):
    """Exact max-log LLRs for 2^m-level Gray PAM (unit-scaled levels
    +-1,+-3,...). Returns [..., m] (bit 0 = MSB/sign)."""
    outs = []
    t = y
    half = float(1 << (m - 1))
    for j in range(m):
        lev = float(1 << (m - 1 - j))
        if j == 0:
            llr = 4.0 * lev * t  # sign bit: distance diff linear in t... see below
        else:
            llr = 4.0 * lev * t
        outs.append(llr)
        t = lev - jnp.abs(t) if j == 0 else lev - jnp.abs(t)
    return jnp.stack(outs, axis=-1)

def demod_closed(k):
    """Closed-form recursive Gray max-log (the |.|-folding recursion):
    llr_j = 4*2^(m-1-j)*t_j with t_{j+1} = 2^(m-1-j) - |t_j| — EXACT max-log
    for interior points, approximate at boundaries; check vs masked-min."""
    sym = mk_sym(k)
    scale = np.float32(np.sqrt(42.0))
    m = qm // 2
    def axis_llr(y):
        t = y * scale
        outs = []
        for j in range(m):
            lev = float(1 << (m - 1 - j))
            outs.append(t * (2.0 * lev) if j == 0 else t * (2.0 * lev))
            t = lev - jnp.abs(t)
        return jnp.stack(outs, axis=-1)
    li = axis_llr(sym.real); lq = axis_llr(sym.imag)
    llr = jnp.stack([li, lq], axis=-2)  # interleave I/Q... shape juggling
    llr = jnp.swapaxes(llr, -1, -2).reshape(*sym.shape[:-1], sym.shape[-1] * qm)
    return jnp.sum(llr / (0.1 * 42.0)) * 1e-6
stage("demod closed-form", demod_closed)
