import time
import numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as ge
from isac_tpu.phy.chains import sch_transmit, sch_receive
import isac_tpu.ops.ldpc_layered as LL
g, args, tbs = ge._example_link_batch(n_prb=51, n_links=1, mcs=10, n_layers=2)
tb, w, h, noise = args
def fetch(name, jfn, *a):
    t0 = time.perf_counter()
    try:
        v = float(np.asarray(jfn(*a)))
        print(f"{name}: OK {v:.3f} ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:70]} ({time.perf_counter()-t0:.0f}s)", flush=True)
fetch("tx", jax.jit(lambda t_, w_: jnp.sum(jnp.abs(sch_transmit(t_, g, w=w_)[0]))), tb[0], w[0])
def full(t_, w_, h_, n_):
    rx = jnp.einsum("tsk,skat->ask", sch_transmit(t_, g, w=w_)[0], h_) + n_
    out = sch_receive(rx, g, n_ldpc_iter=6)
    return jnp.sum(out["sinr_db"]) + jnp.sum(out["crc_ok"].astype(jnp.float32))
orig = LL.decode_layered
LL.decode_layered = lambda llr, bg, z, n_iter=6, norm=0.75, impl=None: orig(llr, bg, z, n_iter, norm, "xla")
fetch("full chain (layered-XLA)", jax.jit(full), tb[0], w[0], h[0], noise[0])
LL.decode_layered = lambda llr, bg, z, n_iter=6, norm=0.75, impl=None: orig(llr, bg, z, n_iter, norm, "pallas")
import isac_tpu.phy.chains as CH
CH._rx_kernel.cache_clear(); CH._make_rx_fn.__dict__.pop('cache', None) if hasattr(CH._make_rx_fn,'__dict__') else None
fetch("full chain (layered-pallas)", jax.jit(full), tb[0], w[0], h[0], noise[0])
