"""Break an engine frame into host-plan / dispatch / fetch wall time."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from isac_tpu.utils.compcache import enable_persistent_cache
enable_persistent_cache()
import jax
print("backend", jax.default_backend(), flush=True)

from isac_tpu.config.params import SimulationParameters, assign_cell_parameters
from isac_tpu.config.scenarios import open_street_map_city
from isac_tpu.sim import cell as cellmod
from isac_tpu.sim import block as blk
from isac_tpu.sim.cell import CellSimulator

T = {"fetch": 0.0, "fetch_n": 0, "fetch_bytes": 0,
     "dispatch": 0.0, "dispatch_n": 0, "args": 0.0}

orig_fetch = cellmod._fetch_packed
def fetch(leaves, flags=None):
    t0 = time.perf_counter()
    out = orig_fetch(leaves, flags)
    T["fetch"] += time.perf_counter() - t0
    T["fetch_n"] += 1
    T["fetch_bytes"] += sum(int(np.prod(x.shape)) * 4 for x in leaves)
    return out
cellmod._fetch_packed = fetch

orig_args = blk._slot_args
def slot_args(sim, p, sk):
    t0 = time.perf_counter()
    out = orig_args(sim, p, sk)
    T["args"] += time.perf_counter() - t0
    return out
blk._slot_args = slot_args

orig_disp = blk.dispatch_segment
def disp(sim, plans):
    t0 = time.perf_counter()
    out = orig_disp(sim, plans)
    T["dispatch"] += time.perf_counter() - t0
    T["dispatch_n"] += 1
    return out
blk.dispatch_segment = disp

sim = open_street_map_city(SimulationParameters())
cells = assign_cell_parameters(sim)
kw = dict(n_rb_override=51, nfft_override=1024, block_slots=8)
CellSimulator(cells[0], seed=1, **kw).run()  # warm
for k in T: T[k] = 0 if isinstance(T[k], int) else 0.0
t0 = time.perf_counter()
cs = CellSimulator(cells[0], seed=1, **kw)
cs.run()
total = time.perf_counter() - t0
print(f"total {total:.2f}s  fetch {T['fetch']:.2f}s/{T['fetch_n']} "
      f"({T['fetch_bytes']/1e6:.1f} MB packed-f32)  "
      f"dispatch(incl args) {T['dispatch']:.2f}s/{T['dispatch_n']}  "
      f"args(host) {T['args']:.2f}s  "
      f"other(host+finalize) {total - T['fetch'] - T['dispatch']:.2f}s",
      flush=True)
