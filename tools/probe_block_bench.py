import time, numpy as np
from isac_tpu.utils.compcache import enable_persistent_cache
enable_persistent_cache()
from isac_tpu.config.params import SimulationParameters, assign_cell_parameters
from isac_tpu.config.scenarios import open_street_map_city
from isac_tpu.sim.cell import CellSimulator
import jax
print("backend", jax.default_backend(), flush=True)

sim = open_street_map_city(SimulationParameters())
cells = assign_cell_parameters(sim)
for block in (8, 0):
    kw = dict(n_rb_override=51, nfft_override=1024, block_slots=block)
    t0 = time.perf_counter()
    cs = CellSimulator(cells[0], seed=1, **kw)
    cs.run()
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    cs2 = CellSimulator(cells[0], seed=1, **kw)  # identical signatures
    cs2.run()
    t_cached = time.perf_counter() - t0
    n = cs2.num_slots
    nseg = len(getattr(cs2, "_seg_fns", {}))
    print(f"block={block} warm={t_warm:.1f}s cached={t_cached:.2f}s "
          f"slots/s={n/t_cached:.2f} seg_sigs={nseg}", flush=True)
