"""Engine-mode probe: warm (compile) then repeated same-seed frames for
block_slots in {8, 1, 0} — isolates steady-state execution from compile.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_block_bench.py
"""
import sys, time  # noqa: E401

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402,F401

from isac_tpu.utils.compcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import jax  # noqa: E402

from isac_tpu.config.params import SimulationParameters, assign_cell_parameters  # noqa: E402
from isac_tpu.config.scenarios import open_street_map_city  # noqa: E402
from isac_tpu.sim.cell import CellSimulator  # noqa: E402

print("backend", jax.default_backend(), flush=True)
sim = open_street_map_city(SimulationParameters())
cells = assign_cell_parameters(sim)
for block in (8, 1, 0):
    kw = dict(n_rb_override=51, nfft_override=1024, block_slots=block)
    t0 = time.perf_counter()
    cs = CellSimulator(cells[0], seed=1, **kw)
    cs.run()
    t_warm = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        cs2 = CellSimulator(cells[0], seed=1, **kw)
        cs2.run()
        times.append(time.perf_counter() - t0)
    n = cs2.num_slots
    print(f"block={block} warm={t_warm:.1f}s runs="
          f"{[round(t, 2) for t in times]} best_slots_per_s="
          f"{n / min(times):.2f}", flush=True)
