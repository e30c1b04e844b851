"""Network-level simulation — TPU-native networkSimulation equivalent.

Capability parity with +simulation/networkSimulation.m:1-235 (SURVEY §2.7,
§3.1): validate per-cell parameter maps, build the scenario topology (OSM /
synthetic city), resolve per-link LoS by vectorized ray-blockage tests, flatten
per-cell parameters, run every cell, and aggregate network KPIs (ECDF data
replaces the reference's final ECDF plots).

Parallelism: the reference fans cells out with parfeval over a process pool
(networkSimulation.m:44-61) with zero inter-worker traffic. Here cells run
either serially or on a thread pool (`parallel="thread"` — JAX dispatch
releases the GIL, so device work from independent cells overlaps); the
mesh-sharded device path for batched multi-cell PHY lives in
isac_tpu.parallel (SURVEY §2.10).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from isac_tpu.config.params import CellParams, SimulationParameters, assign_cell_parameters
from isac_tpu.metrics.kpi import ecdf
from isac_tpu.sim.cell import CellSimulator
from isac_tpu.topology.osm import build_city


def resolve_los(cells: list, sim: SimulationParameters) -> list:
    """Build the city (once, from the first cell's CityParams) and compute LoS
    booleans per UE/target link (networkSimulation.m generateScenario:79-115,
    plotLoS:117-171). Cells without a city config keep LoS = True."""
    city = None
    for name in sim.city:
        city = build_city(sim.city[name], sim.roi)
        break
    if city is None:
        return cells
    out = []
    for cell in cells:
        gpos = np.asarray(cell.gnb.position, np.float64)
        ue_los = city.check_los(
            cell.ue_positions, np.broadcast_to(gpos, cell.ue_positions.shape)
        )
        if cell.target_positions.shape[0]:
            tg_los = city.check_los(
                cell.target_positions,
                np.broadcast_to(gpos, cell.target_positions.shape),
            )
        else:
            tg_los = np.ones(0, bool)
        out.append(cell.with_(ue_los=np.asarray(ue_los, bool),
                              target_los=np.asarray(tg_los, bool)))
    return out


def network_simulation(
    sim: SimulationParameters,
    enable_parallel_sim: bool = False,
    seed: int = 0,
    **cell_kwargs,
) -> dict:
    """Run all configured cells. Returns
    {"cells": [per-cell result], "network": aggregate KPIs}."""
    sim.validate()
    cells = assign_cell_parameters(sim)
    cells = resolve_los(cells, sim)

    def run_one(idx_cell):
        idx, cell = idx_cell
        simu = CellSimulator(cell, seed=seed + idx, **cell_kwargs)
        return simu.run()

    items = list(enumerate(cells))
    if enable_parallel_sim and len(items) > 1:
        with ThreadPoolExecutor(max_workers=min(len(items), 8)) as pool:
            results = list(pool.map(run_one, items))
    else:
        results = [run_one(it) for it in items]

    # network-level ECDF inputs (networkSimulation.m plotComMetricsECDF:173-232)
    dl_thr = np.concatenate(
        [r["communication"]["ueDLThroughputMbps"] for r in results]
    )
    ul_thr = np.concatenate(
        [r["communication"]["ueULThroughputMbps"] for r in results]
    )
    dl_v, dl_p = ecdf(dl_thr)
    ul_v, ul_p = ecdf(ul_thr)
    network = {
        "dlThroughputECDF": (dl_v, dl_p),
        "ulThroughputECDF": (ul_v, ul_p),
        "totalDLThroughputMbps": float(
            sum(r["communication"]["cellDLThroughputMbps"] for r in results)
        ),
        "totalULThroughputMbps": float(
            sum(r["communication"]["cellULThroughputMbps"] for r in results)
        ),
    }
    return {"cells": results, "network": network}
