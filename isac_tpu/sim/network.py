"""Network-level simulation — TPU-native networkSimulation equivalent.

Capability parity with +simulation/networkSimulation.m:1-235 (SURVEY §2.7,
§3.1): validate per-cell parameter maps, build the scenario topology (OSM /
synthetic city), resolve per-link LoS by vectorized ray-blockage tests, flatten
per-cell parameters, run every cell, and aggregate network KPIs (ECDF data
replaces the reference's final ECDF plots).

INTER-CELL INTERFERENCE (exceeds the reference): the reference fans cells out
with parfeval over a process pool sharing NOTHING (networkSimulation.m:44-61),
so co-channel cells never interfere even though phyRxBuffer.m:224-225 sums
overlapping waveforms within one cell. Here, co-channel cells run in LOCKSTEP:
every cell's DL port grid for a slot is built first, each UE's receiver then
sums serving signal + every other co-channel cell's signal through a real
cross-cell CDL/pathloss channel + noise (one fused einsum per cell). Cells on
disjoint carriers (or `interference=False`) fall back to isolated runs on a
thread pool (JAX dispatch releases the GIL, so device work overlaps).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from isac_tpu.utils import xfer

from isac_tpu.config.params import CellParams, SimulationParameters, assign_cell_parameters
from isac_tpu.metrics.kpi import ecdf
from isac_tpu.ops.cdl import _freq_response_jit, build_cdl_link, freq_phases, time_phases
from isac_tpu.ops.pathloss import pathloss as pathloss_db
from isac_tpu.parallel.links import stack_links
from isac_tpu.sim.cell import CellSimulator
from isac_tpu.topology.osm import build_city
from isac_tpu.utils.geometry import db2pow


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


@jax.jit
def _cross_rx_jit(tx_grid, h_cross, amp):
    """One source cell's contribution at every destination UE.

    tx_grid [n_tx, 14, K], h_cross [U, 14, K, n_rx, n_tx], amp [U]
    -> [U, n_rx, 14, K]."""
    r = jnp.einsum("tsk,uskat->uask", tx_grid, h_cross,
                   preferred_element_type=jnp.complex64)
    return r * amp[:, None, None, None]


class _CrossChannel:
    """Cross-cell CDL channel bank: source gNB -> every UE of a destination
    cell, same fused one-contraction-per-slot machinery as the serving link
    (sim/cell.py _h_slot)."""

    def __init__(self, src_sim: CellSimulator, dst_sim: CellSimulator,
                 los: np.ndarray | None = None, seed: int = 0):
        dst = dst_sim.cell
        src = src_sim.cell
        n_ues = dst.ue_positions.shape[0]
        if los is None:
            los = np.zeros(n_ues, bool)  # cross links default NLoS
        lam = src_sim.carrier.wavelength
        ue_speed = dst.cdl.max_doppler_shift_hz * lam
        links = [
            build_cdl_link(
                dst.cdl.delay_profile if los[u] else "CDL-A",
                dst.cdl.delay_spread_ns, src.gnb.dl_carrier_freq,
                src_sim.gnb_elems, dst_sim.ue_elems, ue_velocity=ue_speed,
                seed=seed * 7919 + u,
            )
            for u in range(n_ues)
        ]
        bl = stack_links(links)
        L, n_rx, n_tx, R = bl.coeff.shape
        self._ff = xfer.asarray(freq_phases(bl.tau, dst_sim.freqs))
        self._c2 = xfer.asarray(bl.coeff.transpose(0, 3, 1, 2).reshape(L, R, n_rx * n_tx))
        self._nu = bl.nu
        self._shape = (n_rx, n_tx)
        self._sym_t = dst_sim._sym_t
        self._slot_dur = dst_sim.carrier.slot_duration_s
        self._n_sc = dst_sim.n_sc
        # amplitude: src tx power per RE through src->UE pathloss, relative to
        # the DESTINATION receiver's noise floor (same normalization as the
        # serving amp_dl, sim/cell.py link budget)
        pl = pathloss_db(
            dst.pathloss.model, np.asarray(src.gnb.position), dst.ue_positions,
            src.gnb.dl_carrier_freq, los,
        )
        scs_hz = dst.gnb.scs_khz * 1e3
        from isac_tpu.utils.geometry import BOLTZMANN

        def teq(nf_db, t_k):
            return t_k + 290.0 * (db2pow(nf_db) - 1.0)

        n_re = BOLTZMANN * teq(dst.ue.noise_figure_db, dst.ue.temperature_k) * scs_hz
        p_re = db2pow(src.gnb.tx_power_dbm - 30.0) / src_sim.n_sc
        g = db2pow(dst.ue.rx_gain_db - pl)
        self.amp = jnp.asarray(np.sqrt(p_re * g / n_re).astype(np.float32))

    def h(self, slot: int) -> jnp.ndarray:
        from isac_tpu.sim.cell import _h_slot_jit

        t = slot * self._slot_dur + self._sym_t
        ft = xfer.asarray(time_phases(self._nu, t))
        n_rx, n_tx = self._shape
        return _h_slot_jit(ft, self._ff, self._c2, self._n_sc, n_rx, n_tx)


class SyncNetworkRunner:
    """Lockstep multi-cell run with co-channel DL interference."""

    def __init__(self, cells: list, seed: int = 0, **cell_kwargs):
        self.sims = [
            CellSimulator(cell, seed=seed + i, **cell_kwargs)
            for i, cell in enumerate(cells)
        ]
        n_slots = {s.num_slots for s in self.sims}
        if len(n_slots) != 1:
            raise ValueError("lockstep interference needs equal num_slots per cell")
        self.num_slots = n_slots.pop()
        # co-channel pairs: carrier-frequency matching, the packetDistribution
        # bus rule (packetDistribution.m:46-124) applied ACROSS cells
        self.pairs: dict = {}  # dst index -> [(src index, _CrossChannel)]
        for d, dst in enumerate(self.sims):
            lst = []
            for s, src in enumerate(self.sims):
                if s == d:
                    continue
                if src.cell.gnb.dl_carrier_freq != dst.cell.gnb.dl_carrier_freq:
                    continue
                if src.n_sc != dst.n_sc:
                    continue  # mixed-numerology interference not modeled
                lst.append((s, _CrossChannel(src, dst, seed=seed * 131 + d * 17 + s)))
            self.pairs[d] = lst

    def run(self) -> list:
        for slot in range(self.num_slots):
            infos = [sim._slot_begin(slot) for sim in self.sims]
            # 1) every co-channel cell's tx grid first
            states = []
            for sim, info in zip(self.sims, infos):
                n_dl = sim._dl_syms(info)
                states.append(
                    sim._dl_tx_phase(slot, n_dl, csi_slot=info["csi_slot"])
                    if n_dl else None
                )
            # 2) receivers see serving + SUM of other cells' co-channel DL
            for d, (sim, info) in enumerate(zip(self.sims, infos)):
                if states[d] is None:
                    continue
                ext = None
                for s, xc in self.pairs[d]:
                    if states[s] is None:
                        continue
                    term = _cross_rx_jit(states[s]["port_grid"], xc.h(slot), xc.amp)
                    from isac_tpu.sim.cell import _add_jit

                    ext = term if ext is None else _add_jit(ext, term)
                sim._dl_rx_phase(slot, info["csi_slot"], states[d], ext=ext)
            # 3) UL + BSR + SRS per cell (inter-cell UL interference not
            # modeled — the reference models none at all)
            for sim, info in zip(self.sims, infos):
                sim._slot_finish(slot, info)
        return [sim.finalize() for sim in self.sims]


def _has_cochannel(cells: list) -> bool:
    freqs = [c.gnb.dl_carrier_freq for c in cells]
    return len(freqs) != len(set(freqs))


def network_simulation(
    sim: SimulationParameters,
    enable_parallel_sim: bool = False,
    seed: int = 0,
    interference: bool = True,
    **cell_kwargs,
) -> dict:
    """Run all configured cells. Returns
    {"cells": [per-cell result], "network": aggregate KPIs}.

    When >=2 cells share a DL carrier and `interference` is on, cells run in
    LOCKSTEP with cross-cell DL interference (SyncNetworkRunner); otherwise
    isolated, optionally on a thread pool (the reference's parfeval analogue,
    networkSimulation.m:44-61)."""
    sim.validate()
    cells = assign_cell_parameters(sim)
    cells = resolve_los(cells, sim)

    if interference and len(cells) > 1 and _has_cochannel(cells):
        results = SyncNetworkRunner(cells, seed=seed, **cell_kwargs).run()
    else:
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

    # network-level ECDF inputs (networkSimulation.m plotComMetricsECDF:173-232
    # — throughput, goodput AND BLER surfaces, metricsVisualizer.m:627-674)
    def gather(key):
        return np.concatenate([r["communication"][key] for r in results])

    network = {
        "totalDLThroughputMbps": float(
            sum(r["communication"]["cellDLThroughputMbps"] for r in results)
        ),
        "totalULThroughputMbps": float(
            sum(r["communication"]["cellULThroughputMbps"] for r in results)
        ),
    }
    for label, key in (
        ("dlThroughputECDF", "ueDLThroughputMbps"),
        ("ulThroughputECDF", "ueULThroughputMbps"),
        ("dlGoodputECDF", "ueDLAppGoodputMbps"),
        ("ulGoodputECDF", "ueULAppGoodputMbps"),
        ("dlBLERECDF", "ueDLBLER"),
        ("ulBLERECDF", "ueULBLER"),
    ):
        vals = gather(key)
        network[label] = ecdf(vals)
    return {"cells": results, "network": network}
