"""Top-level simulate() entry point (ref: simulate.m:1-24).

results = simulate(scenario_fn) builds default SimulationParameters, applies the
scenario function, runs the network simulation, and returns
{"communication": ..., "sensing": ...} per cell.
"""

from __future__ import annotations

from isac_tpu.config.params import SimulationParameters


def simulate(scenario_fn, enable_parallel_sim: bool = False, **kwargs):
    from isac_tpu.sim.network import network_simulation

    sim_params = SimulationParameters()
    sim_params = scenario_fn(sim_params) or sim_params
    return network_simulation(sim_params, enable_parallel_sim=enable_parallel_sim, **kwargs)
