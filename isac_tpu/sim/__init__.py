"""Simulation engine (L7): per-cell slot loop + network orchestration
(+simulation/ in the reference; SURVEY §2.7)."""

from isac_tpu.sim.cell import CellSimulator
from isac_tpu.sim.network import network_simulation, resolve_los, resolve_los_cross

__all__ = ["CellSimulator", "network_simulation", "resolve_los", "resolve_los_cross"]
