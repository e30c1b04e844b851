"""Device-mesh construction helpers.

The reference's only parallelism is a parfeval process pool over cells
(networkSimulation.m:44-55, no inter-worker traffic). Here the mesh is the
first-class object: axes are named, shardings are explicit, and collectives
ride ICI (SURVEY §5.8)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """Build a named mesh. axis_sizes: ordered {axis_name: size}; sizes must
    multiply to the device count (one axis of all devices by default)."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"cell": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh axes {axis_sizes} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(sizes), names)
