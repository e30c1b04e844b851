"""Multi-host distribution entry point (SURVEY §5.8; VERDICT r2 Missing #7).

The reference's only parallelism is a parfeval pool inside ONE machine with
zero inter-worker traffic (+simulation/networkSimulation.m:44-55). The TPU
equivalent spans hosts: `jax.distributed.initialize` joins every process to
one runtime, `global_mesh` lays the named axes over ALL global devices, and
the existing shard_map programs (parallel/links.py, parallel/cells.py,
parallel/time_blocks.py) then run their collectives over ICI within a slice
and DCN across hosts, with no code change.

Launch recipe (one command per host / process):

    # TPU pods: device count is discovered from the runtime
    python -c "from isac_tpu.parallel.distributed import init_distributed; \
               init_distributed()"  # env-driven on Cloud TPU

    # CPU multi-process emulation (N processes x M local devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=M JAX_PLATFORMS=cpu \
    python your_app.py --coordinator 10.0.0.1:1234 --num-processes N \
                       --process-id K

then build the mesh and hand it to the engine/network layers:

    mesh = global_mesh({"cell": n_cells, "time": -1})
    CellSimulator(cell, mesh=mesh)            # sharded sensing RDM
    network_dl_step(mesh, axis="cell")        # inter-cell interference step
    make_sharded_link_step(grant, mesh=mesh)  # link-axis KPI psum

The ≥80% 1→N-host scaling-efficiency north star (BASELINE.md) is measured by
running bench.py under this launcher on each host.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> dict:
    """Join this process to the global JAX runtime.

    All-None arguments use environment auto-detection (Cloud TPU metadata or
    the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    variables). Single-process callers (num_processes in (None-with-no-env,
    1)) skip initialization entirely — the local backend already works.

    Returns {"process_id", "num_processes", "global_devices",
    "local_devices"}.
    """
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    n = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    if n is not None and n > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=n,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
            local_device_ids=local_device_ids,
        )
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }


def global_mesh(axes: dict) -> Mesh:
    """Build a named mesh over ALL global devices (multi-host aware).

    `axes` maps axis name -> size; at most one size may be -1 (inferred).
    Axis ORDER matters for locality: the LAST axis varies fastest over
    devices, so put the highest-bandwidth axis (intra-slice ICI traffic,
    e.g. `time` for the slow-time DFT all-reduce) last and the
    lowest-traffic axis (e.g. `cell` — one all_gather of tx grids per slot)
    first, which lands it across hosts/DCN.
    """
    devs = np.asarray(jax.devices())
    sizes = list(axes.values())
    n_infer = sum(1 for s in sizes if s == -1)
    if n_infer > 1:
        raise ValueError("at most one axis size may be -1")
    known = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if n_infer:
        if devs.size % known:
            raise ValueError(f"{devs.size} devices not divisible by {known}")
        sizes = [devs.size // known if s == -1 else s for s in sizes]
    total = int(np.prod(sizes))
    if total != devs.size:
        raise ValueError(f"mesh {sizes} != {devs.size} devices")
    return Mesh(devs.reshape(sizes), tuple(axes.keys()))
