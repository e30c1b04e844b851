"""SPMD distribution over jax.sharding.Mesh — the TPU-native replacement for
the reference's parfeval cell fan-out (+simulation/networkSimulation.m:44-61;
SURVEY §2.10, §5.7, §5.8).

Three mesh axes, composable:
- `link`: batched PDSCH/PUSCH links vmapped + shard_mapped over UEs/links
  (replaces the reference's serial per-UE loop, cellSimulation.m:161-163).
- `cell`: multi-cell network step with inter-cell interference exchanged via
  an all-gather over the cell axis — a capability the reference only gestures
  at (its parfeval workers share no channel; phyRxBuffer.m:224-225 combines
  intra-cell only).
- `time`: the sensing slow-time (Doppler) FFT sharded over OFDM-symbol blocks,
  realized as a local DFT matmul + psum (SURVEY §5.7 — the senTxGrid
  accumulator axis).
"""

from isac_tpu.parallel.mesh import make_mesh
from isac_tpu.parallel.links import (
    BatchedLinks,
    batched_frequency_response,
    make_sharded_link_step,
    stack_links,
)
from isac_tpu.parallel.cells import network_dl_step, network_dl_step_reference
from isac_tpu.parallel.time_blocks import range_doppler_map_sharded
from isac_tpu.parallel.distributed import global_mesh, init_distributed

__all__ = [
    "global_mesh", "init_distributed",
    "make_mesh",
    "BatchedLinks",
    "batched_frequency_response",
    "make_sharded_link_step",
    "stack_links",
    "network_dl_step",
    "network_dl_step_reference",
    "range_doppler_map_sharded",
]
