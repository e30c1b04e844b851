"""Block-mode (segment-fused) engine vs the per-slot loop: bit-exact results.

VERDICT r4 #1 acceptance: block execution must reproduce the slot-loop
results with the same seeds. The fused segment program (sim/block.py) calls
the same traced building blocks with the same inputs/PRNG keys, so every
surface — KPIs, per-UE metrics, sensing estimates, scheduling logs — must
match exactly (cellSimulation.m:147-202 is the reference hot loop both modes
re-architect)."""

import numpy as np
import pytest

from isac_tpu.config.params import SimulationParameters, assign_cell_parameters
from isac_tpu.config.scenarios import open_street_map_city
from isac_tpu.sim.cell import CellSimulator


def _deep_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _deep_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _deep_equal(x, y, f"{path}[{i}]")
    elif a is None:
        assert b is None, path
    elif isinstance(a, (str, bool, int)):
        assert a == b, (path, a, b)
    else:
        x, y = np.asarray(a), np.asarray(b)
        assert x.shape == y.shape, (path, x.shape, y.shape)
        assert np.array_equal(x, y, equal_nan=True), (
            path, np.max(np.abs(x.astype(np.float64) - y.astype(np.float64)))
            if x.dtype.kind in "fc" else (x, y))


def _strip(result):
    # sensing params/config are host dataclasses (identical by construction)
    out = dict(result)
    if out.get("sensing") is not None:
        s = dict(out["sensing"])
        s.pop("params", None)
        out["sensing"] = s
    return out


def _run(block_slots, **kw):
    sim = open_street_map_city(SimulationParameters())
    cells = assign_cell_parameters(sim)
    cs = CellSimulator(cells[0], n_rb_override=24, nfft_override=512,
                       block_slots=block_slots, **kw)
    return cs.run(), cs


@pytest.mark.parametrize("block,kw", [(8, {}), (1, {}), (8, {"fast_csi": True})])
def test_block_bit_exact_tdd(block, kw):
    """Full-phy DDDSU frame: segment-fused execution == per-slot loop on
    every result surface (comm KPIs, sensing estimates, logs). block=1 is
    the slot-fused variant (one program per slot)."""
    ref, cs_ref = _run(0, **kw)
    blk, cs_blk = _run(block, **kw)
    assert len(cs_blk._seg_fns) >= 1
    _deep_equal(_strip(ref), _strip(blk))


def test_block_bit_exact_fdd():
    """FDD degenerates to 1-slot segments (UL CRC due every next slot) but
    must still match exactly through the fused program path."""
    from dataclasses import replace

    def mk(block):
        sim = open_street_map_city(SimulationParameters())
        cells = assign_cell_parameters(sim)
        cell = replace(cells[0], gnb=replace(cells[0].gnb, duplex_mode="FDD"))
        cs = CellSimulator(cell, n_rb_override=24, nfft_override=512,
                           block_slots=block, enable_sensing=False)
        return cs.run()

    _deep_equal(_strip(mk(0)), _strip(mk(8)))


def test_block_checkpoint_resume():
    """Checkpoint at a segment boundary, restore into a block-mode simulator,
    and finish: identical final result to an uninterrupted block run."""
    full, _ = _run(8)
    sim = open_street_map_city(SimulationParameters())
    cells = assign_cell_parameters(sim)
    a = CellSimulator(cells[0], n_rb_override=24, nfft_override=512,
                      block_slots=8)
    a.run(stop_slot=10, finalize=False)
    state = a.checkpoint(next_slot=10)
    b = CellSimulator(cells[0], n_rb_override=24, nfft_override=512,
                      block_slots=8)
    resume_at = b.restore(state)
    out = b.run(start_slot=resume_at)
    _deep_equal(_strip(full), _strip(out))
