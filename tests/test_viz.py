"""Smoke tests for the post-sim visualization layer (viz.py) — every figure
renders headless from synthetic result-dict structures and writes a PNG."""

import numpy as np
import pytest

from isac_tpu import viz


def _synth_logs(n_slots=20, n_ues=3, n_rb=12):
    rng = np.random.default_rng(0)
    out = {"grants": []}
    for d in ("DL", "UL"):
        rb = rng.integers(0, n_ues + 1, (n_slots, n_rb)).astype(np.int16)
        bler = rng.uniform(0, 0.4, (n_slots, n_ues))
        bler[::3] = np.nan
        out[d] = {
            "rbGrid": rb,
            "mcsGrid": rb,
            "cqiGrid": rng.integers(0, 16, (n_slots, n_ues, n_rb)).astype(np.int8),
            "slotBLER": bler,
            "blockErrors": rng.integers(0, 3, (n_slots, n_ues)),
            "blocks": rng.integers(1, 5, (n_slots, n_ues)),
        }
    return out


def test_grid_and_bler_figures(tmp_path):
    logs = _synth_logs()
    viz.plot_rb_grid(logs, "DL", str(tmp_path / "rb.png"))
    viz.plot_cqi_grid(logs, "UL", 1, str(tmp_path / "cqi.png"))
    viz.plot_bler(logs, str(tmp_path / "bler.png"))
    for f in ("rb.png", "cqi.png", "bler.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_throughput_and_ecdf_figures(tmp_path):
    comm = {
        "ueDLThroughputMbps": np.array([10.0, 7.5, 3.0]),
        "ueULThroughputMbps": np.array([2.0, 1.5, 0.5]),
        "ueDLGoodputMbps": np.array([9.0, 7.0, 2.5]),
        "ueULGoodputMbps": np.array([1.8, 1.2, 0.4]),
    }
    viz.plot_throughput(comm, str(tmp_path / "thr.png"))
    from isac_tpu.metrics.kpi import ecdf

    named = {"DL throughput": ecdf(np.array([1.0, 2, 3, 8])),
             "UL throughput": ecdf(np.array([0.2, 0.4, 1.1]))}
    viz.plot_ecdf(named, str(tmp_path / "ecdf.png"))
    assert (tmp_path / "thr.png").stat().st_size > 1000
    assert (tmp_path / "ecdf.png").stat().st_size > 1000


def test_rdm_figure_from_sensing_chain(tmp_path):
    """Use the real radar-params/estimate structures (tiny sizes)."""
    import jax.numpy as jnp

    from isac_tpu.config.params import GNBParams, ULA
    from isac_tpu.ops.sensing import derive_radar_params

    gnb = GNBParams(antenna=ULA(n_v=2, polarizations=1))
    p = derive_radar_params(
        gnb, gnb.carrier, np.array([[80.0, 10.0, 1.5]]), np.array([1.0]),
        np.array([5.0]), 2,
    )
    rng = np.random.default_rng(1)
    est = {
        "rdm": rng.standard_normal((2, p.n_ifft, p.n_fft))
        + 1j * rng.standard_normal((2, p.n_ifft, p.n_fft)),
        "rngEst": np.array([80.5, np.nan]),
        "velEst": np.array([5.2, np.nan]),
        "valid": np.array([True, False]),
    }
    viz.plot_rdm({"estimates": est, "params": p}, str(tmp_path / "rdm.png"))
    assert (tmp_path / "rdm.png").stat().st_size > 1000


def test_scenario_figure(tmp_path):
    class Cell:
        def __init__(self, i):
            rng = np.random.default_rng(i)
            self.gnb_position = np.array([i * 100.0, 0.0, 25.0])
            self.ue_positions = rng.uniform(-50, 50, (4, 3)) + self.gnb_position
            self.ue_los = np.array([True, False, True, True])

    walls = np.array([[[0, 0, 0], [10, 0, 0]], [[10, 0, 0], [10, 10, 0]]], float)
    viz.plot_scenario([Cell(0), Cell(1)], str(tmp_path / "map.png"), walls=walls)
    assert (tmp_path / "map.png").stat().st_size > 1000
