import numpy as np
import pytest

from isac_tpu.config import (
    CarrierConfig,
    GNBParams,
    SimulationParameters,
    UEParams,
    assign_cell_parameters,
    determine_prb,
    ofdm_info,
    parse_tdd_pattern,
)
from isac_tpu.config import scenarios


def test_prb_table_matches_38101():
    # Values from TS 38.101 Table 5.3.2-1 (and determinePRB.m:23-41)
    assert determine_prb(3.5e9, 100e6, 30) == 273
    assert determine_prb(3.5e9, 100e6, 60) == 135
    assert determine_prb(3.5e9, 20e6, 15) == 106
    assert determine_prb(3.5e9, 5e6, 15) == 25
    assert determine_prb(28e9, 100e6, 120) == 66
    assert determine_prb(28e9, 400e6, 120) == 264
    with pytest.raises(ValueError):
        determine_prb(3.5e9, 5e6, 60)
    with pytest.raises(ValueError):
        determine_prb(100e9, 100e6, 120)


def test_ofdm_info_30khz_273prb():
    info = ofdm_info(273, 30)
    assert info.nfft == 4096
    assert info.sample_rate == 4096 * 30e3
    assert info.cp_short == 288 and info.cp_long == 352
    # one subframe = exactly 1 ms of samples
    lens = info.symbol_lengths_slots(2)
    assert lens.sum() == int(info.sample_rate * 1e-3)
    assert lens[0, 0] == 4096 + 352 and lens[1, 0] == 4096 + 352
    assert np.all(lens[:, 1:] == 4096 + 288)


def test_ofdm_info_15khz():
    info = ofdm_info(52, 15)  # 10 MHz
    assert info.nfft == 1024
    lens = info.symbol_lengths_slots(1)
    # long CP at symbols 0 and 7 within the 14-symbol slot at mu=0
    assert lens[0, 0] == lens[0, 7] > lens[0, 1]
    assert lens.sum() == int(info.sample_rate * 1e-3)


def test_tdd_parse():
    tdd = parse_tdd_pattern("DDDSU")
    assert tdd.num_dl_slots == 3 and tdd.num_ul_slots == 1
    assert tdd.periodicity == 5 and tdd.has_special
    assert tdd.slot_type(0) == "D" and tdd.slot_type(3) == "S" and tdd.slot_type(9) == "U"
    assert tdd.dl_ratio() == 3 / 5
    with pytest.raises(ValueError):
        parse_tdd_pattern("DDXU")


def test_carrier_config():
    c = CarrierConfig(fc_hz=3.5e9, bandwidth_hz=100e6, scs_khz=30)
    assert c.n_rb == 273 and c.n_sc == 3276
    assert c.slots_per_frame == 20
    assert c.slot_duration_s == 0.5e-3
    assert abs(c.wavelength - 299792458.0 / 3.5e9) < 1e-12


def test_scenario_and_flattening():
    sim = scenarios.open_street_map_city(SimulationParameters())
    cells = assign_cell_parameters(sim)
    assert len(cells) == 1
    cp = cells[0]
    assert cp.gnb.num_tx_ants == 16
    assert cp.ue_positions.shape == (5, 3)
    assert cp.target_positions.shape == (1, 3)
    assert cp.num_slots == 20
    # UEs dropped within the hex radius
    d = np.linalg.norm(cp.ue_positions[:, :2], axis=1)
    assert np.all(d <= 200.0 + 1e-9)
    # determinism
    cells2 = assign_cell_parameters(scenarios.open_street_map_city(SimulationParameters()))
    np.testing.assert_allclose(cells2[0].ue_positions, cp.ue_positions)


def test_cardinality_validation():
    sim = scenarios.open_street_map_city(SimulationParameters())
    sim.bs["cell2"] = GNBParams(cell_id=2)
    with pytest.raises(ValueError):
        sim.validate()
    sim.ue["cell2"] = UEParams()
    for m in (sim.target, sim.scheduling, sim.traffic, sim.pathloss, sim.com_channel):
        m["cell2"] = next(iter(m.values()))
    sim.validate()
