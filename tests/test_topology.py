"""Topology layer tests: wall/building/city LoS, OSM JSON round-trip,
synthetic city, wraparound hex layout."""

import json

import numpy as np
import pytest

from isac_tpu.topology import (
    Building,
    City,
    build_city,
    hex_cell_centers,
    generate_wraparound,
    load_city_json,
    save_city_json,
    synthetic_city,
    wraparound_distance,
)


def square_building(cx, cy, half, height):
    fp = np.array(
        [
            [cx - half, cy - half],
            [cx + half, cy - half],
            [cx + half, cy + half],
            [cx - half, cy + half],
        ]
    )
    return Building(floor_plan=fp, height=height, loss_db=20.0)


class TestLoS:
    def test_wall_blocks_segment(self):
        city = City(buildings=[square_building(0, 0, 10, 30)])
        a = np.array([[-50.0, 0.0, 1.5]])
        b = np.array([[50.0, 0.0, 25.0]])
        assert not city.check_los(a, b)[0]

    def test_above_building_is_los(self):
        city = City(buildings=[square_building(0, 0, 10, 30)])
        a = np.array([[-50.0, 0.0, 40.0]])
        b = np.array([[50.0, 0.0, 45.0]])
        assert city.check_los(a, b)[0]

    def test_beside_building_is_los(self):
        city = City(buildings=[square_building(0, 0, 10, 30)])
        a = np.array([[-50.0, 30.0, 1.5]])
        b = np.array([[50.0, 30.0, 25.0]])
        assert city.check_los(a, b)[0]

    def test_ceiling_crossing_blocked(self):
        # segment dips through the roof: from high above center to ground inside
        city = City(buildings=[square_building(0, 0, 10, 30)])
        a = np.array([[0.0, 0.0, 100.0]])
        b = np.array([[0.0, 0.0, 10.0]])
        assert not city.check_los(a, b)[0]

    def test_vectorized_many_links(self):
        city = City(buildings=[square_building(0, 0, 10, 30)])
        n = 64
        rng = np.random.default_rng(0)
        a = np.column_stack([np.full(n, -50.0), rng.uniform(-40, 40, n), np.full(n, 1.5)])
        b = np.column_stack([np.full(n, 50.0), a[:, 1], np.full(n, 25.0)])
        los = city.check_los(a, b)
        # links with |y| < 10 pass through the building footprint -> blocked
        blocked = np.abs(a[:, 1]) < 9.5
        assert not los[blocked].any()
        clear = np.abs(a[:, 1]) > 10.5
        assert los[clear].all()

    def test_penetration_loss_counts_walls(self):
        city = City(buildings=[square_building(0, 0, 10, 30)])
        a = np.array([[-50.0, 0.0, 1.5]])
        b = np.array([[50.0, 0.0, 1.5]])
        # passes through two walls at 20 dB each
        assert city.penetration_loss_db(a, b)[0] == pytest.approx(40.0)


class TestCityIO:
    def test_json_round_trip(self, tmp_path):
        city = synthetic_city(x_span=200, y_span=200, seed=3)
        p = tmp_path / "city.json"
        save_city_json(city, str(p))
        loaded = load_city_json(str(p))
        assert len(loaded.buildings) == len(city.buildings)
        np.testing.assert_allclose(
            loaded.buildings[0].floor_plan, city.buildings[0].floor_plan
        )
        # identical LoS behavior
        a = np.array([[-90.0, 5.0, 1.5], [-90.0, 5.0, 80.0]])
        b = np.array([[90.0, -5.0, 10.0], [90.0, -5.0, 85.0]])
        np.testing.assert_array_equal(loaded.check_los(a, b), city.check_los(a, b))

    def test_reference_schema_fields(self, tmp_path):
        city = synthetic_city(x_span=150, y_span=150, seed=1)
        p = tmp_path / "c.json"
        save_city_json(city, str(p))
        d = json.load(open(p))
        assert set(d) == {"buildings", "streetSystem"}
        b = d["buildings"][0]
        assert set(b) == {"name", "floorPlan", "height", "loss"}
        assert len(b["floorPlan"]) == 2  # [x_row, y_row]

    def test_build_city_synthetic_fallback(self):
        from isac_tpu.config.params import CityParams, RegionOfInterest

        city = build_city(CityParams(), RegionOfInterest(x_span=300, y_span=300))
        assert len(city.buildings) > 0
        hts = [b.height for b in city.buildings]
        assert min(hts) >= 10.0 and max(hts) <= 40.0


class TestWraparound:
    def test_hex_centers_count_and_spacing(self):
        c = hex_cell_centers(7, 500.0)
        assert c.shape == (7, 2)
        # ring-1 sites all at ISD from center
        d = np.linalg.norm(c[1:] - c[0], axis=1)
        np.testing.assert_allclose(d, 500.0, rtol=1e-9)

    def test_hex_centers_unique(self):
        c = hex_cell_centers(19, 500.0)
        d = np.linalg.norm(c[:, None] - c[None, :], axis=-1)
        d[np.arange(19), np.arange(19)] = 1e9
        assert d.min() > 499.0

    def test_generate_wraparound_layout(self):
        lay = generate_wraparound(3, 500.0, ues_per_cell=4, seed=0)
        assert lay["gnb_positions"].shape == (3, 2)
        assert lay["ue_positions"].shape == (3, 4, 3)
        # UEs inside their hexagon: within circumradius of their center
        r = np.linalg.norm(
            lay["ue_positions"][..., :2] - lay["gnb_positions"][:, None], axis=-1
        )
        assert (r <= 500.0 / np.sqrt(3.0) + 1e-9).all()
        assert lay["sector_azimuths_deg"].shape == (3,)

    def test_wraparound_distance_leq_direct(self):
        gnb = hex_cell_centers(7, 500.0)
        ue = np.array([[1200.0, 0.0], [0.0, 900.0]])
        dist, az = wraparound_distance(ue, gnb, num_rings=1, inter_site_distance=500.0)
        direct = np.linalg.norm(ue[:, None] - gnb[None], axis=-1)
        assert (dist <= direct + 1e-9).all()
        assert az.shape == dist.shape
