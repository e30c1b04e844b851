import numpy as np

from isac_tpu.utils.geometry import cart2sph, point_in_hexagon, poisson_points_2d, sph2cart
from isac_tpu.utils.sequences import gold_sequence, prbs_x1, prbs_x2
from isac_tpu.utils.windows import window


def _lfsr_ref(init_bits, taps, length):
    """Bit-serial reference LFSR per TS 38.211 §5.2.1."""
    x = list(init_bits) + [0] * (length - 31)
    for n in range(length - 31):
        v = 0
        for t in taps:
            v ^= x[n + t]
        x[n + 31] = v
    return np.array(x[:length], dtype=np.uint8)


def test_prbs_x1_matches_bit_serial():
    ref = _lfsr_ref([1] + [0] * 30, (3, 0), 5000)
    np.testing.assert_array_equal(prbs_x1(5000), ref)


def test_prbs_x2_matches_bit_serial():
    c_init = 0x12345
    init = [(c_init >> i) & 1 for i in range(31)]
    ref = _lfsr_ref(init, (3, 2, 1, 0), 5000)
    np.testing.assert_array_equal(prbs_x2(c_init, 5000), ref)


def test_gold_sequence_known_value():
    # c(n) = x1(n+1600) ^ x2(n+1600), cross-checked against the bit-serial form
    c_init = 0x5A5A5
    n = 2048
    x1 = _lfsr_ref([1] + [0] * 30, (3, 0), 1600 + n)
    x2 = _lfsr_ref([(c_init >> i) & 1 for i in range(31)], (3, 2, 1, 0), 1600 + n)
    ref = (x1[1600:] ^ x2[1600:]).astype(np.uint8)
    np.testing.assert_array_equal(gold_sequence(c_init, n), ref)
    # offset consistency
    np.testing.assert_array_equal(gold_sequence(c_init, 100, offset=50), ref[50:150])


def test_gold_sequence_long_fast():
    # The doubling generator must handle multi-megabit lengths quickly & correctly
    c = gold_sequence(1, 3_700_000)
    assert c.shape == (3_700_000,)
    # balancedness of m-sequence XOR: mean close to 0.5
    assert abs(c.mean() - 0.5) < 1e-3


def test_cart2sph_roundtrip():
    az, el, r = cart2sph(3.0, 4.0, 5.0)
    x, y, z = sph2cart(az, el, r)
    np.testing.assert_allclose([x, y, z], [3.0, 4.0, 5.0], atol=1e-12)
    assert abs(r - np.sqrt(50)) < 1e-12


def test_hexagon_and_poisson_drop():
    rng = np.random.default_rng(0)
    pts = poisson_points_2d(rng, np.array([10.0, -5.0]), 100.0, 64, height=1.5)
    assert pts.shape == (64, 3)
    assert np.all(pts[:, 2] == 1.5)
    assert point_in_hexagon(pts[:, :2], np.array([10.0, -5.0]), 100.0).all()
    # corners of bounding box are outside the hexagon
    corners = np.array([[10 + 99, -5 + 99], [10 - 99, -5 - 99]])
    assert not point_in_hexagon(corners, np.array([10.0, -5.0]), 100.0).any()


def test_windows():
    for kind in ("kaiser", "hamming", "hann", "blackman", "gausswin", "tukeywin", "barthannwin", "rect"):
        w = window(kind, 64)
        assert w.shape == (64,) and np.all(w <= 1.0 + 1e-12) and np.all(w >= -1e-12)
    # kaiser beta=3 peak at center, symmetric
    w = window("kaiser", 65)
    assert w[32] == w.max()
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)
