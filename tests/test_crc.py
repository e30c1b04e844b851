import jax.numpy as jnp
import numpy as np
import pytest

from isac_tpu.ops.crc import (
    crc_attach,
    crc_bitserial_reference,
    crc_check,
    crc_compute,
    crc_compute_np,
    crc_length,
)


@pytest.mark.parametrize("kind", ["24A", "24B", "24C", "16", "11", "6"])
def test_crc_matches_bit_serial(kind):
    rng = np.random.default_rng(42)
    for n in (8, 100, 1024):
        bits = rng.integers(0, 2, n).astype(np.uint8)
        ref = crc_bitserial_reference(bits, kind)
        np.testing.assert_array_equal(crc_compute_np(bits, kind), ref)
        np.testing.assert_array_equal(
            np.asarray(crc_compute(jnp.asarray(bits), kind)), ref
        )


def test_crc24a_known_vector():
    # All-zero message -> zero CRC; single leading 1 -> the generator pattern itself
    z = np.zeros(32, dtype=np.uint8)
    assert crc_compute_np(z, "24A").sum() == 0
    one = np.zeros(24, dtype=np.uint8)
    one[-1] = 1  # message = x^0 -> crc = x^24 mod g = g - x^24
    ref = crc_bitserial_reference(one, "24A")
    np.testing.assert_array_equal(crc_compute_np(one, "24A"), ref)


def test_crc_attach_check_roundtrip():
    rng = np.random.default_rng(7)
    bits = jnp.asarray(rng.integers(0, 2, 1000).astype(np.int8))
    coded = crc_attach(bits, "16")
    assert coded.shape == (1000 + crc_length("16"),)
    assert bool(crc_check(coded, "16"))
    # flip one bit -> fail
    bad = coded.at[500].set(1 - coded[500])
    assert not bool(crc_check(bad, "16"))


def test_crc_batched():
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, (4, 256)).astype(np.int8))
    coded = crc_attach(bits, "24B")
    ok = crc_check(coded, "24B")
    assert ok.shape == (4,) and bool(jnp.all(ok))


def test_crc_large_message_exactness():
    # float32 matmul must stay integer-exact for large n
    rng = np.random.default_rng(9)
    n = 200_000
    bits = rng.integers(0, 2, n).astype(np.uint8)
    ref = crc_compute_np(bits, "24A")
    got = np.asarray(crc_compute(jnp.asarray(bits.astype(np.int8)), "24A"))
    np.testing.assert_array_equal(got, ref)
