"""Native C++ host runtime vs the numpy reference implementations."""

import numpy as np
import pytest

from modem_tpu import bits as B
from modem_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library not built and no compiler available")


def test_scramble_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 5380, dtype=np.uint8).tobytes()
    assert native.scramble(data) == B.scramble(data)
    assert native.scramble(native.scramble(data)) == data


def test_crc_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    from modem_tpu.numerology import CRC16_POLY, CRC32_POLY
    assert native.crc_bytes(CRC32_POLY, data) == B.crc32.over_bytes(data)
    assert native.crc_bytes(CRC16_POLY, data) == B.crc16.over_bytes(data)


def test_bits_roundtrip_matches_numpy():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 640, dtype=np.uint8).tobytes()
    got = native.bytes_to_bits_le(data)
    assert (got == B.bytes_to_bits_le(data)).all()
    assert native.bits_to_bytes_le(got) == data
