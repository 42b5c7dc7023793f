"""BCH encoder + ordered-statistics header decoder tests."""

import numpy as np
import pytest

from modem_tpu.fec import bch
from modem_tpu.fec.osd import osd_decode


def test_generator_poly_degree():
    g = bch.generator_poly()
    assert len(g) == 185 and g[0] == 1 and g[-1] == 1


def test_generator_matrix_systematic_and_valid():
    g = bch.generator_matrix()
    assert (g[:, :71] == np.eye(71, dtype=np.uint8)).all()
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, 71, dtype=np.uint8)
    assert bch.is_codeword((u @ g) % 2)


def test_osd_noiseless():
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, 71, dtype=np.uint8)
    cw = (u @ bch.generator_matrix()) % 2
    soft = (127 * (1 - 2 * cw.astype(np.int32))).astype(np.int8)
    data, unique = osd_decode(soft)
    assert bool(unique)
    assert (np.asarray(data) == u).all()


@pytest.mark.parametrize("sigma", [0.5, 0.8])
def test_osd_awgn(sigma):
    rng = np.random.default_rng(2)
    g = bch.generator_matrix()
    ok = 0
    for _ in range(5):
        u = rng.integers(0, 2, 71, dtype=np.uint8)
        cw = (u @ g) % 2
        rx = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(255)
        soft = np.clip(np.round(127 * rx / 4), -128, 127).astype(np.int8)
        data, unique = osd_decode(soft)
        ok += bool(unique) and (np.asarray(data) == u).all()
    assert ok >= 4


def test_osd_with_erasures():
    """Erased positions (soft 0) behave like the reference's
    demod_or_erase zeros (decode.cc:62-70)."""
    rng = np.random.default_rng(3)
    g = bch.generator_matrix()
    u = rng.integers(0, 2, 71, dtype=np.uint8)
    cw = (u @ g) % 2
    soft = (100 * (1 - 2 * cw.astype(np.int32))).astype(np.int8)
    erase = rng.choice(255, 40, replace=False)
    soft[erase] = 0
    data, unique = osd_decode(soft)
    assert bool(unique)
    assert (np.asarray(data) == u).all()
