"""Polar code construction (frozen-set design).

Native re-implementation of the offline table generator
(reference: freezer.cc:14-39 driving CODE::PolarCodeConst0<16>).  The
construction is the binary-erasure-channel polarization recursion: a
channel with erasure probability z splits into a degraded copy 2z - z^2
and an upgraded copy z^2; the channel index's LSB selects the outermost
(last-applied) operation, i.e. W_N^(2i) is the degraded child and
W_N^(2i+1) the upgraded child of W_{N/2}^(i).  The (2^M - K_info) indices
with the largest erasure probability are frozen.

Verified bit-exact against the in-repo oracle /root/reference/
polar_tables.hh for both wire-format codes (see tests/test_freezer.py);
the result is tie-break independent at these design points.

The design erasure probability follows freezer.cc:17-23: for a code
shortened to N with K payload+crc bits, p_design = (N-K)/N, lifted by a
1.59175 dB SNR margin through p = exp(-10^((10*log10(-ln p_design) +
1.59175)/10)).
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

_TABLE_DIR = pathlib.Path(__file__).parent / "tables"


def bec_erasure_profile(p: float, order: int) -> np.ndarray:
    """Erasure probability of every polarized channel, natural SC index."""
    z = np.array([p], dtype=np.longdouble)
    for _ in range(order):
        # New index LSB chooses the outermost op: even -> degraded child,
        # odd -> upgraded child (standard SC channel recursion).
        z = np.stack([2 * z - z * z, z * z], axis=-1).reshape(-1)
    return z


def design_probability(n: int, k: int) -> np.longdouble:
    """freezer.cc:17-23: design SNR + 1.59175 dB margin -> erasure prob."""
    erasure = np.longdouble(n - k) / np.longdouble(n)
    design_snr = 10.0 * np.log10(float(-np.log(erasure)))
    better_snr = design_snr + 1.59175
    return np.exp(np.longdouble(-(10.0 ** (better_snr / 10.0))))


def frozen_mask(n: int, k: int, order: int = 16) -> np.ndarray:
    """Frozen-bit mask (uint8[2**order], 1 = frozen) for the shortened code.

    ``n`` is the shortened code length, ``k`` the payload+crc bit count;
    the mother code keeps k + 2**order - n information positions
    (shortening is pre-allocated, freezer.cc:25).
    """
    code_len = 1 << order
    k_info = k + code_len - n
    z = bec_erasure_profile(design_probability(n, k), order)
    best_first = np.argsort(z, kind="stable")
    frozen = np.zeros(code_len, dtype=np.uint8)
    frozen[best_first[k_info:]] = 1
    return frozen


def mask_to_words(mask: np.ndarray) -> np.ndarray:
    """Pack a frozen mask into uint32 words, bit i -> word i//32 bit i%32
    (the layout the reference tables use, encode.cc:184)."""
    return np.packbits(mask, bitorder="little").view(np.uint32)


def words_to_mask(words: np.ndarray) -> np.ndarray:
    return np.unpackbits(np.asarray(words, dtype=np.uint32).view(np.uint8),
                         bitorder="little")


@functools.lru_cache(maxsize=None)
def cached_frozen_mask(n: int, k: int, order: int = 16) -> np.ndarray:
    """Disk-cached frozen mask (construction takes ~seconds at order 16)."""
    path = _TABLE_DIR / f"frozen_{n}_{k}_{order}.npy"
    if path.exists():
        mask = np.load(path)
        if len(mask) == (1 << order):
            return mask
    mask = frozen_mask(n, k, order)
    try:
        _TABLE_DIR.mkdir(parents=True, exist_ok=True)
        np.save(path, mask)
    except OSError:
        pass
    return mask
