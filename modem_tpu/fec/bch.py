"""BCH(255,71) systematic encoder and generator matrix.

Protects the 71-bit metadata block (55 data + 16 CRC bits); reference:
CODE::BoseChaudhuriHocquenghemEncoder<255,71> constructed from 24 minimal
polynomials at encode.cc:272-278, and the matching systematic generator
matrix used by the OSD header decoder (decode.cc:378-384).

Codeword layout on air: bits 0..70 = data, 71..254 = parity
(encode.cc:170-173).  Host-side numpy; the generator matrix enters the
device OSD as a trace-time constant.
"""

from __future__ import annotations

import functools

import numpy as np

# encode.cc:272-278 — minimal polynomials whose product is the degree-184
# generator of the (255, 71) BCH code.
MIN_POLYS = (
    0b100011101, 0b101110111, 0b111110011, 0b101101001,
    0b110111101, 0b111100111, 0b100101011, 0b111010111,
    0b000010011, 0b101100101, 0b110001011, 0b101100011,
    0b100011011, 0b100111111, 0b110001101, 0b100101101,
    0b101011111, 0b111111001, 0b111000011, 0b100111001,
    0b110101001, 0b000011111, 0b110000111, 0b110110001)

N, K = 255, 71


def _poly_to_bits(p: int) -> np.ndarray:
    """Integer polynomial -> coefficient array, lowest degree first."""
    return np.array([(p >> i) & 1 for i in range(p.bit_length())],
                    dtype=np.uint8)


@functools.cache
def generator_poly() -> np.ndarray:
    """GF(2) product of the minimal polynomials, lowest degree first."""
    g = np.array([1], dtype=np.uint8)
    for p in MIN_POLYS:
        g = np.convolve(g, _poly_to_bits(p)) & 1
    assert len(g) == N - K + 1, len(g)
    return g.astype(np.uint8)


def encode(data_bits: np.ndarray) -> np.ndarray:
    """71 data bits -> 184 parity bits (systematic cyclic encoding).

    Treats codeword bit i as the coefficient of x^(254-i); parity is the
    remainder of d(x) * x^184 modulo the generator.
    """
    data_bits = np.asarray(data_bits, dtype=np.uint8)
    assert data_bits.shape[-1] == K
    g = generator_poly()[::-1]  # highest degree first
    reg = np.concatenate([data_bits, np.zeros(N - K, dtype=np.uint8)])
    for i in range(K):
        if reg[i]:
            reg[i:i + (N - K + 1)] ^= g
    return reg[K:]


@functools.cache
def generator_matrix() -> np.ndarray:
    """Systematic [K, N] generator matrix, row i = encode(unit_i)."""
    G = np.zeros((K, N), dtype=np.uint8)
    for i in range(K):
        u = np.zeros(K, dtype=np.uint8)
        u[i] = 1
        G[i, :K] = u
        G[i, K:] = encode(u)
    return G


def is_codeword(bits: np.ndarray) -> bool:
    """Divisibility check of the codeword polynomial by the generator."""
    g = generator_poly()[::-1]
    reg = np.asarray(bits, dtype=np.uint8).copy()
    for i in range(K):
        if reg[i]:
            reg[i:i + (N - K + 1)] ^= g
    return not reg.any()
