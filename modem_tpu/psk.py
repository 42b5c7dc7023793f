"""Vectorized PSK constellations: map / hard / soft / quantize.

TPU-native equivalent of the header-only PhaseShiftKeying family
(reference: psk.hh:9-141).  Where the reference maps one symbol at a time
through static methods, these functions operate on whole arrays of
symbols: ``bits`` has shape [..., BITS] in the +/-1 NRZ domain and the
complex symbol arrays have shape [...].  All are jit/vmap-safe.

Layout quirks preserved from the reference:
  * QPSK is Gray (I = b0, Q = b1), scaled 1/sqrt(2) (psk.hh:84-87);
  * 8PSK uses the axis-swap layout: b1 signs I, b2 signs Q, b0 selects
    whether |I| = cos(pi/8) or sin(pi/8) (psk.hh:132-139) — not Gray;
  * soft bits scale by DIST * precision, with int8 saturation when
    quantizing to integral code types (psk.hh:28-29).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RCP_SQRT_2 = 0.70710678118654752440
COS_PI_8 = 0.92387953251128675613
SIN_PI_8 = 0.38268343236508977173

DIST = {2: 2.0, 4: 2.0 * RCP_SQRT_2, 8: 2.0 * SIN_PI_8}


def _quantize(num: int, precision, value, int8: bool):
    value = value * (DIST[num] * precision)
    if int8:
        value = jnp.clip(jnp.round(value), -128, 127)
    return value


# ---------------------------------------------------------------------------
# BPSK (psk.hh:13-47)
# ---------------------------------------------------------------------------

def bpsk_map(bits):
    return bits[..., 0].astype(jnp.complex64)


def bpsk_hard(symbols):
    return jnp.where(jnp.real(symbols) < 0, -1.0, 1.0)[..., None]


def bpsk_soft(symbols, precision, int8: bool = False):
    return _quantize(2, precision, jnp.real(symbols), int8)[..., None]


# ---------------------------------------------------------------------------
# QPSK (psk.hh:50-88)
# ---------------------------------------------------------------------------

def qpsk_map(bits):
    return (RCP_SQRT_2 * (bits[..., 0] + 1j * bits[..., 1])).astype(
        jnp.complex64)


def qpsk_hard(symbols):
    b0 = jnp.where(jnp.real(symbols) < 0, -1.0, 1.0)
    b1 = jnp.where(jnp.imag(symbols) < 0, -1.0, 1.0)
    return jnp.stack([b0, b1], axis=-1)


def qpsk_soft(symbols, precision, int8: bool = False):
    b0 = _quantize(4, precision, jnp.real(symbols), int8)
    b1 = _quantize(4, precision, jnp.imag(symbols), int8)
    return jnp.stack([b0, b1], axis=-1)


# ---------------------------------------------------------------------------
# 8PSK (psk.hh:91-140)
# ---------------------------------------------------------------------------

def psk8_map(bits):
    swap = bits[..., 0] < 0
    real = jnp.where(swap, SIN_PI_8, COS_PI_8) * bits[..., 1]
    imag = jnp.where(swap, COS_PI_8, SIN_PI_8) * bits[..., 2]
    return (real + 1j * imag).astype(jnp.complex64)


def psk8_hard(symbols):
    re, im = jnp.real(symbols), jnp.imag(symbols)
    b1 = jnp.where(re < 0, -1.0, 1.0)
    b2 = jnp.where(im < 0, -1.0, 1.0)
    b0 = jnp.where(jnp.abs(re) < jnp.abs(im), -1.0, 1.0)
    return jnp.stack([b0, b1, b2], axis=-1)


def psk8_soft(symbols, precision, int8: bool = False):
    re, im = jnp.real(symbols), jnp.imag(symbols)
    b1 = _quantize(8, precision, re, int8)
    b2 = _quantize(8, precision, im, int8)
    b0 = _quantize(8, precision, RCP_SQRT_2 * (jnp.abs(re) - jnp.abs(im)),
                   int8)
    return jnp.stack([b0, b1, b2], axis=-1)


# ---------------------------------------------------------------------------
# Dispatch on mod_bits (encode.cc:187-196, decode.cc:262-293)
# ---------------------------------------------------------------------------

_TABLES = {
    1: (bpsk_map, bpsk_hard, bpsk_soft),
    2: (qpsk_map, qpsk_hard, qpsk_soft),
    3: (psk8_map, psk8_hard, psk8_soft),
}


def mod_map(mod_bits: int, bits):
    """bits [..., mod_bits] in +/-1 -> unit-power complex symbols [...]."""
    return _TABLES[mod_bits][0](bits)


def mod_hard(mod_bits: int, symbols):
    return _TABLES[mod_bits][1](symbols)


def mod_soft(mod_bits: int, symbols, precision, int8: bool = False):
    return _TABLES[mod_bits][2](symbols, precision, int8)


def mod_map_np(mod_bits: int, bits: np.ndarray) -> np.ndarray:
    """Host/numpy twin of mod_map for trace-time constant generation."""
    bits = np.asarray(bits, dtype=np.float64)
    if mod_bits == 1:
        return bits[..., 0].astype(np.complex128)
    if mod_bits == 2:
        return RCP_SQRT_2 * (bits[..., 0] + 1j * bits[..., 1])
    swap = bits[..., 0] < 0
    real = np.where(swap, SIN_PI_8, COS_PI_8) * bits[..., 1]
    imag = np.where(swap, COS_PI_8, SIN_PI_8) * bits[..., 2]
    return real + 1j * imag
