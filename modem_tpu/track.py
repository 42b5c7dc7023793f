"""Channel tracking: Theil-Sen SFO/CFO regression and SNR estimation.

TPU-native equivalents of DSP::TheilSenEstimator (decode.cc:195,
488-494) and the per-row Es/N0 loop (decode.cc:505-523).  The reference
computes O(cols^2) pairwise slopes serially; here the slope matrix is
one broadcast subtraction and the median a sort — trivial work for the
VPU at cols <= 512.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cplx, psk


def _median_lower(v, count: int):
    """Element at index count//2 of the sorted first `count` entries
    (std::nth_element-style middle, matching the reference's estimator)."""
    return jnp.sort(v)[count // 2]


def theil_sen(x, y):
    """Robust line fit: median slope over disjoint pairs + median
    intercept (the O(n) Theil-Sen variant: pairs (i, i + n/2)).

    x, y: [cols].  Returns (slope, yint).  The all-pairs variant sorts
    O(cols^2) slopes — a multi-minute XLA compile and a large runtime
    sort on TPU for no accuracy the tracking loop can use (an outlier
    contaminates 1 of n/2 slopes here vs n-1 of n^2/2 there).
    """
    cols = x.shape[-1]
    h = cols // 2
    slopes = (y[h: 2 * h] - y[:h]) / (x[h: 2 * h] - x[:h])
    slope = _median_lower(slopes, h)
    resid = y - slope * x
    yint = _median_lower(resid, cols)
    return slope, yint


def derotate_rows(cons, code_off: int, mod_bits: int):
    """Per-row Theil-Sen phase regression and derotation
    (decode.cc:479-504).

    cons: [rows, cols, 2] differential constellation points.
    Returns (derotated cons, avg_slope, avg_yint).
    """
    rows, cols, _ = cons.shape
    x = (jnp.arange(cols) + code_off).astype(jnp.float32)

    hard = psk.mod_hard(mod_bits, cons)
    ref = psk.mod_map(mod_bits, hard)
    # phase error of each point vs its hard decision
    err = jnp.arctan2(
        cons[..., 1] * ref[..., 0] - cons[..., 0] * ref[..., 1],
        cons[..., 0] * ref[..., 0] + cons[..., 1] * ref[..., 1])

    def fit(row_err):
        return theil_sen(x, row_err)

    slopes, yints = jax.vmap(fit)(err)
    theta = -(slopes[:, None] * x[None, :] + yints[:, None])
    rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    out = cplx.cmul(cons, rot)
    return out, jnp.mean(slopes), jnp.mean(yints)


def soft_llrs(cons, mod_bits: int):
    """Cumulative-SNR soft demap (decode.cc:505-523).

    The reference accumulates signal/noise power ACROSS rows (sp, np are
    never reset), so row r uses precision = sum(sp[0..r])/sum(np[0..r]).
    Returns (llrs [rows, cols, mod_bits], snr_per_row [rows]).
    """
    hard = psk.mod_hard(mod_bits, cons)
    ref = psk.mod_map(mod_bits, hard)
    err = cons - ref
    sp = jnp.cumsum(jnp.sum(ref[..., 0]**2 + ref[..., 1]**2, axis=1))
    npow = jnp.cumsum(jnp.sum(err[..., 0]**2 + err[..., 1]**2, axis=1))
    precision = sp / jnp.maximum(npow, 1e-12)
    llrs = psk.mod_soft(mod_bits, cons, precision[:, None])
    return llrs, 10.0 * jnp.log10(precision)
