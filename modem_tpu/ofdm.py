"""OFDM symbol synthesis: PAPR reduction, IFFT, windowed guard crossfade.

TPU-native re-design of the reference's per-symbol streaming synthesis
(encode.cc:80-131).  The reference synthesises one symbol at a time
through member-state FFTs; here a whole frame's worth of symbols is one
batched IFFT plus vectorised clip-and-filter, and the guard crossfade —
the only cross-symbol dependency — becomes a one-symbol shift instead of
carried state.

Conventions matched to the reference:
  * FFT sign/scale: fwd = unnormalised e^{-j}, bwd = unnormalised e^{+j}
    (DSP::FastFourierTransform semantics); all normalisation explicit.
  * improve_papr (encode.cc:80-100): 4x zero-padded oversample, clip
    |re|,|im| to 1, refilter, keep only originally-occupied bins.
  * symbol IFFT scaled 1/sqrt(8 N) for 3 dB headroom (encode.cc:109).
  * guard = raised-cosine crossfade between the previous symbol's head
    and the current symbol's tail — windowed OFDM, not a cyclic prefix
    (encode.cc:110-114, 127-130).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bin_index(carrier, n: int):
    """Negative-frequency-aware bin mapping (encode.cc:68-71)."""
    return (np.asarray(carrier) + n) % n


def improve_papr(fdom):
    """Batched 4x-oversampled clip-and-filter (encode.cc:80-100).

    fdom: [..., N] complex symbol spectra.  Returns spectra with reduced
    peak-to-average ratio; bins that were exactly zero stay zero.
    """
    n = fdom.shape[-1]
    lead = fdom.shape[:-1]
    zeros = jnp.zeros(lead + (3 * n,), dtype=fdom.dtype)
    # fdom4[bin4(i)] = fdom[bin(i)] for i in [-N/2, N/2): the low half of
    # the N-spectrum keeps its bins, the negative half moves to the top.
    fdom4 = jnp.concatenate(
        [fdom[..., : n // 2], zeros, fdom[..., n // 2:]], axis=-1)
    # bwd4 then /sqrt(4N): unnormalised inverse DFT = 4N * ifft.
    tdom4 = jnp.fft.ifft(fdom4, axis=-1) * jnp.sqrt(jnp.asarray(4.0 * n))
    amp = jnp.maximum(jnp.abs(tdom4.real), jnp.abs(tdom4.imag))
    tdom4 = jnp.where(amp > 1.0, tdom4 / amp, tdom4)
    spec = jnp.fft.fft(tdom4, axis=-1) / jnp.sqrt(jnp.asarray(4.0 * n))
    clipped = jnp.concatenate(
        [spec[..., : n // 2], spec[..., 3 * n + n // 2:]], axis=-1)
    return jnp.where(fdom != 0, clipped, 0)


def synthesize(fdom, guard_len: int, papr_mask=None):
    """Spectra [n_sym, N] -> (waveform [n_sym*(G+N)], papr [n_sym, 2]).

    Applies PAPR reduction where ``papr_mask`` (bool [n_sym]) is true
    (the Schmidl-Cox symbol skips it, encode.cc:153), synthesises all
    symbols as one batched IFFT, and emits [guard | symbol] per row with
    the raised-cosine crossfade.  The caller appends the all-zero flush
    symbol as the last row (encode.cc:311-313).
    """
    n_sym, n = fdom.shape
    shaped = improve_papr(fdom)
    if papr_mask is not None:
        shaped = jnp.where(jnp.asarray(papr_mask)[:, None], shaped, fdom)
    tdom = jnp.fft.ifft(shaped, axis=-1) * (n / jnp.sqrt(jnp.asarray(8.0 * n)))

    # Raised-cosine crossfade guard (encode.cc:110-114): between the head
    # of the previous symbol and the tail of the current one.
    x = jnp.arange(guard_len) / (guard_len - 1)
    w = 0.5 * (1.0 - jnp.cos(jnp.pi * x))
    heads = tdom[:, :guard_len]
    tails = tdom[:, n - guard_len:]
    prev_heads = jnp.concatenate(
        [jnp.zeros((1, guard_len), tdom.dtype), heads[:-1]], axis=0)
    guards = prev_heads * (1.0 - w)[None, :] + tails * w[None, :]

    # Per-symbol PAPR on each axis (encode.cc:115-126), as metrics.
    power_re = tdom.real ** 2
    power_im = tdom.imag ** 2
    papr = jnp.stack(
        [n * jnp.max(power_re, axis=1) /
         jnp.maximum(jnp.sum(power_re, axis=1), 1e-30),
         n * jnp.max(power_im, axis=1) /
         jnp.maximum(jnp.sum(power_im, axis=1), 1e-30)], axis=-1)

    wave = jnp.concatenate([guards, tdom], axis=1).reshape(-1)
    return wave, papr
