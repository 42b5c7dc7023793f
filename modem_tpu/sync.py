"""Vectorized Schmidl-Cox synchronization over whole recordings.

TPU-native re-design of the reference's per-sample streaming correlator
(SchmidlCox, decode.cc:37-153).  The reference pushes one sample at a
time through sliding-window sums (SMA), a Schmitt trigger and an argmax
tracker; here the whole recording is processed as arrays:

  * the three sliding windows (correlation P over L, power R over 2L,
    timing match over guard_len|1) become cumulative-sum differences,
  * the Schmitt trigger + falling-edge detection become an associative
    boolean scan,
  * the per-event fine stage (fractional-CFO mixdown, L-point FFT,
    adjacent-bin differential, circular correlation against the MLS0
    kernel) is a batched jitted function over all candidate peaks.

All positions are in recording coordinates: ``p0`` points at the first
sample of the Schmidl-Cox symbol's payload (after its guard), matching
the reference's ``symbol_pos`` (relative buffer offsets collapse away;
see decode.cc:84-152 and SURVEY.md §3.2).

Numerics note (SURVEY.md §7 hard part 5): window sums run in float64 to
avoid cumulative-sum drift the reference's recursive SMA does not have.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bits as B
from . import ofdm
from .numerology import ModemConfig


def window_sum(x, w: int):
    """y[n] = sum(x[n-w+1 .. n]) via cumsum difference (same length)."""
    c = jnp.cumsum(x, axis=-1)
    return c - jnp.concatenate(
        [jnp.zeros_like(c[..., :w]), c[..., :-w]], axis=-1)


def schmitt_falling(timing, lo: float, hi: float):
    """Hysteresis trigger state + falling edges, vectorised.

    s[n] = (t[n] > hi) | (t[n] >= lo & s[n-1])  — an associative boolean
    recurrence composed with lax.associative_scan (decode.cc:49-50,93-94).
    Returns (collect_state, falling_edge) bool arrays.
    """
    a = timing > hi
    b = timing >= lo

    def compose(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 | (b2 & a1), b2 & b1

    s, _ = jax.lax.associative_scan(compose, (a, b), axis=-1)
    prev = jnp.concatenate([jnp.zeros_like(s[..., :1]), s[..., :-1]],
                           axis=-1)
    return s, prev & ~s


@dataclasses.dataclass
class SyncCandidate:
    p0: int           # recording index of the S&C symbol payload start
    frac_cfo: float   # fractional CFO estimate, rad/sample
    cfo_rad: float    # full CFO estimate (integer + fractional)
    ok: bool          # passed uniqueness + timing-error gates
    peak_ratio: float


class Synchronizer:
    """Per-config Schmidl-Cox detector (operates at L = symbol_len/2)."""

    def __init__(self, cfg: ModemConfig):
        self.cfg = cfg
        n = cfg.symbol_len
        self.L = L = n // 2
        self.match_len = cfg.guard_len | 1
        self.match_del = (self.match_len - 1) // 2
        self.thr_lo = 0.17 * self.match_len   # decode.cc:76
        self.thr_hi = 0.19 * self.match_len

        # Matched kernel from the decoder-side MLS0 layout over L bins
        # (decode.cc:236-244, 76-83).
        seq = np.zeros(L, dtype=np.complex64)
        mls0 = B.mls_nrz(cfg.mls0_poly, cfg.mls0_len)
        bins = (np.arange(cfg.mls0_len) + cfg.mls0_off // 2 + L) % L
        seq[bins] = mls0
        self.kern = np.conj(np.fft.fft(seq)) / L

        self._metrics_jit = jax.jit(self._metrics)
        self._fine_jit = jax.jit(jax.vmap(self._fine_stage))

    # -- stage 1: whole-recording timing metric ---------------------------
    def _metrics(self, x):
        L = self.L
        T = x.shape[-1]
        xc = x.astype(jnp.complex64)
        a = xc[..., L: T - L]            # x[v + L]
        bseg = xc[..., 2 * L:]           # x[v + 2L]
        prod = (a * jnp.conj(bseg)).astype(jnp.complex128)
        p = window_sum(prod, L)
        power = window_sum(jnp.abs(bseg).astype(jnp.float64) ** 2, 2 * L)
        r = jnp.maximum(0.5 * power, 1e-4 * L)
        timing = window_sum(jnp.abs(p) ** 2 / (r * r), self.match_len)
        phase = jnp.angle(p)
        return timing.astype(jnp.float32), phase.astype(jnp.float32)

    # -- stage 2: fine timing / CFO at one candidate ----------------------
    def _fine_stage(self, window, frac_cfo):
        """window: [L] samples at x[p0+L : p0+2L] (second half of the S&C
        symbol); returns (shift, pos_err, peak, next_peak, peak_phase)."""
        L = self.L
        idx = jnp.arange(L)
        mixed = window * jnp.exp(1j * frac_cfo * idx).astype(jnp.complex64)
        spec = jnp.fft.fft(mixed)
        prev = jnp.roll(spec, 1)
        cons = ofdm.demod_or_erase(spec, prev)
        corr = jnp.fft.ifft(jnp.fft.fft(cons) * jnp.asarray(self.kern)) * L
        pwr = jnp.abs(corr) ** 2
        shift = jnp.argmax(pwr)
        peak = pwr[shift]
        next_peak = jnp.max(jnp.where(idx == shift, -jnp.inf, pwr))
        pos_err = jnp.round(jnp.angle(corr[shift]) * L /
                            (2.0 * jnp.pi)).astype(jnp.int32)
        return shift, pos_err, peak, next_peak, jnp.angle(corr[shift])

    # -- public API --------------------------------------------------------
    def scan(self, x: np.ndarray, max_candidates: int = 8):
        """Find S&C preambles in a recording (analytic complex samples).

        Returns a list of SyncCandidate in time order, gates applied
        (uniqueness peak > 4*next, |pos_err| <= guard/2; decode.cc:140-145).
        """
        cfg = self.cfg
        L = self.L
        timing, phase = self._metrics_jit(jnp.asarray(x))
        timing = np.asarray(timing)
        phase = np.asarray(phase)
        state, falling = np.asarray(
            schmitt_falling(jnp.asarray(timing), self.thr_lo, self.thr_hi))
        falling = np.asarray(falling)

        events = []
        edges = np.nonzero(falling)[0]
        start = 0
        for edge in edges[:max_candidates * 4]:
            # region of collect=true ending at this edge
            region = np.nonzero(~state[start:edge])[0]
            rstart = start + (region[-1] + 1 if len(region) else 0)
            seg = timing[rstart:edge]
            if not len(seg):
                start = edge
                continue
            n_max = rstart + int(np.argmax(seg))
            start = edge
            index_max = min(edge - 1 - n_max + self.match_del,
                            L + cfg.guard_len + self.match_del)
            p0 = (edge - 1) - index_max      # == n_max - match_del if uncapped
            fc = float(phase[max(n_max - self.match_del, 0)]) / L
            events.append((p0, fc))
        if not events:
            return []

        p0s = np.array([e[0] for e in events])
        fcs = np.array([e[1] for e in events], dtype=np.float32)
        wins = np.stack([self._window(x, p) for p in p0s])
        shift, pos_err, peak, nxt, _ = (
            np.asarray(v) for v in self._fine_jit(jnp.asarray(wins),
                                                  jnp.asarray(fcs)))
        out = []
        for i, (p0, fc) in enumerate(events):
            ok = bool(peak[i] > 4.0 * nxt[i]) and \
                bool(abs(int(pos_err[i])) <= cfg.guard_len // 2)
            cfo = float(shift[i]) * 2.0 * np.pi / L - fc
            if cfo >= np.pi:
                cfo -= 2.0 * np.pi
            out.append(SyncCandidate(
                p0=int(p0) - int(pos_err[i]), frac_cfo=fc, cfo_rad=cfo,
                ok=ok, peak_ratio=float(peak[i] / max(nxt[i], 1e-30))))
        return out

    def _window(self, x: np.ndarray, p0: int) -> np.ndarray:
        L = self.L
        lo = p0 + L
        pad = np.zeros(L, dtype=np.complex64)
        if 0 <= lo and lo + L <= len(x):
            return x[lo: lo + L].astype(np.complex64)
        seg = x[max(lo, 0): max(lo + L, 0)]
        pad[: len(seg)] = seg
        return pad
