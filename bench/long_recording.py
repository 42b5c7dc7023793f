#!/usr/bin/env python
"""Decode a one-hour recording in constant device memory.

VERDICT round-1 task 2 / SURVEY §5 long-signal analog: the reference
decodes arbitrarily long streams through a fixed 8,640-sample BipBuffer
(decode.cc:188-194).  Here a 1-hour 8 kHz recording (28.8M samples)
holding N frames at random offsets is scanned by the CHUNKED
Schmidl-Cox pass (sync.metrics_host: O(2^20)-sample device windows,
Schmitt state threaded across chunks) and every found frame
batch-decodes in one jitted call.

Usage: python bench/long_recording.py [hours] [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from modem_tpu import apply_env_platform
    apply_env_platform()
    from modem_tpu import bits as B
    from modem_tpu.encoder import Encoder
    from modem_tpu.numerology import make_config
    from modem_tpu.pipeline import BatchPipeline

    hours = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rate = 8000
    cfg = make_config(rate, 6, 2000)
    t_total = int(hours * 3600 * rate)

    rng = np.random.default_rng(7)
    payloads = [rng.integers(0, 256, cfg.mode.data_bytes,
                             dtype=np.uint8).tobytes()
                for _ in range(n_frames)]
    enc = Encoder(cfg)
    waves, _ = enc.encode_batch(payloads, B.base37_encode("N0CALL"))
    flen = waves.shape[1]

    # non-overlapping random frame starts with 1 s clearance
    gap = rate
    slot = (t_total - gap) // n_frames
    assert slot > flen + gap, "recording too short for n_frames"
    starts = np.sort(rng.integers(0, slot - flen - gap, n_frames)
                     + np.arange(n_frames) * slot + gap)

    x = np.zeros((t_total, 2), dtype=np.float32)
    for s, w in zip(starts, waves):
        x[s: s + flen, 0] = w.real
        x[s: s + flen, 1] = w.imag
    x += 1e-4 * rng.standard_normal(x.shape).astype(np.float32)
    print(f"# recording: {hours:.2f} h = {t_total} samples "
          f"({x.nbytes / 1e6:.0f} MB host), {n_frames} frames",
          file=sys.stderr, flush=True)

    pipe = BatchPipeline(rate, 6)
    t0 = time.time()
    res, pos = pipe.decode_recording(x, max_frames=n_frames + 4)
    dt = time.time() - t0
    ok = np.asarray(res["ok"])
    exact = sum(pipe.payload_bytes(res, i) == payloads[i]
                for i in range(min(len(pos), n_frames)))
    n_chunks = -(-(t_total) // pipe.sync.CHUNK_SMALL)
    print(f"# found {len(pos)} frames, ok {int(ok.sum())}, "
          f"byte-exact {exact}/{n_frames}; scan+decode {dt:.1f} s "
          f"({hours * 3600 / dt:.0f}x real time end-to-end), "
          f"{n_chunks} sync chunks of {pipe.sync.CHUNK_SMALL} samples",
          file=sys.stderr, flush=True)
    print(f"positions found: {list(map(int, pos))}")
    print(f"positions true:  {[int(s) for s in starts]}")
    return 0 if exact == n_frames else 1


if __name__ == "__main__":
    sys.exit(main())
