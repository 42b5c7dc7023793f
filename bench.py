#!/usr/bin/env python
"""Benchmark: batched mode-6 decode throughput per TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

metric = frames decoded per second per chip through the full batched
pipeline (sync argmax -> fine CFO -> FFT demod -> Theil-Sen -> soft
demap -> SCL VM list-8 -> CRC select).  vs_baseline = multiples of
real time at 8 kHz (frame duration 9.54 s for mode 6) against the
BASELINE.md target of >= 1000x real time per chip.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from modem_tpu import apply_env_platform
    apply_env_platform()
    import jax

    from modem_tpu import bits as B
    from modem_tpu.encoder import Encoder
    from modem_tpu.numerology import make_config
    from modem_tpu.pipeline import BatchPipeline

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = make_config(8000, 6, 2000)
    enc = Encoder(cfg)
    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 256, cfg.mode.data_bytes,
                             dtype=np.uint8).tobytes()
                for _ in range(batch)]
    sil = np.zeros(cfg.rate // 4, dtype=np.complex64)
    recs = []
    t0 = time.time()
    for i, p in enumerate(payloads):
        wave, _ = enc.encode(p, B.base37_encode("N0CALL"))
        recs.append(np.concatenate([sil, wave, sil]))
        print(f"# encoded {i + 1}/{batch} ({time.time() - t0:.0f} s)",
              file=sys.stderr, flush=True)
    recs = np.stack(recs)

    pipe = BatchPipeline(8000, 6)
    t0 = time.time()
    print("# compiling batched decode...", file=sys.stderr, flush=True)
    res = pipe.decode_batch(recs)              # compile
    print(f"# decode compile+first: {time.time() - t0:.0f} s",
          file=sys.stderr, flush=True)
    ok = np.asarray(res["ok"])
    exact = sum(pipe.payload_bytes(res, i) == payloads[i]
                for i in range(batch))
    if not ok.all() or exact != batch:
        print(json.dumps({"metric": "decode correctness", "value": 0,
                          "unit": "failed",
                          "vs_baseline": 0.0}))
        return 1

    reps = 3
    # vary the input (scaling leaves the decode invariant) and fetch a
    # result to host each rep: block_until_ready does not actually block
    # through the axon tunnel, and identical inputs could be memoized.
    # Inputs are staged on device outside the timed loop.
    from modem_tpu import cplx
    import jax.numpy as jnp
    staged = [jnp.asarray(cplx.from_np(recs) * np.float32(s))
              for s in (1.02, 1.01, 0.99)]
    for s in staged:
        s.block_until_ready()
    t0 = time.time()
    for i in range(reps):
        res = pipe.decode_batch(staged[i % 3])
        np.asarray(res["flips"])
    dt = (time.time() - t0) / reps
    fps = batch / dt
    frame_s = cfg.frame_samples / cfg.rate     # on-air frame duration
    xrt = fps * frame_s
    print(json.dumps({
        "metric": "frames decoded/sec/chip (mode 6, 8 kHz, batch "
                  f"{batch}, bit-exact)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(xrt / 1000.0, 4),
    }))
    print(f"# {fps:.2f} frames/s = {xrt:.0f}x real time "
          f"(target 1000x); batch {batch}, {dt*1000:.0f} ms/batch",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
