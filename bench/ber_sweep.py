#!/usr/bin/env python
"""Frame-success-rate sweep vs AWGN level (BASELINE config 4 evidence).

Encodes a batch of mode-6 frames, applies the reference impairment
chain (multipath + CFO 234.567 Hz + SFO 147 ppm) plus a sweep of AWGN
levels, and reports the frame success rate and mean bit flips at each
level through the batched pipeline.

Usage: python bench/ber_sweep.py [batch] [mode]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    from modem_tpu import apply_env_platform
    apply_env_platform()
    from modem_tpu import bits as B
    from modem_tpu import channel
    from modem_tpu.encoder import Encoder
    from modem_tpu.numerology import make_config
    from modem_tpu.pipeline import BatchPipeline

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mode = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = make_config(8000, mode, 2000)
    enc = Encoder(cfg)
    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 256, cfg.mode.data_bytes,
                             dtype=np.uint8).tobytes()
                for _ in range(batch)]
    sil = np.zeros(cfg.rate // 2, dtype=np.complex64)
    clean = [np.concatenate([sil, enc.encode(p, B.base37_encode(
        "N0CALL"))[0], sil]) for p in payloads]

    pipe = BatchPipeline(8000, mode)
    print(f"mode {mode}, batch {batch}; chain = multipath + CFO "
          "234.567 Hz + SFO 147 ppm + AWGN:")
    for awgn_db in [-40, -35, -30, -25, -22, -20, -18]:
        recs = []
        for i, c in enumerate(clean):
            y = channel.multipath(c)
            y = channel.cfo(y, 234.567, cfg.rate)
            y = channel.sfo(y, 147.0)
            y = channel.awgn(y, awgn_db, np.random.default_rng(100 + i))
            recs.append(y[: len(clean[0])])
        res = pipe.decode_batch(np.stack(recs))
        ok = 0
        for i in range(batch):
            ok += (bool(np.asarray(res["ok"])[i]) and
                   pipe.payload_bytes(res, i) == payloads[i])
        flips = np.asarray(res["flips"])
        print(f"  awgn {awgn_db:+d} dB: {ok}/{batch} frames bit-exact, "
              f"mean flips {flips.mean():.0f}")


if __name__ == "__main__":
    main()
