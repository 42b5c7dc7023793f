#!/usr/bin/env python
"""SC (list_size=1) Pallas kernel probe on real hardware.

The adaptive-decode lever (docs/SCL_KERNEL.md §8): at L=1 the SCL
kernel degenerates to plain successive cancellation — the schedule is
unchanged but P = F lanes hold F FRAMES instead of F*L, so one cell
amortises the serial schedule over up to 8x more frames under the same
VMEM budget.  A CRC-gated serving path can decode everything with SC
first and fall back to exact L=8 SCL only on CRC failure (adaptive
SCL, Li-Niu-Chen 2012 style), which at serving SNR turns ~96% of
decode wall time into the SC cost.

This probe ladders frames_per_cell for L=1 at wire size against the
L=8 F=16 serving baseline and checks clean-frame correctness.

Usage: python bench/probe_sc_l1.py [batch] [F...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from modem_tpu import apply_env_platform
    apply_env_platform()
    import jax
    import jax.numpy as jnp

    from modem_tpu.fec.polar import PolarCode
    from modem_tpu.kernels.scl_pallas import make_pallas_decoder

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    fs = [int(a) for a in sys.argv[2:]] or [16, 32, 64]
    code = PolarCode(n=64800, k=43072, order=16)
    rng = np.random.default_rng(0)

    # clean frames: correctness check rides the timing reps
    m = rng.integers(0, 2, (batch, code.mesg_bits), dtype=np.uint8)
    m[:, code.k:] = 0
    cws = np.stack([code.encode_systematic_np(r) for r in m])
    tx = 1.0 - 2.0 * np.stack(
        [code.shorten_np(c) for c in cws]).astype(np.float64)
    reps = []
    for r in range(4):
        rx = tx + 0.4 * rng.standard_normal(tx.shape)
        reps.append(jnp.asarray(np.stack(
            [code.lengthen_np(2.0 * row / 0.16) for row in rx]
        ).astype(np.float32)))

    configs = [(8, 16)] + [(1, F) for F in fs]
    for L, F in configs:
        if batch % F:
            continue
        tag = f"L={L} F={F:3d}"
        try:
            t0 = time.time()
            dec = jax.jit(make_pallas_decoder(
                code.frozen, L, frames_per_cell=F))
            compiled = dec.lower(reps[0]).compile()
            t_compile = time.time() - t0
            cw, pm = compiled(reps[0])
            ok = (np.asarray(cw)[:, 0] == cws).all(axis=1).sum()
            times = []
            for r in range(1, 4):
                t0 = time.time()
                cw, pm = compiled(reps[r])
                np.asarray(pm)
                np.asarray(cw[:, 0, :64])
                times.append(time.time() - t0)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        dt = min(times)
        print(f"{tag}: {dt * 1e3 / batch:7.3f} ms/frame "
              f"({dt * 1e3:8.1f} ms/batch)  clean-correct {ok}/{batch}  "
              f"compile {t_compile:6.1f} s", flush=True)


if __name__ == "__main__":
    main()
