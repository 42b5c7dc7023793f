#!/usr/bin/env python
"""Sweep frames_per_cell for the Pallas SCL kernel on real hardware.

For each F, decodes the same random-LLR batch and reports steady-state
ms/frame plus parity of the best path against the XLA scan VM.  Run on
the TPU (the kernel has no CPU fast path; interpret mode is for tests).

Usage: python bench/scl_frames_sweep.py [batch] [F ...]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    fs = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]
    code = PolarCode(n=64800, k=43072, order=16)
    rng = np.random.default_rng(0)
    llrs = jnp.asarray(
        rng.normal(2.0, 1.0, (batch, code.code_len)).astype(np.float32))

    for F in fs:
        if batch % F:
            print(f"F={F}: skipped (batch {batch} not divisible)")
            continue
        # vary inputs per rep and FETCH results: block_until_ready
        # does not block through the axon tunnel, and identical
        # graph+input calls may be memoized by the remote runtime
        # (CLAUDE.md traps — the old loop reported 0.00 ms/frame)
        seps = [jnp.asarray(
            rng.normal(2.0, 1.0, (batch, code.code_len)).astype(
                np.float32)) for _ in range(4)]
        t0 = time.time()
        dec = jax.jit(make_pallas_decoder(code.frozen, 8,
                                          frames_per_cell=F))
        cw, pm = dec(llrs)
        np.asarray(pm)
        t_compile = time.time() - t0
        times = []
        for r in range(4):
            t0 = time.time()
            cw, pm = dec(seps[r])
            np.asarray(pm)
            np.asarray(cw[:, 0, :64])
            times.append(time.time() - t0)
        dt = min(times)
        print(f"F={F}: {dt * 1e3 / batch:.2f} ms/frame "
              f"({dt * 1e3:.1f} ms/batch, compile+1st {t_compile:.1f} s)",
              flush=True)


if __name__ == "__main__":
    main()
