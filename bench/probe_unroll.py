#!/usr/bin/env python
"""Static-unroll SCL kernel A/B on real hardware.

The schedule-VM kernel pays ~2.4 us of fixed overhead per iteration
(docs/SCL_KERNEL.md §7) — the prime suspect is the 16 dynamic op-table
scalar reads + dynamic-offset addressing each iteration (the schedule
itself is static per frozen mask).  make_pallas_decoder(unroll=True)
expands the schedule at trace time: every offset/width/roll becomes a
compile-time constant, no switch, no table.  This probe ladders code
sizes (the unrolled Mosaic program grows with schedule length; the
wire code is 5,108 bodies) and reports trace+compile time and
steady-state ms/frame, baseline vs unroll, with bit-exactness checked
on the same inputs.

Usage: python bench/probe_unroll.py [batch] [sizes...]
  sizes: subset of {1024, 4096, 65536}; default all, smallest first.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

CODES = {
    1024: dict(n=960, k=480, order=10),
    4096: dict(n=4032, k=2304, order=12),
    65536: dict(n=64800, k=43072, order=16),
}


def main():
    from modem_tpu import apply_env_platform
    apply_env_platform()
    import jax
    import jax.numpy as jnp

    from modem_tpu.fec.polar import PolarCode
    from modem_tpu.kernels.scl_pallas import make_pallas_decoder

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sizes = [int(a) for a in sys.argv[2:]] or [1024, 4096, 65536]
    F = 16
    rng = np.random.default_rng(0)

    for sz in sizes:
        code = PolarCode(**CODES[sz])
        reps = [jnp.asarray(rng.normal(
            2.0, 1.0, (batch, code.code_len)).astype(np.float32))
            for _ in range(5)]
        results = {}
        for unroll in (False, True):
            tag = "unroll" if unroll else "loop  "
            t0 = time.time()
            dec = jax.jit(make_pallas_decoder(
                code.frozen, 8, frames_per_cell=F, unroll=unroll))
            try:
                lowered = dec.lower(reps[0])
                t_trace = time.time() - t0
                t0 = time.time()
                compiled = lowered.compile()
                t_compile = time.time() - t0
                # execution faults (device OOM/wedge at the risky
                # unroll sizes) must not abort the remaining ladder
                cw, pm = compiled(reps[0])
                first = (np.asarray(cw), np.asarray(pm))
                times = []
                for r in range(1, 5):
                    t0 = time.time()
                    cw, pm = compiled(reps[r])
                    np.asarray(pm)
                    np.asarray(cw[:, 0, :64])
                    times.append(time.time() - t0)
            except Exception as e:
                print(f"n={sz} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            dt = min(times)
            results[unroll] = first
            print(f"n={sz} {tag}: {dt * 1e3 / batch:7.3f} ms/frame "
                  f"({dt * 1e3:8.1f} ms/batch)  trace {t_trace:6.1f} s  "
                  f"compile {t_compile:6.1f} s", flush=True)
        if len(results) == 2:
            same = (np.array_equal(results[False][0], results[True][0])
                    and np.array_equal(results[False][1],
                                       results[True][1]))
            print(f"n={sz} parity: bit-identical={same}", flush=True)


if __name__ == "__main__":
    main()
