"""Per-opcode-class timing ablation for the Pallas SCL kernel.

Builds override schedules consisting of M copies of one opcode class
(cycling through that class's real instances from the n=4096 wire-like
schedule) and times them at F=16 vs F=32.  Pinpoints which op class
causes the P=256 per-cell blowup (bench/probe_p256.py showed the raw
primitives all scale ~1.25x, so the cliff must be inside a switch
branch or in their composition).

Usage: python bench/ablate_ops.py [F ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from modem_tpu import apply_env_platform
apply_env_platform()

import jax
import jax.numpy as jnp

M = 1920
BATCH = 96

OPNAMES = {
    0: "F", 1: "G", 2: "C", 3: "RATE0", 4: "REP", 5: "RATE1",
    6: "SPC", 7: "F_S", 8: "G_S", 9: "C_S", 10: "F0", 11: "G0",
    12: "F_B", 13: "G_B", 14: "C_B", 15: "F2", 16: "G2", 17: "C2",
    18: "RATE0_2", 19: "REP_2", 20: "RATE1_2", 21: "SPC_2",
    22: "REPSPC_2", 23: "RATE0_FL", 24: "REP_FL", 25: "RATE1_FL",
    26: "SPC_FL", 27: "RATE0_GR", 28: "REP_GR", 29: "RATE1_GR",
    30: "SPC_GR", 31: "REPSPC_FL", 32: "REPSPC_GR", 33: "FF_2",
    34: "GF_2", 35: "CG_2", 36: "CC_2",
}


def main():
    from modem_tpu.kernels.scl_pallas import make_pallas_decoder

    fs = [int(a) for a in sys.argv[1:]] or [16, 32]
    frozen = np.load(os.path.join(
        os.path.dirname(__file__),
        "../modem_tpu/fec/tables/frozen_3968_2720_12.npy"))
    n = frozen.size
    rng = np.random.default_rng(0)
    llrs = jnp.asarray(rng.normal(2, 1, (BATCH, n)).astype(np.float32))

    # real retargeted table (via a throwaway decoder build)
    ref = make_pallas_decoder(frozen, 8, frames_per_cell=fs[0],
                              exact=True)
    ops16 = np.asarray(ref.ops16)
    classes = {}
    for r in ops16:
        classes.setdefault(int(r[0]), []).append(r)
    keep = os.environ.get("ABLATE_CLASSES")
    if keep:
        want = set(int(x) for x in keep.split(","))
        classes = {k: v for k, v in classes.items() if k in want}
    print("schedule:", {OPNAMES[k]: len(v)
                        for k, v in sorted(classes.items())})

    results = {}
    for F in fs:
        results[F] = {}
        for k, rows in sorted(classes.items()):
            sel = np.asarray(rows, dtype=np.int32)
            ov = np.tile(sel, (M // len(sel) + 1, 1))[:M]
            fn = jax.jit(make_pallas_decoder(
                frozen, 8, frames_per_cell=F, exact=True,
                ops_override=ov))
            try:
                cw, pm = fn(llrs)
                _ = np.asarray(pm)
                best = 1e9
                for rep in range(3):
                    x = llrs * (1.0 + 0.003 * rep)
                    t0 = time.time()
                    cw, pm = fn(x)
                    _ = np.asarray(pm)
                    best = min(best, time.time() - t0)
                cells = BATCH // F
                us = best * 1e6 / (M * cells)
                results[F][k] = us
                print(f"F={F} {OPNAMES[k]:10s}: {us:7.2f} us/op/cell")
            except Exception as e:
                print(f"F={F} {OPNAMES[k]:10s}: FAIL "
                      f"{type(e).__name__} {str(e)[:80]}")

    if len(fs) == 2 and all(results.get(f) for f in fs):
        a, b = fs
        print(f"\nratios F={b} / F={a} per op per cell:")
        for k in sorted(results[a]):
            if k in results[b]:
                print(f"  {OPNAMES[k]:10s}: "
                      f"{results[b][k]/results[a][k]:5.2f}x")


if __name__ == "__main__":
    main()
