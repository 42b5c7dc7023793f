"""Mosaic v5e scaling probe: which SCL-kernel primitive falls off a
cliff at P=256 sublanes?

The F=32 (P=256) kernel measured 5x the per-cell cost of F=16
(P=128) on n=4096 — far beyond the ~1.3x/doubling trend measured
F=8->16 (bench/scl_frames_sweep.py).  Each probe below times ONE
primitive class in isolation at P=128 vs 256, repeated R times inside
a fori_loop in a single pallas_call (so per-call dispatch cancels and
the loop models the schedule interpreter's serialized issue).

Usage: python bench/probe_p256.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 20000


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def timeit(name, P, body_fn, out_shape=None):
    """body_fn(x, i) -> y with x, y [P, 512] f32; looped R times."""
    def kernel(x_ref, o_ref):
        def body(i, v):
            return body_fn(v, i)
        o_ref[:] = jax.lax.fori_loop(0, R, body, x_ref[:])

    x = jnp.asarray(np.random.default_rng(0).normal(
        1, 1, (P, 512)).astype(np.float32))
    fn = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, 512), jnp.float32),
    ))
    try:
        y = fn(x)
        _ = np.asarray(y)
        best = 1e9
        for rep in range(4):
            x2 = x * (1.0 + 0.003 * rep)
            t0 = time.time()
            _ = np.asarray(fn(x2))
            best = min(best, time.time() - t0)
        print(f"{name:34s} P={P:3d}: {best*1e6/R:8.2f} us/iter")
        return best / R
    except Exception as e:
        print(f"{name:34s} P={P:3d}: FAIL {type(e).__name__}: "
              f"{str(e)[:90]}")
        return None


def main():
    results = {}
    for P in (128, 256):
        ew = timeit("elementwise madd [P,512]", P,
                    lambda v, i: v * 1.0001 + 0.001)

        def red(v, i):
            m = jnp.min(v, axis=1, keepdims=True)
            return v + m
        rd = timeit("min-reduce axis1 + bcast", P, red)

        def tp(v, i):
            col = v[:, 0:1]             # [P, 1]
            row = col.T                 # [1, P]
            return v + row[0, 0]
        tr = timeit("(P,1)->(1,P) transpose", P, tp)

        def onehot(v, i):
            perm = jnp.zeros((P, 1), jnp.int32) + (i % P)
            m = (iota2((P, P), 1) == perm).astype(jnp.float32)
            return jnp.dot(m, v, preferred_element_type=jnp.float32)
        oh = timeit("one-hot [P,P] matmul", P, onehot)

        def eyesum(v, i):
            a = jnp.dot(v[:, :P], v[:, :P],
                        preferred_element_type=jnp.float32)
            eye = (iota2((P, P), 0) == iota2((P, P), 1)).astype(
                jnp.float32)
            d = jnp.sum(a * eye, axis=1, keepdims=True)
            return v + d
        es = timeit("[P,P] matmul + eye diag-sum", P, eyesum)

        def bcast_fp(v, i):
            # the [F, 2P] selector view: F = P // 8
            Fh = P // 8
            pos = iota2((Fh, 2 * P), 1)
            cand = jnp.concatenate([v[:, 0:1].T, v[:, 1:2].T],
                                   axis=1)      # [1, 2P]
            cf = jnp.where((pos % P) // 8 == iota2((Fh, 2 * P), 0),
                           jnp.broadcast_to(cand, (Fh, 2 * P)), 3e38)
            m = jnp.min(cf, axis=1, keepdims=True)     # [Fh, 1]
            s = jnp.sum(m)                              # scalar
            return v + s
        bf = timeit("[F,2P] masked min (selector)", P, bcast_fp)

        results[P] = (ew, rd, tr, oh, es, bf)

    names = ["elementwise", "min-reduce", "transpose", "one-hot dot",
             "eye diag-sum", "selector view"]
    print("\nratios P=256 / P=128 (2.0 = linear in tiles):")
    for k, nm in enumerate(names):
        a, b = results[128][k], results[256][k]
        if a and b:
            print(f"  {nm:16s}: {b/a:5.2f}x")


if __name__ == "__main__":
    main()
