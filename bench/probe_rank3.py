"""Mosaic v5e capability probe for the rank-based one-shot selection.

Validates, on the real chip, the primitives the single-pass SCL fork
selection needs (docs/SCL_KERNEL.md §7d):
  1. rank-3 broadcasted_iota / broadcast compare / where / reduce over
     trailing axes on [P, 16, 16] and [P, 16, 8] blocks;
  2. pltpu.roll along the SUBLANE axis (axis 0) of a [P, 16] tile;
  3. the existing matmul one-hot machinery on [F, P] @ [P, 8].

Each probe compiles a tiny pallas_call under jit and checks values
against numpy.  Prints one PASS/FAIL line per primitive.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from modem_tpu import apply_env_platform
apply_env_platform()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, C = 128, 16


def run(name, kernel, x, expect, atol=0.0):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(expect.shape, jnp.float32),
        )
        y = np.asarray(jax.jit(out)(x))
        ok = np.allclose(y, expect, atol=atol, rtol=0)
        print(f"{name}: {'PASS' if ok else 'VALUE-FAIL'}"
              + ("" if ok else f" maxdiff={np.abs(y-expect).max()}"))
    except Exception as e:  # noqa: BLE001
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: COMPILE-FAIL {type(e).__name__}: {msg}")


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((P, C)).astype(np.float32)

    # 1. within-row rank via rank-3 all-pairs (strict less, no ties in
    # random f32 data)
    def k_rank3(x_ref, o_ref):
        v = x_ref[:]
        a = jax.lax.broadcast_in_dim(v, (P, C, C), (0, 1))   # v[p,q] -> [p,q,q']
        b = jax.lax.broadcast_in_dim(v, (P, C, C), (0, 2))   # v[p,q'] -> [p,q,q']
        less = jnp.where(b < a, 1.0, 0.0)
        o_ref[:] = jnp.sum(less, axis=2)

    expect = (x[:, None, :] < x[:, :, None]).sum(axis=2).astype(np.float32)
    run("rank3-allpairs", k_rank3, x, expect)

    # 2. rank-3 broadcast of a 2D COMPUTED where-mask (affine
    # functions of iotas fold back into an unsupported rank-3
    # tpu.iota; comparison->select masks must not).  The mask is
    # multiplied into a data tensor as in the kernel's tie-break.
    def k_mask3(x_ref, o_ref):
        v = x_ref[:]
        tri = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1),
            1.0, 0.0)
        t3 = jax.lax.broadcast_in_dim(tri, (P, C, C), (1, 2))
        a3 = jax.lax.broadcast_in_dim(v, (P, C, C), (0, 1))
        b3 = jax.lax.broadcast_in_dim(v, (P, C, C), (0, 2))
        o_ref[:] = jnp.sum(jnp.where(b3 == a3, t3, 0.0), axis=2)

    tri = (np.arange(C)[:, None] < np.arange(C)[None, :])
    eq = x[:, :, None] == x[:, None, :]
    run("rank3-computed-mask", k_mask3, x,
        np.where(eq, np.broadcast_to(tri, (P, C, C)), 0.0)
        .sum(axis=2).astype(np.float32))

    # 3. slot extraction IN 2D (the kernel's actual shape): rank mask
    # [F, LC] -> masked sum per slot -> [F, 1] columns
    def k_slot(x_ref, o_ref):
        v = x_ref[:]
        r = jnp.floor(v * 3.0)     # pseudo "ranks"
        cols = [jnp.sum(jnp.where(r == k, v, 0.0), axis=1,
                        keepdims=True) for k in range(8)]
        o_ref[:] = jnp.concatenate(cols, axis=1)

    r = np.floor(x * 3.0)
    expect = np.zeros((P, 8), np.float32)
    for k in range(8):
        expect[:, k] = np.where(r == k, x, 0.0).sum(axis=1)
    # multi-element sums here (pseudo-ranks collide) -> reduction-
    # order noise; the kernel's real masks hit exactly one element
    run("rank2-slot-extract", k_slot, x, expect, atol=1e-5)

    # 4. sublane roll (axis 0) of [P, C] — pltpu.roll requires a
    # NON-NEGATIVE shift; the kernel always passes P - o
    def k_roll0(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], P - 3, 0)

    run("sublane-roll", k_roll0, x, np.roll(x, -3, axis=0))

    # 5. the full roll-aligned frame rank (mini): frames of L=8
    # sublane rows x C columns; rank[p, q] = # of same-frame
    # candidates strictly smaller (random data: no ties).  This is
    # the exact compute shape of make_select_flat_rank — NO leading
    # reshape (reshape [P, C] -> [P//8, 8, C] + middle-dim slices
    # crashed the remote compile helper, HTTP 500).
    L = 8

    def k_frame_rank(x_ref, o_ref):
        v = x_ref[:]
        l2 = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) % L
        cnt = jnp.zeros((P, C), jnp.float32)
        for o in range(L):
            if o == 0:
                rolled = v
            else:
                r_main = pltpu.roll(v, P - o, 0)
                r_wrap = pltpu.roll(v, L - o, 0)
                rolled = jnp.where(l2 < L - o, r_main, r_wrap)
            a3 = jax.lax.broadcast_in_dim(v, (P, C, C), (0, 1))
            b3 = jax.lax.broadcast_in_dim(rolled, (P, C, C), (0, 2))
            cnt = cnt + jnp.sum(jnp.where(b3 < a3, 1.0, 0.0), axis=2)
        o_ref[:] = cnt

    expect = np.zeros((P, C), np.float32)
    for f in range(P // L):
        blk = x[f * L:(f + 1) * L].ravel()
        rk = (blk[None, :] < blk[:, None]).sum(axis=1)
        expect[f * L:(f + 1) * L] = rk.reshape(L, C)
    run("frame-rank-rolled", k_frame_rank, x, expect)


if __name__ == "__main__":
    main()
