"""Pallas TPU kernel for the SCL schedule VM.

Executes the same static instruction schedule as fec/scl_vm.py (see its
docstring for the algorithm) entirely inside one kernel invocation with
VMEM-resident state:

  * LLR tree   [rows, L, 512] f32 (~4.3 MB)   — VMEM scratch
  * beta slots [rows, L, 512] f32 (~6.4 MB)   — VMEM scratch
  * lane indirections / path metrics — small VMEM tiles

so the ~20k sequential micro-steps never touch HBM (the XLA scan
version streams ~MBs of chunk state per step).  Every schedule offset
is a multiple of the 512 chunk, so buffers are addressed by block row;
lane permutations (list forks) are one-hot [L, L] matmuls; top-k
selections are short iterative min-extractions (sorts and gathers both
lower poorly on the VPU).

One frame decodes per grid cell; the grid runs over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fec.scl_vm import (C_BDST, C_BSRC, C_BSRC2, C_D, C_DST, C_LAST,
                          C_OP, C_SIDR, C_SIDR2, C_SIDW, C_SRC, C_SRC2,
                          C_SUB, C_WIDTH, CHUNK, T_RATE1, build_schedule)

BIG = 3.0e38


def make_pallas_decoder(frozen: np.ndarray, list_size: int = 8,
                        interpret: bool = False):
    """Compile the Pallas SCL decoder for one frozen mask.

    Returns fn: llrs [batch, code_len] f32 -> (codewords [batch, L,
    code_len] uint8, pm [batch, L] f32).
    """
    sched = build_schedule(np.asarray(frozen, dtype=np.uint8).tobytes())
    L = list_size
    n = sched.code_len
    n_rows = -(-n // CHUNK)
    llr_rows = sched.sz_llr // CHUNK
    beta_rows = sched.sz_beta // CHUNK
    depths = sched.n_depths
    out_row0 = sched.out_off // CHUNK

    ops16 = np.zeros((sched.n_ops, 16), dtype=np.int32)
    ops16[:, : sched.ops.shape[1]] = sched.ops
    for col in (C_SRC, C_SRC2, C_DST, C_BSRC, C_BSRC2, C_BDST):
        ops16[:, col] //= CHUNK
    # sub-block F/G/COMBINE (half width < chunk) dispatch to the
    # in-block shift-matmul variants, opcodes 6..8
    sub = ops16[:, C_SUB] > 0
    ops16[sub, C_OP] += 6

    def sel_matrix(lanes):
        """lanes [L] -> one-hot [L, L] with S[p, l] = (p == lanes[l]):
        (mat @ S)[:, l] = mat[:, lanes[l]]."""
        p = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        return (p == lanes[None, :]).astype(jnp.float32)

    def row_perm_matrix(perm):
        """perm [L] -> P [L, L] with (P @ mat)[l] = mat[perm[l]]."""
        c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        return (c == perm[:, None]).astype(jnp.float32)

    def select_l_smallest(cand):
        """cand [1, 2L] -> (perm [L], flip [L], pm [L]) iteratively."""
        idx2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * L), 1)

        def body(k, carry):
            cand, perm, flip, pm = carry
            m = jnp.min(cand)
            at = jnp.min(jnp.where(cand == m, idx2, 2 * L))
            sel = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) == k
            perm = jnp.where(sel, at % L, perm)
            flip = jnp.where(sel, (at >= L).astype(jnp.int32), flip)
            pm = jnp.where(sel, m, pm)
            cand = jnp.where(idx2 == at, BIG, cand)
            return cand, perm, flip, pm

        zero_i = jnp.zeros((1, L), jnp.int32)
        zero_f = jnp.zeros((1, L), jnp.float32)
        _, perm, flip, pm = jax.lax.fori_loop(
            0, L, body, (cand, zero_i, zero_i, zero_f))
        return perm[0], flip[0], pm[0]

    def kernel(ops_ref, llr_in_ref, cw_ref, pm_ref, llr_s, beta_s,
               refs_s, pm_s):
        # ---- per-cell init -------------------------------------------
        for r in range(n_rows):
            lo, hi = r * CHUNK, min(n, (r + 1) * CHUNK)
            row = llr_in_ref[0, lo:hi]
            if hi - lo < CHUNK:
                row = jnp.concatenate(
                    [row, jnp.zeros(CHUNK - (hi - lo), jnp.float32)])
            llr_s[r] = jnp.broadcast_to(row[None, :], (L, CHUNK))
        refs_s[:] = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % L,
            refs_s.shape)
        pm_s[:] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, pm_s.shape, 1) == 0,
            0.0, BIG / 2)

        # ---- helpers --------------------------------------------------
        def read_llr(d, brow):
            p = row_perm_matrix(refs_s[d, :L])
            return jnp.dot(p, llr_s[brow],
                           preferred_element_type=jnp.float32)

        def read_beta(sid, brow):
            p = row_perm_matrix(refs_s[depths + sid, :L])
            return jnp.dot(p, beta_s[brow],
                           preferred_element_type=jnp.float32)

        def reset_ref(idx, last):
            @pl.when(last > 0)
            def _():
                refs_s[idx] = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, 128), 1) % L)[0]

        def permute_refs(perm):
            """refs[:, l] <- refs[:, perm[l]] on the first L lanes."""
            s128 = jnp.eye(128, dtype=jnp.float32)
            onehot = sel_matrix(perm)                  # [L, L]
            s128 = s128.at[:L, :L].set(onehot)
            out = jnp.dot(refs_s[:].astype(jnp.float32), s128,
                          preferred_element_type=jnp.float32)
            refs_s[:] = jnp.round(out).astype(jnp.int32)

        def chunk_mask(width):
            return jax.lax.broadcasted_iota(
                jnp.int32, (L, CHUNK), 1) < width

        def pm_get():
            return pm_s[0, :L]

        def pm_put(vals_l):
            full = jnp.concatenate(
                [vals_l, jnp.full((128 - L,), BIG, jnp.float32)])
            pm_s[0] = full

        # ---- schedule interpreter ------------------------------------
        def body(i, _):
            op = ops_ref[i, C_OP]
            d = ops_ref[i, C_D]
            width = ops_ref[i, C_WIDTH]
            last = ops_ref[i, C_LAST]

            def do_f(_):
                a = read_llr(d, ops_ref[i, C_SRC])
                b = read_llr(d, ops_ref[i, C_SRC2])
                llr_s[ops_ref[i, C_DST]] = (
                    jnp.sign(a) * jnp.sign(b)
                    * jnp.minimum(jnp.abs(a), jnp.abs(b)))
                reset_ref(d + 1, last)
                return 0

            def do_g(_):
                a = read_llr(d, ops_ref[i, C_SRC])
                b = read_llr(d, ops_ref[i, C_SRC2])
                bl = read_beta(ops_ref[i, C_SIDR], ops_ref[i, C_BSRC])
                llr_s[ops_ref[i, C_DST]] = b + bl * a
                reset_ref(d + 1, last)
                return 0

            def do_combine(_):
                bl = read_beta(ops_ref[i, C_SIDR], ops_ref[i, C_BSRC])
                br = read_beta(ops_ref[i, C_SIDR2], ops_ref[i, C_BSRC2])
                beta_s[ops_ref[i, C_BDST]] = bl * br
                beta_s[ops_ref[i, C_DST]] = br
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            def do_rate0(_):
                a = read_llr(d, ops_ref[i, C_SRC])
                pen = jnp.sum(
                    jnp.where(chunk_mask(width),
                              jnp.maximum(-a, 0.0), 0.0), axis=1)
                pm_put(pm_get() + pen)
                beta_s[ops_ref[i, C_BDST]] = jnp.ones((L, CHUNK),
                                                      jnp.float32)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            def do_rep(_):
                a = read_llr(d, ops_ref[i, C_SRC])
                m = chunk_mask(width)
                m0 = jnp.sum(jnp.where(m, jnp.maximum(-a, 0.0), 0.0),
                             axis=1)
                m1 = jnp.sum(jnp.where(m, jnp.maximum(a, 0.0), 0.0),
                             axis=1)
                pm = pm_get()
                cand = jnp.concatenate([pm + m0, pm + m1])[None, :]
                perm, flip, pm2 = select_l_smallest(cand)
                sign = jnp.where(flip > 0, -1.0, 1.0).astype(
                    jnp.float32)
                beta_s[ops_ref[i, C_BDST]] = jnp.broadcast_to(
                    sign[:, None], (L, CHUNK))
                permute_refs(perm)
                pm_put(pm2)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            def do_rate1(_):
                a = read_llr(d, ops_ref[i, C_SRC])
                valid = chunk_mask(width)
                mag0 = jnp.where(valid, jnp.abs(a), BIG)
                b0 = jnp.where(a < 0.0, -1.0, 1.0) * valid
                iota = jax.lax.broadcasted_iota(jnp.int32, (L, CHUNK),
                                                1)
                pm0 = pm_get()

                def round_body(r, carry):
                    mag, b_local, pm = carry
                    v = jnp.min(mag, axis=1)             # [L]
                    at = jnp.min(jnp.where(mag == v[:, None], iota,
                                           CHUNK), axis=1)
                    cand = jnp.concatenate([pm, pm + v])[None, :]
                    perm, flip, pm2 = select_l_smallest(cand)
                    pmat = row_perm_matrix(perm)
                    b_local = jnp.dot(pmat, b_local,
                                      preferred_element_type=jnp.float32)
                    mag = jnp.dot(pmat, mag,
                                  preferred_element_type=jnp.float32)
                    at2 = jnp.round(jnp.dot(
                        pmat, at[:, None].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
                    )[:, 0].astype(jnp.int32)
                    hit = iota == at2[:, None]
                    b_local = jnp.where(hit & (flip > 0)[:, None],
                                        -b_local, b_local)
                    mag = jnp.where(hit, BIG, mag)
                    permute_refs(perm)
                    return mag, b_local, pm2

                _, b_local, pm2 = jax.lax.fori_loop(
                    0, T_RATE1, round_body, (mag0, b0, pm0))
                beta_s[ops_ref[i, C_BDST]] = b_local
                pm_put(pm2)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            # In-block variants for internal nodes with half width h <
            # chunk: the second half sits h lanes in, which is not
            # block-aligned — realign with dynamic shift matmuls
            # (SH_l[c, j] = (c == j+h) shifts left by h).
            def shl(mat, h):
                c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK),
                                             0)
                j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK),
                                             1)
                return jnp.dot(mat, (c == j + h).astype(jnp.float32),
                               preferred_element_type=jnp.float32)

            def shr(mat, h):
                c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK),
                                             0)
                j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK),
                                             1)
                return jnp.dot(mat, (j == c + h).astype(jnp.float32),
                               preferred_element_type=jnp.float32)

            def clean(mat, cols):
                """Zero columns >= cols: garbage (NaN on interpret)
                would poison the shift matmul contraction."""
                m = jax.lax.broadcasted_iota(jnp.int32, (L, CHUNK),
                                             1) < cols
                return jnp.where(m, mat, 0.0)

            def do_f_s(_):
                blk = clean(read_llr(d, ops_ref[i, C_SRC]), 2 * width)
                b = shl(blk, width)
                llr_s[ops_ref[i, C_DST]] = (
                    jnp.sign(blk) * jnp.sign(b)
                    * jnp.minimum(jnp.abs(blk), jnp.abs(b)))
                reset_ref(d + 1, last)
                return 0

            def do_g_s(_):
                blk = clean(read_llr(d, ops_ref[i, C_SRC]), 2 * width)
                b = shl(blk, width)
                bl = clean(read_beta(ops_ref[i, C_SIDR],
                                     ops_ref[i, C_BSRC]), width)
                llr_s[ops_ref[i, C_DST]] = b + bl * blk
                reset_ref(d + 1, last)
                return 0

            def do_combine_s(_):
                bl = read_beta(ops_ref[i, C_SIDR], ops_ref[i, C_BSRC])
                br = clean(read_beta(ops_ref[i, C_SIDR2],
                                     ops_ref[i, C_BSRC2]), width)
                left = bl * br
                right = shr(br, width)
                mask = chunk_mask(width)
                beta_s[ops_ref[i, C_BDST]] = jnp.where(mask, left,
                                                       right)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            jax.lax.switch(op, [do_f, do_g, do_combine, do_rate0,
                                do_rep, do_rate1, do_f_s, do_g_s,
                                do_combine_s], 0)
            return 0

        jax.lax.fori_loop(0, sched.n_ops, body, 0)

        # ---- emit outputs --------------------------------------------
        for r in range(n_rows):
            lo, hi = r * CHUNK, min(n, (r + 1) * CHUNK)
            cw_ref[0, :, lo:hi] = (
                beta_s[out_row0 + r][:, : hi - lo] < 0.0).astype(
                    jnp.uint8)
        pm_ref[0, :] = pm_s[0, :L]

    def decode(llrs):
        batch = llrs.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec((sched.n_ops, 16), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, L, n), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, L, n), jnp.uint8),
                jax.ShapeDtypeStruct((batch, L), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((llr_rows, L, CHUNK), jnp.float32),
                pltpu.VMEM((beta_rows, L, CHUNK), jnp.float32),
                pltpu.VMEM((3 * depths, 128), jnp.int32),
                pltpu.VMEM((1, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(jnp.asarray(ops16), llrs)

    return decode
