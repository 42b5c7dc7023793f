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

Mosaic constraints honoured throughout: every vector value is rank-2
(per-path scalars are [L, 1] columns or [1, L] rows — rank-1 arrays
crash the layout inferer), dim insertions happen on 32-bit types only,
and no scatter/gather primitives are used.

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
                        interpret: bool = False, ops_override=None):
    """Compile the Pallas SCL decoder for one frozen mask.

    Returns fn: llrs [batch, code_len] f32 -> (codewords [batch, L,
    code_len] uint8, pm [batch, L] f32).  ops_override replaces the
    instruction table (profiling aid).
    """
    sched = build_schedule(np.asarray(frozen, dtype=np.uint8).tobytes())
    if ops_override is not None:
        import dataclasses as _dc
        sched = _dc.replace(sched, ops=np.asarray(ops_override,
                                                  dtype=np.int32))
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
    # in-block shift-matmul variants, opcodes 7..9
    sub = ops16[:, C_SUB] > 0
    ops16[sub, C_OP] += 7

    def iota2(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

    def perm_matrix(perm_col):
        """perm [L, 1] -> P [L, L] with (P @ mat)[l] = mat[perm[l]]."""
        return (iota2((L, L), 1) == perm_col).astype(jnp.float32)

    def select_l_smallest(cand_row):
        """cand [1, 2L] -> (perm [L,1], flip [L,1], pm [1,L])."""
        idx2 = iota2((1, 2 * L), 1)

        def body(k, carry):
            cand, perm, flip, pm = carry
            m = jnp.min(cand)
            at = jnp.min(jnp.where(cand == m, idx2, 2 * L))
            sel = iota2((1, L), 1) == k
            perm = jnp.where(sel, at % L, perm)
            flip = jnp.where(sel, jnp.where(at >= L, 1, 0), flip)
            pm = jnp.where(sel, m, pm)
            cand = jnp.where(idx2 == at, BIG, cand)
            return cand, perm, flip, pm

        zero_i = jnp.zeros((1, L), jnp.int32)
        zero_f = jnp.zeros((1, L), jnp.float32)
        _, perm, flip, pm = jax.lax.fori_loop(
            0, L, body, (cand_row, zero_i, zero_i, zero_f))
        return perm.T, flip.T, pm

    def kernel(ops_ref, llr_in_ref, cw_ref, pm_ref, llr_s, beta_s,
               refs_s, pm_s):
        # ---- per-cell init -------------------------------------------
        for r in range(n_rows):
            row = llr_in_ref[0, r:r + 1, :]            # [1, CHUNK]
            llr_s[r] = jnp.broadcast_to(row, (L, CHUNK))
        refs_s[:] = jnp.broadcast_to(iota2((1, 128), 1) % L,
                                     refs_s.shape)
        pm_s[:] = jnp.where(iota2(pm_s.shape, 1) == 0, 0.0, BIG / 2)

        # ---- helpers --------------------------------------------------
        def read_with(perm_col, buf, brow):
            p = perm_matrix(perm_col)
            return jnp.dot(p, buf[brow],
                           preferred_element_type=jnp.float32)

        def read_llr(d, brow):
            return read_with(refs_s[pl.ds(d, 1), :L].T, llr_s, brow)

        def read_beta(sid, brow):
            return read_with(refs_s[pl.ds(depths + sid, 1), :L].T,
                             beta_s, brow)

        def reset_ref(idx, last):
            @pl.when(last > 0)
            def _():
                refs_s[pl.ds(idx, 1)] = iota2((1, 128), 1) % L

        def permute_refs(perm_col):
            """refs[:, l] <- refs[:, perm[l]] (identity beyond lane L)
            via one [*, 128] x [128, 128] one-hot matmul."""
            perm128 = jnp.concatenate(
                [perm_col, iota2((128 - L, 1), 0) + L], axis=0)
            s128 = (iota2((128, 128), 0) == perm128.T).astype(
                jnp.float32)
            out = jnp.dot(refs_s[:].astype(jnp.float32), s128,
                          preferred_element_type=jnp.float32)
            refs_s[:] = jnp.round(out).astype(jnp.int32)

        def chunk_mask(width):
            return iota2((L, CHUNK), 1) < width

        def pm_row():
            return pm_s[0:1, :L]                        # [1, L]

        def pm_put(row):
            pm_s[0:1, :] = jnp.concatenate(
                [row, jnp.full((1, 128 - L), BIG, jnp.float32)],
                axis=1)

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
                              jnp.maximum(-a, 0.0), 0.0),
                    axis=1, keepdims=True)              # [L, 1]
                pm_put(pm_row() + pen.T)
                beta_s[ops_ref[i, C_BDST]] = jnp.ones((L, CHUNK),
                                                      jnp.float32)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            def do_rep(_):
                a = read_llr(d, ops_ref[i, C_SRC])
                m = chunk_mask(width)
                m0 = jnp.sum(jnp.where(m, jnp.maximum(-a, 0.0), 0.0),
                             axis=1, keepdims=True).T    # [1, L]
                m1 = jnp.sum(jnp.where(m, jnp.maximum(a, 0.0), 0.0),
                             axis=1, keepdims=True).T
                pm = pm_row()
                cand = jnp.concatenate([pm + m0, pm + m1], axis=1)
                perm, flip, pm2 = select_l_smallest(cand)
                sign = jnp.where(flip > 0, -1.0, 1.0).astype(
                    jnp.float32)                         # [L, 1]
                beta_s[ops_ref[i, C_BDST]] = jnp.broadcast_to(
                    sign, (L, CHUNK))
                permute_refs(perm)
                pm_put(pm2)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            def do_rate1(_):
                a = read_llr(d, ops_ref[i, C_SRC])
                valid = chunk_mask(width)
                mag0 = jnp.where(valid, jnp.abs(a), BIG)
                b0 = jnp.where(valid, jnp.where(a < 0.0, -1.0, 1.0),
                               0.0)
                iota = iota2((L, CHUNK), 1)
                pm0 = pm_row()

                def round_body(r, carry):
                    mag, b_local, pm = carry
                    v = jnp.min(mag, axis=1, keepdims=True)  # [L, 1]
                    at = jnp.min(jnp.where(mag == v, iota, CHUNK),
                                 axis=1, keepdims=True)      # [L, 1]
                    cand = jnp.concatenate([pm, pm + v.T], axis=1)
                    perm, flip, pm2 = select_l_smallest(cand)
                    pmat = perm_matrix(perm)
                    b_local = jnp.dot(pmat, b_local,
                                      preferred_element_type=jnp.float32)
                    mag = jnp.dot(pmat, mag,
                                  preferred_element_type=jnp.float32)
                    at2 = jnp.round(jnp.dot(
                        pmat, at.astype(jnp.float32),
                        preferred_element_type=jnp.float32)).astype(
                            jnp.int32)                   # [L, 1]
                    hit = iota == at2
                    b_local = jnp.where(hit & (flip > 0), -b_local,
                                        b_local)
                    mag = jnp.where(hit, BIG, mag)
                    permute_refs(perm)
                    return mag, b_local, pm2

                _, b_local, pm2 = jax.lax.fori_loop(
                    0, T_RATE1, round_body, (mag0, b0, pm0))
                beta_s[ops_ref[i, C_BDST]] = b_local
                pm_put(pm2)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            def do_spc(_):
                """Single-parity-check node: parity-fix the hard
                decisions, fork on exclusive pair flips {i0, ij}."""
                a = read_llr(d, ops_ref[i, C_SRC])
                valid = chunk_mask(width)
                mag = jnp.where(valid, jnp.abs(a), BIG)
                b = jnp.where(valid, jnp.where(a < 0.0, -1.0, 1.0),
                              0.0)
                iota = iota2((L, CHUNK), 1)
                negs = jnp.sum(jnp.where(b < 0.0, 1, 0), axis=1,
                               keepdims=True)             # [L, 1]
                odd = (negs % 2) == 1                     # [L, 1] bool

                # T least-reliable positions per path
                vals_l, idxs_l = [], []
                mag_t = mag
                for _k in range(T_RATE1):
                    v = jnp.min(mag_t, axis=1, keepdims=True)
                    at = jnp.min(jnp.where(mag_t == v, iota, CHUNK),
                                 axis=1, keepdims=True)
                    vals_l.append(v)
                    idxs_l.append(at)
                    mag_t = jnp.where(iota == at, BIG, mag_t)
                vals = jnp.concatenate(vals_l, axis=1)    # [L, T]
                idxs = jnp.concatenate(idxs_l, axis=1)

                v0 = vals[:, 0:1]
                i0 = idxs[:, 0:1]
                pm = pm_row() + jnp.where(odd, v0, 0.0).T
                b = jnp.where((iota == i0) & odd, -b, b)
                switched = jnp.zeros((L, 1), jnp.int32)
                pm2 = pm
                for r in range(1, T_RATE1):
                    vr = vals[:, r:r + 1]
                    delta = jnp.where(odd, vr - vals[:, 0:1],
                                      vr + vals[:, 0:1])
                    delta = jnp.where(switched > 0, BIG, delta)
                    cand = jnp.concatenate([pm2, pm2 + delta.T],
                                           axis=1)
                    perm, flip, pm2 = select_l_smallest(cand)
                    pmat = perm_matrix(perm)
                    b = jnp.dot(pmat, b,
                                preferred_element_type=jnp.float32)
                    vals = jnp.dot(pmat, vals,
                                   preferred_element_type=jnp.float32)
                    idxs = jnp.round(jnp.dot(
                        pmat, idxs.astype(jnp.float32),
                        preferred_element_type=jnp.float32)).astype(
                            jnp.int32)
                    oddsw = jnp.round(jnp.dot(
                        pmat, jnp.concatenate(
                            [jnp.where(odd, 1.0, 0.0),
                             switched.astype(jnp.float32)], axis=1),
                        preferred_element_type=jnp.float32))
                    odd = oddsw[:, 0:1] > 0.5
                    switched = oddsw[:, 1:2].astype(jnp.int32)
                    permute_refs(perm)
                    pair = ((iota == idxs[:, 0:1]) |
                            (iota == idxs[:, r:r + 1]))
                    b = jnp.where(pair & (flip > 0), -b, b)
                    switched = switched | flip
                beta_s[ops_ref[i, C_BDST]] = b
                pm_put(pm2)
                reset_ref(depths + ops_ref[i, C_SIDW], last)
                return 0

            # In-block variants for internal nodes with half width h <
            # chunk: the second half sits h lanes in, which is not
            # block-aligned — realign with dynamic shift matmuls
            # (SH_l[c, j] = (c == j+h) shifts left by h).
            def shl(mat, h):
                c = iota2((CHUNK, CHUNK), 0)
                j = iota2((CHUNK, CHUNK), 1)
                return jnp.dot(mat, (c == j + h).astype(jnp.float32),
                               preferred_element_type=jnp.float32)

            def shr(mat, h):
                c = iota2((CHUNK, CHUNK), 0)
                j = iota2((CHUNK, CHUNK), 1)
                return jnp.dot(mat, (j == c + h).astype(jnp.float32),
                               preferred_element_type=jnp.float32)

            def clean(mat, cols):
                """Zero columns >= cols: garbage (NaN on interpret)
                would poison the shift matmul contraction."""
                return jnp.where(iota2((L, CHUNK), 1) < cols, mat, 0.0)

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
                                do_rep, do_rate1, do_spc, do_f_s,
                                do_g_s, do_combine_s], 0)
            return 0

        jax.lax.fori_loop(0, sched.n_ops, body, 0)

        # ---- emit outputs --------------------------------------------
        for r in range(n_rows):
            cw_ref[0, :, r * CHUNK:(r + 1) * CHUNK] = (
                beta_s[out_row0 + r] < 0.0).astype(jnp.int32)
        pm_ref[0, 0:1, :] = pm_s[0:1, :]

    n_pad = n_rows * CHUNK

    def decode(llrs):
        batch = llrs.shape[0]
        if n_pad != n:
            llrs = jnp.concatenate(
                [llrs, jnp.zeros((batch, n_pad - n), llrs.dtype)],
                axis=1)
        blocks = llrs.reshape(batch, n_rows, CHUNK)
        cw, pm = pl.pallas_call(
            kernel,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec((sched.n_ops, 16), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_rows, CHUNK), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, L, n_pad), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, L, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((batch, 1, 128), jnp.float32),
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
        )(jnp.asarray(ops16), blocks)
        return cw[:, :, :n].astype(jnp.uint8), pm[:, 0, :L]

    return decode
