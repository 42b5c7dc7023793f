"""Device-side SCL polar decoder: a schedule-driven vector machine.

TPU-native equivalent of CODE::PolarListDecoder (decode.cc:201,530).
The reference walks the 2^16-leaf SC tree with SIMD lanes as list paths.
A literal translation is impossible under XLA (data-dependent recursion)
and a naive leaf-sequential scan is 65536 steps of tiny work.  Instead:

  * The tree is pruned host-side into Fast-SSC constituent nodes
    (RATE0 / REP / RATE1 with list forks; Sarkis et al. style) and
    linearised into a STATIC instruction schedule — possible because the
    frozen mask is a compile-time constant.  ~25k instructions replace
    131k leaf visits.
  * The device executes the schedule as one `lax.scan` whose step is a
    `lax.switch` over 6 micro-ops (f / g / save / combine / leaf ops),
    each a fixed-width (C=512) chunk of VPU work over all L list lanes
    (and a vmapped frame batch).
  * List forks never copy the multi-megabyte LLR/partial-sum buffers:
    per-depth lane-indirection vectors (`refs`, `brefs`) are permuted
    instead (the Tal-Vardy lazy-copy idea, collapsed to O(depth * L)
    integers because every buffer write is lane-dense).

Path metrics are the min-sum LLR formulation (penalty |llr| on sign
mismatch).  RATE1 nodes fork on the T=4 least-reliable bits per node —
the standard list-rate-1 approximation.  The decoder outputs the
re-encoded codeword per path (root partial sums), which makes the
reference's systematic() step (decode.cc:254-261) a gather.

Buffers are padded per depth to the chunk width so every access is a
static-size dynamic slice; garbage in the padding is never read
unmasked.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 512      # static op width (columns)
T_RATE1 = 4      # fork rounds per RATE1 node

OP_F, OP_G, OP_SAVE, OP_COMBINE, OP_RATE0, OP_REP, OP_RATE1 = range(7)


# ---------------------------------------------------------------------------
# Schedule compiler (host)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Schedule:
    ops: np.ndarray        # [n, 8] int32: op, d, src, src2, dst, boff, width, last
    lofs: np.ndarray       # [depths] llr region column offsets
    bofs: np.ndarray       # [depths] beta region column offsets
    sz_llr: int
    sz_beta: int
    n_depths: int
    code_len: int

    @property
    def n_ops(self) -> int:
        return len(self.ops)


def _region_offsets(n: int, depths: int):
    offs = []
    pos = 0
    for d in range(depths):
        offs.append(pos)
        pos += max(n >> d, CHUNK)
    return np.array(offs, dtype=np.int32), pos


@functools.lru_cache(maxsize=None)
def build_schedule(frozen_key) -> Schedule:
    """frozen_key: bytes of the frozen mask (hashable)."""
    frozen = np.frombuffer(frozen_key, dtype=np.uint8)
    n = len(frozen)
    depths = n.bit_length()          # 0..M
    lofs, sz_llr = _region_offsets(n, depths)
    bofs, sz_beta = _region_offsets(n, depths)
    ops: list[tuple] = []

    def emit_chunks(op, d, w, src, src2, dst, boff):
        """Emit ceil(w/CHUNK) instructions covering w columns."""
        nchunks = max(1, -(-w // CHUNK))
        for j in range(nchunks):
            off = j * CHUNK
            width = min(CHUNK, w - off)
            ops.append((op, d, src + off, src2 + off, dst + off,
                        boff + off, width, int(j == nchunks - 1)))

    def walk(lo, hi, d):
        w = hi - lo
        fz = frozen[lo:hi]
        s = int(fz.sum())
        if w <= CHUNK:
            if s == w:
                ops.append((OP_RATE0, d, lofs[d], 0, 0, bofs[d], w, 1))
                return
            if s == 0:
                ops.append((OP_RATE1, d, lofs[d], 0, 0, bofs[d], w, 1))
                return
            if s == w - 1 and fz[-1] == 0:
                ops.append((OP_REP, d, lofs[d], 0, 0, bofs[d], w, 1))
                return
        h = w // 2
        # f: children LLRs from parent's two half-chunks
        emit_chunks(OP_F, d, h, lofs[d], lofs[d] + h, lofs[d + 1], 0)
        walk(lo, lo + h, d + 1)
        # save left child's beta into parent's region (left half)
        emit_chunks(OP_SAVE, d, h, bofs[d + 1], 0, bofs[d], 0)
        # g: right child LLRs use the saved left beta
        emit_chunks(OP_G, d, h, lofs[d], lofs[d] + h, lofs[d + 1],
                    bofs[d])
        walk(lo + h, hi, d + 1)
        # combine: parent beta = [bl*br, br]
        emit_chunks(OP_COMBINE, d, h, bofs[d + 1], 0, bofs[d] + h,
                    bofs[d])

    walk(0, n, 0)
    return Schedule(ops=np.array(ops, dtype=np.int32), lofs=lofs,
                    bofs=bofs, sz_llr=sz_llr, sz_beta=sz_beta,
                    n_depths=depths, code_len=n)


# ---------------------------------------------------------------------------
# Device VM
# ---------------------------------------------------------------------------

def _gather_cols(buf, lanes, off):
    """[L, SZ] buffer -> [L, CHUNK] chunk at `off`, rows re-indexed."""
    sl = jax.lax.dynamic_slice(buf, (0, off), (buf.shape[0], CHUNK))
    return jnp.take(sl, lanes, axis=0)


def _write_cols(buf, off, vals):
    return jax.lax.dynamic_update_slice(buf, vals, (0, off))


def _maybe_reset(refs, d, last):
    """Set refs[d] = identity when `last` is 1."""
    ident = jnp.arange(refs.shape[1], dtype=refs.dtype)
    row = jnp.where(last > 0, ident, refs[d])
    return jax.lax.dynamic_update_slice(refs, row[None, :], (d, 0))


def _permute_all(state, perm):
    llr, beta, refs, brefs, pm = state
    return (llr, beta, refs[:, perm], brefs[:, perm], pm)


def _mask(width):
    return (jnp.arange(CHUNK) < width).astype(jnp.float32)


def _select_paths(pm_cand, L):
    """2L candidate metrics -> (perm [L], chosen flag [L], new pm)."""
    neg, order = jax.lax.top_k(-pm_cand, L)
    return order % L, order >= L, -neg


def make_decoder(frozen: np.ndarray, list_size: int = 8):
    """Compile an SCL decoder for one frozen mask.

    Returns a jitted function llrs [code_len] -> (codewords [L, code_len]
    in 0/1 bits, path metrics [L]); vmap over a leading batch axis as
    needed.
    """
    sched = build_schedule(np.asarray(frozen, dtype=np.uint8).tobytes())
    L = list_size
    n = sched.code_len
    big = jnp.float32(3.0e38)

    def step(state, row):
        op, d, src, src2, dst, boff, width, last = (row[i] for i in
                                                    range(8))
        llr, beta, refs, brefs, pm = state

        def get_llr(off):
            return _gather_cols(llr, refs[d], off)

        def get_beta(dd, off):
            return _gather_cols(beta, brefs[dd], off)

        def op_f(state):
            llr, beta, refs, brefs, pm = state
            a, b = get_llr(src), get_llr(src2)
            out = jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a),
                                                          jnp.abs(b))
            return (_write_cols(llr, dst, out), beta,
                    _maybe_reset(refs, d + 1, last), brefs, pm)

        def op_g(state):
            llr, beta, refs, brefs, pm = state
            a, b = get_llr(src), get_llr(src2)
            bl = get_beta(d, boff)
            out = b + bl * a
            return (_write_cols(llr, dst, out), beta,
                    _maybe_reset(refs, d + 1, last), brefs, pm)

        def op_save(state):
            llr, beta, refs, brefs, pm = state
            v = get_beta(d + 1, src)
            return (llr, _write_cols(beta, dst, v), refs,
                    _maybe_reset(brefs, d, last), pm)

        def op_combine(state):
            llr, beta, refs, brefs, pm = state
            br = get_beta(d + 1, src)
            bl = get_beta(d, boff)
            beta = _write_cols(beta, boff, bl * br)
            beta = _write_cols(beta, dst, br)
            return (llr, beta, refs, _maybe_reset(brefs, d, last), pm)

        def op_rate0(state):
            llr, beta, refs, brefs, pm = state
            a = get_llr(src)
            pm = pm + jnp.sum(jnp.maximum(-a, 0.0) * _mask(width),
                              axis=-1)
            beta = _write_cols(beta, boff, jnp.ones((L, CHUNK),
                                                    jnp.float32))
            return (llr, beta, refs, _maybe_reset(brefs, d, last), pm)

        def op_rep(state):
            llr, beta, refs, brefs, pm = state
            a = get_llr(src)
            m = _mask(width)
            m0 = jnp.sum(jnp.maximum(-a, 0.0) * m, axis=-1)
            m1 = jnp.sum(jnp.maximum(a, 0.0) * m, axis=-1)
            perm, flip, pm = _select_paths(
                jnp.concatenate([pm + m0, pm + m1]), L)
            sign = jnp.where(flip, -1.0, 1.0)
            beta = _write_cols(beta, boff,
                               jnp.broadcast_to(sign[:, None],
                                                (L, CHUNK)).astype(
                                                    jnp.float32))
            llr, beta, refs, brefs, _ = _permute_all(
                (llr, beta, refs, brefs, pm), perm)
            return (llr, beta, refs, _maybe_reset(brefs, d, last), pm)

        def op_rate1(state):
            llr, beta, refs, brefs, pm = state
            a = get_llr(src)
            m = _mask(width)
            mag = jnp.where(m > 0, jnp.abs(a), big)
            b_local = jnp.where(a < 0, -1.0, 1.0) * m  # pad -> 0, fine
            vals, idxs = jax.lax.top_k(-mag, T_RATE1)
            vals = -vals                                # T smallest |llr|
            gperm = jnp.arange(L)
            for r in range(T_RATE1):
                perm, flip, pm = _select_paths(
                    jnp.concatenate([pm, pm + vals[:, r]]), L)
                b_local = jnp.take(b_local, perm, axis=0)
                vals = jnp.take(vals, perm, axis=0)
                idxs = jnp.take(idxs, perm, axis=0)
                gperm = jnp.take(gperm, perm)
                onehot = (jnp.arange(CHUNK)[None, :] ==
                          idxs[:, r][:, None]) & flip[:, None]
                b_local = jnp.where(onehot, -b_local, b_local)
            beta = _write_cols(beta, boff, b_local)
            llr, beta, refs, brefs, _ = _permute_all(
                (llr, beta, refs, brefs, pm), gperm)
            return (llr, beta, refs, _maybe_reset(brefs, d, last), pm)

        new_state = jax.lax.switch(
            op, [op_f, op_g, op_save, op_combine, op_rate0, op_rep,
                 op_rate1], state)
        return new_state, None

    ops_arr = jnp.asarray(sched.ops)

    def decode(llrs):
        llr0 = jnp.zeros((L, sched.sz_llr), jnp.float32)
        llr0 = llr0.at[:, :n].set(jnp.broadcast_to(llrs, (L, n)))
        # Derive every state leaf from the input so all lax.switch
        # branches agree on device-variance under shard_map.
        vzero = llrs[0] * 0.0
        beta0 = jnp.zeros((L, sched.sz_beta), jnp.float32) + vzero
        ident = (jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                  (sched.n_depths, L))
                 + vzero.astype(jnp.int32))
        pm0 = jnp.full((L,), 0.0).at[1:].set(big / 2) + vzero
        state = (llr0, beta0, ident, ident, pm0)
        (llr, beta, refs, brefs, pm), _ = jax.lax.scan(step, state,
                                                       ops_arr)
        codeword = (beta[:, :n] < 0).astype(jnp.uint8)
        return codeword, pm

    return decode
