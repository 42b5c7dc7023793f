"""Pallas TPU kernel for the SCL schedule VM.

Executes the same static instruction schedule as fec/scl_vm.py (see its
docstring for the algorithm) entirely inside one kernel invocation with
VMEM-resident state:

  * channel LLRs [rows, F, 512] f32   — shared per frame (lanes hold
    identical copies; forks never cross frames)
  * LLR tree / beta slots, two tiers:
      tier 1 (node width > 128): [*, F*L, 512] tiles
      tier 2 (node width <= 128): [*, F*L, 128] tiles — most schedule
      ops live deep in the tree at widths 4..128, where a 512-wide
      tile wastes 4-64x of every vector instruction
  * lane indirections / path metrics  — small VMEM tiles

so the ~10k sequential micro-steps never touch HBM (the XLA scan
version streams ~MBs of chunk state per step).  F frames decode
together per grid cell, sharing one schedule pass — the per-op cost is
latency-dominated, so wider lane tiles are nearly free.  Lane
permutations (list forks) are one-hot matmuls; top-k selections are
short iterative min-extractions (sorts and gathers both lower poorly
on the VPU); sub-block realignments are dynamic lane rotates.

Mosaic constraints honoured throughout: every vector value is rank-2
(per-path scalars are [P, 1] columns or [1, P] rows — rank-1 arrays
crash the layout inferer), no lane-crossing reshapes (masked
broadcasts + one-hot matmuls instead), no bf16 vector compares, and no
scatter/gather primitives.

NOTE: pallas_call must be invoked under jax.jit on this backend — an
eager call re-dispatches through the remote-compile relay every time
(~2.3 s fixed per call, measured).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fec.scl_vm import (C_BDST, C_BSRC, C_BSRC2, C_D, C_DST, C_LAST,
                          C_OP, C_SIDR, C_SIDR2, C_SIDW, C_SRC, C_SRC2,
                          C_SUB, C_WIDTH, CHUNK, T_RATE1,
                          build_schedule, scl_params)

BIG = 3.0e38
CHUNK2 = 128      # tier-2 tile width (node width <= 128)

# switch table indices
(OPX_F, OPX_G, OPX_C, OPX_RATE0, OPX_REP, OPX_RATE1, OPX_SPC,
 OPX_F_S, OPX_G_S, OPX_C_S, OPX_F0, OPX_G0,
 OPX_F_B, OPX_G_B, OPX_C_B,
 OPX_F2, OPX_G2, OPX_C2, OPX_RATE0_2, OPX_REP_2, OPX_RATE1_2,
 OPX_SPC_2, OPX_REPSPC_2,
 OPX_RATE0_FL, OPX_REP_FL, OPX_RATE1_FL, OPX_SPC_FL,
 OPX_RATE0_GR, OPX_REP_GR, OPX_RATE1_GR, OPX_SPC_GR,
 OPX_REPSPC_FL, OPX_REPSPC_GR,
 OPX_FF_2, OPX_GF_2, OPX_CG_2, OPX_CC_2) = range(37)

# spare column used by the CC_2 pair op for op2's beta-slot write id
C_P2A = 14

# chain-pair fusion toggle (A/B benchmarking; tests pin parity in
# both states via ops_override-free schedules)
PAIR_FUSION = True


def make_pallas_decoder(frozen: np.ndarray, list_size: int = 8,
                        frames_per_cell: int = 1,
                        interpret: bool = False, ops_override=None,
                        beta_bf16: bool = True, exact: bool = True,
                        decompose_spc: bool = False,
                        rank_select: bool = False,
                        unroll: bool = False):
    """Compile the Pallas SCL decoder for one frozen mask.

    Returns fn: llrs [batch, code_len] f32 -> (codewords [batch, L,
    code_len] uint8, pm [batch, L] f32); batch must be a multiple of
    frames_per_cell.  ops_override replaces the FINAL instruction
    table (profiling aid; [M, 16] rows in the retargeted .ops16
    format — e.g. copies of another decoder's .ops16 rows).

    beta_bf16 stores the partial-sum buffers as bfloat16 — exact, since
    betas are only {-1, 0, +1} — halving that scratch so more frames
    fit per cell.

    exact=True (default): bit-by-bit-SCL-equivalent one-shot RATE1/
    SPC enumeration (oneshot_core / select_flat) on the same schedule,
    measured at ~5% over the Fast-SSC-List approximation (exact=
    False); decompose_spc=True instead decomposes SPC nodes into
    subtrees (the round-2 exact path, ~2x the ops; cross-check
    oracle).

    unroll=True expands the static schedule at trace time instead of
    running the fori_loop/switch interpreter: every operand offset,
    node width, roll amount and mask bound becomes a compile-time
    constant and the per-iteration op-table scalar reads (16 dynamic
    VMEM loads/op — the measured ~2.4 us/iteration serial overhead,
    docs/SCL_KERNEL.md §7) disappear entirely, at the cost of a
    schedule-length-proportional Mosaic program.  Bit-exact: the
    expansion calls the same op bodies with the same values.

    rank_select=True replaces the L serial min-extraction rounds in
    both fork selectors with single-pass rank computations (all
    pairwise precedence counts at once) over a dominance-reduced
    candidate set — provably the same winners and tie-breaks
    (bit-exact in CI), but MEASURED 5.4x SLOWER on chip: the VPU is
    instruction-throughput bound, not dependence-depth bound, so the
    extra data-parallel passes cost more than the removed serial
    rounds ever stalled.  Kept as the experiment that pinned the
    cost model; see docs/SCL_KERNEL.md §7d.  Not for serving.
    """
    emit_spc, t_r1, t_spc, spc_exact = scl_params(list_size, exact,
                                                  decompose_spc)
    sched = build_schedule(np.asarray(frozen, dtype=np.uint8).tobytes(),
                           emit_spc=emit_spc)
    L = list_size
    F = frames_per_cell
    P = F * L
    # PW: width of the flat lane tables (refs rows, pm row).  P <= 128
    # pads up to the full 128-lane tile; F=32 (P=256) runs them at two
    # lane tiles.  Everything else (perm matmuls, selectors) is sized
    # by P directly.
    PW = max(P, 128)
    assert P <= 256, "lane tables sized for at most two 128-lane tiles"
    assert not (rank_select and P > 128), \
        "rank_select sublane rolls assume one 128-lane tile"
    beta_dt = jnp.bfloat16 if beta_bf16 else jnp.float32
    n = sched.code_len
    n_rows = -(-n // CHUNK)
    depths = sched.n_depths
    split_d0 = n > CHUNK
    d0_shift = n_rows if split_d0 else 0

    # region tables (same allocation rule as build_schedule)
    lofs, pos = [], 0
    for d in range(depths):
        lofs.append(pos)
        pos += max(n >> d, CHUNK)
    bslot = np.zeros((depths, 2), dtype=np.int64)
    pos = 0
    for d in range(depths):
        alloc = max(n >> d, CHUNK)
        bslot[d, 0] = pos
        bslot[d, 1] = pos + (alloc if d > 0 else 0)
        pos += (2 * alloc) if d > 0 else alloc

    # ---- two-tier split: depths with node width <= 128 run on
    # [P, 128] tiles.  D2 = first tier-2 depth.
    D2 = max(0, (depths - 1) - 7)
    use_t2 = D2 >= 1 and D2 < depths
    if use_t2:
        t1_llr_rows = lofs[D2] // CHUNK - d0_shift
        t1_beta_rows = int(bslot[D2, 0]) // CHUNK
        llr2_rows = depths - D2
        beta2_rows = 2 * (depths - D2)
    else:
        t1_llr_rows = sched.sz_llr // CHUNK - d0_shift
        t1_beta_rows = sched.sz_beta // CHUNK
        llr2_rows = beta2_rows = 1        # dummy scratch
    out_row0 = sched.out_off // CHUNK     # root slot: always tier 1

    # ---- instruction retargeting (host-side, from raw element
    # offsets).  Output column semantics:
    #   C_SRC/C_SRC2/C_DST  : llr row in the op's tier (llr_d0 rows for
    #                         F0/G0, tier-1 rows for *_B sources)
    #   C_BSRC/C_BSRC2/C_BDST: beta row in the op's tier (tier-1 row
    #                         for C_B's destination)
    raw = sched.ops
    ops16 = np.zeros((sched.n_ops, 16), dtype=np.int32)
    ops16[:, : raw.shape[1]] = raw
    for i in range(sched.n_ops):
        opc = int(raw[i, C_OP])
        d = int(raw[i, C_D])
        nw = n >> d                        # node width at this depth
        r = ops16[i]
        if opc in (0, 1):                  # F / G (write depth d+1)
            if use_t2 and nw <= CHUNK2:
                r[C_OP] = OPX_F2 if opc == 0 else OPX_G2
                r[C_SRC] = d - D2
                r[C_DST] = d + 1 - D2
                if opc == 1:
                    r[C_BSRC] = r[C_SIDR] - 2 * D2
            elif use_t2 and nw == 2 * CHUNK2:
                r[C_OP] = OPX_F_B if opc == 0 else OPX_G_B
                r[C_SRC] = raw[i, C_SRC] // CHUNK - d0_shift
                r[C_DST] = d + 1 - D2
                if opc == 1:
                    r[C_BSRC] = r[C_SIDR] - 2 * D2
            else:
                sub = int(raw[i, C_SUB]) > 0
                if split_d0 and d == 0:
                    r[C_OP] = OPX_F0 if opc == 0 else OPX_G0
                    r[C_SRC] = raw[i, C_SRC] // CHUNK
                    r[C_SRC2] = raw[i, C_SRC2] // CHUNK
                else:
                    r[C_OP] = (OPX_F_S if opc == 0 else OPX_G_S) \
                        if sub else (OPX_F if opc == 0 else OPX_G)
                    r[C_SRC] = raw[i, C_SRC] // CHUNK - d0_shift
                    r[C_SRC2] = raw[i, C_SRC2] // CHUNK - d0_shift
                r[C_DST] = raw[i, C_DST] // CHUNK - d0_shift
                r[C_BSRC] = raw[i, C_BSRC] // CHUNK
        elif opc == 2:                     # COMBINE (own slot depth d)
            if use_t2 and nw <= CHUNK2:
                r[C_OP] = OPX_C2
                r[C_BSRC] = r[C_SIDR] - 2 * D2
                r[C_BSRC2] = r[C_SIDR2] - 2 * D2
                r[C_BDST] = r[C_SIDW] - 2 * D2
            elif use_t2 and nw == 2 * CHUNK2:
                r[C_OP] = OPX_C_B
                r[C_BSRC] = r[C_SIDR] - 2 * D2
                r[C_BSRC2] = r[C_SIDR2] - 2 * D2
                r[C_BDST] = raw[i, C_BDST] // CHUNK
            else:
                r[C_OP] = OPX_C_S if int(raw[i, C_SUB]) > 0 else OPX_C
                r[C_BSRC] = raw[i, C_BSRC] // CHUNK
                r[C_BSRC2] = raw[i, C_BSRC2] // CHUNK
                r[C_BDST] = raw[i, C_BDST] // CHUNK
                r[C_DST] = raw[i, C_DST] // CHUNK
        else:                              # leaves 3..6
            if use_t2 and nw <= CHUNK2:
                r[C_OP] = opc + 15         # RATE0_2 .. SPC_2
                r[C_SRC] = d - D2
                r[C_BDST] = r[C_SIDW] - 2 * D2
            else:
                r[C_OP] = opc + 0 if opc >= 3 else opc
                r[C_SRC] = raw[i, C_SRC] // CHUNK - d0_shift
                r[C_BDST] = raw[i, C_BDST] // CHUNK

    # ---- REP-SPC fusion: the dominant bottom-of-tree pattern is a
    # node whose left child is a REP leaf and right child an SPC leaf
    # (457 of the wire schedule's 545 twin-leaf parents).  Fuse its
    # five ops (F, REP, G, COMBINE glue around the two leaves) into
    # one: the REP beta is a single +-1 per lane, so G degenerates to
    # b + s*a and the combine to [s*b_spc | b_spc].  Path-metric and
    # fork order are IDENTICAL to the unfused sequence.
    fused = []
    i = 0
    want = (OPX_F2, OPX_REP_2, OPX_G2, OPX_SPC_2, OPX_C2)
    while i < sched.n_ops:
        if (i + 4 < sched.n_ops
                and tuple(ops16[i: i + 5, C_OP]) == want
                and ops16[i, C_D] == ops16[i + 2, C_D]
                == ops16[i + 4, C_D]
                and ops16[i, C_WIDTH] == ops16[i + 2, C_WIDTH]
                == ops16[i + 4, C_WIDTH]):
            row = ops16[i].copy()          # the F2 row: src, d, width
            row[C_OP] = OPX_REPSPC_2
            row[C_BDST] = ops16[i + 4, C_BDST]
            row[C_SIDW] = ops16[i + 4, C_SIDW]
            row[C_LAST] = ops16[i + 4, C_LAST]
            fused.append(row)
            i += 5
        else:
            fused.append(ops16[i])
            i += 1
    ops16 = np.stack(fused)

    # ---- prefix/suffix fusion: absorb each tier-2 leaf's preceding
    # F (left children) or preceding G plus following COMBINE (right
    # children) into the leaf op itself.  A left leaf's F only feeds
    # that leaf; a right leaf's G/COMBINE only wrap it; fusing them
    # removes ~30% of the schedule.  The left-child beta needed by the
    # G and the COMBINE is carried through the leaf's list forks as a
    # payload tile, reproducing the lazy-copy re-read exactly.
    leafset = (OPX_RATE0_2, OPX_REP_2, OPX_RATE1_2, OPX_SPC_2,
               OPX_REPSPC_2)
    fused2 = []
    i = 0
    n1 = len(ops16)
    while i < n1:
        o = ops16[i, C_OP]
        if (o == OPX_F2 and i + 1 < n1
                and ops16[i + 1, C_OP] in leafset):
            nxt = ops16[i + 1]
            row = ops16[i].copy()      # F: C_D, C_SRC, C_WIDTH
            if nxt[C_OP] == OPX_REPSPC_2:
                row[C_OP] = OPX_REPSPC_FL
            else:
                row[C_OP] = OPX_RATE0_FL + (nxt[C_OP] - OPX_RATE0_2)
            row[C_BDST] = nxt[C_BDST]
            row[C_SIDW] = nxt[C_SIDW]
            row[C_LAST] = nxt[C_LAST]
            fused2.append(row)
            i += 2
            continue
        if (o == OPX_G2 and i + 2 < n1
                and ops16[i + 1, C_OP] in leafset
                and ops16[i + 2, C_OP] == OPX_C2
                and ops16[i, C_D] == ops16[i + 2, C_D]):
            nxt = ops16[i + 1]
            comb = ops16[i + 2]
            row = ops16[i].copy()      # G: C_D/C_SRC/C_WIDTH/SIDR/BSRC
            if nxt[C_OP] == OPX_REPSPC_2:
                row[C_OP] = OPX_REPSPC_GR
            else:
                row[C_OP] = OPX_RATE0_GR + (nxt[C_OP] - OPX_RATE0_2)
            row[C_BDST] = comb[C_BDST]
            row[C_SIDW] = comb[C_SIDW]
            row[C_LAST] = comb[C_LAST]
            fused2.append(row)
            i += 3
            continue
        fused2.append(ops16[i])
        i += 1
    ops16 = np.stack(fused2)

    # ---- chain-pair fusion (round 3): two consecutive DEPENDENT
    # tier-2 chain ops execute as ONE iteration with the intermediate
    # value register-chained — op2's read of op1's output skips both
    # the VMEM round trip and the 3-pass lane-permute matmul (op1
    # always writes lane-dense and resets that indirection row, so the
    # identity-permute read it replaces is exact).  Four pair shapes
    # cover the descending/ascending chains left in the schedule:
    #   F2>F2, G2>F2 (descend: op2 reads op1's LLR output; all op2
    #     params derive from op1's row — dst+1, width/2),
    #   C2>G2 (ascend-then-descend: op2's left beta IS op1's output),
    #   C2>C2 (ascend: op2's RIGHT beta is op1's output; op2's left
    #     beta slot/row + write slot pack into op1's unused columns).
    # Invariants asserted here so a schedule change can never silently
    # mispair.  Wire schedule: 5713 -> ~4900 iterations.
    fused3 = []
    i = 0
    n2 = len(ops16) if PAIR_FUSION else -1
    while i < n2 - 1:
        a, b = ops16[i], ops16[i + 1]
        oa, ob = int(a[C_OP]), int(b[C_OP])
        desc = (b[C_SRC] == a[C_DST] and b[C_D] == a[C_D] + 1
                and 2 * b[C_WIDTH] == a[C_WIDTH]
                and b[C_DST] == a[C_DST] + 1 and a[C_LAST] > 0
                and b[C_LAST] > 0)
        if oa == OPX_F2 and ob == OPX_F2 and desc:
            row = a.copy()
            row[C_OP] = OPX_FF_2
            fused3.append(row)
            i += 2
            continue
        if oa == OPX_G2 and ob == OPX_F2 and desc:
            row = a.copy()
            row[C_OP] = OPX_GF_2
            fused3.append(row)
            i += 2
            continue
        if (oa == OPX_C2 and ob == OPX_G2
                and b[C_BSRC] == a[C_BDST] and b[C_SIDR] == a[C_SIDW]
                and b[C_D] == a[C_D] - 1
                and b[C_WIDTH] == 2 * a[C_WIDTH]
                and a[C_LAST] > 0 and b[C_LAST] > 0
                and b[C_SRC] == b[C_D] - D2
                and b[C_DST] == b[C_D] + 1 - D2):
            row = a.copy()
            row[C_OP] = OPX_CG_2
            fused3.append(row)
            i += 2
            continue
        if (oa == OPX_C2 and ob == OPX_C2
                and b[C_BSRC2] == a[C_BDST] and b[C_SIDR2] == a[C_SIDW]
                and b[C_D] == a[C_D] - 1
                and b[C_WIDTH] == 2 * a[C_WIDTH]
                and a[C_LAST] > 0 and b[C_LAST] > 0):
            row = a.copy()
            row[C_OP] = OPX_CC_2
            row[C_SRC] = b[C_SIDR]     # op2 left-beta slot id
            row[C_SRC2] = b[C_BSRC]    # op2 left-beta row
            row[C_DST] = b[C_BDST]     # op2 beta write row
            row[C_P2A] = b[C_SIDW]     # op2 beta write slot id
            fused3.append(row)
            i += 2
            continue
        fused3.append(a)
        i += 1
    if PAIR_FUSION:
        if i < n2:
            fused3.append(ops16[i])
        ops16 = np.stack(fused3)
    if ops_override is not None:
        # profiling aid: rows in the FINAL retargeted 16-column format
        # (copies of a real decoder's .ops16 rows, bench/ablate_ops.py)
        # — raw build_schedule rows would be re-retargeted into
        # out-of-bounds offsets and fault the kernel
        ops16 = np.array(ops_override, dtype=np.int32)
        assert ops16.ndim == 2 and ops16.shape[1] == 16, \
            "ops_override takes final .ops16-format rows"
    n_ops = len(ops16)
    # expose the final instruction table for schedule analysis tools
    global LAST_OPS
    LAST_OPS = ops16

    def iota2(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

    def perm_matrix(perm_col):
        """perm [P, 1] flat lanes -> M [P, P]: (M @ mat)[p] = mat[perm[p]]."""
        return (iota2((P, P), 1) == perm_col).astype(jnp.float32)

    def dot_sel(m, x):
        """One-hot select m @ x preserving FULL f32 on the values.

        The MXU rounds f32 matmul inputs to bf16 (8-bit significand):
        LLR chunks and path metrics in the thousands lose all sub-32
        resolution, which collapses the list at low SNR (caught by
        bench.py's real-chip noisy parity check; interpret mode hides
        it).  Split x into three bf16-exact parts with disjoint
        mantissa windows (hi/mid/lo, 8 bits each = the 24-bit f32
        significand) and select each: every product is exact because
        one-hot rows pick single elements, and the two adds are exact
        because the windows are disjoint.  3 MXU passes vs 6 for
        XLA-HIGHEST, exact where HIGHEST merely bounds error.

        Only needed where the value operand is genuine f32 or an
        integer above 256 — betas (+-1/0) and lane indices (< 128)
        are bf16-exact and use plain dots; bf16 represents integers
        exactly only up to 256, so 512-wide-tier bit positions route
        through here too (rate1_core / spc_core).
        """
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        rem = x - hi
        mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
        lo = rem - mid
        d = lambda v: jnp.dot(m, v, preferred_element_type=jnp.float32)
        return d(hi) + (d(mid) + d(lo))

    def make_select_l_smallest():
        """Returns select(keep_row [1,P], delta_col [P,1]) -> (perm
        [P,1] global source lanes, flip [P,1], pm [1,P]).

        Per-frame iterative min-extraction over the 2P keep/flip
        candidates, flat in lane space: per-frame segmentation is a
        masked min over a broadcast [F, 2P] view, round results
        accumulate in [F, L] and map to lanes ONCE at the end via
        diag(FSEL @ v @ LSEL) — no lane-crossing reshapes (Mosaic only
        supports reshapes/transposes that keep the minor dim or swap a
        size-1 dim).  Tie-breaking matches lax.top_k (lowest candidate
        index wins; keeps order before flips within a frame).
        """
        pos = iota2((F, 2 * P), 1)
        pframe = (pos % P) // L          # frame of each candidate slot
        fidx = iota2((F, 2 * P), 0)
        lane_frame = iota2((P, F), 0) // L
        fsel = (iota2((P, F), 1) == lane_frame).astype(jnp.float32)
        lsel = (iota2((L, P), 1) % L == iota2((L, P), 0)).astype(
            jnp.float32)
        eye_p = (iota2((P, P), 0) == iota2((P, P), 1)).astype(
            jnp.float32)
        ksel = iota2((F, L), 1)

        def to_lane(v):
            """[F, L] per-(frame, round) values -> [P, 1] per lane:
            out[p] = v[f(p), l(p)] = diag(FSEL @ v @ LSEL)[p].
            Used for candidate indices (< 2P <= 256 since P <= 128 =
            full lane width; bf16 is exact only up to 256)."""
            a = jnp.dot(fsel, jnp.dot(v, lsel,
                                      preferred_element_type=jnp.float32),
                        preferred_element_type=jnp.float32)   # [P, P]
            return jnp.sum(a * eye_p, axis=1, keepdims=True)

        def to_lane_val(v):
            """to_lane for genuine f32 values (path metrics): both
            one-hot passes via the exact 3-way split (see dot_sel)."""
            hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            rem = v - hi
            mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
            lo = rem - mid
            d = lambda p: jnp.dot(p, lsel,
                                  preferred_element_type=jnp.float32)
            a = dot_sel(fsel, d(hi) + (d(mid) + d(lo)))       # [P, P]
            return jnp.sum(a * eye_p, axis=1, keepdims=True)

        def select(keep_row, delta_col):
            cand = jnp.concatenate([keep_row, keep_row + delta_col.T],
                                   axis=1)               # [1, 2P]
            candF = jnp.where(pframe == fidx,
                              jnp.broadcast_to(cand, (F, 2 * P)), BIG)

            # fori (not unrolled): static unrolling saved only ~2.5%
            # runtime but grew the kernel compile 4 s -> 54 s
            def body(k, carry):
                candF, at_all, m_all = carry
                m = jnp.min(candF, axis=1, keepdims=True)     # [F, 1]
                at = jnp.min(jnp.where(candF == m, pos, 2 * P),
                             axis=1, keepdims=True)           # [F, 1]
                sel = ksel == k
                at_all = jnp.where(sel, at.astype(jnp.float32),
                                   at_all)                    # [F, L]
                m_all = jnp.where(sel, m, m_all)
                candF = jnp.where(pos == at, BIG, candF)
                return candF, at_all, m_all

            zero_f = jnp.zeros((F, L), jnp.float32)
            _, at_all, m_all = jax.lax.fori_loop(
                0, L, body, (candF, zero_f, zero_f))
            if P > 128:
                # flat candidate indices reach 2P-1 = 511: NOT
                # bf16-exact through the to_lane one-hot dots (257+
                # round on the MXU).  Map the lane part (< P <= 256,
                # exact) and the keep/flip bit separately.
                lane_p = jnp.round(
                    to_lane(at_all - P * jnp.floor(at_all / P))
                ).astype(jnp.int32)
                flip = jnp.round(
                    to_lane(jnp.floor(at_all / P))).astype(jnp.int32)
                return lane_p, flip, to_lane_val(m_all).T
            at_p = jnp.round(to_lane(at_all)).astype(jnp.int32)
            perm = at_p % P
            flip = jnp.where(at_p >= P, 1, 0)
            return perm, flip, to_lane_val(m_all).T

        return select

    def make_select_flat():
        """Returns select(cand [P, 128]) -> (perm [P, 1] source lanes,
        patp [P, 1] winning pattern ids, pm [1, P]).

        Per-frame global top-L over each frame's L x 128 candidate
        block (the one-shot exact enumeration: every (source lane,
        flip-subset pattern) pair is one candidate).  L iterative
        extraction rounds; each round takes the per-lane column min,
        reduces it across the frame's lanes in row space, recovers the
        winning lane's pattern the same way, and masks the winning
        cell.  >= L finite candidates always exist (pattern 0 of every
        lane costs pm + 0), so a masked cell (BIG) is never re-picked.
        Tie-breaking matches the VM's flat lane*128+pattern top_k:
        lowest pattern within a lane, then lowest lane."""
        lane_iota = iota2((F, P), 1)
        gmask = lane_iota // L == iota2((F, P), 0)
        lane_frame = iota2((P, F), 0) // L
        fsel = (iota2((P, F), 1) == lane_frame).astype(jnp.float32)
        lsel = (iota2((L, P), 1) % L == iota2((L, P), 0)).astype(
            jnp.float32)
        eye_p = (iota2((P, P), 0) == iota2((P, P), 1)).astype(
            jnp.float32)
        ksel = iota2((F, L), 1)
        i128 = iota2((P, 128), 1)
        lane_col = iota2((P, 1), 0)

        def to_lane(v):
            """[F, L] -> [P, 1]; ints < 256 so plain dots are exact."""
            a = jnp.dot(fsel, jnp.dot(v, lsel,
                                      preferred_element_type=jnp.float32),
                        preferred_element_type=jnp.float32)
            return jnp.sum(a * eye_p, axis=1, keepdims=True)

        def to_lane_val(v):
            hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            rem = v - hi
            mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
            lo = rem - mid
            d = lambda p: jnp.dot(p, lsel,
                                  preferred_element_type=jnp.float32)
            a = dot_sel(fsel, d(hi) + (d(mid) + d(lo)))
            return jnp.sum(a * eye_p, axis=1, keepdims=True)

        def select(cand):
            def body(k, carry):
                cand, at_all, pw_all, m_all = carry
                colmin = jnp.min(cand, axis=1, keepdims=True)   # [P, 1]
                colat = jnp.min(jnp.where(cand == colmin, i128, 128),
                                axis=1, keepdims=True)          # [P, 1]
                rowm = jnp.where(gmask,
                                 jnp.broadcast_to(colmin.T, (F, P)),
                                 BIG)
                m = jnp.min(rowm, axis=1, keepdims=True)        # [F, 1]
                at = jnp.min(jnp.where(rowm == m, lane_iota, P),
                             axis=1, keepdims=True)             # [F, 1]
                rowp = jnp.where(gmask & (lane_iota == at),
                                 jnp.broadcast_to(
                                     colat.astype(jnp.float32).T,
                                     (F, P)),
                                 jnp.float32(128))
                pw = jnp.min(rowp, axis=1, keepdims=True)       # [F, 1]
                sel = ksel == k
                at_all = jnp.where(sel, at.astype(jnp.float32), at_all)
                pw_all = jnp.where(sel, pw, pw_all)
                m_all = jnp.where(sel, m, m_all)
                # ONE frame->lane dot for both winner coordinates
                # (at < P, pw <= 128: bf16-exact, so the columns ride
                # one [P, F] @ [F, 2] matmul instead of two — the
                # small-dot MXU latency is per ISSUE, not per column)
                apw = jnp.dot(
                    fsel,
                    jnp.concatenate([at.astype(jnp.float32), pw],
                                    axis=1),
                    preferred_element_type=jnp.float32)         # [P, 2]
                at_p = jnp.round(apw[:, 0:1]).astype(jnp.int32)
                pw_p = jnp.round(apw[:, 1:2]).astype(jnp.int32)
                hit = (lane_col == at_p) & (i128 == pw_p)
                cand = jnp.where(hit, BIG, cand)
                return cand, at_all, pw_all, m_all

            zf = jnp.zeros((F, L), jnp.float32)
            cand, at_all, pw_all, m_all = jax.lax.fori_loop(
                0, L, body, (cand, zf, zf, zf))
            perm = jnp.round(to_lane(at_all)).astype(jnp.int32)
            patp = jnp.round(to_lane(pw_all)).astype(jnp.int32)
            return perm, patp, to_lane_val(m_all).T

        return select

    # ---- single-pass rank selectors (round 3, docs/SCL_KERNEL.md
    # §7d).  Both compute every candidate's within-frame precedence
    # count (rank) in one data-parallel pass and read the L winners
    # off rank==k masks, replacing the L serially-dependent
    # min-extraction rounds.  The precedence order is EXACTLY the
    # VM's flat top_k order — (value asc, flat candidate index asc) —
    # so winners, slot order, and tie-breaks are bit-identical.

    def _lane_helpers():
        """to_lane / to_lane_val as in the round selectors: map a
        per-(frame, slot) [F, L] table to per-lane [P, 1] columns via
        diag(FSEL @ v @ LSEL) — no lane-crossing reshapes."""
        lane_frame = iota2((P, F), 0) // L
        fsel = (iota2((P, F), 1) == lane_frame).astype(jnp.float32)
        lsel = (iota2((L, P), 1) % L == iota2((L, P), 0)).astype(
            jnp.float32)
        eye_p = (iota2((P, P), 0) == iota2((P, P), 1)).astype(
            jnp.float32)

        def to_lane(v):
            a = jnp.dot(fsel, jnp.dot(v, lsel,
                                      preferred_element_type=jnp.float32),
                        preferred_element_type=jnp.float32)
            return jnp.sum(a * eye_p, axis=1, keepdims=True)

        def to_lane_val(v):
            hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            rem = v - hi
            mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
            lo = rem - mid
            d = lambda p: jnp.dot(p, lsel,
                                  preferred_element_type=jnp.float32)
            a = dot_sel(fsel, d(hi) + (d(mid) + d(lo)))
            return jnp.sum(a * eye_p, axis=1, keepdims=True)

        return to_lane, to_lane_val

    def make_select_l_rank():
        """Rank-based replacement for make_select_l_smallest: the
        frame's 2L keep/flip candidates are ranked in ONE pass.

        Candidate (p, c) (c=0 keep, c=1 flip) has within-frame flat
        index c*L + l (all keeps before all flips, lanes ascending —
        the [F, 2P] pos order of the round selector).  Its rank is the
        number of frame candidates preceding it under (value asc, flat
        asc), accumulated over the L within-frame lane offsets via
        sublane rotations; slot k's winner is the candidate with
        rank == k (ranks are distinct: the order is total)."""
        to_lane, to_lane_val = _lane_helpers()
        l2 = iota2((P, 2), 0) % L
        c2 = iota2((P, 2), 1)
        key2 = c2 * L + l2                     # within-frame flat index
        l1 = iota2((P, 1), 0) % L
        kio = iota2((P, L), 1).astype(jnp.float32)
        p_col = iota2((P, 1), 0).astype(jnp.float32)
        lane_frame = iota2((F, P), 1) // L
        fselT = (lane_frame == iota2((F, P), 0)).astype(jnp.float32)

        def select(keep_row, delta_col):
            keep_col = keep_row.T                           # [P, 1]
            cand2 = jnp.concatenate(
                [keep_col, keep_col + delta_col], axis=1)   # [P, 2]
            cnt = jnp.zeros((P, 2), jnp.float32)
            for o in range(L):
                if o == 0:
                    rolled = cand2
                else:
                    # row p -> row f*L + (l+o)%L of the same frame:
                    # a global sublane rotation, wrap rows fixed up
                    r_main = pltpu.roll(cand2, P - o, 0)
                    r_wrap = pltpu.roll(cand2, L - o, 0)
                    rolled = jnp.where(l2 < L - o, r_main, r_wrap)
                lp = jnp.where(l1 + o < L, l1 + o, l1 + o - L)
                kv = rolled[:, 0:1]                # their keep value
                fv = rolled[:, 1:2]                # their flip value
                cnt = cnt + jnp.where(
                    (kv < cand2) | ((kv == cand2) & (lp < key2)),
                    1.0, 0.0)
                cnt = cnt + jnp.where(
                    (fv < cand2) | ((fv == cand2) & (lp + L < key2)),
                    1.0, 0.0)
            r0 = cnt[:, 0:1]
            r1 = cnt[:, 1:2]
            m0 = r0 == kio                          # [P, L]
            m1 = r1 == kio
            at_rows = (jnp.where(m0, p_col, 0.0)
                       + jnp.where(m1, p_col, 0.0))
            fl_rows = jnp.where(m1, 1.0, 0.0)
            v_rows = (jnp.where(m0, jnp.broadcast_to(cand2[:, 0:1],
                                                     (P, L)), 0.0)
                      + jnp.where(m1, jnp.broadcast_to(cand2[:, 1:2],
                                                       (P, L)), 0.0))
            # one nonzero per (frame, slot) column: the frame sums are
            # exact; lane indices < 128 ride plain (bf16-exact) dots
            at_all = jnp.dot(fselT, at_rows,
                             preferred_element_type=jnp.float32)
            fl_all = jnp.dot(fselT, fl_rows,
                             preferred_element_type=jnp.float32)
            v_all = dot_sel(fselT, v_rows)
            perm = jnp.round(to_lane(at_all)).astype(jnp.int32)
            flip = jnp.round(to_lane(fl_all)).astype(jnp.int32)
            return perm, flip, to_lane_val(v_all).T

        return select

    # the 13 flip patterns (binary codes over the 7 least-reliable
    # positions, values sorted ascending) that can ever reach a top-8:
    # a pattern outside this set has >= 8 strict dominators — remove
    # an element or shift an index down and the subset sum never
    # increases, and for SPC costs the parity swap changes the cost by
    # -b_j +- a0 <= 0 since a0 <= every b_j — each with a strictly
    # smaller binary code, so it loses even under value ties.
    # Columns 0..9 are codes 0..9; 10/11/12 are {5}/{6}/{7}.
    RANK_NC = 16                      # 13 live + 3 dead columns

    def make_select_flat_rank():
        """Rank-based replacement for make_select_flat over the
        dominance-reduced candidate matrix [P, 16] (13 live patterns
        per lane instead of 128).

        Roll-aligned frame rank in pure full-width 2D: the L
        within-frame lane offsets' candidate rows rotate into
        registration with ours ([P, NC] sublane rolls, wrap rows fixed
        up — exactly make_select_l_rank's alignment) and concatenate
        into ONE [P, L*NC = 128] full-lane-width matrix; each live
        column q then takes a single [P, 128] compare + row-sum to
        count its predecessors.  (A rank-3 [P, NC, NC] formulation
        compiled but blew the 112 MB scoped-VMEM budget by 7 MB at
        wire size; this shape is both smaller and VPU-dense.)  The
        precedence order is the VM's flat (value asc, lane*128 +
        pattern-code asc): columns are code-ascending (0..9 then
        16/32/64), so (lane, column) lexicographic == the VM order
        restricted to the live set.  Slot k's winner is read off the
        rank==k mask in 2D.  No rank-3 iota, no leading reshape
        (bench/probe_rank3.py pins the working primitive set)."""
        to_lane, to_lane_val = _lane_helpers()
        NC = RANK_NC
        l2 = iota2((P, NC), 0) % L            # our lane-in-frame
        q2 = iota2((P, NC), 1)
        live2 = q2 < 13
        pid2 = jnp.where(
            q2 < 10, q2, jnp.where(q2 == 10, 16,
                                   jnp.where(q2 == 11, 32, 64))
        ).astype(jnp.float32)
        # [P, L*NC] masks over the packed rolled matrix: column
        # o*NC + q' holds the o-offset frame-mate's candidate q'
        LC = L * NC
        colo = iota2((P, LC), 1) // NC
        colq = iota2((P, LC), 1) % NC
        livef = jnp.where(colq < 13, 1.0, 0.0)
        l2w = iota2((P, LC), 0) % L
        # tie mask, o>0 part: their lane is lower iff the roll wrapped
        # (f32 mask arithmetic: Mosaic rejects bool-valued selects,
        # arith.trunci i8 -> i1)
        wrapf = jnp.where(l2w >= L - colo, 1.0, 0.0)
        o0f = jnp.where(colo == 0, 1.0, 0.0)
        tie_o = (1.0 - o0f) * wrapf * livef
        p_col = iota2((P, 1), 0).astype(jnp.float32)
        lane_frame = iota2((F, P), 1) // L
        fselT = (lane_frame == iota2((F, P), 0)).astype(jnp.float32)

        def select(cand):                            # [P, NC]
            rolls = []
            for o in range(L):
                if o == 0:
                    rolls.append(cand)
                else:
                    r_main = pltpu.roll(cand, P - o, 0)
                    r_wrap = pltpu.roll(cand, L - o, 0)
                    rolls.append(jnp.where(l2 >= L - o, r_wrap,
                                           r_main))
            rolled_all = jnp.concatenate(rolls, axis=1)  # [P, LC]
            rank_cols = []
            for q in range(13):
                a_col = cand[:, q:q + 1]               # [P, 1]
                # ties: same lane (o==0) -> their column before ours;
                # other lanes -> theirs first iff their lane is lower
                tie = tie_o + o0f * jnp.where(colq < q, livef, 0.0)
                pre = jnp.where(
                    rolled_all < a_col, livef,
                    jnp.where(rolled_all == a_col, tie, 0.0))
                rank_cols.append(jnp.sum(pre, axis=1, keepdims=True))
            rank = jnp.concatenate(
                rank_cols + [jnp.full((P, NC - 13), -1.0,
                                      jnp.float32)], axis=1)
            at_l, pid_l, v_l = [], [], []
            for k in range(L):
                hit = (rank == k) & live2
                mk = jnp.where(hit, 1.0, 0.0)
                win = jnp.sum(mk, axis=1, keepdims=True)   # [P, 1]
                at_l.append(win * p_col)
                pid_l.append(jnp.sum(mk * pid2, axis=1,
                                     keepdims=True))
                # where, not mk*cand: unselected columns can be inf
                # (BIG-sentinel subset sums overflow) and 0*inf = NaN
                v_l.append(jnp.sum(jnp.where(hit, cand, 0.0),
                                   axis=1, keepdims=True))
            at_rows = jnp.concatenate(at_l, axis=1)        # [P, L]
            pid_rows = jnp.concatenate(pid_l, axis=1)
            v_rows = jnp.concatenate(v_l, axis=1)
            # one nonzero per (frame, slot) column: frame sums exact;
            # lanes < 128 and pattern ids <= 64 ride plain bf16 dots
            at_all = jnp.dot(fselT, at_rows,
                             preferred_element_type=jnp.float32)
            pid_all = jnp.dot(fselT, pid_rows,
                              preferred_element_type=jnp.float32)
            v_all = dot_sel(fselT, v_rows)
            perm = jnp.round(to_lane(at_all)).astype(jnp.int32)
            patp = jnp.round(to_lane(pid_all)).astype(jnp.int32)
            return perm, patp, to_lane_val(v_all).T

        return select

    def kernel(*_refs):
        if unroll:
            # static expansion needs no instruction table on device
            ops_ref = None
            (llr_in_ref, cw_ref, pm_ref, llr_d0, llr_s,
             beta_s, llr2_s, beta2_s, refs_s, pm_s, tbl_s) = _refs
        else:
            (ops_ref, llr_in_ref, cw_ref, pm_ref, llr_d0, llr_s,
             beta_s, llr2_s, beta2_s, refs_s, pm_s, tbl_s) = _refs
        # ---- per-cell init -------------------------------------------
        for r in range(n_rows):
            rows = llr_in_ref[0, :, r, :]                  # [F, CHUNK]
            if split_d0:
                llr_d0[r] = rows
            else:
                llr_s[r] = jnp.reshape(
                    jnp.broadcast_to(rows[:, None, :], (F, L, CHUNK)),
                    (P, CHUNK))
        # identity lane maps: lane p sources itself
        refs_s[:] = jnp.broadcast_to(iota2((1, PW), 1), refs_s.shape)
        # lane l=0 of each frame live; clones die at the first fork
        pm_s[:] = jnp.where((iota2(pm_s.shape, 1) % L) == 0, 0.0,
                            BIG / 2)

        # ---- helpers --------------------------------------------------
        # L == 1 (plain successive cancellation, the adaptive-decode
        # fast path — docs/SCL_KERNEL.md §8): each frame owns exactly
        # one lane, every fork selects its own lane's best candidate,
        # so the lane indirections stay identity forever.  All permute
        # machinery (one-hot matmul reads, refs bookkeeping) resolves
        # away at trace time.
        def read_with(perm_col, buf, brow):
            """Lane-permuted read of a bf16-exact buffer (betas)."""
            if L == 1:
                return buf[brow].astype(jnp.float32)
            m = perm_matrix(perm_col)
            return jnp.dot(m, buf[brow].astype(jnp.float32),
                           preferred_element_type=jnp.float32)

        def read_with_val(perm_col, buf, brow):
            """Lane-permuted read of genuine f32 values (LLR tiles)."""
            if L == 1:
                return buf[brow]
            return dot_sel(perm_matrix(perm_col), buf[brow])

        def read_llr(d, brow):
            return read_with_val(refs_s[pl.ds(d, 1), :P].T, llr_s, brow)

        def read_llr2(d, brow):
            return read_with_val(refs_s[pl.ds(d, 1), :P].T, llr2_s,
                                 brow)

        def read_d0(brow):
            """Channel LLR chunk, shared per frame, broadcast to lanes
            (no permute: within-frame lane permutations are no-ops on
            identical rows, and forks never cross frames)."""
            rows = llr_d0[brow]                            # [F, CHUNK]
            if L == 1:
                return rows                                # F == P
            return jnp.reshape(
                jnp.broadcast_to(rows[:, None, :], (F, L, CHUNK)),
                (P, CHUNK))

        def read_beta(sid, brow):
            return read_with(refs_s[pl.ds(depths + sid, 1), :P].T,
                             beta_s, brow)

        def read_beta2(sid, brow):
            return read_with(refs_s[pl.ds(depths + sid, 1), :P].T,
                             beta2_s, brow)

        def put_llr(brow, val):
            llr_s[brow] = val

        def put_llr2(brow, val):
            llr2_s[brow] = val

        def put_beta(brow, val):
            beta_s[brow] = val.astype(beta_dt)

        def put_beta2(brow, val):
            beta2_s[brow] = val.astype(beta_dt)

        def reset_ref(idx, last):
            if L == 1:
                return                     # refs are identity forever
            if isinstance(last, (int, np.integer)):
                # static schedule row (unroll mode, or a literal 1
                # from a fused op): resolve the guard at trace time
                if last > 0:
                    refs_s[pl.ds(idx, 1)] = iota2((1, PW), 1)
                return

            @pl.when(last > 0)
            def _():
                refs_s[pl.ds(idx, 1)] = iota2((1, PW), 1)

        def permute_refs(perm_col):
            """refs[:, p] <- refs[:, perm[p]] (identity beyond lane P)
            via one [*, PW] x [PW, PW] one-hot matmul.  refs values
            are lane indices < P <= 256: bf16-exact on the MXU."""
            if L == 1:
                return                     # refs are identity forever
            if P == PW:
                permW = perm_col
            else:
                permW = jnp.concatenate(
                    [perm_col, iota2((PW - P, 1), 0) + P], axis=0)
            sW = (iota2((PW, PW), 0) == permW.T).astype(jnp.float32)
            out = jnp.dot(refs_s[:].astype(jnp.float32), sW,
                          preferred_element_type=jnp.float32)
            refs_s[:] = jnp.round(out).astype(jnp.int32)

        def pm_row():
            return pm_s[0:1, :P]                        # [1, P]

        def pm_put(row):
            if P == PW:
                pm_s[0:1, :] = row
            else:
                pm_s[0:1, :] = jnp.concatenate(
                    [row, jnp.full((1, PW - P), BIG, jnp.float32)],
                    axis=1)

        if L == 1:
            # every select call site resolves to its closed form at
            # trace time; the selectors (and their iota tables) are
            # never referenced
            select_l = select_flat = None
        elif rank_select:
            select_l = make_select_l_rank()
            select_flat = make_select_flat_rank() if spc_exact else None
        else:
            select_l = make_select_l_smallest()
            select_flat = make_select_flat() if spc_exact else None

        # ---- loop-invariant oneshot tables, hoisted out of the
        # schedule loop: pattern bit j of pattern p = (p >> j) & 1
        # over the [P, 128] candidate grid, plus the popcount parity
        # of each pattern.  The leaf ops used to rebuild these from an
        # iota EVERY schedule iteration (~30 wide vector ops per
        # oneshot leaf); under the instruction-count cost model
        # (docs/SCL_KERNEL.md §7d) computing them once per cell and
        # re-reading is strictly cheaper.  Values are identical —
        # this is a pure hoist, bit-exact by construction.  They are
        # staged through a VMEM scratch ref (rows 0..6 = bit planes,
        # row 7 = popcount parity) rather than captured SSA values:
        # eight [P, 128] values live across a 5k-iteration loop send
        # the Mosaic compile time through the roof.
        if spc_exact and not rank_select and L > 1:
            pjh = iota2((P, 128), 1).astype(jnp.float32)
            popc = jnp.zeros((P, 128), jnp.float32)
            for j in range(7):
                bit = pjh - 2.0 * jnp.floor(pjh / 2.0)
                tbl_s[j] = bit
                popc = popc + bit
                pjh = jnp.floor(pjh / 2.0)
            tbl_s[7] = popc - 2.0 * jnp.floor(popc / 2.0)
            # read back INSIDE the consuming op (not here): a read at
            # kernel scope would recreate the loop-spanning SSA values
            hoisted_tables = True
        else:
            hoisted_tables = False

        # ---- schedule interpreter ------------------------------------
        def make_branches(get):
            d = get(C_D)
            width = get(C_WIDTH)
            last = get(C_LAST)

            def f_of(a, b):
                return (jnp.sign(a) * jnp.sign(b)
                        * jnp.minimum(jnp.abs(a), jnp.abs(b)))

            # ---- tier-1 full-width internal ops ----------------------
            def do_f(_):
                a = read_llr(d, get(C_SRC))
                b = read_llr(d, get(C_SRC2))
                put_llr(get(C_DST), f_of(a, b))
                reset_ref(d + 1, last)
                return 0

            def do_g(_):
                a = read_llr(d, get(C_SRC))
                b = read_llr(d, get(C_SRC2))
                bl = read_beta(get(C_SIDR), get(C_BSRC))
                put_llr(get(C_DST), b + bl * a)
                reset_ref(d + 1, last)
                return 0

            def do_combine(_):
                bl = read_beta(get(C_SIDR), get(C_BSRC))
                br = read_beta(get(C_SIDR2), get(C_BSRC2))
                put_beta(get(C_BDST), bl * br)
                put_beta(get(C_DST), br)
                reset_ref(depths + get(C_SIDW), last)
                return 0

            # ---- depth-0 variants (shared channel-LLR buffer) --------
            def do_f0(_):
                a = read_d0(get(C_SRC))
                b = read_d0(get(C_SRC2))
                put_llr(get(C_DST), f_of(a, b))
                reset_ref(d + 1, last)
                return 0

            def do_g0(_):
                a = read_d0(get(C_SRC))
                b = read_d0(get(C_SRC2))
                bl = read_beta(get(C_SIDR), get(C_BSRC))
                put_llr(get(C_DST), b + bl * a)
                reset_ref(d + 1, last)
                return 0

            # ---- boundary ops (256-wide node -> 128-wide children) ---
            def do_f_b(_):
                full = read_llr(d, get(C_SRC))
                a = full[:, :CHUNK2]
                b = full[:, CHUNK2: 2 * CHUNK2]
                put_llr2(get(C_DST), f_of(a, b))
                reset_ref(d + 1, last)
                return 0

            def do_g_b(_):
                full = read_llr(d, get(C_SRC))
                a = full[:, :CHUNK2]
                b = full[:, CHUNK2: 2 * CHUNK2]
                bl = read_beta2(get(C_SIDR), get(C_BSRC))
                put_llr2(get(C_DST), b + bl * a)
                reset_ref(d + 1, last)
                return 0

            def do_c_b(_):
                bl = read_beta2(get(C_SIDR), get(C_BSRC))
                br = read_beta2(get(C_SIDR2),
                                get(C_BSRC2))
                out = jnp.concatenate(
                    [bl * br, br,
                     jnp.zeros((P, CHUNK - 2 * CHUNK2), jnp.float32)],
                    axis=1)
                put_beta(get(C_BDST), out)
                reset_ref(depths + get(C_SIDW), last)
                return 0

            # ---- width-parameterized bodies ---------------------------
            def make_tier(CW, rd_llr, rd_beta, wr_llr, wr_beta):
                def cmask(w):
                    return iota2((P, CW), 1) < w

                def shl(mat, h):
                    # static h (unroll mode): pass the positive
                    # congruent shift — Mosaic rejects some negative
                    # static roll amounts that the dynamic form allows
                    sh = ((CW - h) % CW
                          if isinstance(h, (int, np.integer)) else -h)
                    rolled = pltpu.roll(mat, sh, 1)
                    return jnp.where(iota2((P, CW), 1) < CW - h,
                                     rolled, 0.0)

                def shr(mat, h):
                    rolled = pltpu.roll(mat, h, 1)
                    return jnp.where(iota2((P, CW), 1) >= h, rolled,
                                     0.0)

                def clean(mat, cols):
                    return jnp.where(iota2((P, CW), 1) < cols, mat,
                                     0.0)

                def t_f_s(_):
                    blk = clean(rd_llr(d, get(C_SRC)),
                                2 * width)
                    wr_llr(get(C_DST), f_of(blk, shl(blk,
                                                            width)))
                    reset_ref(d + 1, last)
                    return 0

                def t_g_s(_):
                    blk = clean(rd_llr(d, get(C_SRC)),
                                2 * width)
                    b = shl(blk, width)
                    bl = clean(rd_beta(get(C_SIDR),
                                       get(C_BSRC)), width)
                    wr_llr(get(C_DST), b + bl * blk)
                    reset_ref(d + 1, last)
                    return 0

                def t_c_s(_):
                    bl = rd_beta(get(C_SIDR),
                                 get(C_BSRC))
                    br = clean(rd_beta(get(C_SIDR2),
                                       get(C_BSRC2)), width)
                    wr_beta(get(C_BDST),
                            jnp.where(cmask(width), bl * br,
                                      shr(br, width)))
                    reset_ref(depths + get(C_SIDW), last)
                    return 0

                # ---- leaf cores: body(llr tile, width, carry tile)
                # -> (beta tile, carry, pm row).  `carry` rides through
                # every list fork via the same one-hot permutation as
                # the local state (None = no payload, zero cost).

                def rate0_core(a, w, carry):
                    pen = jnp.sum(
                        jnp.where(cmask(w),
                                  jnp.maximum(-a, 0.0), 0.0),
                        axis=1, keepdims=True)          # [P, 1]
                    return (jnp.ones((P, CW), jnp.float32), carry,
                            pm_row() + pen.T)

                def rep_core(a, w, carry):
                    m = cmask(w)
                    m0 = jnp.sum(jnp.where(m, jnp.maximum(-a, 0.0),
                                           0.0),
                                 axis=1, keepdims=True)  # [P, 1]
                    m1 = jnp.sum(jnp.where(m, jnp.maximum(a, 0.0),
                                           0.0),
                                 axis=1, keepdims=True)
                    if L == 1:
                        # single path: the all-minus-ones hypothesis
                        # wins only STRICTLY (tie keeps all-ones,
                        # matching the selector's keep-before-flip
                        # candidate order)
                        sign = jnp.where(m1 < m0, -1.0, 1.0).astype(
                            jnp.float32)                 # [P, 1]
                        pm2 = pm_row() + jnp.minimum(m0, m1).T
                        return (jnp.broadcast_to(sign, (P, CW)), carry,
                                pm2)
                    perm, flip, pm2 = select_l(pm_row() + m0.T,
                                               m1 - m0)
                    sign = jnp.where(flip > 0, -1.0, 1.0).astype(
                        jnp.float32)                     # [P, 1]
                    if carry is not None:
                        carry = jnp.dot(
                            perm_matrix(perm), carry,
                            preferred_element_type=jnp.float32)
                    permute_refs(perm)
                    return (jnp.broadcast_to(sign, (P, CW)), carry,
                            pm2)

                def leaf_op(core):
                    def run(_):
                        a = rd_llr(d, get(C_SRC))
                        beta, _c, pm2 = core(a, width, None)
                        wr_beta(get(C_BDST), beta)
                        pm_put(pm2)
                        reset_ref(depths + get(C_SIDW), last)
                        return 0
                    return run

                def leaf_op_fl(core):
                    """Left leaf with its parent F absorbed."""
                    def run(_):
                        blk = clean(rd_llr(d, get(C_SRC)),
                                    2 * width)
                        a = f_of(blk, shl(blk, width))
                        beta, _c, pm2 = core(a, width, None)
                        wr_beta(get(C_BDST), beta)
                        pm_put(pm2)
                        reset_ref(depths + get(C_SIDW), last)
                        return 0
                    return run

                def leaf_op_gr(core):
                    """Right leaf with its parent G and the node
                    COMBINE absorbed; the left-child beta rides the
                    forks as a payload."""
                    def run(_):
                        blk = clean(rd_llr(d, get(C_SRC)),
                                    2 * width)
                        bl = clean(rd_beta(get(C_SIDR),
                                           get(C_BSRC)), width)
                        g = shl(blk, width) + bl * blk
                        beta, bl2, pm2 = core(g, width, bl)
                        beta = clean(beta, width)
                        out = jnp.where(cmask(width), bl2 * beta,
                                        shr(beta, width))
                        wr_beta(get(C_BDST), out)
                        pm_put(pm2)
                        reset_ref(depths + get(C_SIDW), last)
                        return 0
                    return run

                def least_reliable(mag, iota, count):
                    """`count` smallest |llr| per lane: [P, T] vals + idx.
                    (CW is a valid out-of-range index sentinel for any
                    node width.)"""
                    vals_l, idxs_l = [], []
                    mag_t = mag
                    for _k in range(count):
                        v = jnp.min(mag_t, axis=1, keepdims=True)
                        at = jnp.min(jnp.where(mag_t == v, iota, CW),
                                     axis=1, keepdims=True)
                        vals_l.append(v)
                        idxs_l.append(at)
                        mag_t = jnp.where(iota == at, BIG, mag_t)
                    return (jnp.concatenate(vals_l, axis=1),
                            jnp.concatenate(idxs_l, axis=1))

                def rate1_core(a, w, carry):
                    if L == 1:
                        # SC: zero flips is always the per-lane
                        # minimum (subset penalties are sums of
                        # non-negative |llr|; ties pick pattern 0 =
                        # the lowest flat candidate index), so the
                        # leaf is a pure hard decision with pm and
                        # every payload untouched — in BOTH exact and
                        # fast modes
                        valid = cmask(w)
                        b = jnp.where(valid,
                                      jnp.where(a < 0.0, -1.0, 1.0),
                                      0.0)
                        return b, carry, pm_row()
                    if spc_exact:
                        b, carry, _s, pm2 = oneshot_core(a, w, carry,
                                                         None, False)
                        return b, carry, pm2
                    valid = cmask(w)
                    mag = jnp.where(valid, jnp.abs(a), BIG)
                    b_local = jnp.where(valid,
                                        jnp.where(a < 0.0, -1.0, 1.0),
                                        0.0)
                    iota = iota2((P, CW), 1)
                    pm2 = pm_row()
                    # python loop: the optional carry payload makes the
                    # fori state shape conditional
                    for _r in range(t_r1):
                        v = jnp.min(mag, axis=1, keepdims=True)
                        at = jnp.min(jnp.where(mag == v, iota, CW),
                                     axis=1, keepdims=True)   # [P, 1]
                        perm, flip, pm2 = select_l(pm2, v)
                        pmat = perm_matrix(perm)
                        b_local = jnp.dot(
                            pmat, b_local,
                            preferred_element_type=jnp.float32)
                        mag = dot_sel(pmat, mag)
                        if carry is not None:
                            carry = jnp.dot(
                                pmat, carry,
                                preferred_element_type=jnp.float32)
                        # bit positions reach CW-1: beyond 256 they
                        # are NOT bf16-exact (257 rounds to 256 on the
                        # MXU and the wrong bit flips) — exact 3-pass
                        # select for the 512-wide tier
                        at_f = at.astype(jnp.float32)
                        at2 = jnp.round(
                            dot_sel(pmat, at_f) if CW > 256 else
                            jnp.dot(pmat, at_f,
                                    preferred_element_type=jnp.float32)
                        ).astype(jnp.int32)                   # [P, 1]
                        hit = iota == at2
                        b_local = jnp.where(hit & (flip > 0),
                                            -b_local, b_local)
                        mag = jnp.where(hit, BIG, mag)
                        permute_refs(perm)
                    return b_local, carry, pm2

                def oneshot_core(a, w, carry, s_col, spc):
                    """One-shot exact list decode of a RATE1 (spc=
                    False) or SPC node: every candidate flip set is a
                    (source lane, subset of the 7 least-reliable
                    positions [plus the parity-forced i0 for SPC])
                    pair; the global per-frame top-L over the [P, 128]
                    candidate matrix (select_flat) replaces all serial
                    fork rounds.  Equal to bit-by-bit SCL by greedy
                    dominance (a path pruned at bit i cannot beat any
                    survivor's zero-cost extension) — parity vs the
                    numpy oracle in tests/test_pallas.py.  ONE lane
                    permutation of b/carry/s_col/refs instead of one
                    per fork round.  Pattern bits are decoded
                    arithmetically (no gathers) and subset sums
                    accumulate on the VPU in f32 (no MXU bf16
                    rounding)."""
                    valid = cmask(w)
                    mag = jnp.where(valid, jnp.abs(a), BIG)
                    b = jnp.where(valid,
                                  jnp.where(a < 0.0, -1.0, 1.0), 0.0)
                    iota = iota2((P, CW), 1)
                    t = 8 if spc else 7
                    fl0 = 1 if spc else 0
                    vals, idxs = least_reliable(mag, iota, t)
                    # pattern bit j of pattern p is (p >> j) & 1 —
                    # decoded arithmetically from an iota (pallas_call
                    # rejects captured constant tables).  rank_select
                    # enumerates only the 13 dominance-surviving
                    # pattern codes (columns 0..9 = codes 0..9,
                    # 10/11/12 = 16/32/64; see RANK_NC) — a pattern
                    # outside that set has >= L strict same-lane
                    # dominators and can never reach the top-L.
                    NCC = RANK_NC if rank_select else 128
                    if rank_select:
                        qc = iota2((P, NCC), 1)
                        pjC = jnp.where(
                            qc < 10, qc,
                            jnp.where(qc == 10, 16,
                                      jnp.where(qc == 11, 32, 64))
                        ).astype(jnp.float32)
                        liveC = qc < 13
                        subs = jnp.zeros((P, NCC), jnp.float32)
                        bitsumC = jnp.zeros((P, NCC), jnp.float32)
                        for j in range(7):
                            bit = pjC - 2.0 * jnp.floor(pjC / 2.0)
                            subs = subs + (vals[:, fl0 + j: fl0 + j + 1]
                                           * bit)
                            bitsumC = bitsumC + bit
                            pjC = jnp.floor(pjC / 2.0)
                        spar = bitsumC - 2.0 * jnp.floor(bitsumC / 2.0)
                    else:
                        # hoisted tables (tbl_s scratch, written once
                        # per cell): only the 7 multiply-accumulates
                        # remain per leaf
                        assert hoisted_tables
                        liveC = None
                        subs = jnp.zeros((P, NCC), jnp.float32)
                        for j in range(7):
                            subs = subs + (vals[:, fl0 + j: fl0 + j + 1]
                                           * tbl_s[j])
                        spar = tbl_s[7]
                    cand = pm_row().T + subs
                    if spc:
                        negs = jnp.sum(jnp.where(b < 0.0, 1.0, 0.0),
                                       axis=1, keepdims=True)
                        odd = negs - 2.0 * jnp.floor(negs / 2.0)
                        # spar: pattern popcount parity
                        i0_in = odd + spar - 2.0 * odd * spar  # XOR
                        cand = cand + i0_in * vals[:, 0:1]
                    if liveC is not None:
                        cand = jnp.where(liveC, cand, BIG)
                    perm, patp, pm2 = select_flat(cand)
                    pmat = perm_matrix(perm)
                    b = jnp.dot(pmat, b,
                                preferred_element_type=jnp.float32)
                    # bit positions > 256 are not bf16-exact: exact
                    # 3-pass select for the 512-wide tier
                    idxs_f = idxs.astype(jnp.float32)
                    idxs_p = jnp.round(
                        dot_sel(pmat, idxs_f) if CW > 256 else
                        jnp.dot(pmat, idxs_f,
                                preferred_element_type=jnp.float32)
                    ).astype(jnp.int32)
                    if carry is not None:
                        carry = jnp.dot(
                            pmat, carry,
                            preferred_element_type=jnp.float32)
                    if s_col is not None:
                        s_col = jnp.dot(
                            pmat, s_col,
                            preferred_element_type=jnp.float32)
                    if spc:
                        odd = jnp.dot(pmat, odd,
                                      preferred_element_type=jnp.float32)
                    permute_refs(perm)
                    flip = jnp.zeros((P, CW), jnp.float32)
                    bitsum = jnp.zeros((P, 1), jnp.float32)
                    pj = patp.astype(jnp.float32)
                    for j in range(7):
                        bit = pj - 2.0 * jnp.floor(pj / 2.0)
                        bitsum = bitsum + bit
                        flip = flip + jnp.where(
                            iota == idxs_p[:, fl0 + j: fl0 + j + 1],
                            bit, 0.0)
                        pj = jnp.floor(pj / 2.0)
                    if spc:
                        sp = bitsum - 2.0 * jnp.floor(bitsum / 2.0)
                        i0bit = odd + sp - 2.0 * odd * sp      # XOR
                        flip = flip + jnp.where(
                            iota == idxs_p[:, 0:1], i0bit, 0.0)
                    b = jnp.where(flip > 0.5, -b, b)
                    return b, carry, s_col, pm2

                def spc_core_serial(a, w, carry, s_col=None):
                    """Single-parity-check list decode of `a` over `w`
                    columns (Fast-SSC-List approximation): parity-fix
                    the hard decisions, then fork on least-reliable
                    flips paired with an i0 toggle — at most one
                    exclusive pair flip {i0, ij} per path (the
                    `switched` blocker).  `s_col` [P, 1] and `carry`
                    [P, CW] are per-lane payloads carried through the
                    forks.  Returns (betas, carry, s_col, pm)."""
                    if s_col is None:
                        s_col = jnp.ones((P, 1), jnp.float32)
                    valid = cmask(w)
                    mag = jnp.where(valid, jnp.abs(a), BIG)
                    b = jnp.where(valid,
                                  jnp.where(a < 0.0, -1.0, 1.0), 0.0)
                    iota = iota2((P, CW), 1)
                    negs = jnp.sum(jnp.where(b < 0.0, 1, 0), axis=1,
                                   keepdims=True)          # [P, 1]
                    odd = (negs % 2) == 1
                    vals, idxs = least_reliable(mag, iota, t_spc)
                    v0 = vals[:, 0:1]
                    i0 = idxs[:, 0:1]
                    pm = pm_row() + jnp.where(odd, v0, 0.0).T
                    b = jnp.where((iota == i0) & odd, -b, b)
                    switched = jnp.zeros((P, 1), jnp.int32)
                    pm2 = pm
                    for r in range(1, t_spc):
                        vr = vals[:, r:r + 1]
                        delta = jnp.where(odd, vr - vals[:, 0:1],
                                          vr + vals[:, 0:1])
                        delta = jnp.where(switched > 0, BIG, delta)
                        perm, flip, pm2 = select_l(pm2, delta)
                        pmat = perm_matrix(perm)
                        b = jnp.dot(pmat, b,
                                    preferred_element_type=jnp.float32)
                        vals = dot_sel(pmat, vals)
                        # same bf16 hazard as rate1_core's at2: bit
                        # positions > 256 need the exact select
                        idxs_f = idxs.astype(jnp.float32)
                        idxs = jnp.round(
                            dot_sel(pmat, idxs_f) if CW > 256 else
                            jnp.dot(pmat, idxs_f,
                                    preferred_element_type=jnp.float32)
                        ).astype(jnp.int32)
                        oddsw = jnp.round(jnp.dot(
                            pmat, jnp.concatenate(
                                [jnp.where(odd, 1.0, 0.0),
                                 switched.astype(jnp.float32),
                                 s_col],
                                axis=1),
                            preferred_element_type=jnp.float32))
                        odd = oddsw[:, 0:1] > 0.5
                        switched = oddsw[:, 1:2].astype(jnp.int32)
                        s_col = oddsw[:, 2:3]
                        if carry is not None:
                            carry = jnp.dot(
                                pmat, carry,
                                preferred_element_type=jnp.float32)
                        permute_refs(perm)
                        pair = ((iota == idxs[:, 0:1]) |
                                (iota == idxs[:, r:r + 1]))
                        b = jnp.where(pair & (flip > 0), -b, b)
                        switched = switched | flip
                    return b, carry, s_col, pm2

                if L == 1:
                    def spc_core(a, w, carry, s_col=None):
                        """L=1 closed form (exact and fast modes
                        coincide): hard decisions, and on odd parity
                        flip the least-reliable position and pay its
                        |llr|.  Any multi-flip candidate costs at
                        least as much and loses ties on candidate
                        order (pattern 0 is the lowest flat index);
                        payloads ride through untouched — no forks."""
                        valid = cmask(w)
                        mag = jnp.where(valid, jnp.abs(a), BIG)
                        b = jnp.where(valid,
                                      jnp.where(a < 0.0, -1.0, 1.0),
                                      0.0)
                        iota = iota2((P, CW), 1)
                        negs = jnp.sum(jnp.where(b < 0.0, 1.0, 0.0),
                                       axis=1, keepdims=True)
                        odd = negs - 2.0 * jnp.floor(negs / 2.0)
                        v0 = jnp.min(mag, axis=1, keepdims=True)
                        i0 = jnp.min(jnp.where(mag == v0, iota, CW),
                                     axis=1, keepdims=True)
                        pm2 = pm_row() + (odd * v0).T
                        b = jnp.where((iota == i0) & (odd > 0.5),
                                      -b, b)
                        if s_col is None:
                            s_col = jnp.ones((P, 1), jnp.float32)
                        return b, carry, s_col, pm2
                elif spc_exact:
                    def spc_core(a, w, carry, s_col=None):
                        return oneshot_core(a, w, carry, s_col, True)
                else:
                    spc_core = spc_core_serial

                def spc_leaf_core(a, w, carry):
                    b, carry, _s, pm2 = spc_core(a, w, carry)
                    return b, carry, pm2

                def repspc_core(x, w, carry):
                    """Node with REP left child + SPC right child
                    (widths w), given the node's LLR tile `x` (2w valid
                    cols).  Fork order matches the unfused F, REP, G,
                    SPC, COMBINE sequence exactly; the REP beta is one
                    sign per lane, so G is b + s*a and the combine is
                    [s*b_spc | b_spc]."""
                    f_llr = f_of(x, shl(x, w))
                    m = cmask(w)
                    m0 = jnp.sum(jnp.where(m, jnp.maximum(-f_llr, 0.0),
                                           0.0),
                                 axis=1, keepdims=True)     # [P, 1]
                    m1 = jnp.sum(jnp.where(m, jnp.maximum(f_llr, 0.0),
                                           0.0),
                                 axis=1, keepdims=True)
                    if L == 1:
                        # rep_core's L=1 closed form inlined: strict
                        # win flips, tie keeps; no forks to permute
                        s_col = jnp.where(m1 < m0, -1.0, 1.0).astype(
                            jnp.float32)                    # [P, 1]
                        pm_put(pm_row() + jnp.minimum(m0, m1).T)
                        g_llr = shl(x, w) + s_col * x
                        b, carry, s_col, pm3 = spc_core(g_llr, w,
                                                        carry, s_col)
                        out = jnp.where(m, s_col * b, shr(b, w))
                        return out, carry, pm3
                    perm, flip, pm2 = select_l(pm_row() + m0.T,
                                               m1 - m0)
                    s_col = jnp.where(flip > 0, -1.0, 1.0).astype(
                        jnp.float32)                        # [P, 1]
                    pmat = perm_matrix(perm)
                    x = dot_sel(pmat, x)
                    if carry is not None:
                        carry = jnp.dot(
                            pmat, carry,
                            preferred_element_type=jnp.float32)
                    permute_refs(perm)
                    pm_put(pm2)
                    g_llr = shl(x, w) + s_col * x
                    b, carry, s_col, pm3 = spc_core(g_llr, w, carry,
                                                    s_col)
                    out = jnp.where(m, s_col * b, shr(b, w))
                    return out, carry, pm3

                def t_rep_spc(_):
                    blk = clean(rd_llr(d, get(C_SRC)),
                                2 * width)
                    out, _c, pm3 = repspc_core(blk, width, None)
                    wr_beta(get(C_BDST), out)
                    pm_put(pm3)
                    reset_ref(depths + get(C_SIDW), last)
                    return 0

                def t_rep_spc_fl(_):
                    """REP-SPC node with its parent F absorbed: the
                    op's width is the NODE width (2x the REP width)."""
                    blk = clean(rd_llr(d, get(C_SRC)),
                                2 * width)
                    x = clean(f_of(blk, shl(blk, width)), width)
                    out, _c, pm3 = repspc_core(x, width // 2, None)
                    wr_beta(get(C_BDST), out)
                    pm_put(pm3)
                    reset_ref(depths + get(C_SIDW), last)
                    return 0

                def t_rep_spc_gr(_):
                    """REP-SPC node with its parent G and COMBINE
                    absorbed; left beta rides the forks."""
                    blk = clean(rd_llr(d, get(C_SRC)),
                                2 * width)
                    bl = clean(rd_beta(get(C_SIDR),
                                       get(C_BSRC)), width)
                    x = clean(shl(blk, width) + bl * blk, width)
                    out, bl2, pm3 = repspc_core(x, width // 2, bl)
                    out = clean(out, width)
                    pout = jnp.where(cmask(width), bl2 * out,
                                     shr(out, width))
                    wr_beta(get(C_BDST), pout)
                    pm_put(pm3)
                    reset_ref(depths + get(C_SIDW), last)
                    return 0

                # ---- chain-pair ops (round 3; dispatched tier-2
                # only).  op2's read of op1's output is the REGISTER
                # value: op1 writes lane-dense and resets that
                # indirection row, so the identity-permute read it
                # replaces is exact (betas are {-1,0,+1}: the skipped
                # bf16 store/load round trip is exact too).
                def t_ff(_):
                    blk = clean(rd_llr(d, get(C_SRC)),
                                2 * width)
                    v1 = f_of(blk, shl(blk, width))
                    wr_llr(get(C_DST), v1)
                    w2 = width // 2
                    v1c = clean(v1, width)
                    wr_llr(get(C_DST) + 1,
                           f_of(v1c, shl(v1c, w2)))
                    reset_ref(d + 1, 1)
                    reset_ref(d + 2, 1)
                    return 0

                def t_gf(_):
                    blk = clean(rd_llr(d, get(C_SRC)),
                                2 * width)
                    b = shl(blk, width)
                    bl = clean(rd_beta(get(C_SIDR),
                                       get(C_BSRC)), width)
                    v1 = b + bl * blk
                    wr_llr(get(C_DST), v1)
                    w2 = width // 2
                    v1c = clean(v1, width)
                    wr_llr(get(C_DST) + 1,
                           f_of(v1c, shl(v1c, w2)))
                    reset_ref(d + 1, 1)
                    reset_ref(d + 2, 1)
                    return 0

                def t_cg(_):
                    bl = rd_beta(get(C_SIDR),
                                 get(C_BSRC))
                    br = clean(rd_beta(get(C_SIDR2),
                                       get(C_BSRC2)), width)
                    v1 = jnp.where(cmask(width), bl * br,
                                   shr(br, width))
                    wr_beta(get(C_BDST), v1)
                    reset_ref(depths + get(C_SIDW), 1)
                    # G2 at depth d-1, width 2w; left beta = v1
                    d2 = d - 1
                    w2 = 2 * width
                    blk = clean(rd_llr(d2, d2 - D2), 2 * w2)
                    b = shl(blk, w2)
                    blv = clean(v1, w2)
                    wr_llr(d2 + 1 - D2, b + blv * blk)
                    reset_ref(d2 + 1, 1)
                    return 0

                def t_cc(_):
                    bl = rd_beta(get(C_SIDR),
                                 get(C_BSRC))
                    br = clean(rd_beta(get(C_SIDR2),
                                       get(C_BSRC2)), width)
                    v1 = jnp.where(cmask(width), bl * br,
                                   shr(br, width))
                    wr_beta(get(C_BDST), v1)
                    reset_ref(depths + get(C_SIDW), 1)
                    # C2 at depth d-1, width 2w; RIGHT beta = v1,
                    # left beta slot/row + write ids from packed cols
                    w2 = 2 * width
                    bl2 = rd_beta(get(C_SRC),
                                  get(C_SRC2))
                    br2 = clean(v1, w2)
                    v2 = jnp.where(cmask(w2), bl2 * br2,
                                   shr(br2, w2))
                    wr_beta(get(C_DST), v2)
                    reset_ref(depths + get(C_P2A), 1)
                    return 0

                return (t_f_s, t_g_s, t_c_s, leaf_op(rate0_core),
                        leaf_op(rep_core), leaf_op(rate1_core),
                        leaf_op(spc_leaf_core), t_rep_spc,
                        leaf_op_fl(rate0_core), leaf_op_fl(rep_core),
                        leaf_op_fl(rate1_core),
                        leaf_op_fl(spc_leaf_core),
                        leaf_op_gr(rate0_core), leaf_op_gr(rep_core),
                        leaf_op_gr(rate1_core),
                        leaf_op_gr(spc_leaf_core),
                        t_rep_spc_fl, t_rep_spc_gr,
                        t_ff, t_gf, t_cg, t_cc)

            t1 = make_tier(CHUNK, read_llr, read_beta, put_llr,
                           put_beta)
            t2 = make_tier(CHUNK2, read_llr2, read_beta2, put_llr2,
                           put_beta2)
            # t1 uses only the plain variants (fusion is tier-2 only)
            (do_f_s, do_g_s, do_c_s, do_rate0, do_rep, do_rate1,
             do_spc) = t1[:7]
            (do_f2, do_g2, do_c2, do_rate0_2, do_rep_2, do_rate1_2,
             do_spc_2, do_rep_spc_2, do_rate0_fl, do_rep_fl,
             do_rate1_fl, do_spc_fl, do_rate0_gr, do_rep_gr,
             do_rate1_gr, do_spc_gr, do_rep_spc_fl,
             do_rep_spc_gr, do_ff_2, do_gf_2, do_cg_2, do_cc_2) = t2

            return [do_f, do_g, do_combine, do_rate0,
                    do_rep, do_rate1, do_spc, do_f_s,
                    do_g_s, do_c_s, do_f0, do_g0,
                    do_f_b, do_g_b, do_c_b,
                    do_f2, do_g2, do_c2, do_rate0_2,
                    do_rep_2, do_rate1_2, do_spc_2,
                    do_rep_spc_2,
                    do_rate0_fl, do_rep_fl, do_rate1_fl,
                    do_spc_fl, do_rate0_gr, do_rep_gr,
                    do_rate1_gr, do_spc_gr,
                    do_rep_spc_fl, do_rep_spc_gr,
                    do_ff_2, do_gf_2, do_cg_2,
                    do_cc_2]

        def body(i, _):
            jax.lax.switch(ops_ref[i, C_OP],
                           make_branches(lambda c: ops_ref[i, c]), 0)
            return 0

        if unroll:
            # static schedule expansion: every operand offset, width,
            # roll amount and mask bound is a Python constant -- no
            # op-table scalar reads, no switch, no dynamic addressing.
            for _row in ops16:
                make_branches(
                    lambda c, _r=_row: int(_r[c]))[int(_row[C_OP])](0)
        else:
            jax.lax.fori_loop(0, n_ops, body, 0)

        # ---- emit outputs --------------------------------------------
        for r in range(n_rows):
            # f32 compare: Mosaic on v5e rejects bf16 vector cmpf.
            # int8 output quarters the HBM block vs int32.
            blk = jnp.reshape(beta_s[out_row0 + r], (F, L, CHUNK))
            cw_ref[0, :, :, r * CHUNK:(r + 1) * CHUNK] = (
                blk.astype(jnp.float32) < 0.0).astype(jnp.int8)
        pm_ref[0, 0:1, :] = pm_s[0:1, :]

    n_pad = n_rows * CHUNK

    def decode(llrs):
        batch = llrs.shape[0]
        assert batch % F == 0, (batch, F)
        cells = batch // F
        if n_pad != n:
            llrs = jnp.concatenate(
                [llrs, jnp.zeros((batch, n_pad - n), llrs.dtype)],
                axis=1)
        blocks = llrs.reshape(cells, F, n_rows, CHUNK)
        in_specs = [
            # NOTE: SMEM would be the natural home for the op table
            # (16 scalar reads per op) but SMEM allocates 32 B per
            # element — [5108, 16] i32 needs 2.6 MB vs the 1 MB
            # budget — so it stays in VMEM.
            pl.BlockSpec((n_ops, 16), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, n_rows, CHUNK),
                         lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = (jnp.asarray(ops16), blocks)
        if unroll:
            in_specs = in_specs[1:]
            inputs = (blocks,)
        cw, pm = pl.pallas_call(
            kernel,
            grid=(cells,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, F, L, n_pad), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, PW), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((cells, F, L, n_pad), jnp.int8),
                jax.ShapeDtypeStruct((cells, 1, PW), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_rows if split_d0 else 1, F, CHUNK),
                           jnp.float32),
                pltpu.VMEM((max(t1_llr_rows, 1), P, CHUNK),
                           jnp.float32),
                pltpu.VMEM((max(t1_beta_rows, 1), P, CHUNK), beta_dt),
                pltpu.VMEM((max(llr2_rows, 1), P, CHUNK2),
                           jnp.float32),
                pltpu.VMEM((max(beta2_rows, 1), P, CHUNK2), beta_dt),
                pltpu.VMEM((3 * depths, PW), jnp.int32),
                pltpu.VMEM((1, PW), jnp.float32),
                # hoisted oneshot tables (pattern bits + popc parity)
                pltpu.VMEM((8, P, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )(*inputs)
        cw = cw.reshape(batch, L, n_pad)[:, :, :n].astype(jnp.uint8)
        pm = pm[:, 0, :P].reshape(batch, L)
        return cw, pm

    decode.ops16 = ops16       # introspection/profiling aid
    return decode
