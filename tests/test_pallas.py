"""Pallas SCL kernel vs XLA VM parity (interpreter mode, toy code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modem_tpu.fec.polar import PolarCode
from modem_tpu.fec.scl_vm import make_decoder
from modem_tpu.kernels.scl_pallas import make_pallas_decoder

TOY = PolarCode(n=224, k=144, order=8)


@pytest.fixture(scope="module")
def toy_llrs():
    rng = np.random.default_rng(0)
    m = rng.integers(0, 2, TOY.mesg_bits, dtype=np.uint8)
    m[TOY.k:] = 0
    cw = TOY.encode_systematic_np(m)
    tx = 1.0 - 2.0 * TOY.shorten_np(cw).astype(np.float64)
    llrs = np.stack([
        TOY.lengthen_np(2 * (tx + 0.5 * rng.standard_normal(TOY.n))
                        / 0.25) for _ in range(4)]).astype(np.float32)
    return cw, llrs


# default lane keeps one case per axis value (exact x {1,4} lane
# layouts + one fast-mode case); the remaining combinations add no
# new code path and run opt-in (pytest -m slow)
@pytest.mark.parametrize("exact,frames_per_cell", [
    (True, 1), (True, 4), (False, 2),
    pytest.param(True, 2, marks=pytest.mark.slow),
    pytest.param(False, 1, marks=pytest.mark.slow),
    pytest.param(False, 4, marks=pytest.mark.slow)])
def test_pallas_matches_xla_vm(toy_llrs, frames_per_cell, exact):
    cw, llrs = toy_llrs
    ref = jax.jit(jax.vmap(make_decoder(TOY.frozen, 8, exact=exact)))
    cws_r, pm_r = (np.asarray(v) for v in ref(jnp.asarray(llrs)))
    pal = make_pallas_decoder(TOY.frozen, 8,
                              frames_per_cell=frames_per_cell,
                              interpret=True, exact=exact)
    cws_p, pm_p = (np.asarray(v) for v in pal(jnp.asarray(llrs)))
    assert np.allclose(np.sort(pm_r, axis=1), np.sort(pm_p, axis=1))
    for b in range(llrs.shape[0]):
        assert (np.sort(cws_r[b], axis=0) ==
                np.sort(cws_p[b], axis=0)).all()
        assert (cws_p[b] == cw).all(axis=1).any()


def test_pallas_split_d0_chunked_code():
    """Codes wider than one chunk route depth-0 F/G through the shared
    per-frame channel-LLR buffer (opcodes 10/11); parity vs the VM."""
    big = PolarCode(n=960, k=480, order=10)     # code_len 1024 > CHUNK
    rng = np.random.default_rng(7)
    m = rng.integers(0, 2, big.mesg_bits, dtype=np.uint8)
    m[big.k:] = 0
    cw = big.encode_systematic_np(m)
    tx = 1.0 - 2.0 * big.shorten_np(cw).astype(np.float64)
    llrs = np.stack([
        big.lengthen_np(2 * (tx + 0.4 * rng.standard_normal(big.n))
                        / 0.16) for _ in range(2)]).astype(np.float32)
    ref = jax.jit(jax.vmap(make_decoder(big.frozen, 8)))
    cws_r, pm_r = (np.asarray(v) for v in ref(jnp.asarray(llrs)))
    pal = make_pallas_decoder(big.frozen, 8, frames_per_cell=2,
                              interpret=True)
    cws_p, pm_p = (np.asarray(v) for v in pal(jnp.asarray(llrs)))
    assert np.allclose(np.sort(pm_r, axis=1), np.sort(pm_p, axis=1))
    for b in range(llrs.shape[0]):
        assert (np.sort(cws_r[b], axis=0) ==
                np.sort(cws_p[b], axis=0)).all()
        assert (cws_p[b] == cw).all(axis=1).any()


def test_pallas_all_opcode_classes():
    """A hand-built 2048-bit frozen mask that produces every kernel op
    class the wire schedules use (tier-1 full/sub F/G/C and leaves,
    boundary ops, tier-2 fused and unfused leaves); parity vs the VM."""
    import modem_tpu.kernels.scl_pallas as K
    from modem_tpu.fec.scl_vm import C_OP

    n = 2048
    frozen = np.zeros(n, dtype=np.uint8)
    frozen[0:512] = 1                      # RATE0 (tier-1, 512)
    # [512:1024) all info -> RATE1 (tier-1, 512)
    frozen[1024:1280] = 1                  # REP 256 (tier-1 sub)
    frozen[1279] = 0
    # [1280:1536) info -> RATE1 256 (tier-1 sub)
    frozen[1536] = 1                       # SPC 256 (tier-1 sub)
    frozen[1792:1919] = 1                  # REP 128 via boundary (t2,
    frozen[1919] = 0                       #   unfused: F_B prefix)
    # [1920:2048) info -> RATE1_2 via boundary (unfused)

    k = int(n - frozen.sum())
    rng = np.random.default_rng(3)
    mk = lambda F: K.make_pallas_decoder(frozen, 8, frames_per_cell=F,
                                         interpret=True)
    raw = mk(2)
    ops = [c.cell_contents for c in raw.__closure__
           if isinstance(c.cell_contents, np.ndarray)
           and getattr(c.cell_contents, "ndim", 0) == 2
           and c.cell_contents.shape[1] == 16][0]
    seen = set(ops[:, C_OP].tolist())
    needed = {K.OPX_F, K.OPX_G, K.OPX_C, K.OPX_RATE0, K.OPX_RATE1,
              K.OPX_REP, K.OPX_SPC, K.OPX_F_B, K.OPX_G_B, K.OPX_C_B,
              K.OPX_REP_2, K.OPX_RATE1_2, K.OPX_F0, K.OPX_G0}
    assert needed <= seen, sorted(needed - seen)

    # parity vs the XLA VM on noisy codewords
    from modem_tpu.fec.polar import polar_transform_np
    msg = np.where(frozen == 1, 0,
                   rng.integers(0, 2, n)).astype(np.uint8)
    cw = polar_transform_np(msg)
    tx = 1.0 - 2.0 * cw.astype(np.float64)
    llrs = np.stack([
        2 * (tx + 0.5 * rng.standard_normal(n)) / 0.25
        for _ in range(2)]).astype(np.float32)
    ref = jax.jit(jax.vmap(make_decoder(frozen, 8)))
    cws_r, pm_r = (np.asarray(v) for v in ref(jnp.asarray(llrs)))
    cws_p, pm_p = (np.asarray(v) for v in raw(jnp.asarray(llrs)))
    assert np.allclose(np.sort(pm_r, axis=1), np.sort(pm_p, axis=1))
    for b in range(llrs.shape[0]):
        assert (np.sort(cws_r[b], axis=0) ==
                np.sort(cws_p[b], axis=0)).all()


@pytest.mark.slow
@pytest.mark.parametrize("exact", [False, True])
def test_pallas_rank_select_bit_exact(toy_llrs, exact):
    """rank_select=True (single-pass rank selectors over the
    dominance-reduced 13-pattern candidate set; docs/SCL_KERNEL.md
    §7d) must be BIT-identical to the round-robin extractors — same
    slots, same order, same path metrics — not merely set-equal.
    (On chip it measured 5.4x slower; the flag is kept as the
    experiment that pinned the instruction-throughput cost model.)"""
    cw, llrs = toy_llrs
    base = make_pallas_decoder(TOY.frozen, 8, frames_per_cell=2,
                               interpret=True, exact=exact)
    rank = make_pallas_decoder(TOY.frozen, 8, frames_per_cell=2,
                               interpret=True, exact=exact,
                               rank_select=True)
    cws_b, pm_b = (np.asarray(v) for v in base(jnp.asarray(llrs)))
    cws_r, pm_r = (np.asarray(v) for v in rank(jnp.asarray(llrs)))
    assert np.array_equal(cws_b, cws_r)
    assert np.array_equal(pm_b, pm_r)


@pytest.mark.parametrize("exact", [
    pytest.param(False, marks=pytest.mark.slow), True])
def test_pallas_unroll_bit_exact(toy_llrs, exact):
    """unroll=True (static trace-time schedule expansion — no op
    table, no switch, every offset/width/roll a compile-time
    constant) must be BIT-identical to the fori_loop interpreter:
    same codewords, same path metrics.  The expansion calls the same
    op bodies with the same values, so any divergence is a wiring
    bug in the static-operand path (reset_ref guards, static rolls)."""
    cw, llrs = toy_llrs
    base = make_pallas_decoder(TOY.frozen, 8, frames_per_cell=2,
                               interpret=True, exact=exact)
    unr = make_pallas_decoder(TOY.frozen, 8, frames_per_cell=2,
                              interpret=True, exact=exact,
                              unroll=True)
    cws_b, pm_b = (np.asarray(v) for v in base(jnp.asarray(llrs)))
    cws_u, pm_u = (np.asarray(v) for v in unr(jnp.asarray(llrs)))
    assert np.array_equal(cws_b, cws_u)
    assert np.array_equal(pm_b, pm_u)


def test_pallas_unroll_bit_exact_all_wire_op_types():
    """Unroll parity over codes that together with the toy test cover
    EVERY op type the wire schedule emits (the toy schedule uses only
    16 of its 32): n=56 adds the plain tier-1 leaves + sub F_S/G_S/C_S
    {3,4,5,6,7,8,9}; n=960 adds the plain tier-2 leaves {18,21} and
    C/F0/G0 {2,10,11}; n=2048 adds full-width F/G and tier-2 REP/
    RATE1 {0,1,19,20}.  A static-operand wiring bug in any op body's
    unroll path fails here, not only on the manual chip probe.
    (exact=False differs only in leaf-op CHOICE, all covered by the
    toy test + n=56 here, so the big codes run the serving default
    only — unroll interpret mode costs minutes per run.  unroll=True
    is a non-default mode closed as a wire-size negative, so only the
    cheap n=56 wiring smoke stays in the default lane; the n=960 and
    n=2048 coverage extensions are opt-in, pytest -m slow.)"""
    _run_unroll_parity_cases([
        (PolarCode(n=56, k=36, order=6), 0.6, True),
        (PolarCode(n=56, k=36, order=6), 0.6, False)])


@pytest.mark.slow
def test_pallas_unroll_bit_exact_tier2_ops():
    """n=960 coverage extension: plain tier-2 leaves {18,21} and
    C/F0/G0 {2,10,11} through the unroll path (opt-in slow lane,
    like the n=2048 wide-op case below)."""
    _run_unroll_parity_cases([
        (PolarCode(n=960, k=480, order=10), 0.5, True)])


@pytest.mark.slow
def test_pallas_unroll_bit_exact_wide_ops():
    """The n=2048 coverage extension (full-width F/G and tier-2 REP/
    RATE1 ops {0,1,19,20}) runs ~3 min in interpret mode, so it lives
    in the opt-in slow lane (pytest -m slow); the default suite keeps
    the toy + n=56 + n=960 unroll pins."""
    _run_unroll_parity_cases(
        [(PolarCode(n=2048, k=1024, order=11), 0.5, True)])


def _run_unroll_parity_cases(cases):
    for code, sigma, exact in cases:
        rng = np.random.default_rng(11)
        m = rng.integers(0, 2, code.mesg_bits, dtype=np.uint8)
        m[code.k:] = 0
        tx = 1.0 - 2.0 * code.shorten_np(
            code.encode_systematic_np(m)).astype(np.float64)
        llrs = code.lengthen_np(
            2 * (tx + sigma * rng.standard_normal(code.n))
            / sigma**2)[None, :].astype(np.float32)
        llrs = np.repeat(llrs, 2, axis=0)
        outs = []
        for unroll in (False, True):
            fn = make_pallas_decoder(code.frozen, 8, frames_per_cell=2,
                                     interpret=True, exact=exact,
                                     unroll=unroll)
            outs.append(tuple(np.asarray(v)
                              for v in fn(jnp.asarray(llrs))))
        assert np.array_equal(outs[0][0], outs[1][0]), (code.n, exact)
        assert np.array_equal(outs[0][1], outs[1][1]), (code.n, exact)


def test_pallas_exact_mode_oracle_parity(toy_llrs):
    """exact=True in the kernel (exact SPC parity-adjuster rule, L-1
    RATE1 rounds) must reproduce the bit-by-bit numpy oracle's
    surviving set strictly, through the fused REP-SPC / prefix-suffix
    leaf paths (round-3 serving default)."""
    from modem_tpu.fec.scl_np import scl_decode_np
    cw, llrs = toy_llrs
    pal = make_pallas_decoder(TOY.frozen, 8, frames_per_cell=2,
                              interpret=True, exact=True)
    cws_p, pm_p = (np.asarray(v) for v in pal(jnp.asarray(llrs)))
    for b in range(llrs.shape[0]):
        cnp, pnp = scl_decode_np(llrs[b], TOY.frozen, 8)
        assert np.allclose(np.sort(pm_p[b]), np.sort(pnp),
                           rtol=1e-4, atol=1e-2)
        assert (np.sort(cws_p[b], axis=0) == np.sort(cnp, axis=0)).all()

@pytest.mark.slow
@pytest.mark.parametrize("exact", [False, True])
def test_pallas_p256_two_lane_tiles(toy_llrs, exact):
    """F=32 (P=256: two 128-lane tables, [256, 256] one-hot permutes,
    flat keep/flip indices up to 511 mapped via the split lane/flip
    path in make_select_l_smallest) must be BIT-identical to F=1.
    Guards the P > 128 generalisation."""
    cw, llrs = toy_llrs
    llrs32 = np.tile(llrs, (8, 1))               # batch 32
    base = make_pallas_decoder(TOY.frozen, 8, frames_per_cell=1,
                               interpret=True, exact=exact)
    big = make_pallas_decoder(TOY.frozen, 8, frames_per_cell=32,
                              interpret=True, exact=exact)
    cb, pb = (np.asarray(v) for v in base(jnp.asarray(llrs32)))
    cg, pg = (np.asarray(v) for v in big(jnp.asarray(llrs32)))
    assert np.array_equal(cb, cg)
    assert np.array_equal(pb, pg)
