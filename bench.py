#!/usr/bin/env python
"""Benchmark: batched mode-6 decode + encode throughput per TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "encode_fps": N, "encode_x_realtime": N, "scl_parity_tpu": bool}

metric = frames decoded per second per chip through the full batched
pipeline (sync argmax -> fine CFO -> FFT demod -> Theil-Sen -> soft
demap -> SCL list-8 -> CRC select).  vs_baseline = multiples of real
time at 8 kHz (frame duration 9.54 s for mode 6) against the
BASELINE.md target of >= 1000x real time per chip.

encode_fps/encode_x_realtime: the batched single-jit encode path
(Encoder.encode_batch: polar encode, D-PSK phase accumulation, PAPR
clip-filter, synthesis IFFT, guard crossfade).

scl_parity_tpu: noisy wire-size frames decoded by the Pallas kernel on
the REAL chip, compared bitwise against the XLA VM run in a CPU
subprocess on the same inputs — the Mosaic-codegen check that
interpret-mode CI parity (tests/test_pallas.py) cannot provide.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PARITY_FRAMES = 8
PARITY_SIGMA = 0.70    # the list-decoding sensitivity edge (bench/ab_scl.py)
PARITY_SEED = 1234


def parity_llrs(code):
    """Seeded noisy wire-size LLR batch shared by both backends."""
    rng = np.random.default_rng(PARITY_SEED)
    m = rng.integers(0, 2, code.mesg_bits, dtype=np.uint8)
    m[code.k:] = 0
    cw = code.encode_systematic_np(m)
    tx = 1.0 - 2.0 * code.shorten_np(cw).astype(np.float64)
    llrs = np.stack([
        code.lengthen_np(
            2.0 * (tx + PARITY_SIGMA * rng.standard_normal(code.n))
            / PARITY_SIGMA**2)
        for _ in range(PARITY_FRAMES)]).astype(np.float32)
    return llrs


def _parity_cache_key(llrs):
    """Content hash of everything the CPU VM reference depends on:
    the fec package sources (schedule builder, polar construction,
    oracle rules) and the exact seeded LLR inputs.  Any fec/ edit or
    input change invalidates the cache; the Pallas-on-TPU side of the
    parity check always runs fresh, so caching the REFERENCE half
    loses no checking power — it only removes a recompute whose cost
    varied 11-955 s with the XLA CPU compile cache."""
    import hashlib
    h = hashlib.sha256()
    fec_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "modem_tpu", "fec")
    for name in sorted(os.listdir(fec_dir)):
        if name.endswith(".py"):
            with open(os.path.join(fec_dir, name), "rb") as f:
                h.update(name.encode() + b"\0" + f.read())
    h.update(np.ascontiguousarray(llrs).tobytes())
    h.update(b"list8")
    return h.hexdigest()[:24]


def vm_reference_subprocess(out_path):
    """Run the XLA VM on the parity batch in a clean CPU process."""
    prog = (
        "import numpy as np, jax, jax.numpy as jnp, sys\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "from modem_tpu.fec.polar import PolarCode\n"
        "from modem_tpu.fec.scl_vm import make_decoder\n"
        "code = PolarCode(n=64800, k=43072, order=16)\n"
        "llrs = bench.parity_llrs(code)\n"
        "dec = jax.jit(jax.vmap(make_decoder(code.frozen, 8)))\n"
        "cws, pm = dec(jnp.asarray(llrs))\n"
        "np.savez(%r, cws=np.asarray(cws), pm=np.asarray(pm))\n"
    ) % (os.path.dirname(os.path.abspath(__file__)), out_path)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", prog], check=True, env=env,
                   timeout=1200)
    return np.load(out_path)


def scl_parity_check(pipe):
    """Pallas-on-TPU vs XLA-VM-on-CPU on identical noisy inputs.

    Agreement criterion: identical per-frame recovery of the true
    codeword at the sensitivity edge, and path metrics within 1 %.
    Bitwise list equality across backends is NOT achievable: Mosaic
    and CPU-XLA reduce the per-leaf penalty sums in different orders,
    and a ULP-level pm difference at a near-tie fork lets the two
    backends keep different (equally good) tail paths.  Kernel LOGIC
    is proven exactly against the VM at wire size in interpret mode
    (identical codeword sets; see docs/SCL_KERNEL.md) — this check
    covers what interpret mode cannot: Mosaic codegen on the chip.
    """
    import jax.numpy as jnp
    llrs = parity_llrs(pipe.code)
    rng = np.random.default_rng(PARITY_SEED)
    m = rng.integers(0, 2, pipe.code.mesg_bits, dtype=np.uint8)
    m[pipe.code.k:] = 0
    cw = pipe.code.encode_systematic_np(m)
    scl = pipe._make_scl(PARITY_FRAMES)
    cws_p, pm_p = (np.asarray(v) for v in scl(jnp.asarray(llrs)))
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    cache = os.path.join(
        cache_dir, f"scl_vm_parity_{_parity_cache_key(llrs)}.npz")
    if os.path.exists(cache):
        ref = np.load(cache)
    else:
        os.makedirs(cache_dir, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            ref = vm_reference_subprocess(os.path.join(td, "vm.npz"))
            np.savez(cache, cws=ref["cws"], pm=ref["pm"])
            ref = np.load(cache)
    cws_r, pm_r = ref["cws"], ref["pm"]
    hits_p = (cws_p == cw).all(axis=2).any(axis=1)
    hits_r = (cws_r == cw).all(axis=2).any(axis=1)
    ok = bool((hits_p == hits_r).all()) and bool(hits_p.any())
    ok &= bool(np.allclose(np.sort(pm_r, axis=1), np.sort(pm_p, axis=1),
                           rtol=1e-2))
    return ok


def device_reachable(timeout_s: float = 180.0) -> bool:
    """Probe the TPU with a tiny op in a SUBPROCESS under a timeout.

    The axon tunnel can wedge server-side for hours (2026-08-17
    outage); a wedged device makes every jax op hang forever, so
    without this gate bench.py would hang silently instead of
    reporting.  A subprocess (not a thread) because a hung jax call
    cannot be cancelled in-process."""
    prog = ("import numpy as np, jax.numpy as jnp\n"
            "assert np.asarray(jnp.arange(4.0) * 2)[1] == 2.0\n")
    try:
        return subprocess.run([sys.executable, "-c", prog],
                              timeout=timeout_s,
                              capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    from modem_tpu import apply_env_platform
    apply_env_platform()

    if os.environ.get("JAX_PLATFORMS", "axon") != "cpu":
        # Retry the probe for a while before giving up: tunnel blips
        # shorter than the retry window (default 10 min, env
        # MODEM_BENCH_PROBE_RETRY_S) must not turn a round's official
        # number into an error line.  Hard outages still report fast:
        # each probe itself times out in 180 s.
        budget = float(os.environ.get("MODEM_BENCH_PROBE_RETRY_S",
                                      "600"))
        deadline = time.time() + budget
        up = device_reachable(min(180.0, max(5.0, budget)))
        while not up and time.time() < deadline:
            print("# TPU probe failed; retrying until "
                  f"{budget:.0f} s elapse...", file=sys.stderr,
                  flush=True)
            time.sleep(min(30.0, max(0.0, deadline - time.time())))
            # cap each probe (sleep excluded) to the remaining budget
            # so the error line lands near the promised window, not
            # up to 180+30 s past it
            left = deadline - time.time()
            if left <= 0:
                break
            up = device_reachable(min(180.0, max(5.0, left)))
        if not up:
            # one honest JSON line beats an indefinite hang
            print(json.dumps(dict(
                metric="decode_frames_per_sec_per_chip", value=0.0,
                unit="frames/s", vs_baseline=0.0,
                error="TPU unreachable: axon tunnel probe timed out")))
            return

    from modem_tpu import bits as B
    from modem_tpu import cplx
    from modem_tpu.encoder import Encoder
    from modem_tpu.numerology import make_config
    from modem_tpu.pipeline import BatchPipeline
    import jax.numpy as jnp

    # default 512: measured 635.5 fps vs 626.9 at 256 and 581.6 at 128
    # (the fixed ~26 ms result-fetch round trip and per-call dispatch
    # amortize: SCL 1.553 -> 1.503 ms/frame going 256 -> 512; staged
    # inputs live on device so HBM is the only cost, ~2.3 GB at 512)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = make_config(8000, 6, 2000)
    enc = Encoder(cfg)
    rng = np.random.default_rng(0)
    call = B.base37_encode("N0CALL")
    # 4 sets: set 0 warms the compile, sets 1-3 are timed — the timed
    # loop must never replay the warmup input (identical graph+input
    # calls may be memoized by the remote runtime; CLAUDE.md trap)
    payload_sets = [
        [rng.integers(0, 256, cfg.mode.data_bytes,
                      dtype=np.uint8).tobytes() for _ in range(batch)]
        for _ in range(4)]

    # ---- encode (batched, one jit) ------------------------------------
    # Same staging convention as the decode loop: inputs staged on
    # device, a small forcing digest fetched per rep (the axon tunnel
    # moves ~18 MB/s, so fetching the 81 MB float waveform would
    # measure the tunnel, not the chip — docs/PERFORMANCE.md "Encode
    # throughput" has the end-to-end transfer numbers and the
    # device-side int16 PCM option that halves them).
    import jax

    def _enc_digest(m, f):
        wave, papr = jax.vmap(
            lambda mm, ff: enc._encode_traced(mm[None], ff[None], 1))(m, f)
        return jnp.sum(jnp.abs(wave), axis=(1, 2)), papr

    enc_digest = jax.jit(_enc_digest)
    from modem_tpu import bits as _B
    meta = jnp.asarray(np.broadcast_to(
        cplx.from_np(enc.meta_fdom(call)),
        (batch, cfg.symbol_len, 2)))
    mesg_sets = [jnp.asarray(np.stack(
        [enc.mesg_bits(_B.scramble(p)) for p in ps]))
        for ps in payload_sets]
    for m in mesg_sets:
        m.block_until_ready()
    t0 = time.time()
    np.asarray(enc_digest(mesg_sets[0], meta)[0])    # compile
    print(f"# encode compile+first: {time.time() - t0:.0f} s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for m in mesg_sets[1:]:
        np.asarray(enc_digest(m, meta)[0])
    enc_dt = (time.time() - t0) / (len(mesg_sets) - 1)
    frame_s = cfg.frame_samples / cfg.rate      # on-air frame duration
    enc_fps = batch / enc_dt
    enc_xrt = enc_fps * frame_s
    print(f"# encode: {enc_fps:.1f} frames/s = {enc_xrt:.0f}x real time",
          file=sys.stderr, flush=True)
    waves, _ = enc.encode_batch(payload_sets[0], call)

    sil = np.zeros((batch, cfg.rate // 4), dtype=np.complex64)
    recs = np.concatenate([sil, waves, sil], axis=1)

    # ---- decode (batched, one jit) ------------------------------------
    # MODEM_SCL_UNROLL=1 serves the trace-time-expanded SCL kernel
    # (no schedule-interpreter overhead; costs a long one-time trace,
    # docs/SCL_KERNEL.md §7i); unset follows pipeline.SCL_UNROLL_DEFAULT
    unroll_env = os.environ.get("MODEM_SCL_UNROLL")
    if not unroll_env:
        # unset OR empty string both mean "follow SCL_UNROLL_DEFAULT"
        unroll = None
    elif unroll_env.lower() in ("1", "true", "yes", "on"):
        unroll = True
    elif unroll_env.lower() in ("0", "false", "no", "off"):
        unroll = False
    else:
        raise SystemExit(f"MODEM_SCL_UNROLL={unroll_env!r}: "
                         "expected 1/0/true/false/yes/no/on/off")
    # MODEM_ADAPTIVE=0 serves the pure exact-SCL pipeline; the default
    # is the CRC-gated adaptive path (SC for every frame, exact SCL
    # only on CRC failure — pipeline.AdaptivePipeline).  Decode output
    # stays byte-exact either way; the adaptive loop additionally
    # asserts zero escalations on this clean workload.
    adaptive = os.environ.get("MODEM_ADAPTIVE", "").lower() not in (
        "0", "false", "no", "off")
    if adaptive:
        from modem_tpu.pipeline import AdaptivePipeline
        pipe = AdaptivePipeline(8000, 6, scl_unroll=unroll)
        kernel_pipe = pipe.sc       # stage-split timings (SC kernel)
        parity_pipe = pipe.scl      # exact-kernel noisy parity check
    else:
        pipe = BatchPipeline(8000, 6, scl_unroll=unroll)
        kernel_pipe = parity_pipe = pipe
    t0 = time.time()
    print("# compiling batched decode...", file=sys.stderr, flush=True)
    res = pipe.decode_batch(recs)              # compile
    print(f"# decode compile+first: {time.time() - t0:.0f} s",
          file=sys.stderr, flush=True)
    ok = np.asarray(res["ok"])
    exact = sum(pipe.payload_bytes(res, i) == payload_sets[0][i]
                for i in range(batch))
    if not ok.all() or exact != batch:
        print(json.dumps({"metric": "decode correctness", "value": 0,
                          "unit": "failed",
                          "vs_baseline": 0.0}))
        return 1

    reps = 3
    # every rep decodes a DISTINCT encoded batch (disjoint payload
    # sets 1-3; set 0 warmed the compile above) and fetches a result
    # to host: block_until_ready does not actually block through the
    # axon tunnel, and identical inputs could be memoized.  (Scalar-
    # scaled copies of ONE batch defeated memoization but re-timed the
    # same sync/demod workload — VERDICT r3 weak #4.)  Staging happens
    # entirely ON DEVICE — encode the batch and splice the silence
    # pads in one jit from the already-staged message bits: fetching
    # the float waveforms to host only to re-upload them moved ~180 MB
    # per staged batch through the ~20-40 MB/s tunnel.
    sil_len = cfg.rate // 4

    def _stage(m, f):
        wave, _papr = jax.vmap(
            lambda mm, ff: enc._encode_traced(mm[None], ff[None], 1))(
            m, f)
        z = jnp.zeros((wave.shape[0], sil_len, 2), jnp.float32)
        return jnp.concatenate([z, wave, z], axis=1)

    stage_jit = jax.jit(_stage)
    staged = [stage_jit(m, meta) for m in mesg_sets[1:]]
    np.asarray(jnp.sum(staged[-1]))        # force staging off the clock
    t0 = time.time()
    oks = []
    fallbacks = 0
    pending = None
    for i in range(reps):
        # pipelined result retirement: resolve/fetch the PREVIOUS
        # rep's result while this rep computes (dispatch is async; a
        # fetch is one ~26 ms tunnel round trip that a serving loop
        # overlaps with compute exactly like this).  The final
        # retirement lands inside the timed window, so every rep's
        # compute — including any adaptive CRC gate — is fully
        # counted.
        if adaptive:
            h = pipe.decode_batch_async(staged[i % 3])
            if pending is not None:
                out = pipe.resolve(pending)
                oks.append(out["ok"])
                fallbacks += pipe.last_fallbacks
            pending = h
        else:
            res = pipe.decode_batch(staged[i % 3])
            oks.append(res["ok"])
            if pending is not None:
                np.asarray(pending)
            pending = res["flips"]
    if adaptive:
        out = pipe.resolve(pending)
        oks.append(out["ok"])
        fallbacks += pipe.last_fallbacks
    else:
        np.asarray(pending)
    dt = (time.time() - t0) / reps
    fps = batch / dt
    xrt = fps * frame_s
    if not all(bool(np.asarray(ok).all()) for ok in oks):
        print(json.dumps({"metric": "decode correctness", "value": 0,
                          "unit": "failed (timed reps)",
                          "vs_baseline": 0.0}))
        return 1

    # ---- per-stage split for the roofline ledger -----------------------
    # (docs/PERFORMANCE.md "Roofline"): time the demod front-end and
    # the SCL stage separately with an in-graph scalar digest (ONE
    # fetch each; per-leaf fetches are one ~26 ms tunnel round trip
    # EACH and would swamp the numbers).
    def _digest(fn):
        def run(*a):
            out = fn(*a)
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(out))
        return jax.jit(run)

    def _min_time(fn, argsets, reps=3):
        """argsets[0] warms the compile and is NEVER re-timed: an
        identical graph+input call may be memoized by the remote
        runtime (CLAUDE.md trap) and min() would keep the cached rep."""
        np.asarray(fn(*argsets[0]))        # compile
        timed = argsets[1:]
        best = float("inf")
        for i in range(reps):
            t1 = time.time()
            np.asarray(fn(*timed[i % len(timed)]))
            best = min(best, time.time() - t1)
        return best

    front_t = _min_time(
        _digest(lambda r: jax.vmap(kernel_pipe._demod_one)(r)),
        [(s,) for s in staged])
    scl_fn = kernel_pipe._make_scl(batch)
    llr_sets = [jnp.asarray(parity_llrs(pipe.code)[:1].repeat(batch, 0)
                            * k) for k in (1.0, 1.01, 0.99)]
    scl_t = _min_time(_digest(scl_fn), [(l,) for l in llr_sets])
    kname = "SC" if adaptive else "SCL"
    print(f"# stages: front {front_t*1e3:.0f} ms, {kname} "
          f"{scl_t*1e3:.0f} ms of {dt*1e3:.0f} ms/batch",
          file=sys.stderr, flush=True)

    # ---- Pallas-vs-VM noisy parity on the real chip -------------------
    # always checks the EXACT list-8 kernel (the adaptive path's
    # fallback decoder; its SC stage is pinned by tests/test_adaptive)
    t0 = time.time()
    parity = scl_parity_check(parity_pipe)
    print(f"# scl parity check ({PARITY_FRAMES} noisy frames @ sigma "
          f"{PARITY_SIGMA}): {'ok' if parity else 'MISMATCH'} "
          f"({time.time() - t0:.0f} s)", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "frames decoded/sec/chip (mode 6, 8 kHz, batch "
                  f"{batch}, bit-exact)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(xrt / 1000.0, 4),
        "encode_fps": round(enc_fps, 3),
        "encode_x_realtime": round(enc_xrt, 1),
        "scl_parity_tpu": parity,
        # decoder=adaptive_sc_scl8: every frame decodes with the L=1
        # SC kernel and CRC-failing frames (sc_fallbacks, 0 on this
        # clean workload) re-decode through the exact list-8 kernel —
        # output is byte-exact either way (pipeline.AdaptivePipeline)
        "decoder": "adaptive_sc_scl8" if adaptive else "scl8_exact",
        **({"sc_fallbacks": fallbacks} if adaptive else {}),
        "front_ms_per_batch": round(front_t * 1e3, 1),
        "scl_ms_per_batch": round(scl_t * 1e3, 1),
        # the serving bound is the SCL kernel's serialized vector-
        # instruction issue, not FLOPs or HBM (docs/PERFORMANCE.md
        # "Roofline"): the whole pipeline moves ~3 GFLOP/frame
        # (<1% MXU peak at this rate) and the SCL floor is the
        # ~5.1k-iteration schedule at its measured per-iteration cost
        "bound": "scl_instruction_issue",
    }))
    print(f"# {fps:.2f} frames/s = {xrt:.0f}x real time "
          f"(target 1000x); batch {batch}, {dt*1000:.0f} ms/batch",
          file=sys.stderr)
    return 0 if parity else 1


if __name__ == "__main__":
    sys.exit(main())
