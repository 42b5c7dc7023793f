"""Is the SCL kernel's serial op cost issue-THROUGHPUT or dependence-
LATENCY?  (round 5; decides the last open redesign lever)

docs/SCL_KERNEL.md §7d concluded "no meaningful stall time" from the
rank_select experiment, §7i concluded "loop-iteration issue latency" —
if the truth is latency (stalls on the serial dependence chain), then
interleaving TWO INDEPENDENT frame-sets' schedules in one kernel fills
the stalls and decodes 2x the frames in ~1x the time; if throughput,
interleaving measures ~2x and the amortisation lever is closed for
good (every other lever already measured-and-closed).

Three variants per op mix, R iterations of a serially-dependent body:
  single : one chain, R iters
  dual   : two independent chains, R iters each (2x work, same depth)
  double : one chain, 2R iters (2x work, 2x depth)
latency-bound  => dual ~= single;  throughput-bound => dual ~= double.

Op mixes mirror the two schedule cost classes:
  chain: minsum F + masked reduce + broadcast add ([P,128] streaming)
  leaf : one extraction round + per-frame row reduce + one-hot
         permute matmul (the select_flat/least_reliable mix)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import modem_tpu  # noqa: E402  (pins platform)

P = 128
BIG = 3.0e38
L = 8
F = P // L


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def chain_body(x, pm):
    """minsum-ish chain op: [P,128] streaming + a [P,1] reduce."""
    y = jnp.concatenate([x[:, 64:], x[:, :64]], axis=1)
    s = jnp.sign(x) * jnp.sign(y)
    m = jnp.minimum(jnp.abs(x), jnp.abs(y))
    out = s * m
    pen = jnp.sum(jnp.maximum(-out, 0.0), axis=1, keepdims=True)
    pm2 = pm + 1e-6 * pen.T
    # keep magnitudes bounded so the chain never over/underflows
    out = jnp.where(jnp.abs(out) > 4.0, out * 0.5, out + 0.125)
    return out, pm2


def leaf_body(x, pm):
    """One extraction round + per-frame reduce + permute matmul."""
    i128 = iota2((P, 128), 1)
    lane_iota = iota2((F, P), 1)
    gmask = lane_iota // L == iota2((F, P), 0)
    colmin = jnp.min(x, axis=1, keepdims=True)            # [P,1]
    colat = jnp.min(jnp.where(x == colmin, i128, 128),
                    axis=1, keepdims=True)                # [P,1]
    rowm = jnp.where(gmask, jnp.broadcast_to(colmin.T, (F, P)), BIG)
    m = jnp.min(rowm, axis=1, keepdims=True)              # [F,1]
    at = jnp.min(jnp.where(rowm == m, lane_iota, P),
                 axis=1, keepdims=True)                   # [F,1]
    lane_frame = iota2((P, F), 0) // L
    fsel = (iota2((P, F), 1) == lane_frame).astype(jnp.float32)
    at_p = jnp.round(
        jnp.dot(fsel, at.astype(jnp.float32),
                preferred_element_type=jnp.float32)).astype(jnp.int32)
    perm = (at_p + iota2((P, 1), 0)) % P
    pmat = (iota2((P, P), 1) == perm).astype(jnp.float32)
    x2 = jnp.dot(pmat, x, preferred_element_type=jnp.float32)
    hit = (iota2((P, 1), 0) == at_p) & (i128 == colat)
    x2 = jnp.where(hit, x2 + 1.0, x2)
    x2 = jnp.where(jnp.abs(x2) > 4.0, x2 * 0.5, x2 + 0.0625)
    pm2 = pm + 1e-6 * jnp.min(m) * jnp.ones((1, P), jnp.float32)
    return x2, pm2


def make_probe(body, n_chains: int, reps: int):
    def kernel(x_ref, o_ref):
        def run(i, st):
            xs = st[:-1]
            pm = st[-1]
            out = []
            for c, x in enumerate(xs):
                x2, pm = body(x, pm)
                out.append(x2)
            return (*out, pm)

        init = tuple(x_ref[c] for c in range(n_chains)) + (
            jnp.zeros((1, P), jnp.float32),)
        st = jax.lax.fori_loop(0, reps, run, init)
        acc = st[-1]
        for c in range(n_chains):
            acc = acc + jnp.sum(st[c], axis=0, keepdims=True)
        o_ref[...] = acc

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn


def time_fn(fn, mk_input, n=5):
    best = np.inf
    for i in range(n):
        x = mk_input(i + 1)
        t0 = time.time()
        r = np.asarray(fn(x))
        dt = time.time() - t0
        if i:                       # first rep pays compile
            best = min(best, dt)
        assert np.all(np.isfinite(r)), "probe diverged"
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rng = np.random.default_rng(0)

    def mk(seed):
        r = np.random.default_rng(seed)
        return r.normal(0, 1, (2, P, 128)).astype(np.float32)

    for name, body in (("chain", chain_body), ("leaf", leaf_body)):
        single = make_probe(body, 1, reps)
        dual = make_probe(body, 2, reps)
        double = make_probe(body, 1, 2 * reps)
        t1 = time_fn(single, mk)
        t2 = time_fn(dual, mk)
        t3 = time_fn(double, mk)
        print(f"{name}: single {t1 * 1e3:8.2f} ms   "
              f"dual {t2 * 1e3:8.2f} ms ({t2 / t1:.2f}x)   "
              f"double {t3 * 1e3:8.2f} ms ({t3 / t1:.2f}x)")
        verdict = ("LATENCY-bound: interleaving is the lever"
                   if t2 < 0.6 * t3 else
                   "THROUGHPUT-bound: amortisation closed")
        print(f"       -> {verdict}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "width":
        pass     # handled by width_main at the bottom
    else:
        main()


def make_width_probe(body_w, width: int, reps: int):
    """Single chain over [P, width] — measures whether doubling the
    minor (width) axis of every op is free (slab frame-packing)."""
    def kernel(x_ref, o_ref):
        def run(i, st):
            x, pm = st
            return body_w(x, pm, width)

        st = jax.lax.fori_loop(
            0, reps, run,
            (x_ref[0, :, :width], jnp.zeros((1, P), jnp.float32)))
        o_ref[...] = st[1] + jnp.sum(st[0][:, :128], axis=0,
                                     keepdims=True)

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn


def leaf_width_body(x, pm, w):
    """Width-axis leaf mix on [P, w]: extraction-round reduces, MACs,
    mask updates — the part of a leaf op slab packing must NOT double."""
    iw = iota2((P, w), 1)
    colmin = jnp.min(x, axis=1, keepdims=True)
    colat = jnp.min(jnp.where(x == colmin, iw, w), axis=1,
                    keepdims=True)
    acc = x + colmin * 0.125
    acc = jnp.where(iw == colat, acc + 1.0, acc)
    m2 = jnp.min(jnp.where(iw == colat, BIG, acc), axis=1,
                 keepdims=True)
    acc = acc + m2 * 0.0625
    x2 = jnp.where(jnp.abs(acc) > 4.0, acc * 0.5, acc + 0.03125)
    return x2, pm + 1e-6 * jnp.sum(colmin) * jnp.ones((1, P),
                                                      jnp.float32)


def width_main():
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50000

    def mk(seed):
        r = np.random.default_rng(seed)
        return r.normal(0, 1, (1, P, 256)).astype(np.float32)

    for w in (128, 256):
        fn = make_width_probe(leaf_width_body, w, reps)
        t = time_fn(fn, mk)
        print(f"width {w}: {t * 1e3:8.2f} ms ({reps} reps)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "width":
    width_main()
