#!/usr/bin/env python
"""Per-stage compile/steady-state timings on real hardware.

Isolates which piece of the batched decode graph is responsible for
long remote compiles: sync metrics, the full demod front-end, the
Pallas SCL kernel at various frames_per_cell, and the FEC back-end.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def clock(name, fn, *argsets):
    """argsets: >=1 tuples of args; distinct inputs defeat any
    result memoization in the remote runtime.

    The digest is computed INSIDE one jit so each rep costs exactly
    ONE host fetch: fetching a per-leaf digest costs one ~26 ms tunnel
    round trip PER LEAF and swamped the round-3 stage numbers
    (docs/PERFORMANCE.md trap 8 corollary)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def digest(*a):
        out = fn(*a)
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree_util.tree_leaves(out))

    t0 = time.time()
    np.asarray(digest(*argsets[0]))
    t1 = time.time()
    reps = 4
    best = float("inf")
    # argsets[0] warmed the compile and is never re-timed, and every
    # timed rep gets a DISTINCT input (identical graph+input calls may
    # be memoized remotely; min() would keep the cached rep)
    timed = list(argsets[1:])
    base = argsets[-1]
    while len(timed) < reps:
        s = 1.0 + 0.003 * (len(timed) + 1)
        timed.append(jax.tree_util.tree_map(
            lambda a: a * s if np.issubdtype(
                np.asarray(a).dtype, np.floating) else a, base))
    for i in range(reps):
        t2 = time.time()
        np.asarray(digest(*timed[i % len(timed)]))
        best = min(best, time.time() - t2)
    print(f"{name}: compile+1st {t1 - t0:.1f} s, "
          f"steady(min) {best * 1e3:.1f} ms incl. one fetch",
          flush=True)


def main():
    from modem_tpu import apply_env_platform
    apply_env_platform()
    import jax
    import jax.numpy as jnp

    from modem_tpu.kernels.scl_pallas import make_pallas_decoder
    from modem_tpu.pipeline import BatchPipeline

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    stages = sys.argv[2:] or ["sync", "front", "scl", "back"]
    rng = np.random.default_rng(0)
    pipe = BatchPipeline(8000, 6)

    if "sync" in stages or "front" in stages:
        T = 88320
        recs = jnp.asarray(
            rng.normal(0, .1, (batch, T, 2)).astype(np.float32))
    if "sync" in stages:
        sync = pipe.sync
        fA = jax.jit(jax.vmap(sync._metrics))
        clock("sync metrics (full phase)", fA, (recs,), (recs * 1.01,))
        fA2 = jax.jit(jax.vmap(sync._metrics_parts))
        clock("sync metrics (parts, batch path)", fA2, (recs,),
              (recs * 1.01,))
        if sync.stride_ok(8):
            fA3 = jax.jit(jax.vmap(
                lambda x: sync._metrics_parts_strided(x, 8)))
            clock("sync metrics (strided S=8)", fA3, (recs,),
                  (recs * 1.01,))
    if "front" in stages:
        fB = jax.jit(jax.vmap(pipe._demod_one))
        clock("front demod", fB, (recs,), (recs * 1.01,))

    if "scl" in stages:
        llrs = jnp.asarray(
            rng.normal(2, 1, (batch, 65536)).astype(np.float32))
        for F in (1, 2, 4, 8):
            if batch % F:
                continue
            fC = jax.jit(make_pallas_decoder(
                pipe.code.frozen, 8, frames_per_cell=F))
            clock(f"pallas SCL F={F} bf16beta", fC, (llrs,),
                  (llrs * 1.01,), (llrs * 0.99,))

    if "back" in stages or "sc" in stages:
        front = dict(
            llrs=jnp.asarray(rng.normal(
                2, 1, (batch, 65536)).astype(np.float32)),
            p0=jnp.zeros(batch, jnp.int32),
            cfo_rad=jnp.zeros(batch, jnp.float32),
            snr=jnp.zeros((batch, pipe.cfg.mode.cons_rows), jnp.float32),
            sync_gate=jnp.ones(batch, bool),
            multiframe=jnp.zeros(batch, bool))
        front2 = dict(front, llrs=front["llrs"] * 1.01)
    if "back" in stages:
        _, back_fn = pipe._staged_fns(batch)
        clock("fec back-end (L=8)", back_fn, (front,), (front2,))
    if "sc" in stages:
        # adaptive-path pieces (docs/SCL_KERNEL.md §8): the L=1 SC
        # kernel alone (loop and unrolled) and the SC back-end
        # (kernel + CRC select) — the select cost is the difference
        sc_pipe = BatchPipeline(8000, 6, list_size=1)
        llrs = front["llrs"]
        for unroll in (False, True):
            if unroll and "scunroll" not in stages:
                continue
            fD = jax.jit(make_pallas_decoder(
                sc_pipe.code.frozen, 1,
                frames_per_cell=sc_pipe._auto_frames_per_cell(batch),
                unroll=unroll))
            clock(f"pallas SC L=1 unroll={unroll}", fD, (llrs,),
                  (llrs * 1.01,), (llrs * 0.99,))
        _, sc_back = sc_pipe._staged_fns(batch)
        clock("sc back-end (kernel + select)", sc_back, (front,),
              (front2,))


if __name__ == "__main__":
    main()
