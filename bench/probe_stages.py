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
    result memoization in the remote runtime."""
    import jax
    import jax.numpy as jnp

    def force(o):
        # block_until_ready does NOT block through the axon tunnel
        # (CLAUDE.md trap): fetch a scalar digest of every output leaf
        # to force completion while moving only bytes.
        for leaf in jax.tree_util.tree_leaves(o):
            np.asarray(jnp.sum(leaf.astype(jnp.float32)))

    t0 = time.time()
    out = fn(*argsets[0])
    force(out)
    t1 = time.time()
    reps = 4
    for i in range(reps):
        out = fn(*argsets[(i + 1) % len(argsets)])
        force(out)
    t2 = time.time()
    print(f"{name}: compile+1st {t1 - t0:.1f} s, "
          f"steady {(t2 - t1) * 1e3 / reps:.1f} ms", flush=True)
    return out


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
        clock("sync metrics", fA, (recs,), (recs * 1.01,))
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

    if "back" in stages:
        front = dict(
            llrs=jnp.asarray(rng.normal(
                2, 1, (batch, 65536)).astype(np.float32)),
            p0=jnp.zeros(batch, jnp.int32),
            cfo_rad=jnp.zeros(batch, jnp.float32),
            snr=jnp.zeros((batch, pipe.cfg.mode.cons_rows), jnp.float32),
            sync_gate=jnp.ones(batch, bool))
        _, back_fn = pipe._staged_fns(batch)
        front2 = dict(front, llrs=front["llrs"] * 1.01)
        clock("fec back-end", back_fn, (front,), (front2,))


if __name__ == "__main__":
    main()
