"""Pallas-kernel-on-REAL-CHIP vs the cached exact-oracle outcomes,
ab_scl seeding, across the sensitivity edge."""
import json, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
from modem_tpu import apply_env_platform
apply_env_platform()
import jax.numpy as jnp
from modem_tpu.fec.polar import PolarCode
from modem_tpu.kernels.scl_pallas import make_pallas_decoder

code = PolarCode(n=64800, k=43072, order=16)
with open("/root/repo/bench/ab_scl_oracle_64800.json") as f:
    oracle = json.load(f)
dec = make_pallas_decoder(code.frozen, 8, frames_per_cell=4)
import jax
dec_j = jax.jit(dec)

def frame(seed):
    rng = np.random.default_rng(seed)
    m = rng.integers(0, 2, code.mesg_bits, dtype=np.uint8)
    m[code.k:] = 0
    cw = code.encode_systematic_np(m)
    tx = 1.0 - 2.0 * code.shorten_np(cw).astype(np.float64)
    return cw, tx, rng

N = 100
for sigma in (0.64, 0.68, 0.70, 0.72, 0.76):
    cws, llrs = [], []
    for i in range(N):
        seed = int(sigma * 1000) * 100000 + i
        cw, tx, rng = frame(seed)
        rx = tx + sigma * rng.standard_normal(code.n)
        llrs.append(code.lengthen_np(2.0 * rx / sigma**2).astype(np.float32))
        cws.append(cw)
    hits_p = hits_np = agree = 0
    for j in range(0, N, 4):
        cands, _ = dec_j(jnp.asarray(np.stack(llrs[j:j+4])))
        cands = np.asarray(cands)
        for k in range(4):
            i = j + k
            hp = bool((cands[k] == cws[i]).all(axis=1).any())
            ho = oracle[f"{sigma}:{i}"]
            hits_p += hp; hits_np += ho; agree += (hp == ho)
    print(f"sigma {sigma}: pallas-chip {hits_p}/{N}  oracle {hits_np}/{N}  agree {agree}/{N}", flush=True)
