#!/usr/bin/env python3
"""Minimal compiled-form probe for ops/pallas_group.py (Mosaic debugging)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from curvecloudnet_tpu.ops import pallas_group

aggr = sys.argv[1] if len(sys.argv) > 1 else "max"
m = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
k = int(sys.argv[3]) if len(sys.argv) > 3 else 65
tile_m = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

c1 = 64
dims, att_dims = (128, 192, 256), (256, 256)
r = np.random.default_rng(0)
h1 = jnp.asarray(r.normal(size=(1, m, k, c1)), jnp.bfloat16)
mask = jnp.asarray(r.random((1, m, k)) > 0.3)
aff = (jnp.asarray(r.random(c1) + 0.5, jnp.float32),
       jnp.asarray(r.normal(size=c1) * 0.1, jnp.float32))


def mk(prev, ds):
    out = []
    for d in ds:
        out.append((jnp.asarray(r.normal(size=(prev, d)) / np.sqrt(prev),
                                jnp.float32),
                    jnp.asarray(r.normal(size=d) * 0.1, jnp.float32)))
        prev = d
    return tuple(out), prev


loc, last = mk(c1, dims)
att, _ = mk(last, att_dims)

t0 = time.time()
out = pallas_group.fused_group_reduce(
    h1, mask, aff, loc, att if aggr == "attend" else None, aggr=aggr,
    tile_m=tile_m)
jax.block_until_ready(out)
print(f"compiled+ran in {time.time()-t0:.1f}s out={out.shape}", flush=True)

# steady-state timing
for _ in range(2):
    t0 = time.time()
    for _ in range(10):
        out = pallas_group.fused_group_reduce(
            h1, mask, aff, loc, att if aggr == "attend" else None, aggr=aggr,
            tile_m=tile_m)
    jax.block_until_ready(out)
    print(f"10 iters: {(time.time()-t0)*100:.2f} ms/iter", flush=True)

# per-call blocked timing with varying inputs (rule out dispatch artifacts)
h1s = [jnp.asarray(np.random.default_rng(i).normal(size=(1, m, k, c1)),
                   jnp.bfloat16) for i in range(3)]
ts = []
for i in range(6):
    t0 = time.time()
    o = pallas_group.fused_group_reduce(
        h1s[i % 3], mask, aff, loc, att if aggr == "attend" else None,
        aggr=aggr, tile_m=tile_m)
    jax.block_until_ready(o)
    ts.append((time.time() - t0) * 1000)
print("blocked ms:", [f"{t:.2f}" for t in ts], flush=True)
