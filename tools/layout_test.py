#!/usr/bin/env python3
"""Check whether re-laying-out parameters to the compiled executable's
preferred input formats removes the per-call weight copies."""

import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from curvecloudnet_tpu.config import load_config
from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import (
    CurveCloudNet, cloud_from_arrays, parse_model_config,
)

n_points = int(os.environ.get("PROF_POINTS", 32768))
cfg = load_config("configs/nuscenes.yaml")
spec = parse_model_config(cfg["model"], in_dim=4, n_out=17)
model = CurveCloudNet(spec, n_points=n_points)
rng = np.random.default_rng(0)
pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 1, n_points)
cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                          jnp.asarray(valid), jnp.asarray(feat))
key = jax.random.PRNGKey(0)
variables = jax.jit(lambda c: model.init(
    {"params": key, "dropout": key}, c, train=False, key=key))(cloud)

fwd = jax.jit(lambda v, c: model.apply(v, c, train=False,
                                       key=jax.random.PRNGKey(0))[0])


def timed(tag, v, c, iters=6):
    out = fwd(v, c); out.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.time(); out = fwd(v, c); out.block_until_ready()
        ts.append(time.time() - t0)
    print(f"{tag}: min {min(ts)*1e3:.1f} ms  med {sorted(ts)[len(ts)//2]*1e3:.1f} ms")


timed("as-initialized", variables, cloud)

lowered = fwd.lower(variables, cloud)
compiled = lowered.compile()
try:
    fmts = compiled.input_formats
    v2, c2 = jax.device_put((variables, cloud), fmts[0])
    timed("relayout to input_formats", v2, c2)
except Exception as e:
    print("input_formats path failed:", type(e).__name__, e)
    try:
        layouts = compiled.input_layouts
        v2, c2 = jax.device_put((variables, cloud), layouts[0])
        timed("relayout to input_layouts", v2, c2)
    except Exception as e2:
        print("input_layouts path failed:", type(e2).__name__, e2)
