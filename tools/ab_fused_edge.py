#!/usr/bin/env python3
"""A/B the fused edge kernel on TPU: correctness + speed."""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")
import jax.numpy as jnp

from curvecloudnet_tpu.config import load_config
from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import (
    CurveCloudNet, cloud_from_arrays, parse_model_config,
)

N = int(os.environ.get("AB_POINTS", 32768))
cfg = load_config("configs/nuscenes.yaml")
spec = parse_model_config(cfg["model"], in_dim=4, n_out=17)
model = CurveCloudNet(spec, n_points=N)
rng = np.random.default_rng(0)
pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 1, N)
cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                          jnp.asarray(valid), jnp.asarray(feat))
key = jax.random.PRNGKey(0)
variables = jax.jit(lambda c: model.init(
    {"params": key, "dropout": key}, c, train=False, key=key))(cloud)


def run(fused):
    os.environ["CCN_FUSED_EDGE"] = "1" if fused else "0"
    fwd = jax.jit(lambda v, c: model.apply(
        v, c, train=False, key=jax.random.PRNGKey(0))[0])
    out = fwd(variables, cloud)
    out.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = fwd(variables, cloud)
        out.block_until_ready()
        ts.append(time.time() - t0)
    return np.asarray(out), min(ts)


o0, t0 = run(False)
o1, t1 = run(True)
v = np.asarray(valid)
print("unfused %.1f ms | fused %.1f ms" % (t0 * 1e3, t1 * 1e3))
d = np.abs(o0[v] - o1[v])
print("max logit diff:", float(d.max()), "mean:", float(d.mean()))
