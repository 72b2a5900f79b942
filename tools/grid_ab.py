"""A/B the grid-kNN strip-table layout on the real chip.

Scan-chained timing of ops.grid_knn.grid_knn at the KITTI/nuScenes grid
operating points, strip=1 (per-cell rows, 27+2 fetches/query) vs strip=3
(3-cell strip rows, 9+2 fetches/query).  Also cross-checks that both
layouts return the same neighbor SETS (order within distance ties may
differ; compares sorted index sets per query).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/grid_ab.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.ops import grid_knn as g

ITERS = 10


def chained(fn, q, pos, qv, pv):
    def run(c):
        def body(carry, _):
            idx, dist = fn(q + carry * 1e-12, pos, qv, pv)
            return carry * 0 + jnp.sum(dist[:, :1, :1]) * 1e-30, None

        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    f = jax.jit(run)
    f(jnp.float32(0)).block_until_ready()
    t0 = time.time()
    f(jnp.float32(0)).block_until_ready()
    return (time.time() - t0) / ITERS


def case(n, k, radius, cap):
    rng = np.random.default_rng(0)
    pos, _, _, valid, _ = synthetic_lidar_batch(rng, 1, n)
    pos = jnp.asarray(pos)
    valid = jnp.asarray(valid)
    out = {}
    for strip in (1, 3):
        fn = functools.partial(g.grid_knn, k=k, radius=radius, cap=cap,
                               overflow_planes=2, strip=strip)
        dt = chained(fn, pos, pos, valid, valid)
        idx, dist = fn(pos, pos, valid, valid)
        out[strip] = (dt, np.sort(np.asarray(idx[0]), axis=-1))
        print(f"  n={n} r={radius} cap={cap} strip={strip}: "
              f"{dt * 1e3:8.2f} ms")
    a, b = out[1][1], out[3][1]
    agree = float((a == b).mean())
    print(f"  set agreement strip1 vs strip3: {agree:.6f}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    case(73728, 32, 0.04, 192)
    case(36864, 32, 0.10, 128)
    case(131072, 32, 0.04, 192)
