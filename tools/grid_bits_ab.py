"""A/B grid-kNN hash-table size on the real chip.

The plane gathers are DRAM-page-locality bound: a 400MB bucket table
(default_hash_bits = ceil_log2(n)) scatters fetches across pages, while
the same fetch count from a 100MB table rides row-buffer hits (measured
at the KITTI 36864 proven row: 6.5 -> 18.6 ms when the table grew 4x).
This sweeps hash_bits at the big KITTI operating points; recall safety of
smaller tables (more cell merges sharing one cap) is pinned separately by
tests/test_grid_recall.py at the same bits.

Usage: PYTHONPATH=/root/repo python tools/grid_bits_ab.py
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

ITERS = 8


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


def case(n, k, radius, cap, bits_list):
    rng = np.random.default_rng(0)
    pos, _, _, valid, _ = synthetic_lidar_batch(rng, 1, n)
    pos = jnp.asarray(pos)
    valid = jnp.asarray(valid)
    base_idx = None
    for bits in bits_list:
        fn = functools.partial(g.grid_knn, k=k, radius=radius, cap=cap,
                               overflow_planes=2, hash_bits=bits)
        dt = chained(fn, pos, pos, valid, valid)
        idx, _ = fn(pos, pos, valid, valid)
        si = np.sort(np.asarray(idx[0]), axis=-1)
        agree = (1.0 if base_idx is None
                 else float((si == base_idx).mean()))
        if base_idx is None:
            base_idx = si
        print(f"  n={n} r={radius} cap={cap} bits={bits}: {dt*1e3:8.2f} ms"
              f"  set-agreement vs first: {agree:.5f}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    case(73728, 32, 0.04, 192, [17, 15, 14, 13, 12])
    case(23040, 32, 0.04, 192, [15, 13, 12, 11])
