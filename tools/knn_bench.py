"""Microbench: Pallas kNN kernel at flagship sizes on the real chip.

Scan-chained timing (per-dispatch tunnel latency would otherwise dominate);
correctness checked against the XLA brute-force reference with the kernel's
documented distance quantization tolerance (low log2(tile_n) mantissa bits
of d^2 are traded for the packed index).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/knn_bench.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.ops.pallas_knn import knn_pallas

ITERS = 20


def chained_time(fn, q, pos, qv, pv):
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


def run(q_n, n, k, radius):
    rng = np.random.default_rng(0)
    pos, _, _, valid, _ = synthetic_lidar_batch(rng, 1, n)
    pos = jnp.asarray(pos)
    valid = jnp.asarray(valid)
    if q_n <= n:
        stride = n // q_n
        q = pos[:, ::stride][:, :q_n]
        qv = valid[:, ::stride][:, :q_n]
    else:
        reps = -(-q_n // n)
        q = jnp.tile(pos, (1, reps, 1))[:, :q_n]
        q = q + 0.01 * jnp.asarray(rng.normal(size=q.shape), jnp.float32)
        qv = jnp.tile(valid, (1, reps))[:, :q_n]

    fn = functools.partial(knn_pallas, k=k, radius=radius)
    dt = chained_time(fn, q, pos, qv, valid)

    out = jax.jit(fn)(q, pos, qv, valid)
    from curvecloudnet_tpu.ops import neighbors
    neighbors.KNN_BACKEND = "xla"
    ref = neighbors.knn(q, pos, qv, valid, k, radius=radius)
    neighbors.KNN_BACKEND = "auto"
    d_p, d_x = np.asarray(out[1]), np.asarray(ref[1])
    finite = d_x < 1e20
    ok = np.isclose(d_p[finite], d_x[finite], rtol=1e-3, atol=1e-4).mean()
    vm = ((d_p < 1e20) != finite).mean()
    print(f"q={q_n:6d} n={n:6d} k={k:3d} r={radius}  {dt*1e3:7.2f} ms  "
          f"dist-ok={ok:.4f} validity-mismatch={vm:.5f}", flush=True)


CASES = [
    (18432, 18432, 32, None),   # flagship first table row (36864 pad)
    (16384, 16384, 32, None),
    (16384, 16384, 20, 0.04),
    (9216, 9216, 32, None),
    (4096, 4096, 32, None),
    (36864, 18432, 3, None),    # fp 3-NN upsample
    (16384, 8192, 3, None),
]
BIG = [                          # KITTI-scale rows (CCN_KNN_BIG=1)
    (32768, 32768, 20, 0.3),     # the decoder-sgcnn hazard row (exact)
    (32768, 32768, 32, None),
    (65536, 65536, 20, 0.08),
    (131072, 131072, 20, 0.04),
]

if __name__ == "__main__":
    import os
    print(f"device: {jax.devices()[0]}")
    if os.environ.get("CCN_KNN_SWEEP") or os.environ.get("CCN_KNN_VARIANT"):
        # the aabb/mxu/gated experiment kernels were deleted in round 4
        # (numbers preserved in docs/ROADMAP.md); a sweep would silently
        # re-bench the same v2 kernel under different labels
        raise SystemExit("CCN_KNN_SWEEP/CCN_KNN_VARIANT are gone: only the "
                         "v2 kernel remains (see docs/ROADMAP.md for the "
                         "closed experiments)")
    cases = CASES + (BIG if os.environ.get("CCN_KNN_BIG") == "1" else [])
    for case in cases:
        try:
            run(*case)
        except Exception as e:
            print(f"case {case}: FAIL {str(e).splitlines()[0][:100]}",
                  flush=True)
