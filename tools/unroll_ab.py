#!/usr/bin/env python3
"""A/B the extraction-round unroll on real TPU shapes.

CCN_TOPK_UNROLL gates the grid-tail kernel, CCN_KNN_UNROLL the brute kNN
kernel (independent defaults — the measured winners differ; see the
_unrolled/_unroll_k docstrings).  Run with each var 0/1 to reproduce.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")
    rng = np.random.default_rng(0)

    from curvecloudnet_tpu.ops import pallas_topk as pt
    from curvecloudnet_tpu.ops import pallas_knn as pk

    # --- grid extraction shape (step_3-like): Q=23040, ncells=10, cap=192
    q, ncells, cap, k, nb = 23040, 10, 192, 20, 8196
    table = rng.normal(size=(nb + 1, cap * 4)).astype(np.float32) ** 2
    # idx field: biased encoding with plausible validity
    idxs = rng.integers(0, 23040, size=(nb + 1, cap)).astype(np.int32)
    bias = (0x40000000 | (idxs + 1)).view(np.float32)
    table[:, 3 * cap:] = bias
    nbrb = rng.integers(0, nb, size=(q, ncells)).astype(np.int32)
    query = rng.normal(size=(q, 3)).astype(np.float32)
    qv = np.ones(q, bool)

    def run_grid(tb, nbq, qq, qvv):
        return pt.grid_topk_records(tb, nbq, qq, qvv, k=k, cap=cap,
                                    radius=1.0, idx_bound=23040)

    jit_grid = jax.jit(run_grid)
    args = (jnp.asarray(table), jnp.asarray(nbrb), jnp.asarray(query),
            jnp.asarray(qv))
    ms = timed(jit_grid, *args)
    print(f"grid_topk q={q} cap={cap} k={k} "
          f"unroll={pt._unrolled()}: {ms:.2f} ms")

    # --- brute kNN shape (16k table-like): Q=15872, N=18432, k=32
    qn, n, kk = 15872, 18432, 32
    pts = (rng.normal(size=(n, 3)) * 0.3).astype(np.float32)
    qry = pts[rng.permutation(n)[:qn]] + rng.normal(size=(qn, 3)).astype(
        np.float32) * 0.01
    f = jax.jit(lambda a, b: pk.knn_pallas_single(
        a, b, jnp.ones(qn, bool), jnp.ones(n, bool), kk, radius=0.08))
    ms = timed(f, jnp.asarray(qry), jnp.asarray(pts), iters=20)
    print(f"knn_pallas q={qn} n={n} k={kk} "
          f"unroll={os.environ.get('CCN_KNN_UNROLL', '1')}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
