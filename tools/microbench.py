#!/usr/bin/env python3
"""Op-level microbenchmark at flagship (nuScenes, N=32k) sizes.

Each op is iterated inside ONE jit via lax.scan with forced data dependence
(the next iteration's input is perturbed by the previous output), so
per-dispatch overhead and async-timing artifacts cancel out.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 20


def timeit(name, fn, pos_args, perturb_idx=0):
    """Run fn ITERS times chained through a scan; report ms/iter."""

    def chained(args):
        def body(carry, _):
            args = list(pos_args)
            a = args[perturb_idx]
            args[perturb_idx] = a + carry * 1e-12
            out = fn(*args)
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            feedback = sum(jnp.sum(l[..., :1, :1].astype(jnp.float32))
                           for l in leaves) if leaves else jnp.float32(0)
            return carry * 0 + feedback * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    f = jax.jit(chained)
    c = f(0)  # compile+warm
    c.block_until_ready()
    t0 = time.time()
    c = f(0)
    c.block_until_ready()
    dt = (time.time() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
    from curvecloudnet_tpu.ops import curve1d, interpolate, neighbors, sampling
    from curvecloudnet_tpu.ops import grid_knn as gk
    from curvecloudnet_tpu.ops import segments

    rng = np.random.default_rng(0)
    B, N = 1, 32768
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, B, N)
    pos = jnp.asarray(pos); cid = jnp.asarray(cid); valid = jnp.asarray(valid)
    x64 = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))
    print(f"backend={jax.default_backend()}  N={N}  iters={ITERS}", flush=True)

    timeit("knn xla brute k=20 r=0.04 (N->N)",
           functools.partial(neighbors.knn, k=20, radius=0.04),
           [pos, pos, valid, valid])
    timeit("grid_knn k=20 r=0.04 cap=16 (N->N)",
           functools.partial(gk.grid_knn, k=20, radius=0.04),
           [pos, pos, valid, valid])
    timeit("grid_knn k=32 r=0.04 cap=16 (N/2->N)",
           functools.partial(gk.grid_knn, k=32, radius=0.04),
           [pos[:, ::2], pos, valid[:, ::2], valid])
    timeit("voxel_downsample 0.03 budget N/2",
           functools.partial(sampling.voxel_downsample, voxel_size=0.03,
                             budget=N // 2), [pos, valid])
    timeit("curve_fps arclen 0.007 budget N/2",
           functools.partial(sampling.curve_fps, arclen_spacing=0.007,
                             budget=N // 2), [pos, cid, valid])
    timeit("fps ratio 0.3 (N/16 in)",
           functools.partial(sampling.fps, ratio=0.3),
           [pos[:, :N // 16], valid[:, :N // 16]])
    timeit("geodesic_arclength", segments.geodesic_arclength,
           [pos, cid, valid])
    timeit("symmetric_window_concat h=2 C=64",
           lambda x, c, v: curve1d.symmetric_window_concat(x, c, v, 2),
           [x64, cid, valid])
    idx = jnp.broadcast_to(jnp.arange(0, N, 2, dtype=jnp.int32)[None],
                           (B, N // 2))
    iv = jnp.ones((B, N // 2), bool)
    timeit("radius_1d_group r=0.02 w=32",
           functools.partial(curve1d.radius_1d_group_subset, radius=0.02,
                             window=32), [pos, idx, iv, cid, valid])
    timeit("knn_1d_group_superset k=3",
           functools.partial(curve1d.knn_1d_group_superset, k=3),
           [pos, idx, iv, cid, valid])
    m = N // 4
    xm = jnp.asarray(rng.normal(size=(B, m, 128)).astype(np.float32))
    timeit("knn_interpolate k=3 (N/4 -> N/2, C=128)",
           functools.partial(interpolate.knn_interpolate, k=3),
           [xm, pos[:, :m], valid[:, :m], pos[:, :N // 2], valid[:, :N // 2]])
    nbr = jnp.asarray(rng.integers(0, N, size=(B, N, 21)).astype(np.int32))
    x67 = jnp.concatenate([x64, pos], -1)
    w1 = jnp.asarray(rng.normal(size=(134, 64)).astype(np.float32))

    def sgcnn_msg(x, nbr):
        xj = neighbors.gather_neighbors(x, nbr)
        xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
        msg = jnp.concatenate([xj, xi - xj], axis=-1)
        return jnp.max(jnp.einsum("bnkc,cd->bnkd", msg, w1), axis=2)

    timeit("sgcnn gather+concat+mlp64+max (N,K=21,C=67)", sgcnn_msg,
           [x67, nbr])


if __name__ == "__main__":
    main()
