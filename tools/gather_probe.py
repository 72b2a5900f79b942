"""Probe: Mosaic in-kernel dynamic gather throughput on the real TPU.

The fused edge-conv design (docs/ROADMAP.md round-3 item 2) hinges on
gathering neighbor feature rows from a VMEM-resident array inside a Pallas
kernel.  Mosaic lowers ``jnp.take_along_axis(x, idx, axis)`` (indices
broadcast to the operand shape) to ``tpu.dynamic_gather`` for 2D operands —
this script measures whether that's fast on v5e in both orientations:

  A. sublane gather: x (N, H), out[i, h] = x[idx[i], h]
  B. lane gather:    x (H, N), out[h, e] = x[h, idx[e]]

Baseline: the XLA take() gather (~7ns/row measured in round 1).
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")


def _time(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def sublane_kernel(x_ref, idx_ref, out_ref):
    idx = idx_ref[:]                      # (N, 1) int32
    idxb = jnp.broadcast_to(idx, x_ref.shape)
    out_ref[:] = jnp.take_along_axis(x_ref[:], idxb, axis=0,
                                     mode="promise_in_bounds")


def lane_kernel(x_ref, idx_ref, out_ref):
    idx = idx_ref[:]                      # (1, N) int32
    idxb = jnp.broadcast_to(idx, x_ref.shape)
    out_ref[:] = jnp.take_along_axis(x_ref[:], idxb, axis=1,
                                     mode="promise_in_bounds")


@functools.partial(jax.jit, static_argnames=("variant",))
def probe(x, idx, variant):
    if variant == "sublane":
        kern, ispec = sublane_kernel, pl.BlockSpec(
            (x.shape[0], 1), lambda: (0, 0), memory_space=pltpu.VMEM)
    else:
        kern, ispec = lane_kernel, pl.BlockSpec(
            (1, x.shape[1]), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM), ispec],
        out_specs=pl.BlockSpec(x.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, idx)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    for dtype in (jnp.float32, jnp.bfloat16, jnp.int32):
        for n, h in ((4096, 128), (16384, 64), (16384, 128)):
            x = jnp.asarray(rng.normal(size=(n, h)), dtype=dtype)
            perm = rng.integers(0, n, size=n).astype(np.int32)

            # A: sublane
            try:
                idx = jnp.asarray(perm)[:, None]
                t, out = _time(probe, x, idx, "sublane")
                ref = np.asarray(x)[perm]
                ok = np.array_equal(np.asarray(out), ref)
                print(f"sublane {np.dtype(out.dtype).name} ({n},{h}): "
                      f"{t*1e6:.1f} us, {t/n*1e9:.2f} ns/row, ok={ok}")
            except Exception as e:
                print(f"sublane {dtype.__name__} ({n},{h}): FAIL "
                      f"{str(e).splitlines()[0][:120]}")

            # B: lane (transposed layout)
            try:
                xt = x.T.reshape(h, n)
                idx = jnp.asarray(perm)[None, :]
                t, out = _time(probe, xt, idx, "lane")
                ref = np.asarray(x)[perm].T
                ok = np.array_equal(np.asarray(out), ref)
                print(f"lane    {np.dtype(out.dtype).name} ({h},{n}): "
                      f"{t*1e6:.1f} us, {t/n*1e9:.2f} ns/row, ok={ok}")
            except Exception as e:
                print(f"lane    {dtype.__name__} ({h},{n}): FAIL "
                      f"{str(e).splitlines()[0][:120]}")

    # XLA baseline gather for comparison
    for n, h in ((16384, 64),):
        x = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
        perm = jnp.asarray(rng.integers(0, n, size=n).astype(np.int32))
        f = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
        t, _ = _time(f, x, perm)
        print(f"XLA take ({n},{h}): {t*1e6:.1f} us, {t/n*1e9:.2f} ns/row")


if __name__ == "__main__":
    main()
