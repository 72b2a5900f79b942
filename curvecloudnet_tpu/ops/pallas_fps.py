"""Pallas TPU kernel: farthest point sampling.

FPS is inherently serial (each pick depends on the running min-distance
field), so the XLA formulation pays per-iteration loop overhead on a
(B, N) array in HBM (~15-40 ms per call at lidar scale, from the v5e
profile).  Here the whole loop runs inside one kernel with the position
planes and the min-distance field resident in VMEM: per pick, one dynamic
scalar read + a fused distance/min/argmax sweep on the VPU.

Matches ops.sampling.fps semantics: ceil(n_valid * ratio) picks per sample
(slots beyond a sample's own K are invalidated by the wrapper), optional
random start, ascending index order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -1e30


def _fps_kernel(start_ref, px_ref, py_ref, pz_ref, valid_ref, out_ref,
                mind2_ref, *, budget: int, lanes: int):
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, px_ref.shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, px_ref.shape, 1)
    flat = sub_iota * lanes + lane_iota
    valid = valid_ref[:] > 0
    mind2_ref[:] = jnp.where(valid, 1e30, _NEG)
    start = start_ref[pl.program_id(0)]

    def body(i, last):
        # select the last-picked point's coords with a masked reduction —
        # Mosaic cannot prove alignment for arbitrary-lane scalar VMEM reads
        hit = (flat == last).astype(jnp.float32)
        lx = jnp.sum(px_ref[:] * hit)
        ly = jnp.sum(py_ref[:] * hit)
        lz = jnp.sum(pz_ref[:] * hit)
        d2 = ((px_ref[:] - lx) ** 2 + (py_ref[:] - ly) ** 2
              + (pz_ref[:] - lz) ** 2)
        mind2 = jnp.minimum(mind2_ref[:], d2)
        mind2_ref[:] = mind2
        cand = jnp.where(valid, mind2, _NEG)
        m = jnp.max(cand)
        nxt = jnp.min(jnp.where(cand == m, flat, jnp.int32(2**30)))
        out_ref[pl.ds(i, 1), 0] = last[None]
        return nxt

    jax.lax.fori_loop(0, budget, body, start)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("budget", "interpret"))
def _fps_pallas_batched(pos, valid, start, budget: int,
                        interpret: bool = False):
    """pos (B, N, 3), valid (B, N), start (B,) -> (B, budget) indices.

    One pallas_call with the batch as the grid (a vmapped call would try to
    slice the SMEM scalar input, which Mosaic rejects)."""
    b, n, _ = pos.shape
    n_pad = _round_up(max(n, _LANES * 8), _LANES * 8)
    sub = n_pad // _LANES
    pos = jnp.pad(pos.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    v = jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, n_pad - n)))
    planes = [pos[:, :, c].reshape(b, sub, _LANES) for c in range(3)]
    vplane = v.reshape(b, sub, _LANES)

    plane_spec = pl.BlockSpec((None, sub, _LANES), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_kernel, budget=budget, lanes=_LANES),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # start (B,) whole array
            plane_spec, plane_spec, plane_spec, plane_spec,
        ],
        out_specs=pl.BlockSpec((None, budget, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, budget, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((sub, _LANES), jnp.float32)],
        interpret=interpret,
    )(start.astype(jnp.int32), *planes, vplane)
    return out[:, :, 0]


def fps_pallas(pos, valid, ratio: float, key=None, budget=None,
               interpret: bool = False):
    """Batched Pallas FPS with the ops.sampling.fps interface."""
    from . import segments

    b, n, _ = pos.shape
    if budget is None:
        budget = max(1, int(-(-n * ratio // 1)))
    budget = min(budget, n)
    lengths = segments.lengths_from_valid(valid)
    k_per_sample = jnp.minimum(
        jnp.ceil(lengths.astype(jnp.float32) * ratio).astype(jnp.int32),
        budget)
    if key is None:
        start = jnp.zeros((b,), jnp.int32)
    else:
        u = jax.random.uniform(key, (b,))
        start = (u * jnp.maximum(lengths, 1).astype(jnp.float32)).astype(
            jnp.int32)
        start = jnp.minimum(start, jnp.maximum(lengths - 1, 0))

    sel = _fps_pallas_batched(pos, valid, start, budget, interpret)

    slot_valid = (jnp.arange(budget, dtype=jnp.int32)[None, :]
                  < k_per_sample[:, None])
    sort_key = jnp.where(slot_valid, sel, n + 1)
    order = jnp.argsort(sort_key, axis=-1)
    sel = jnp.take_along_axis(sel, order, axis=-1)
    slot_valid = jnp.take_along_axis(slot_valid, order, axis=-1)
    sel = jnp.where(slot_valid, sel, 0)
    return jnp.clip(sel, 0, n - 1), slot_valid
