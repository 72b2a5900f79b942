"""Pallas TPU kernel: masked top-k-smallest over the last axis.

Serves the grid-kNN tail (ops/grid_knn.py): selecting k of 27*cap
candidates per query.  ``lax.top_k`` lowers to a full-width sort and an
XLA-level min-extraction loop re-materializes the (Q, W) array in HBM every
round; here each query tile's candidates stay VMEM-resident for all k
rounds.

Packing scheme (as ops/pallas_knn.py): values are non-negative f32, so
``(value_bits & ~(pw-1)) | column`` orders like the values and a round is a
lane-min plus compare-selects.  The low log2(next_pow2(W)) mantissa bits of
the returned values are quantized (~2^-10 relative at W=5184).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30


def _topk_kernel(d_ref, i_ref, out_d, out_i, *, k: int, w: int,
                 tile_q: int):
    pw = 1
    while pw < w:
        pw *= 2
    low_mask = pw - 1
    sent = jnp.int32(0x7F800000 | low_mask)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, w), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)

    bits = jax.lax.bitcast_convert_type(d_ref[:], jnp.int32)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(bits, jnp.int32(~low_mask)), col)
    ivals = i_ref[:]

    # packed entries are distinct per row (col low bits), so round j+1's
    # min is taken over entries strictly greater than round j's — the
    # packed matrix is never rewritten (drops a (TQ, W) VMEM store per
    # round; same trick as ops/pallas_knn.py, measured -31% there).
    def body(j, st):
        best_d, best_i, m_prev = st
        m = jnp.min(jnp.where(packed > m_prev, packed, sent),
                    axis=-1, keepdims=True)                  # (TQ, 1)
        sel = packed == m
        ival = jnp.sum(jnp.where(sel, ivals, 0), axis=-1,
                       keepdims=True)
        dval = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(m, jnp.int32(~low_mask)), jnp.float32)
        at = slot == j
        best_d = jnp.where(at, dval, best_d)
        best_i = jnp.where(at, ival, best_i)
        return best_d, best_i, m

    best_d = jnp.full((tile_q, k), _INF, jnp.float32)
    best_i = jnp.full((tile_q, k), -1, jnp.int32)
    best_d, best_i, _ = jax.lax.fori_loop(
        0, k, body,
        (best_d, best_i, jnp.full((tile_q, 1), jnp.int32(-2**31))))
    good = best_d < _INF * 0.98
    out_d[:] = jnp.where(good, best_d, _INF)
    out_i[:] = jnp.where(good, best_i, -1)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "interpret"))
def topk_smallest(d: jax.Array, idx: jax.Array, k: int,
                  tile_q: int | None = None, interpret: bool = False):
    """Per-row k smallest of ``d`` (Q, W) with carried values ``idx``.

    Entries with d >= ~1e30 count as invalid (-1 fills).  Returns
    (values (Q, k), idx (Q, k)) ascending, with the documented low-bit
    value quantization.
    """
    q, w = d.shape
    if tile_q is None:
        # ~6 live (tile_q, W) f32 arrays must fit the 16MB scoped-vmem stack
        tile_q = max(8, min(256, (12_000_000 // (24 * w)) // 8 * 8))
    qp = _round_up(q, tile_q)
    d = jnp.pad(d.astype(jnp.float32), ((0, qp - q), (0, 0)),
                constant_values=_INF)
    idx = jnp.pad(idx.astype(jnp.int32), ((0, qp - q), (0, 0)),
                  constant_values=-1)
    kernel = functools.partial(_topk_kernel, k=k, w=w, tile_q=tile_q)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(qp // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ],
        interpret=interpret,
    )(d, idx)
    return out_d[:q], out_i[:q]
