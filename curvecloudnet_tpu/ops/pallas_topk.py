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


def _grid_topk_kernel(cand_ref, q_ref, qv_ref, out_d, out_i, packed_s,
                      ival_s, *, k: int, cap: int, ncells: int, tile_q: int,
                      r2: float):
    """Distances + radius mask + packed min-extraction over raw grid rows.

    cand_ref: (tile_q, ncells*cap*4) f32 — gathered bucket rows in the
    table's channel-major layout [x*cap, y*cap, z*cap, idxbits*cap] per
    cell (ops/grid_knn.py builds them); the (Q, 27, cap) distance/index
    planes that the XLA path materializes in HBM never exist here.
    """
    w = ncells * cap
    pw = 1
    while pw < w:
        pw *= 2
    low_mask = pw - 1
    sent = jnp.int32(0x7F800000 | low_mask)
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    qv = qv_ref[:, 0:1] > 0
    colc = jax.lax.broadcasted_iota(jnp.int32, (tile_q, cap), 1)

    for c in range(ncells):
        base = c * cap * 4
        px = cand_ref[:, base:base + cap]
        py = cand_ref[:, base + cap:base + 2 * cap]
        pz = cand_ref[:, base + 2 * cap:base + 3 * cap]
        ib = jax.lax.bitcast_convert_type(
            cand_ref[:, base + 3 * cap:base + 4 * cap], jnp.int32)
        d2 = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
        good = (ib >= 0) & (d2 <= r2) & qv
        bits = jax.lax.bitcast_convert_type(
            jnp.where(good, d2, _INF), jnp.int32)
        packed_s[:, c * cap:(c + 1) * cap] = jnp.bitwise_or(
            jnp.bitwise_and(bits, jnp.int32(~low_mask)), colc + c * cap)
        ival_s[:, c * cap:(c + 1) * cap] = ib

    packed = packed_s[:]
    ivals = ival_s[:]
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)

    def body(j, st):
        best_d, best_i, m_prev = st
        m = jnp.min(jnp.where(packed > m_prev, packed, sent),
                    axis=-1, keepdims=True)
        sel = packed == m
        ival = jnp.sum(jnp.where(sel, ivals, 0), axis=-1, keepdims=True)
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


@functools.partial(jax.jit,
                   static_argnames=("k", "cap", "ncells", "radius", "tile_q",
                                    "interpret"))
def grid_topk_records(cand: jax.Array, query: jax.Array, q_valid: jax.Array,
                      k: int, cap: int, radius: float, ncells: int = 27,
                      tile_q: int | None = None, interpret: bool = False):
    """Top-k nearest within ``radius`` from raw grid bucket rows.

    cand (Q, ncells*cap*4) f32 rows as gathered from the grid table
    (ops/grid_knn.py record layout), query (Q, 3), q_valid (Q,) ->
    (d2 (Q, k), point-index (Q, k)) with the packed-extraction low-bit
    quantization of :func:`topk_smallest`.
    """
    q = cand.shape[0]
    w = ncells * cap
    if tile_q is None:
        # cand block dominates: ~(4W f32 in + 2W packed/ival scratch) per
        # query row, double-buffered input
        tile_q = max(8, min(256, (48_000_000 // (40 * w)) // 8 * 8))
    qp = _round_up(q, tile_q)
    cand = jnp.pad(cand.astype(jnp.float32), ((0, qp - q), (0, 0)))
    query = jnp.pad(query.astype(jnp.float32), ((0, qp - q), (0, 0)))
    qv = jnp.pad(q_valid.astype(jnp.float32)[:, None], ((0, qp - q), (0, 0)))
    kernel = functools.partial(_grid_topk_kernel, k=k, cap=cap,
                               ncells=ncells, tile_q=tile_q,
                               r2=float(radius) * float(radius))
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(qp // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, 4 * w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
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
        scratch_shapes=[
            pltpu.VMEM((tile_q, w), jnp.int32),
            pltpu.VMEM((tile_q, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cand, query, qv)
    return out_d[:q], out_i[:q]


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
