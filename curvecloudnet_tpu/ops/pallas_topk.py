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


def _grid_topk_kernel(*refs, k: int, cap: int, ncells: int, tile_q: int,
                      r2: float):
    """Distances + radius mask + packed min-extraction over raw grid rows.

    refs: ncells x (tile_q, cap*4) f32 bucket-row planes in the table's
    channel-major layout [x*cap, y*cap, z*cap, idxbits*cap]
    (ops/grid_knn.py builds them), then (tile_q, 4) [qx, qy, qz, valid],
    then outputs + scratch.  One plane per neighbor cell keeps every
    operand 2D and reshape/pad-free — merging them in XLA re-tiles the
    multi-GB candidate array twice (measured 55 ms/step at KITTI scale).
    """
    cand_refs = refs[:ncells]
    q_ref = refs[ncells]
    out_d, out_i = refs[ncells + 1], refs[ncells + 2]
    packed_s, ival_s = refs[ncells + 3], refs[ncells + 4]
    w = ncells * cap
    pw = 1
    while pw < w:
        pw *= 2
    low_mask = pw - 1
    sent = jnp.int32(0x7F800000 | low_mask)
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    qv = q_ref[:, 3:4] > 0
    colc = jax.lax.broadcasted_iota(jnp.int32, (tile_q, cap), 1)

    for c in range(ncells):
        px = cand_refs[c][:, 0:cap]
        py = cand_refs[c][:, cap:2 * cap]
        pz = cand_refs[c][:, 2 * cap:3 * cap]
        # biased-index decode (grid_knn._decode_idx): records store
        # 0x40000000 | (idx+1) so the f32 field is never a denormal/NaN
        ib = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(
                cand_refs[c][:, 3 * cap:4 * cap], jnp.int32),
            jnp.int32(0x7FFFFF)) - 1
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


def _grid_topk_kernel_v2(*refs, k: int, cap: int, ncells: int, tile_q: int,
                         r2: float, visit_order: tuple):
    """v2: per-cell threshold-skipped extraction instead of one full-width
    extraction.

    v1 runs k min-extraction rounds over the whole (TQ, 27*cap) candidate
    row — 32 x 3 x 5184 VPU ops per query at KITTI scale.  Here cells are
    visited center-first (the query's own cell almost always holds the k
    nearest within r); each cell pays its distance pass, and only cells
    where some query still sees d2 < t = min(kth-best, r^2) run the k-round
    extraction over their own cap-wide plane + a 2k-lane merge (the
    ops/pallas_knn.py scheme).  Same contract as v1 up to packed-bit
    quantization (FEWER bits dropped here: next_pow2(cap) instead of
    next_pow2(27*cap)) and tie order.

    NEGATIVE RESULT (v5e, kept off the default path): 2-2.7x slower than
    v1 at KITTI shape — the 27 lax.cond gates per tile outweigh the
    extraction rounds they skip.  See grid_topk_records.
    """
    cand_refs = refs[:ncells]
    q_ref = refs[ncells]
    out_d, out_i = refs[ncells + 1], refs[ncells + 2]
    pw = 1
    while pw < cap:
        pw *= 2
    low_mask = pw - 1
    sent = jnp.int32(0x7F800000 | low_mask)
    two_k = 2 * k
    pw2 = 1
    while pw2 < two_k:
        pw2 *= 2
    pmask = pw2 - 1
    sent_mrg = jnp.int32(0x7F800000 | pmask)

    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    qv = q_ref[:, 3:4] > 0
    colc = jax.lax.broadcasted_iota(jnp.int32, (tile_q, cap), 1)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_q, two_k), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)

    def extract_cell(packed, ivals, best_d, best_i):
        def round_body(j, st):
            cd, ci, m_prev = st
            m = jnp.min(jnp.where(packed > m_prev, packed, sent),
                        axis=-1, keepdims=True)
            ival = jnp.sum(jnp.where(packed == m, ivals, 0), axis=-1,
                           keepdims=True)
            at = slot == j
            cd = jnp.where(at, m, cd)
            ci = jnp.where(at, ival, ci)
            return cd, ci, m

        cd = jnp.full((tile_q, k), sent, jnp.int32)
        ci = jnp.full((tile_q, k), -1, jnp.int32)
        cd, ci, _ = jax.lax.fori_loop(
            0, k, round_body,
            (cd, ci, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        cand_d = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(cd, jnp.int32(~low_mask)), jnp.float32)

        all_d = jnp.concatenate([best_d, cand_d], axis=-1)
        all_i = jnp.concatenate([best_i, ci], axis=-1)
        mb = jnp.bitwise_or(
            jnp.bitwise_and(
                jax.lax.bitcast_convert_type(all_d, jnp.int32),
                jnp.int32(~pmask)),
            pos_iota)

        def merge_body(j, st):
            nd, ni, m_prev = st
            m = jnp.min(jnp.where(mb > m_prev, mb, sent_mrg),
                        axis=-1, keepdims=True)
            pos = jnp.bitwise_and(m, jnp.int32(pmask))
            dval = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(m, jnp.int32(~pmask)), jnp.float32)
            ival = jnp.sum(jnp.where(pos_iota == pos, all_i, 0),
                           axis=-1, keepdims=True)
            at = slot == j
            nd = jnp.where(at, dval, nd)
            ni = jnp.where(at, ival, ni)
            return nd, ni, m

        nd = jnp.full((tile_q, k), _INF, jnp.float32)
        ni = jnp.full((tile_q, k), -1, jnp.int32)
        nd, ni, _ = jax.lax.fori_loop(
            0, k, merge_body,
            (nd, ni, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        return nd, ni

    best_d = jnp.full((tile_q, k), _INF, jnp.float32)
    best_i = jnp.full((tile_q, k), -1, jnp.int32)
    t = jnp.where(qv, jnp.float32(r2), -_INF)

    for c in visit_order:
        px = cand_refs[c][:, 0:cap]
        py = cand_refs[c][:, cap:2 * cap]
        pz = cand_refs[c][:, 2 * cap:3 * cap]
        ib = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(
                cand_refs[c][:, 3 * cap:4 * cap], jnp.int32),
            jnp.int32(0x7FFFFF)) - 1  # biased decode, see grid_knn
        d2 = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
        d2 = jnp.where((ib >= 0) & (d2 <= r2) & qv, d2, _INF)
        hit = jnp.any(d2 < t)

        def with_extract(args, d2=d2, ib=ib):
            best_d, best_i = args
            bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
            packed = jnp.bitwise_or(
                jnp.bitwise_and(bits, jnp.int32(~low_mask)), colc)
            nd, ni = extract_cell(packed, ib, best_d, best_i)
            new_t = jnp.minimum(
                jnp.max(nd, axis=-1, keepdims=True), jnp.float32(r2))
            new_t = jnp.where(qv, new_t, -_INF)
            return nd, ni, new_t

        best_d, best_i, t = jax.lax.cond(
            hit, with_extract, lambda args: (args[0], args[1], t),
            (best_d, best_i))

    good = (best_d < _INF * 0.98) & qv
    out_d[:] = jnp.where(good, best_d, _INF)
    out_i[:] = jnp.where(good, best_i, -1)


# visit order: center cell, faces, edges, corners (offsets are lexicographic
# (-1,0,1)^3 in grid_knn._NEIGHBOR_OFFSETS)
def _visit_order(ncells: int) -> tuple:
    if ncells != 27:
        return tuple(range(ncells))
    import numpy as _np

    offs = _np.array([[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                      for dz in (-1, 0, 1)])
    return tuple(int(i) for i in _np.argsort((offs ** 2).sum(-1),
                                             kind="stable"))


def _pick_tile(q: int, cap: int, ncells: int) -> int:
    """Largest tile <=256 that divides q (no padding => no multi-GB pad
    copy of the gathered rows), budgeted for VMEM."""
    budget = max(8, min(256, (48_000_000 // (40 * ncells * cap)) // 8 * 8))
    for t in range(budget - budget % 8, 7, -8):
        if q % t == 0:
            return t
    return budget


@functools.partial(jax.jit,
                   static_argnames=("k", "cap", "radius", "tile_q",
                                    "interpret"))
def grid_topk_records(table: jax.Array, nbr_buckets: jax.Array,
                      query: jax.Array, q_valid: jax.Array,
                      k: int, cap: int, radius: float,
                      tile_q: int | None = None, interpret: bool = False):
    """Top-k nearest within ``radius`` from grid bucket rows.

    table (NB+1, cap*4) f32 record table and nbr_buckets (Q, ncells) from
    ops/grid_knn.py; query (Q, 3), q_valid (Q,) -> (d2 (Q, k),
    point-index (Q, k)) with the packed-extraction low-bit quantization of
    :func:`topk_smallest`.  The per-cell gathers happen here so each
    kernel operand is an independent clean-tiled (Q, cap*4) plane.
    """
    import os

    q, ncells = nbr_buckets.shape
    if tile_q is None:
        tile_q = _pick_tile(q, cap, ncells)
    qp = _round_up(q, tile_q)
    planes = [jnp.pad(table[nbr_buckets[:, c]], ((0, qp - q), (0, 0)))
              for c in range(ncells)]
    qq = jnp.concatenate(
        [query.astype(jnp.float32),
         q_valid.astype(jnp.float32)[:, None]], axis=-1)
    qq = jnp.pad(qq, ((0, qp - q), (0, 0)))
    # v1 (default): one full-width extraction.  The per-cell
    # threshold-skipped v2 measured 2-2.7x SLOWER at KITTI shape
    # (87 -> 164 ms at r=0.1, 83 -> 220 ms at r=0.04, q=73728 n=131072):
    # 27 lax.cond gates per tile cost more than the skipped extraction
    # rounds save (the same Mosaic control-flow tax as every kNN skip
    # experiment).  CCN_GRID_TAIL=v2 keeps it measurable.
    v2 = os.environ.get("CCN_GRID_TAIL", "v1") == "v2"
    if v2:
        kernel = functools.partial(
            _grid_topk_kernel_v2, k=k, cap=cap, ncells=ncells,
            tile_q=tile_q, r2=float(radius) * float(radius),
            visit_order=_visit_order(ncells))
        scratch = []
    else:
        kernel = functools.partial(_grid_topk_kernel, k=k, cap=cap,
                                   ncells=ncells, tile_q=tile_q,
                                   r2=float(radius) * float(radius))
        w = ncells * cap
        scratch = [
            pltpu.VMEM((tile_q, w), jnp.int32),
            pltpu.VMEM((tile_q, w), jnp.int32),
        ]
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(qp // tile_q,),
        in_specs=[pl.BlockSpec((tile_q, 4 * cap), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
                  for _ in range(ncells)] + [
            pl.BlockSpec((tile_q, 4), lambda i: (i, 0),
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*planes, qq)
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
