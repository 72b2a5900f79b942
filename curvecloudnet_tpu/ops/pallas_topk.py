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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30


def _unrolled():
    """Python-unroll the k extraction rounds (default OFF here).

    A/B on v5e (tools/unroll_ab.py): at the grid shapes the fori_loop is
    3.7x FASTER than unrolled straight-line rounds (0.34 vs 1.27 ms at the
    23040/cap=192/k=20 table) — the wide (TQ, 1920) packed matrix stays
    register/VMEM-scheduled better inside the hardware loop.  The brute
    kNN kernel's narrower merge rounds measure the OPPOSITE (see
    ops/pallas_knn._unroll_k, default ON there: 0.98 -> 0.57 ms)."""
    return os.environ.get("CCN_TOPK_UNROLL", "0") != "0"


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
    init = (best_d, best_i, jnp.full((tile_q, 1), jnp.int32(-2**31)))
    if _unrolled():
        st = init
        for j in range(k):
            st = body(j, st)
        best_d, best_i, _ = st
    else:
        best_d, best_i, _ = jax.lax.fori_loop(0, k, body, init)
    good = best_d < _INF * 0.98
    out_d[:] = jnp.where(good, best_d, _INF)
    out_i[:] = jnp.where(good, best_i, -1)


def _round_up(x, m):
    return -(-x // m) * m


def _grid_topk_kernel(*refs, k: int, cap: int, ncells: int, tile_q: int,
                      r2: float, idx_bound: int = 0):
    """Distances + radius mask + packed min-extraction over raw grid rows.

    refs: ncells x (tile_q, cap*4) f32 bucket-row planes in the table's
    channel-major layout [x*cap, y*cap, z*cap, idxbits*cap]
    (ops/grid_knn.py builds them), then (tile_q, 4) [qx, qy, qz, valid],
    then outputs + scratch.  One plane per neighbor cell keeps every
    operand 2D and reshape/pad-free — merging them in XLA re-tiles the
    multi-GB candidate array twice (measured 55 ms/step at KITTI scale).

    ``idx_bound > 0`` enables ONE-PASS rounds: the packed low bits carry
    the candidate's POINT INDEX + 1 directly (distinct per query — the
    stencil-row dedup in grid_knn guarantees a point appears at most once
    among a query's candidates), so each round is a single lane-min; the
    per-round ival select-sum pass and the (TQ, W) ival scratch disappear
    (~2x on the extraction loop).  Costs coarser d2 quantization
    (ceil_log2(idx_bound) low mantissa bits instead of log2(W)); the
    caller keeps the col scheme when that exceeds its quantization budget.
    """
    cand_refs = refs[:ncells]
    q_ref = refs[ncells]
    out_d, out_i = refs[ncells + 1], refs[ncells + 2]
    packed_s = refs[ncells + 3]
    ival_s = refs[ncells + 4] if idx_bound == 0 else None
    w = ncells * cap
    pw = 1
    while pw < (idx_bound if idx_bound else w):
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
        ibp1 = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(
                cand_refs[c][:, 3 * cap:4 * cap], jnp.int32),
            jnp.int32(0x7FFFFF))                    # idx + 1; 0 = empty
        d2 = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
        good = (ibp1 > 0) & (d2 <= r2) & qv
        bits = jax.lax.bitcast_convert_type(
            jnp.where(good, d2, _INF), jnp.int32)
        # payload is the RAW index (ibp1 - 1), not idx+1: empty slots
        # (ibp1=0) would alias payload -1&mask, but they pack d2=_INF and
        # are either never extracted or filtered by the `good` guard below
        # — and dropping the +1 lets idx_bound = 2^bits exactly (the KITTI
        # 131072-point row fits the 17-bit budget this way)
        payload = (jnp.bitwise_and(ibp1 - 1, jnp.int32(low_mask))
                   if idx_bound else colc + c * cap)
        packed_s[:, c * cap:(c + 1) * cap] = jnp.bitwise_or(
            jnp.bitwise_and(bits, jnp.int32(~low_mask)), payload)
        if ival_s is not None:
            ival_s[:, c * cap:(c + 1) * cap] = ibp1 - 1

    packed = packed_s[:]
    ivals = ival_s[:] if ival_s is not None else None
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)

    def body(j, st):
        best_d, best_i, m_prev = st
        m = jnp.min(jnp.where(packed > m_prev, packed, sent),
                    axis=-1, keepdims=True)
        if idx_bound:
            ival = jnp.bitwise_and(m, jnp.int32(low_mask))
        else:
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
    init = (best_d, best_i, jnp.full((tile_q, 1), jnp.int32(-2**31)))
    if _unrolled():
        st = init
        for j in range(k):
            st = body(j, st)
        best_d, best_i, _ = st
    else:
        best_d, best_i, _ = jax.lax.fori_loop(0, k, body, init)
    good = best_d < _INF * 0.98
    out_d[:] = jnp.where(good, best_d, _INF)
    out_i[:] = jnp.where(good, best_i, -1)


def _pick_tile(q: int, cap: int, ncells: int) -> int:
    """Largest tile <=256 that divides q (no padding => no multi-GB pad
    copy of the gathered rows), budgeted for VMEM."""
    budget = max(8, min(256, (48_000_000 // (40 * ncells * cap)) // 8 * 8))
    for t in range(budget - budget % 8, 7, -8):
        if q % t == 0:
            return t
    return budget


# idx-payload rounds are enabled while keeping >= this many high bits of
# d2 in the packed value (sign+exp8+mantissa: 17 payload bits leave
# ~2^-7 relative d2 quantization — covers every grid-served row up to
# 128k points incl. the KITTI 73728-row table, whose 2-pass extraction
# was its largest kernel pool; the quantization only reorders candidates
# within a 2^-7 d2 band at the k-th boundary, documented with the other
# grid quantization in docs/DEVIATIONS.md #19).
_IDX_PACK_MAX_BITS = 17


@functools.partial(jax.jit,
                   static_argnames=("k", "cap", "radius", "tile_q",
                                    "idx_bound", "interpret"))
def grid_topk_records(table: jax.Array, nbr_buckets: jax.Array,
                      query: jax.Array, q_valid: jax.Array,
                      k: int, cap: int, radius: float,
                      tile_q: int | None = None, idx_bound: int = 0,
                      interpret: bool = False):
    """Top-k nearest within ``radius`` from grid bucket rows.

    table (NB+1, cap*4) f32 record table and nbr_buckets (Q, ncells) from
    ops/grid_knn.py; query (Q, 3), q_valid (Q,) -> (d2 (Q, k),
    point-index (Q, k)) with the packed-extraction low-bit quantization of
    :func:`topk_smallest`.  The per-cell gathers happen here so each
    kernel operand is an independent clean-tiled (Q, cap*4) plane.

    ``idx_bound``: largest point index + 1 in the table.  When it fits
    ``_IDX_PACK_MAX_BITS`` the kernel runs one-pass rounds (index in the
    packed payload — see _grid_topk_kernel), halving extraction time.
    """
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
    use_idx = 0 < idx_bound <= (1 << _IDX_PACK_MAX_BITS)
    # one full-width extraction.  (A per-cell threshold-skipped variant
    # measured 2-2.7x SLOWER at KITTI shape — 27 lax.cond gates per tile
    # cost more than the extraction rounds they skip, the same Mosaic
    # control-flow tax as every kNN skip experiment; deleted in round 4,
    # numbers in docs/ROADMAP.md "Parked floors".)
    kernel = functools.partial(_grid_topk_kernel, k=k, cap=cap,
                               ncells=ncells, tile_q=tile_q,
                               r2=float(radius) * float(radius),
                               idx_bound=idx_bound if use_idx else 0)
    w = ncells * cap
    scratch = [pltpu.VMEM((tile_q, w), jnp.int32)]
    if not use_idx:
        scratch.append(pltpu.VMEM((tile_q, w), jnp.int32))
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
