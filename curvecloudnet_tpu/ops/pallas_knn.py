"""Pallas TPU kernel: exact masked kNN with packed extraction + block skipping.

TPU-native replacement for the reference's exact searches (pytorch3d
``knn_points``, reference src/models/utils/point_ops.py:73-111) and the FRNN
fixed-radius path (point_ops.py:431-461) at brute-force-viable sizes.  The
XLA blocked path materializes (Q, block) distance tiles in HBM between the
matmul and the top-k; here each tile lives in VMEM.

What makes this version fast (vs. a naive argmin-extraction brute force):

  * **Packed selection.**  Distances are non-negative f32, so their bit
    patterns order like the values.  Each candidate packs
    ``(d2_bits & ~(tile_n-1)) | column`` into one int32; a top-k round is
    then just a lane-min plus one compare-select to eliminate the winner —
    2 VPU passes instead of ~6 (no argmin, no index gather).  The low
    ``log2(tile_n)`` mantissa bits of the returned distance are quantized
    (relative error <= 2^-12 at tile_n=2048); neighbor *selection* is exact
    up to such near-ties.
  * **Threshold skipping.**  Each query carries t = min(kth-best-so-far,
    radius^2).  A candidate block is extracted only when any query in the
    tile sees d2 < t (a sound skip: otherwise no candidate can change any
    result).  Blocks are visited near-diagonal-first — scan order is
    spatially coherent for curve clouds, so t tightens after 1-2 blocks and
    the remaining blocks cost only the distance pass.

Mosaic constraints shaping the code: no value-level dynamic_update_slice
(slot writes via iota==j selects), no sort (min-extraction rounds), planar
coordinates on the VPU (a 3-wide dot_general blows the VMEM stack).

Negative results (measured on v5e, kept out of the default path):
  * AABB per-block gates: neutral at every size/radius (boxes too loose on
    clustered lidar); early-exit/while extraction; segmented extraction;
    window+far-pass; morton ordering (see CLAUDE.md rounds 2-3).
  * MXU hit check (:func:`knn_pallas_single_mxu`): replace the per-block
    exact VPU distance pass with a (TQ,8)x(8,TN) matmul lift
    d2a = |q|^2 + (q,1)·(-2p,|p|^2) and only run the exact pass on blocks
    with min d2a < t + margin.  Bit-identical results (margin covers the
    lift's rounding at lidar scales), but 35% SLOWER at flagship shapes
    (28.7 -> 38.8 ms at 23040x36864 k=32): Mosaic pads the K=8 f32
    contraction to native MXU tiling at HIGHEST precision (6 bf16 passes),
    so the "free" MXU check costs more than the 8 VPU ops it saves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30
_GOOD_MAX = 9e29  # anything >= this is a fill, not a real distance


def _knn_kernel(q_ref, p_ref, qv_ref, pv_ref, dist_ref, idx_ref, *,
                k: int, tile_q: int, tile_n: int, n_total: int,
                q_total: int, r2init: float):
    # q_ref: (3, TQ) planar query coords; p_ref: (3, N) planar points
    qx = q_ref[0, :][:, None]         # (TQ, 1)
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]
    qv = qv_ref[0, :][:, None]        # (TQ, 1)
    num_blocks = n_total // tile_n

    low_mask = tile_n - 1                       # tile_n is a power of two
    sent_blk = jnp.int32((0x7F800000 | low_mask))
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)

    two_k = 2 * k
    pw = 1
    while pw < two_k:
        pw *= 2
    pmask = pw - 1
    sent_mrg = jnp.int32(0x7F800000 | pmask)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_q, two_k), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)

    # center the visit order on the block "facing" this query tile (scan
    # order is spatially coherent, so true neighbors cluster there)
    qstart = pl.program_id(0) * tile_q
    # (qstart * num_blocks stays well inside int32 — n_total/tile_n <= ~256)
    center = ((qstart + tile_q // 2) * num_blocks) // q_total

    def extract_block(d2, base, best_d, best_i):
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        packed = jnp.bitwise_or(
            jnp.bitwise_and(bits, jnp.int32(~low_mask)), col)

        # packed values are DISTINCT per row (col in the low bits), so the
        # (j+1)-th smallest = min over entries strictly greater than the
        # j-th: rounds never rewrite the packed matrix.  Dropping the
        # per-round (TQ, TN) VMEM store measured -31% kernel time on v5e
        # (15.2 -> 10.4 ms at the 18432 k=32 table).
        def round_body(j, st):
            cand, m_prev = st
            m = jnp.min(jnp.where(packed > m_prev, packed, sent_blk),
                        axis=-1, keepdims=True)              # (TQ, 1)
            cand = jnp.where(slot == j, m, cand)
            return cand, m

        cand = jnp.full((tile_q, k), sent_blk, jnp.int32)
        cand, _ = jax.lax.fori_loop(
            0, k, round_body,
            (cand, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        cand_d = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(cand, jnp.int32(~low_mask)), jnp.float32)
        cand_i = base + jnp.bitwise_and(cand, jnp.int32(low_mask))

        # merge running best with block candidates over 2k lanes
        all_d = jnp.concatenate([best_d, cand_d], axis=-1)   # (TQ, 2K)
        all_i = jnp.concatenate([best_i, cand_i], axis=-1)
        mb = jnp.bitwise_or(
            jnp.bitwise_and(
                jax.lax.bitcast_convert_type(all_d, jnp.int32),
                jnp.int32(~pmask)),
            pos_iota)

        def merge_body(j, st):
            new_d, new_i, m_prev = st
            m = jnp.min(jnp.where(mb > m_prev, mb, sent_mrg),
                        axis=-1, keepdims=True)              # (TQ, 1)
            pos = jnp.bitwise_and(m, jnp.int32(pmask))
            dval = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(m, jnp.int32(~pmask)), jnp.float32)
            ival = jnp.sum(jnp.where(pos_iota == pos, all_i, 0),
                           axis=-1, keepdims=True)
            sel = slot == j
            new_d = jnp.where(sel, dval, new_d)
            new_i = jnp.where(sel, ival, new_i)
            return new_d, new_i, m

        new_d = jnp.full((tile_q, k), _INF, jnp.float32)
        new_i = jnp.full((tile_q, k), -1, jnp.int32)
        new_d, new_i, _ = jax.lax.fori_loop(
            0, k, merge_body,
            (new_d, new_i, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        return new_d, new_i

    def body(s, carry):
        best_d, best_i, t = carry     # (TQ,K), (TQ,K), (TQ,1)
        off = (s + 1) // 2 * (1 - 2 * (s % 2))   # 0, +1, -1, +2, -2, ...
        b = jax.lax.rem(center + off + num_blocks * (s + 1), num_blocks)
        sl = pl.ds(b * tile_n, tile_n)
        px = p_ref[0, sl][None, :]    # (1, TN)
        py = p_ref[1, sl][None, :]
        pz = p_ref[2, sl][None, :]
        pv = pv_ref[0, sl][None, :]
        d2 = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2
        d2 = jnp.where(pv > 0, d2, _INF)
        hit = jnp.any(d2 < t)

        def with_extract(args):
            best_d, best_i = args
            new_d, new_i = extract_block(d2, b * tile_n, best_d, best_i)
            new_t = jnp.minimum(
                jnp.max(new_d, axis=-1, keepdims=True), jnp.float32(r2init))
            new_t = jnp.where(qv > 0, new_t, -_INF)
            return new_d, new_i, new_t

        best_d, best_i, t = jax.lax.cond(
            hit, with_extract, lambda args: (args[0], args[1], t),
            (best_d, best_i))
        return best_d, best_i, t

    init_d = jnp.full((tile_q, k), _INF, jnp.float32)
    init_i = jnp.full((tile_q, k), -1, jnp.int32)
    init_t = jnp.where(qv > 0, jnp.float32(r2init), -_INF)
    best_d, best_i, _ = jax.lax.fori_loop(
        0, num_blocks, body, (init_d, init_i, init_t))

    good = (best_d < _GOOD_MAX) & (qv > 0)
    dist_ref[:] = jnp.where(good, jnp.sqrt(jnp.maximum(best_d, 0.0)), _INF)
    idx_ref[:] = jnp.where(good, best_i, -1)


def _make_extractor(k: int, tile_q: int, tile_n: int):
    """Packed min-extraction + 2k-lane merge (same scheme as _knn_kernel);
    shared by the MXU-hit-check kernel variant below."""
    low_mask = tile_n - 1
    sent_blk = jnp.int32((0x7F800000 | low_mask))
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    two_k = 2 * k
    pw = 1
    while pw < two_k:
        pw *= 2
    pmask = pw - 1
    sent_mrg = jnp.int32(0x7F800000 | pmask)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_q, two_k), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)

    def extract_block(d2, base, best_d, best_i):
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        packed = jnp.bitwise_or(
            jnp.bitwise_and(bits, jnp.int32(~low_mask)), col)

        def round_body(j, st):
            cand, m_prev = st
            m = jnp.min(jnp.where(packed > m_prev, packed, sent_blk),
                        axis=-1, keepdims=True)
            cand = jnp.where(slot == j, m, cand)
            return cand, m

        cand = jnp.full((tile_q, k), sent_blk, jnp.int32)
        cand, _ = jax.lax.fori_loop(
            0, k, round_body,
            (cand, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        cand_d = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(cand, jnp.int32(~low_mask)), jnp.float32)
        cand_i = base + jnp.bitwise_and(cand, jnp.int32(low_mask))

        all_d = jnp.concatenate([best_d, cand_d], axis=-1)
        all_i = jnp.concatenate([best_i, cand_i], axis=-1)
        mb = jnp.bitwise_or(
            jnp.bitwise_and(
                jax.lax.bitcast_convert_type(all_d, jnp.int32),
                jnp.int32(~pmask)),
            pos_iota)

        def merge_body(j, st):
            new_d, new_i, m_prev = st
            m = jnp.min(jnp.where(mb > m_prev, mb, sent_mrg),
                        axis=-1, keepdims=True)
            pos = jnp.bitwise_and(m, jnp.int32(pmask))
            dval = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(m, jnp.int32(~pmask)), jnp.float32)
            ival = jnp.sum(jnp.where(pos_iota == pos, all_i, 0),
                           axis=-1, keepdims=True)
            sel = slot == j
            new_d = jnp.where(sel, dval, new_d)
            new_i = jnp.where(sel, ival, new_i)
            return new_d, new_i, m

        new_d = jnp.full((tile_q, k), _INF, jnp.float32)
        new_i = jnp.full((tile_q, k), -1, jnp.int32)
        new_d, new_i, _ = jax.lax.fori_loop(
            0, k, merge_body,
            (new_d, new_i, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        return new_d, new_i

    return extract_block


def _knn_kernel_mxu(q_ref, p_ref, qv_ref, pv_ref, qa_ref, pa_ref, q2_ref,
                    mg_ref, dist_ref, idx_ref, *,
                    k: int, tile_q: int, tile_n: int, n_total: int,
                    q_total: int, r2init: float):
    """v3: the per-block hit check runs on the MXU.

    The v2 kernel's floor is its exact planar distance pass — ~8 VPU ops
    over every (TQ, TN) tile even when the block is skipped.  Here the
    check uses the matmul lift  d2 ≈ |q|^2 + q_aug · p_aug  with
    q_aug = (q, 1, 0...) and p_aug = (-2p, |p|^2, 0...): one (TQ,8)x(8,TN)
    MXU matmul + 2 VPU passes.  The lift loses precision at lidar
    coordinate scales (terms ~|q||p| >> d2), so the check compares against
    ``t + margin`` where margin bounds the lift's absolute error (computed
    by the wrapper from the coordinate magnitude); blocks that hit still
    run the EXACT planar pass + extraction, so results are bit-identical
    to v2 whenever margin covers the true error (a too-small margin could
    only drop true neighbors; the wrapper sizes it conservatively and
    tests compare against the XLA oracle).
    """
    qx = q_ref[0, :][:, None]
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]
    qv = qv_ref[0, :][:, None]
    num_blocks = n_total // tile_n
    q2 = q2_ref[0, :][:, None]                  # (TQ, 1) |q|^2
    margin = mg_ref[0, 0]
    extract_block = _make_extractor(k, tile_q, tile_n)

    qstart = pl.program_id(0) * tile_q
    center = ((qstart + tile_q // 2) * num_blocks) // q_total

    def body(s, carry):
        best_d, best_i, t = carry
        off = (s + 1) // 2 * (1 - 2 * (s % 2))
        b = jax.lax.rem(center + off + num_blocks * (s + 1), num_blocks)
        sl = pl.ds(b * tile_n, tile_n)
        # MXU hit check: d2a = |q|^2 + q_aug . p_aug  (>= d2 - margin)
        mm = jax.lax.dot_general(
            qa_ref[...], pa_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2a = mm + q2
        hit = jnp.any(d2a < t + margin)

        def with_extract(args):
            best_d, best_i = args
            # exact planar pass, only for blocks that pass the check
            px = p_ref[0, sl][None, :]
            py = p_ref[1, sl][None, :]
            pz = p_ref[2, sl][None, :]
            pv = pv_ref[0, sl][None, :]
            d2 = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2
            d2 = jnp.where(pv > 0, d2, _INF)
            new_d, new_i = extract_block(d2, b * tile_n, best_d, best_i)
            new_t = jnp.minimum(
                jnp.max(new_d, axis=-1, keepdims=True), jnp.float32(r2init))
            new_t = jnp.where(qv > 0, new_t, -_INF)
            return new_d, new_i, new_t

        best_d, best_i, t = jax.lax.cond(
            hit, with_extract, lambda args: (args[0], args[1], t),
            (best_d, best_i))
        return best_d, best_i, t

    init_d = jnp.full((tile_q, k), _INF, jnp.float32)
    init_i = jnp.full((tile_q, k), -1, jnp.int32)
    init_t = jnp.where(qv > 0, jnp.float32(r2init), -_INF)
    best_d, best_i, _ = jax.lax.fori_loop(
        0, num_blocks, body, (init_d, init_i, init_t))

    good = (best_d < _GOOD_MAX) & (qv > 0)
    dist_ref[:] = jnp.where(good, jnp.sqrt(jnp.maximum(best_d, 0.0)), _INF)
    idx_ref[:] = jnp.where(good, best_i, -1)


def _knn_kernel_aabb(q_ref, p_ref, qv_ref, lo_ref, hi_ref, dist_ref, idx_ref,
                     *, k: int, tile_q: int, tile_n: int,
                     n_total: int, q_total: int, r2init: float):
    """AABB-gated variant: per-candidate-block bounding boxes let the kernel
    skip the whole (TQ, TN) distance pass, not just the extraction.

    Scan order is spatially coherent (a block of contiguous rows is a beam
    arc), so block AABBs are compact and most blocks prune against the
    running kth-best threshold.  lo/hi: (nblk, 3) per-block mins/maxes.
    Invalid points carry sentinel coords (set by the wrapper), so no pv
    plane is needed — their distances are ~1e30 and never selected.
    """
    qx = q_ref[0, :][:, None]         # (TQ, 1)
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]
    qv = qv_ref[0, :][:, None]        # (TQ, 1)
    num_blocks = n_total // tile_n

    low_mask = tile_n - 1
    sent_blk = jnp.int32((0x7F800000 | low_mask))
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)

    two_k = 2 * k
    pw = 1
    while pw < two_k:
        pw *= 2
    pmask = pw - 1
    sent_mrg = jnp.int32(0x7F800000 | pmask)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_q, two_k), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)

    qstart = pl.program_id(0) * tile_q
    center = ((qstart + tile_q // 2) * num_blocks) // q_total

    # per-(query, block) distance lower bound: dist(q, AABB_b)^2 as a
    # (TQ, nblk) value — the per-block gate is then one fused masked
    # compare against the (TQ, 1) threshold (nblk is small, so scanning
    # all lanes each block costs ~nothing and avoids any transpose)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (num_blocks, 3), 1)
    dlb = jnp.zeros((tile_q, num_blocks), jnp.float32)
    for a, qcol in ((0, qx), (1, qy), (2, qz)):
        sel = lane3 == a
        lo_a = jnp.min(jnp.where(sel, lo_ref[:], _INF), axis=1)[None, :]
        hi_a = jnp.max(jnp.where(sel, hi_ref[:], -_INF), axis=1)[None, :]
        e = jnp.maximum(jnp.maximum(lo_a - qcol, qcol - hi_a), 0.0)
        dlb = dlb + e * e                      # (TQ, nblk)
    blk_lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, num_blocks), 1)

    def extract_block(d2, base, best_d, best_i):
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        packed = jnp.bitwise_or(
            jnp.bitwise_and(bits, jnp.int32(~low_mask)), col)

        def round_body(j, st):
            cand, m_prev = st
            m = jnp.min(jnp.where(packed > m_prev, packed, sent_blk),
                        axis=-1, keepdims=True)
            cand = jnp.where(slot == j, m, cand)
            return cand, m

        cand = jnp.full((tile_q, k), sent_blk, jnp.int32)
        cand, _ = jax.lax.fori_loop(
            0, k, round_body,
            (cand, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        cand_d = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(cand, jnp.int32(~low_mask)), jnp.float32)
        cand_i = base + jnp.bitwise_and(cand, jnp.int32(low_mask))

        all_d = jnp.concatenate([best_d, cand_d], axis=-1)
        all_i = jnp.concatenate([best_i, cand_i], axis=-1)
        mb = jnp.bitwise_or(
            jnp.bitwise_and(
                jax.lax.bitcast_convert_type(all_d, jnp.int32),
                jnp.int32(~pmask)),
            pos_iota)

        def merge_body(j, st):
            new_d, new_i, m_prev = st
            m = jnp.min(jnp.where(mb > m_prev, mb, sent_mrg),
                        axis=-1, keepdims=True)
            pos = jnp.bitwise_and(m, jnp.int32(pmask))
            dval = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(m, jnp.int32(~pmask)), jnp.float32)
            ival = jnp.sum(jnp.where(pos_iota == pos, all_i, 0),
                           axis=-1, keepdims=True)
            sel = slot == j
            new_d = jnp.where(sel, dval, new_d)
            new_i = jnp.where(sel, ival, new_i)
            return new_d, new_i, m

        new_d = jnp.full((tile_q, k), _INF, jnp.float32)
        new_i = jnp.full((tile_q, k), -1, jnp.int32)
        new_d, new_i, _ = jax.lax.fori_loop(
            0, k, merge_body,
            (new_d, new_i, jnp.full((tile_q, 1), jnp.int32(-2**31))))
        return new_d, new_i

    def body(s, carry):
        best_d, best_i, t = carry     # (TQ,K), (TQ,K), (TQ,1)
        off = (s + 1) // 2 * (1 - 2 * (s % 2))
        b = jax.lax.rem(center + off + num_blocks * (s + 1), num_blocks)
        # per-query gate: the block's AABB lower bound must beat SOME
        # query's kth-best-so-far
        hit_aabb = jnp.any((dlb < t) & (blk_lane == b))

        def with_dist(args):
            best_d, best_i, t = args
            sl = pl.ds(b * tile_n, tile_n)
            px = p_ref[0, sl][None, :]
            py = p_ref[1, sl][None, :]
            pz = p_ref[2, sl][None, :]
            d2 = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2
            hit = jnp.any(d2 < t)

            def with_extract(args):
                best_d, best_i = args
                new_d, new_i = extract_block(d2, b * tile_n, best_d, best_i)
                new_t = jnp.minimum(
                    jnp.max(new_d, axis=-1, keepdims=True),
                    jnp.float32(r2init))
                new_t = jnp.where(qv > 0, new_t, -_INF)
                return new_d, new_i, new_t

            return jax.lax.cond(
                hit, with_extract, lambda a: (a[0], a[1], t),
                (best_d, best_i))

        best_d, best_i, t = jax.lax.cond(
            hit_aabb, with_dist, lambda a: a, (best_d, best_i, t))
        return best_d, best_i, t

    init_d = jnp.full((tile_q, k), _INF, jnp.float32)
    init_i = jnp.full((tile_q, k), -1, jnp.int32)
    init_t = jnp.where(qv > 0, jnp.float32(r2init), -_INF)
    best_d, best_i, _ = jax.lax.fori_loop(
        0, num_blocks, body, (init_d, init_i, init_t))

    good = (best_d < _GOOD_MAX) & (qv > 0)
    dist_ref[:] = jnp.where(good, jnp.sqrt(jnp.maximum(best_d, 0.0)), _INF)
    idx_ref[:] = jnp.where(good, best_i, -1)


_SENTINEL = 1e15  # invalid-point coordinate (d2 ~ 1e30 >= _GOOD_MAX)


@functools.partial(jax.jit, static_argnames=("k", "radius", "tile_q",
                                             "tile_n", "interpret"))
def knn_pallas_single_aabb(query, points, q_valid, p_valid, k: int,
                           radius: float | None = None, tile_q: int = 256,
                           tile_n: int | None = None,
                           interpret: bool = False):
    """AABB-gated exact kNN (single sample).  Same contract as
    :func:`knn_pallas_single`; preferred at every size on TPU — scan-order
    candidate blocks have compact bounding boxes, so most blocks skip even
    their distance pass (the v2 kernel's per-block floor)."""
    q_n, n = query.shape[0], points.shape[0]
    if tile_n is None:
        tile_n = _pow2_at_least(n, 512, 2048)
    qp = _round_up(q_n, tile_q)
    npad = _round_up(n, tile_n)
    nblk = npad // tile_n

    pts = jnp.where(p_valid[:, None], points.astype(jnp.float32), _SENTINEL)
    pts = jnp.pad(pts, ((0, npad - n), (0, 0)),
                  constant_values=_SENTINEL)                 # (NP, 3)
    lo = jnp.min(pts.reshape(nblk, tile_n, 3), axis=1)       # (nblk, 3)
    hi = jnp.max(pts.reshape(nblk, tile_n, 3), axis=1)

    qT = jnp.pad(query.astype(jnp.float32), ((0, qp - q_n), (0, 0))).T
    pT = pts.T                                               # (3, NP)
    qv = jnp.pad(q_valid.astype(jnp.float32), (0, qp - q_n))[None, :]

    r2init = _INF if radius is None else float(radius) * float(radius)
    kernel = functools.partial(_knn_kernel_aabb, k=k, tile_q=tile_q,
                               tile_n=tile_n, n_total=npad, q_total=qp,
                               r2init=r2init)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(qp // tile_q,),
        in_specs=[
            pl.BlockSpec((3, tile_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 3), lambda i: (0, 0),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qT, pT, qv, lo, hi)
    dist, idx = dist[:q_n], idx[:q_n]
    if radius is not None:
        keep = dist <= radius
        idx = jnp.where(keep, idx, -1)
        dist = jnp.where(keep, dist, _INF)
    return idx, dist


def _round_up(x, m):
    return -(-x // m) * m


def _pow2_at_least(x, lo, hi):
    p = lo
    while p < min(x, hi):
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("k", "radius", "tile_q",
                                             "tile_n", "interpret"))
def knn_pallas_single_mxu(query, points, q_valid, p_valid, k: int,
                          radius: float | None = None, tile_q: int = 256,
                          tile_n: int | None = None,
                          interpret: bool = False):
    """Single-sample Pallas kNN with the MXU hit check (see _knn_kernel_mxu).
    Same contract and (margin permitting) identical results to
    :func:`knn_pallas_single`."""
    q_n, n = query.shape[0], points.shape[0]
    if tile_n is None:
        tile_n = _pow2_at_least(n, 512, 2048)
    qp = _round_up(q_n, tile_q)
    npad = _round_up(n, tile_n)
    qf = jnp.pad(query.astype(jnp.float32), ((0, qp - q_n), (0, 0)))
    pf = jnp.pad(points.astype(jnp.float32), ((0, npad - n), (0, 0)))
    qT = qf.T                                    # (3, QP)
    pT = pf.T                                    # (3, NP)
    qv = jnp.pad(q_valid.astype(jnp.float32), (0, qp - q_n))[None, :]
    pv = jnp.pad(p_valid.astype(jnp.float32), (0, npad - n))[None, :]

    q2 = jnp.sum(qf * qf, axis=-1)               # (QP,)
    p2 = jnp.sum(pf * pf, axis=-1)               # (NP,)
    qa = jnp.concatenate(
        [qf, jnp.ones((qp, 1), jnp.float32),
         jnp.zeros((qp, 4), jnp.float32)], axis=-1)          # (QP, 8)
    p2m = jnp.where(pv[0] > 0, p2, _INF)         # invalid -> never hits
    pa = jnp.concatenate(
        [-2.0 * pf, p2m[:, None],
         jnp.zeros((npad, 4), jnp.float32)], axis=-1).T      # (8, NP)
    # |d2a - d2| is bounded by rounding on terms up to (|q|+|p|)^2; 1e-4
    # relative is ~1000x the HIGHEST-precision error — extra hits are
    # cheap, dropped true neighbors are not
    cmax2 = jnp.maximum(jnp.max(jnp.where(qv[0] > 0, q2, 0.0)),
                        jnp.max(jnp.where(pv[0] > 0, p2, 0.0)))
    margin = (4e-4 * cmax2).reshape(1, 1)

    r2init = _INF if radius is None else float(radius) * float(radius)
    kernel = functools.partial(_knn_kernel_mxu, k=k, tile_q=tile_q,
                               tile_n=tile_n, n_total=npad, q_total=qp,
                               r2init=r2init)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(qp // tile_q,),
        in_specs=[
            pl.BlockSpec((3, tile_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qT, pT, qv, pv, qa, pa, q2[None, :], margin)
    dist, idx = dist[:q_n], idx[:q_n]
    if radius is not None:
        keep = dist <= radius
        idx = jnp.where(keep, idx, -1)
        dist = jnp.where(keep, dist, _INF)
    return idx, dist


def _knn_kernel_gated(mb_ref, q_ref, p_ref, qv_ref, pv_ref, dist_ref,
                      idx_ref, *, k: int, tile_q: int, tile_n: int,
                      n_total: int, q_total: int, r2init: float):
    """v2 kernel + a scalar-prefetch (qtile, block) gate.

    ``mb_ref`` is a prefetched SMEM int32 vector of num_q_tiles*num_blocks
    flags: 0 means no candidate in block b can be within the search bound
    of any query in tile i (exact box-to-box distance, computed in XLA by
    :func:`knn_table_sorted` on the morton-permuted row).  A gated-off
    block skips its DISTANCE PASS too — the floor every in-kernel skip
    experiment (AABB gates, MXU hit check, early-exit) could not remove,
    because their gates themselves cost VPU work per block.  Here the gate
    is one SMEM scalar read + branch.
    """
    qx = q_ref[0, :][:, None]
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]
    qv = qv_ref[0, :][:, None]
    num_blocks = n_total // tile_n
    extract_block = _make_extractor(k, tile_q, tile_n)

    qstart = pl.program_id(0) * tile_q
    center = ((qstart + tile_q // 2) * num_blocks) // q_total
    row_off = pl.program_id(0) * num_blocks

    def body(s, carry):
        best_d, best_i, t = carry
        off = (s + 1) // 2 * (1 - 2 * (s % 2))
        b = jax.lax.rem(center + off + num_blocks * (s + 1), num_blocks)
        gate = mb_ref[row_off + b]

        def run(args):
            best_d, best_i, t = args
            sl = pl.ds(b * tile_n, tile_n)
            px = p_ref[0, sl][None, :]
            py = p_ref[1, sl][None, :]
            pz = p_ref[2, sl][None, :]
            pv = pv_ref[0, sl][None, :]
            d2 = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2
            d2 = jnp.where(pv > 0, d2, _INF)
            hit = jnp.any(d2 < t)

            def with_extract(args2):
                bd, bi = args2
                nd, ni = extract_block(d2, b * tile_n, bd, bi)
                nt = jnp.minimum(
                    jnp.max(nd, axis=-1, keepdims=True),
                    jnp.float32(r2init))
                nt = jnp.where(qv > 0, nt, -_INF)
                return nd, ni, nt

            return jax.lax.cond(hit, with_extract,
                                lambda a: (a[0], a[1], t),
                                (best_d, best_i))

        return jax.lax.cond(gate > 0, run, lambda a: a,
                            (best_d, best_i, t))

    init_d = jnp.full((tile_q, k), _INF, jnp.float32)
    init_i = jnp.full((tile_q, k), -1, jnp.int32)
    init_t = jnp.where(qv > 0, jnp.float32(r2init), -_INF)
    best_d, best_i, _ = jax.lax.fori_loop(
        0, num_blocks, body, (init_d, init_i, init_t))

    good = (best_d < _GOOD_MAX) & (qv > 0)
    dist_ref[:] = jnp.where(good, jnp.sqrt(jnp.maximum(best_d, 0.0)), _INF)
    idx_ref[:] = jnp.where(good, best_i, -1)


def _spread3(x):
    """Spread the low 10 bits of ``x`` so bit i lands at position 3i."""
    x = jnp.bitwise_and(x, 0x3FF)
    x = jnp.bitwise_and(jnp.bitwise_or(x, x << 16), 0x030000FF)
    x = jnp.bitwise_and(jnp.bitwise_or(x, x << 8), 0x0300F00F)
    x = jnp.bitwise_and(jnp.bitwise_or(x, x << 4), 0x030C30C3)
    x = jnp.bitwise_and(jnp.bitwise_or(x, x << 2), 0x09249249)
    return x


def _morton_keys(pos, valid):
    """30-bit morton codes over the row's bounding box; invalid -> INT_MAX
    (sorted past every real point)."""
    pf = pos.astype(jnp.float32)
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid[:, None], pf, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pf, -big), axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((pf - lo) / span * 1024.0).astype(jnp.int32), 0, 1023)
    key = (_spread3(cell[:, 0]) | (_spread3(cell[:, 1]) << 1)
           | (_spread3(cell[:, 2]) << 2))
    return jnp.where(valid, key, jnp.int32(0x7FFFFFFF))


def _block_boxes(pos, valid, size):
    """Masked per-block AABBs: (nb, 3) lo / hi (empty blocks: lo=+B, hi=-B)."""
    nb = pos.shape[0] // size
    big = jnp.float32(3.4e38)
    p = pos.reshape(nb, size, 3)
    v = valid.reshape(nb, size, 1)
    lo = jnp.min(jnp.where(v, p, big), axis=1)
    hi = jnp.max(jnp.where(v, p, -big), axis=1)
    return lo, hi


def _knn_gated_single(pos_s, valid_s, maybe, k: int, radius: float,
                      tile_q: int, tile_n: int, interpret: bool):
    """Gated same-set kernel on an (already sorted, padded) row."""
    npad = pos_s.shape[0]
    pT = pos_s.T
    pv = valid_s.astype(jnp.float32)[None, :]
    kernel = functools.partial(
        _knn_kernel_gated, k=k, tile_q=tile_q, tile_n=tile_n, n_total=npad,
        q_total=npad, r2init=float(radius) * float(radius))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // tile_q,),
        in_specs=[
            pl.BlockSpec((3, tile_q), lambda i, mb: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, npad), lambda i, mb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i, mb: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i, mb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, mb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, mb: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dist, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, k), jnp.float32),
            jax.ShapeDtypeStruct((npad, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(maybe, pT, pT, pv, pv)
    return dist, idx


@functools.partial(jax.jit, static_argnames=("k", "radius", "tile_q",
                                             "tile_n", "interpret"))
def knn_table_sorted(pos, valid, k: int, radius: float, tile_q: int = 256,
                     tile_n: int | None = None, interpret: bool = False):
    """Same-set radius-bounded kNN table via morton sort + gated kernel.

    The row is permuted into morton order so candidate blocks are spatially
    compact (curve-order blocks span whole lidar rings — the reason raw
    AABB gates measured useless), an exact (qtile, block) box-distance
    maybe-matrix is computed in XLA, and :func:`_knn_kernel_gated` skips
    gated-off blocks outright (distance pass included).  Results are
    remapped to original indices and row order; equal to
    ``ops.neighbors.knn(pos, pos, ...)`` radius-filtered, up to packed-bit
    quantization and neighbor tie order.

    NEGATIVE RESULT (v5e, off by default — the 6th and FINAL word on block
    skipping): 22.9 vs 14.2 ms at the 23040 r=0.04 flagship table, 12.1 vs
    7.8 at 11520 r=0.1, even with free precomputed exact gates.  The
    arithmetic: one Mosaic ``lax.cond`` costs ~8us while the (256, 2048)
    block distance pass it would skip costs ~5us of VPU time — on this
    stack A GATE CAN NEVER PAY FOR ITSELF at block granularity or coarser,
    regardless of how cheap the predicate is.  Faster kNN must come from
    making unconditional work cheaper, not from skipping it.

    pos: (B, N, 3); valid: (B, N).  Returns idx (B, N, k), dist (B, N, k).
    """
    b, n, _ = pos.shape
    if tile_n is None:
        tile_n = _pow2_at_least(n, 512, 2048)
    npad = _round_up(n, max(tile_q, tile_n))
    num_q, num_b = npad // tile_q, npad // tile_n
    r2 = jnp.float32(float(radius) * float(radius))

    out_d, out_i = [], []
    for bi in range(b):
        pf = pos[bi].astype(jnp.float32)
        vl = valid[bi]
        key = _morton_keys(pf, vl)
        perm = jnp.argsort(key)                       # valid first
        pos_s = jnp.pad(pf[perm], ((0, npad - n), (0, 0)))
        val_s = jnp.pad(vl[perm], (0, npad - n))

        qlo, qhi = _block_boxes(pos_s, val_s, tile_q)   # (num_q, 3)
        blo, bhi = _block_boxes(pos_s, val_s, tile_n)   # (num_b, 3)
        gap = jnp.maximum(
            0.0, jnp.maximum(qlo[:, None] - bhi[None, :],
                             blo[None, :] - qhi[:, None]))  # (nq, nb, 3)
        maybe = (jnp.sum(gap * gap, axis=-1) <= r2).astype(jnp.int32)
        dist_s, idx_s = _knn_gated_single(
            pos_s, val_s, maybe.reshape(-1), k, radius, tile_q, tile_n,
            interpret)
        dist_s, idx_s = dist_s[:n], idx_s[:n]
        # the kernel's threshold only SEEDS at radius^2; in-radius blocks
        # can still fill trailing slots beyond it
        keep = dist_s <= radius
        idx_s = jnp.where(keep, idx_s, -1)
        dist_s = jnp.where(keep, dist_s, _INF)
        # sorted-row indices -> original ids
        idx_o = jnp.where(idx_s >= 0, perm[jnp.maximum(idx_s, 0)], -1)
        # un-permute query rows: sorted row j answers original query perm[j]
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32))
        out_d.append(dist_s[inv])
        out_i.append(idx_o[inv])
    return jnp.stack(out_i), jnp.stack(out_d)


@functools.partial(jax.jit, static_argnames=("k", "radius", "tile_q",
                                             "tile_n", "interpret"))
def knn_pallas_single(query, points, q_valid, p_valid, k: int,
                      radius: float | None = None, tile_q: int = 256,
                      tile_n: int | None = None, interpret: bool = False):
    """Single-sample Pallas kNN: query (Q,3), points (N,3) -> (Q,K) idx/dist."""
    q_n, n = query.shape[0], points.shape[0]
    if tile_n is None:
        tile_n = _pow2_at_least(n, 512, 2048)
    qp = _round_up(q_n, tile_q)
    npad = _round_up(n, tile_n)
    qT = jnp.pad(query.astype(jnp.float32),
                 ((0, qp - q_n), (0, 0))).T          # (3, QP)
    pT = jnp.pad(points.astype(jnp.float32),
                 ((0, npad - n), (0, 0))).T          # (3, NP)
    qv = jnp.pad(q_valid.astype(jnp.float32), (0, qp - q_n))[None, :]
    pv = jnp.pad(p_valid.astype(jnp.float32), (0, npad - n))[None, :]

    r2init = _INF if radius is None else float(radius) * float(radius)
    kernel = functools.partial(_knn_kernel, k=k, tile_q=tile_q,
                               tile_n=tile_n, n_total=npad, q_total=qp,
                               r2init=r2init)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(qp // tile_q,),
        in_specs=[
            pl.BlockSpec((3, tile_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i: (0, 0),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qT, pT, qv, pv)
    dist, idx = dist[:q_n], idx[:q_n]
    if radius is not None:
        # the kernel's threshold is seeded with radius^2, so beyond-radius
        # entries are incidental fills — drop them here
        keep = dist <= radius
        idx = jnp.where(keep, idx, -1)
        dist = jnp.where(keep, dist, _INF)
    return idx, dist


def knn_pallas(query, points, q_valid, p_valid, k: int,
               radius: float | None = None, interpret: bool = False):
    """Batched Pallas kNN with the same signature as ops.neighbors.knn."""
    import os

    k_eff = min(k, points.shape[1])
    # "aabb" (per-block bounding-box gates) measured NEUTRAL vs "v2" at
    # every size and radius on v5e (r3 sweeps: 15.2 vs 14.3 ms at 18432
    # k=32; identical at 32768 r=0.3) and fails Mosaic compile at >=64
    # blocks — per-block conds cost ~us each on this stack, so skipping a
    # distance pass saves less than the gate costs.  Kept for study.
    variant = os.environ.get("CCN_KNN_VARIANT", "v2")
    single = {"v2": knn_pallas_single,
              "aabb": knn_pallas_single_aabb,
              "mxu": knn_pallas_single_mxu}[variant]
    kw = {}
    if os.environ.get("CCN_KNN_TQ"):
        kw["tile_q"] = int(os.environ["CCN_KNN_TQ"])
    if os.environ.get("CCN_KNN_TN"):
        kw["tile_n"] = int(os.environ["CCN_KNN_TN"])
    fn = functools.partial(single, k=k_eff, radius=radius,
                           interpret=interpret, **kw)
    idx, dist = jax.vmap(fn)(query, points, q_valid, p_valid)
    return idx, dist
