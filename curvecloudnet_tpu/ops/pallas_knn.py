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

Negative results (measured on v5e; the experimental kernels were deleted
in round 4 after the round-3 gate-family conclusion closed them — full
numbers in docs/ROADMAP.md "Parked floors"):
  * AABB per-block gates: neutral at every size/radius (boxes too loose
    on clustered lidar); early-exit/while extraction; segmented
    extraction; window+far-pass; morton ordering.
  * MXU hit check: a (TQ,8)x(8,TN) lifted-distance block gate was
    bit-identical but 35% slower (Mosaic pads the K=8 f32 contraction to
    6 bf16 MXU passes at HIGHEST precision).
  * Morton-permuted rows + precomputed exact (qtile, block) box gates via
    scalar prefetch (the strongest possible gate): 22.9 vs 14.2 ms at the
    23040 r=0.04 table — one Mosaic cond (~8us) costs more than the
    (256, 2048) distance pass it skips (~5us).  Gates can never pay at
    >= block granularity on this stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30
_GOOD_MAX = 9e29  # anything >= this is a fill, not a real distance


def _unroll_k(k, body, init):
    """Python-unroll the k extraction/merge rounds (default ON).

    A/B on v5e (tools/unroll_ab.py): 0.98 -> 0.57 ms at the 15872x18432
    k=32 r=0.08 brute search — the fori_loop's per-iteration overhead
    dominates the narrow (TQ, 2k) merge rounds.  The grid-tail kernel
    measures the opposite (wide packed rows; ops/pallas_topk._unrolled,
    default OFF there).  CCN_KNN_UNROLL=0 restores the loops."""
    import os

    if os.environ.get("CCN_KNN_UNROLL", "1") != "0":
        st = init
        for j in range(k):
            st = body(j, st)
        return st
    return jax.lax.fori_loop(0, k, body, init)


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
        cand, _ = _unroll_k(
            k, round_body,
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
        new_d, new_i, _ = _unroll_k(
            k, merge_body,
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


def _round_up(x, m):
    return -(-x // m) * m


def _pow2_at_least(x, lo, hi):
    p = lo
    while p < min(x, hi):
        p *= 2
    return p



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
    kw = {}
    if os.environ.get("CCN_KNN_TQ"):
        kw["tile_q"] = int(os.environ["CCN_KNN_TQ"])
    if os.environ.get("CCN_KNN_TN"):
        kw["tile_n"] = int(os.environ["CCN_KNN_TN"])
    fn = functools.partial(knn_pallas_single, k=k_eff, radius=radius,
                           interpret=interpret, **kw)
    idx, dist = jax.vmap(fn)(query, points, q_valid, p_valid)
    return idx, dist
