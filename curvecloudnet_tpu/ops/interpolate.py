"""k-NN inverse-distance-squared feature interpolation (PointNet++ FP).

TPU-native replacement for reference ``knn_interpolate_pytorch3d`` /
``knn_interpolate_1D_pytorch3d`` (point_ops.py:293-355): scatter_add over COO
edges becomes a dense gather + masked weighted mean over (B, N, K) neighbor
tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import neighbors as nbr_ops
from .sampling import gather_rows


# Positions ride bf16 feature records as exact 3x-bf16 RESIDUAL triplets
# (value split, pallas_gather.split3) — NOT as bit-split hi/lo halves.
# Bit-split halves carry arbitrary bit payloads: ~1/128 of them form bf16
# denormals or NaNs, and any compute op a fusion routes the record through
# (select/where, relayout on the VPU) flushes or canonicalizes them —
# measured 3.4% corrupted position components in-graph on v5e
# (tools/tpu_smoke.py "bf16 bit-split" guard; same hazard class as the
# grid-table denormal find).  Residual triplets are VALUES — hi=bf16(x),
# mid=bf16(x-hi), lo=bf16(rest) — always normal bf16 at lidar scales
# (residuals ~x*2^-8/2^-16; exact zeros stay zero), and their sum
# reconstructs all 24 mantissa bits exactly.  Cost: 9 record channels per
# position instead of 6 (gathers are row-rate bound, so +6 bytes/row).
# (Plain bf16 casting of positions is still wrong — it catastrophically
# cancels in ``p_nbr - pos`` at lidar scales, ADVICE r2.)
POS_PACK_CH = 9  # packed channels per 3-coordinate position


def _pack_pos_bf16(p: jax.Array) -> jax.Array:
    from .pallas_gather import split3

    return split3(p)


def _unpack_pos_bf16(rec: jax.Array) -> jax.Array:
    from .pallas_gather import merge3

    return merge3(rec)


def _weighted_mean(x_nbr, d2, mask):
    """Inverse-d^2 weighted mean over the K axis with validity mask."""
    w = 1.0 / jnp.clip(d2, min=1e-16)
    w = jnp.where(mask, w, 0.0)
    num = jnp.sum(x_nbr * w[..., None], axis=-2)
    den = jnp.sum(w, axis=-1, keepdims=True)
    return num / jnp.clip(den, min=1e-16)


def knn_interpolate(x: jax.Array, pos_src: jax.Array, src_valid: jax.Array,
                    pos_dst: jax.Array, dst_valid: jax.Array,
                    k: int = 3) -> jax.Array:
    """Interpolate features from src points onto dst points (3-NN inv-d^2).

    x: (B, M, C) features at src; returns (B, N, C) at dst.
    """
    idx, dist = nbr_ops.knn(pos_dst, pos_src, dst_valid, src_valid, k)
    mask = idx >= 0
    x_nbr = nbr_ops.gather_neighbors(x, idx)  # (B, N, K, C)
    return _weighted_mean(x_nbr, dist * dist, mask)


# plain float, NOT a module-level jnp constant (those leak tracers when a
# module is first imported inside a trace — CLAUDE.md Mosaic/trace notes)
_INF = 1e30

# Static dropped-query budget for the split fp sweep: budget =
# n - SPLIT_KEEP_FRAC * m.  dropped_valid = n_valid - m_valid, and the
# kept rows run at 0.78-0.97 occupancy on calibrated configs; 0.70 holds
# margin at BOTH audited scales (nuScenes fp#4: dropped ~13.1k of 23040
# vs budget 14976; KITTI n=73728: 0.75 overflowed by 141 queries on
# realistic synthetic — caught by the telemetry gate — 0.70 gives +1.7k
# slack).  Overflow EXCESS queries keep zero neighbors (surfaced by
# fp_split_overflow telemetry + tools/calibrate.py — the same
# static-budget-plus-telemetry contract as the grid caps and curve
# window; a runtime lax.cond fallback measured 4.8 ms/step of pure
# conditional overhead, the round-3 lesson re-learned at the XLA level).
SPLIT_KEEP_FRAC = float(__import__("os").environ.get("CCN_FP_SPLIT_FRAC",
                                                     0.70))


def _cand_rank(cand_idx, cand_valid, n):
    """Row -> candidate-slot rank (-1 where not kept)."""
    b, m = cand_idx.shape
    dump = jnp.where(cand_valid, cand_idx, n)
    rank = jnp.full((b, n + 1), -1, jnp.int32)
    rank = jax.vmap(lambda r, d, a: r.at[d].set(a))(
        rank, dump,
        jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m)))
    return rank[:, :n]


def knn_interpolate_subset(x_cand: jax.Array, cand_idx: jax.Array,
                           cand_valid: jax.Array, pos_full: jax.Array,
                           full_valid: jax.Array, k: int = 3,
                           cand_pos: jax.Array | None = None,
                           table_bound=None, grid_bound=None,
                           grid_cap=None) -> jax.Array:
    """fp upsample when the source points are a SUBSET of the query row.

    Same math as :func:`knn_interpolate` (reference point_ops.py:293-341),
    but with the kept/dropped SPLIT: a KEPT query's nearest candidate is
    itself (d = 0), whose 1/clip(d^2, 1e-16) weight dominates the weighted
    mean to ~1e-12 relative — so the distance sweep runs only over the
    DROPPED queries, compacted into a static-budget row (~40% fewer
    distance passes at the flagship operating points).  Budget-overflow
    excess queries keep zero neighbors, surfaced by ``fp_split_overflow``
    telemetry and gated by tools/calibrate.py (see SPLIT_KEEP_FRAC).

    NEGATIVE RESULTS folded in here (round 4, measured on v5e):
    * serving the whole search as a filtered view of the row's shared
      k=32 table — voxel-kept candidates are too sparse inside the
      0.04/0.1 table bounds (15% of queries lack 3 kept entries), and the
      (B, N, 32) rank-gather the view needs costs 5.3 ms/step alone;
    * runtime ``lax.cond`` fallbacks (table-miss -> split -> full sweep)
      — 7 conditionals/step measured 4.8 ms of pure overhead.
    ``table_bound``/``grid_bound``/``grid_cap`` are accepted for call-site
    stability but unused.
    """
    from . import telemetry

    del table_bound, grid_bound, grid_cap
    k = min(k, cand_idx.shape[1])  # match knn()'s clamp on tiny rows
    if cand_pos is None:
        cand_pos = gather_rows(pos_full, cand_idx)
    b, n = full_valid.shape
    m = cand_idx.shape[1]

    rank = _cand_rank(cand_idx, cand_valid, n)
    kept = (rank >= 0) & full_valid
    dropped = full_valid & ~kept
    budget = min(n, max(k, n - int(SPLIT_KEEP_FRAC * m)))
    from .sampling import mask_to_indices

    d_idx, d_valid = mask_to_indices(dropped, budget, telemetry_name=None)
    if telemetry.active():
        n_drop = jnp.sum(dropped, axis=-1)
        telemetry.record(f"fp_split_overflow.n{n}",
                         jnp.sum(jnp.maximum(n_drop - budget, 0)))

    q_drop = gather_rows(pos_full, d_idx)
    di, dd = nbr_ops.knn(q_drop, cand_pos, d_valid, cand_valid, k)
    slot0 = jax.lax.broadcasted_iota(jnp.int32, (b, n + 1, k), 2) == 0
    base_i = jnp.where(
        slot0 & jnp.pad(kept, ((0, 0), (0, 1)))[..., None],
        jnp.pad(rank, ((0, 0), (0, 1)))[..., None], -1)
    base_d = jnp.where(base_i >= 0, 0.0, _INF)
    tgt = jnp.where(d_valid, d_idx, n)
    idx = jax.vmap(lambda o, t, v: o.at[t].set(v))(base_i, tgt, di)[:, :n]
    dist = jax.vmap(lambda o, t, v: o.at[t].set(v))(base_d, tgt, dd)[:, :n]

    mask = idx >= 0
    x_nbr = nbr_ops.gather_neighbors(x_cand, idx)
    return _weighted_mean(x_nbr, dist * dist, mask)


def knn_interpolate_1d(x_kept: jax.Array, kept_idx: jax.Array,
                       kept_valid: jax.Array, pos_full: jax.Array,
                       curve_id: jax.Array, valid: jax.Array,
                       k: int) -> jax.Array:
    """Interpolate kept-point features back to full resolution along curves.

    Parallel of reference ``knn_interpolate_1D_pytorch3d`` (point_ops.py:344).
    x_kept: (B, M, C) features at the kept subset; returns (B, N, C).
    """
    from . import curve1d

    nbr, mask = curve1d.knn_1d_group_superset(
        pos_full, kept_idx, kept_valid, curve_id, valid, k
    )  # indices into the kept array
    safe = jnp.maximum(nbr, 0)
    # one packed record gather (features + position) — HBM gathers charge
    # per ROW, so combining halves the fetch cost.  Positions must survive
    # the pack at full f32 precision (bf16 absolute coordinates cancel
    # catastrophically in p_nbr - pos at lidar scales), so in the bf16 path
    # they ride along as exact 3x-bf16 residual triplets (POS_PACK_CH).
    kept_pos = gather_rows(pos_full, kept_idx)
    pos_q = pos_full.astype(jnp.float32)
    if x_kept.dtype == jnp.float32:
        rec = jnp.concatenate(
            [x_kept, kept_pos.astype(jnp.float32)], axis=-1)  # (B, M, C+3)
        rec_nbr = jax.vmap(lambda rb, ib: rb[ib])(rec, safe)
        x_nbr = rec_nbr[..., :-3]
        p_nbr = rec_nbr[..., -3:]
    else:
        packed = _pack_pos_bf16(kept_pos.astype(jnp.float32))  # (B, M, 9)
        rec = jnp.concatenate(
            [x_kept.astype(jnp.bfloat16), packed], axis=-1)  # (B, M, C+9)
        rec_nbr = jax.vmap(lambda rb, ib: rb[ib])(rec, safe)
        x_nbr = rec_nbr[..., :-POS_PACK_CH]
        p_nbr = _unpack_pos_bf16(rec_nbr[..., -POS_PACK_CH:])
    d2 = jnp.sum((p_nbr - pos_q[:, :, None, :]) ** 2, axis=-1)
    return _weighted_mean(x_nbr, d2, mask).astype(x_kept.dtype)
