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


def _pack_f32_as_2bf16(p: jax.Array) -> jax.Array:
    """Bit-split (..., C) float32 into (..., 2C) bfloat16 (hi|lo halves).

    Gathers move bits, not values, so packing positions this way lets a
    bf16 feature record carry EXACT f32 coordinates through one combined
    row gather.  (Casting positions to bf16 instead loses ~8 mantissa bits
    of the absolute coordinate, which catastrophically cancels in
    ``p_nbr - pos`` at lidar scales — see ADVICE r2.)
    """
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    hi = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16),
                                      jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16),
                                      jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=-1)


def _unpack_2bf16_as_f32(rec: jax.Array) -> jax.Array:
    """Inverse of :func:`_pack_f32_as_2bf16` ((..., 2C) bf16 -> (..., C) f32)."""
    c = rec.shape[-1] // 2
    hi = jax.lax.bitcast_convert_type(rec[..., :c], jnp.uint16).astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(rec[..., c:], jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


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


def knn_interpolate_subset(x_cand: jax.Array, cand_idx: jax.Array,
                           cand_valid: jax.Array, pos_full: jax.Array,
                           full_valid: jax.Array, k: int = 3,
                           cand_pos: jax.Array | None = None,
                           table_bound=None, grid_bound=None,
                           grid_cap=None) -> jax.Array:
    """fp upsample when the source points are a SUBSET of the query row.

    Same math as :func:`knn_interpolate` (reference point_ops.py:293-341),
    but the k-NN search is served from the query row's shared neighbor
    table (``ops/neighbors.knn_from_table_subset``) whenever every valid
    query has >= k kept entries there — deleting the (Q, M) distance
    sweep.  A counted ``lax.cond`` falls back to the exact whole-row
    search for any scan where the table can't prove the answer, so results
    never deviate; the fallback count lands in eval telemetry
    (``fp_table_fallback``).
    """
    k = min(k, cand_idx.shape[1])  # match knn()'s clamp on tiny rows
    if cand_pos is None:
        cand_pos = gather_rows(pos_full, cand_idx)
    res = nbr_ops.knn_from_table_subset(
        pos_full, full_valid, cand_idx, cand_valid, k,
        table_bound=table_bound, grid_bound=grid_bound, grid_cap=grid_cap)
    if res is None:
        idx, dist = nbr_ops.knn(pos_full, cand_pos, full_valid,
                                cand_valid, k)
    else:
        ok, t_i, t_d, n_unserv = res
        from . import telemetry

        if telemetry.active():
            telemetry.record("fp_table_fallback", n_unserv)

        def _brute(_):
            return nbr_ops.knn(pos_full, cand_pos, full_valid,
                               cand_valid, k)

        idx, dist = jax.lax.cond(ok, lambda _: (t_i, t_d), _brute, None)
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
    # they ride along as exact bit-split hi/lo bf16 pairs.
    kept_pos = gather_rows(pos_full, kept_idx)
    pos_q = pos_full.astype(jnp.float32)
    if x_kept.dtype == jnp.float32:
        rec = jnp.concatenate(
            [x_kept, kept_pos.astype(jnp.float32)], axis=-1)  # (B, M, C+3)
        rec_nbr = jax.vmap(lambda rb, ib: rb[ib])(rec, safe)
        x_nbr = rec_nbr[..., :-3]
        p_nbr = rec_nbr[..., -3:]
    else:
        packed = _pack_f32_as_2bf16(kept_pos.astype(jnp.float32))  # (B, M, 6)
        rec = jnp.concatenate(
            [x_kept.astype(jnp.bfloat16), packed], axis=-1)  # (B, M, C+6)
        rec_nbr = jax.vmap(lambda rb, ib: rb[ib])(rec, safe)
        x_nbr = rec_nbr[..., :-6]
        p_nbr = _unpack_2bf16_as_f32(rec_nbr[..., -6:])
    d2 = jnp.sum((p_nbr - pos_q[:, :, None, :]) ** 2, axis=-1)
    return _weighted_mean(x_nbr, d2, mask).astype(x_kept.dtype)
