"""Downsampling operators with static output budgets.

TPU-native redesign of the reference samplers:
  * ``fps``        — pytorch3d ``sample_farthest_points`` (reference
                     point_ops.py:57-70) becomes a masked iterative
                     farthest-point loop under ``lax.fori_loop``.
  * ``voxel_downsample`` — ``VoxelFPS`` (reference fps_ops.py:42-60): voxel
                     hashing + keep the jittered-nearest-to-center point,
                     done with sorts instead of scatter_min.
  * ``curve_fps``  — ``CurveFPS`` (reference fps_ops.py:7-39): arclength-
                     uniform sampling along each curve with a random phase.
  * ``random_downsample`` — per-sample random subset (reference
                     pointnet2.py:49-52).

All samplers return ``(idx, idx_valid)`` where ``idx`` is ``(B, M)`` int32 of
*ascending* point indices into the input row (the reference sorts its indices
too) and ``idx_valid`` marks which of the M budget slots hold a real
selection. M is a static budget; selections past the budget are dropped
(documented semantic difference vs. the reference's dynamic shapes).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import segments

_BIG = jnp.float32(1e30)

# "auto" runs the Pallas in-VMEM FPS kernel on TPU backends (pallas_fps.py)
# and the XLA fori_loop on CPU; "xla"/"pallas" force one.
FPS_BACKEND = os.environ.get("CCN_FPS_BACKEND", "auto")


def mask_to_indices(mask: jax.Array, budget: int,
                    telemetry_name: str | None = "budget"):
    """Convert a (B, N) selection mask to (B, M) ascending indices + validity.

    Selections beyond ``budget`` are dropped (a selection at a smaller index
    always wins — scan order priority).  ``telemetry_name=None`` suppresses
    the overflow/occupancy channels (callers with their own counters, e.g.
    the fp split sweep, would otherwise pollute the downsample-budget
    channels tools/calibrate.py aggregates).
    """
    b, n = mask.shape
    # rank of each selected element among selections (0-based)
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    in_budget = mask & (rank < budget)
    # scatter selected indices into their rank slot
    slot = jnp.where(in_budget, rank, budget)  # park overflow/unselected
    out = jnp.full((b, budget + 1), 0, dtype=jnp.int32)
    out = jax.vmap(lambda o, s, v: o.at[s].set(v))(out, slot, iota)
    out = out[:, :budget]
    selected = mask.sum(axis=-1)
    count = jnp.minimum(selected, budget)
    idx_valid = jnp.arange(budget, dtype=jnp.int32)[None, :] < count[:, None]

    from . import telemetry

    if telemetry.active() and telemetry_name is not None:
        # fraction of *selected* points dropped by the static budget, and
        # how full the budget ran (both batch means)
        sel_f = selected.astype(jnp.float32)
        telemetry.record(
            f"{telemetry_name}_overflow_frac",
            jnp.mean(jnp.maximum(sel_f - budget, 0.0)
                     / jnp.maximum(sel_f, 1.0)))
        telemetry.record(f"{telemetry_name}_occupancy",
                         jnp.mean(jnp.minimum(sel_f, budget) / budget))
    return out, idx_valid


def gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: x (B, N, ...) indexed by idx (B, M) -> (B, M, ...)."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def random_downsample(key: jax.Array, valid: jax.Array, ratio: float,
                      budget: int | None = None):
    """Per-sample uniform random subset of size ceil(len*ratio)."""
    b, n = valid.shape
    if budget is None:
        budget = max(1, int(-(-n * ratio // 1)))
    scores = jax.random.uniform(key, (b, n))
    scores = jnp.where(valid, scores, _BIG)
    # keep the ceil(len*ratio) smallest scores per row
    order = jnp.argsort(scores, axis=-1)
    rank_of = jnp.zeros_like(order).at[
        jnp.arange(b)[:, None], order
    ].set(jnp.broadcast_to(jnp.arange(n, dtype=order.dtype), (b, n)))
    lengths = segments.lengths_from_valid(valid)
    keep_count = jnp.ceil(lengths.astype(jnp.float32) * ratio).astype(jnp.int32)
    mask = valid & (rank_of < keep_count[:, None])
    return mask_to_indices(mask, budget)


def fps(pos: jax.Array, valid: jax.Array, ratio: float,
        key: jax.Array | None = None, budget: int | None = None):
    """Masked farthest point sampling, K = ceil(len * ratio) per sample.

    Mirrors pytorch3d's ``sample_farthest_points(random_start_point=True)``
    used by the reference (point_ops.py:57-70). Runs a fori_loop of
    ``budget`` iterations; slots past each sample's own K are invalidated.
    """
    b, n, _ = pos.shape
    use_pallas = (FPS_BACKEND == "pallas" or
                  (FPS_BACKEND == "auto"
                   and jax.default_backend() not in ("cpu",)))
    if use_pallas:
        from . import pallas_fps

        return pallas_fps.fps_pallas(pos, valid, ratio, key=key,
                                     budget=budget)
    if budget is None:
        budget = max(1, int(-(-n * ratio // 1)))
    budget = min(budget, n)
    lengths = segments.lengths_from_valid(valid)
    k_per_sample = jnp.minimum(
        jnp.ceil(lengths.astype(jnp.float32) * ratio).astype(jnp.int32), budget
    )

    if key is None:
        start = jnp.zeros((b,), dtype=jnp.int32)
    else:
        u = jax.random.uniform(key, (b,))
        start = (u * jnp.maximum(lengths, 1).astype(jnp.float32)).astype(jnp.int32)
        start = jnp.minimum(start, jnp.maximum(lengths - 1, 0))

    inf_dist = jnp.where(valid, _BIG, -_BIG)  # invalid never selected

    def body(i, carry):
        min_d2, selected, last = carry
        last_pos = gather_rows(pos, last[:, None])[:, 0]  # (B, 3)
        d2 = jnp.sum((pos - last_pos[:, None, :]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        cand = jnp.where(valid, min_d2, -_BIG)
        nxt = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        selected = selected.at[:, i].set(last)
        return min_d2, selected, nxt

    selected0 = jnp.zeros((b, budget), dtype=jnp.int32)
    _, selected, _ = jax.lax.fori_loop(
        0, budget, body, (inf_dist, selected0, start)
    )
    slot_valid = jnp.arange(budget, dtype=jnp.int32)[None, :] < k_per_sample[:, None]
    # return in ascending index order like the reference (point_ops.py:69)
    sort_key = jnp.where(slot_valid, selected, n + 1)
    order = jnp.argsort(sort_key, axis=-1)
    selected = jnp.take_along_axis(selected, order, axis=-1)
    slot_valid = jnp.take_along_axis(slot_valid, order, axis=-1)
    selected = jnp.where(slot_valid, selected, 0)
    return selected, slot_valid


def voxel_downsample(pos: jax.Array, valid: jax.Array, voxel_size: float,
                     budget: int, key: jax.Array | None = None):
    """Keep, per occupied voxel, the point nearest the voxel corner (+jitter).

    Redesign of ``VoxelFPS`` (reference fps_ops.py:51-60): instead of
    ``torch.unique`` + ``scatter_min`` (dynamic #voxels), sort each row by
    (voxel key, jittered distance) and keep first-of-key — fully static.
    """
    b, n, _ = pos.shape
    scaled = pos / voxel_size
    vox = jnp.floor(scaled).astype(jnp.int32)
    # Injective voxel key for coords within +-2^15 voxels of the origin
    # (amply sufficient for normalized scans): key_a packs x,y into 16 bits
    # each; key_b carries z (forced even so the odd invalid sentinel can
    # never collide).
    vox_u = vox.astype(jnp.uint32) & jnp.uint32(0xFFFF)
    key_a = (vox_u[..., 0] << 16) | vox_u[..., 1]
    key_b = vox[..., 2].astype(jnp.uint32) << 1
    dist = jnp.linalg.norm(vox.astype(jnp.float32) - scaled, axis=-1)
    if key is not None:
        dist = dist + jax.random.uniform(key, dist.shape) * (voxel_size / 4)
    key_a = jnp.where(valid, key_a, jnp.uint32(0xFFFFFFFF))
    key_b = jnp.where(valid, key_b, jnp.uint32(0xFFFFFFFF))

    # one lexicographic multi-key sort by (key_a, key_b, dist), carrying the
    # original index — rows end up grouped by voxel with min-distance first
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    sa, sb, _, order = jax.lax.sort(
        (key_a, key_b, dist, iota), dimension=-1, num_keys=3)
    firsts = jnp.concatenate(
        [jnp.ones((b, 1), bool),
         (sa[:, 1:] != sa[:, :-1]) | (sb[:, 1:] != sb[:, :-1])],
        axis=-1,
    )
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)
    winners_sorted = firsts & sorted_valid
    # map winner flags back to original positions
    mask = jnp.zeros((b, n), bool)
    mask = jax.vmap(lambda m, o, w: m.at[o].set(w))(mask, order, winners_sorted)
    return mask_to_indices(mask, budget)


def curve_fps(pos: jax.Array, curve_id: jax.Array, valid: jax.Array,
              arclen_spacing: float, budget: int,
              key: jax.Array | None = None):
    """Arclength-uniform sampling along each curve (reference fps_ops.py:16-39).

    Every curve start is always kept; afterwards one point per
    ``arclen_spacing`` of geodesic length, with a per-curve pseudo-random
    phase derived exactly like the reference (hash of the curve's start index
    times a shared random scalar, modulo the spacing).
    """
    g = segments.geodesic_arclength(pos, curve_id, valid)
    start_idx = segments.curve_start_index(curve_id, valid)
    if key is None:
        rand = jnp.float32(0.0)
    else:
        rand = jax.random.uniform(key, ())
    phase = jnp.mod(start_idx.astype(jnp.float32) * 117.0 * rand, arclen_spacing)
    g = g + phase
    bins = jnp.round(g / arclen_spacing)
    prev_bins = jnp.roll(bins, 1, axis=-1)
    new_bin = bins != prev_bins
    new_bin = new_bin.at[:, 0].set(True)
    starts = segments.curve_starts(curve_id, valid)
    mask = (new_bin | starts) & valid
    return mask_to_indices(mask, budget)
