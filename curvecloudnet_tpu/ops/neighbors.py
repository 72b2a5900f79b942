"""Dense k-nearest-neighbor / ball-query search for batch-padded point clouds.

TPU-native replacement for the reference's CUDA neighbor stack — pytorch3d
``knn_points`` / ``ball_query`` and the FRNN grid-hash kernel (reference
``src/models/utils/point_ops.py:73-111,431-461``). Instead of a grid hash with
dynamic bucket sizes, distances are computed as blocked matmuls
(|q|^2 + |p|^2 - 2 q.p rides the MXU) with a streaming top-k merge, so memory
stays O(B * Q * block) regardless of N.

Outputs are always dense ``(B, Q, K)`` neighbor indices with ``-1`` padding —
the same dense form the reference's fast paths prefer (dgcnn.py:162-207).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)

# kNN backend dispatch ("auto" | "xla" | "grid" | "pallas"):
#   * fixed-radius queries on TPU use the grid-hash path (grid_knn.py — the
#     FRNN equivalent): O(Q·27·cap) HBM traffic instead of the brute-force
#     O(Q·N) distance materialization;
#   * unbounded kNN and CPU runs use the blocked-matmul brute force below.
KNN_BACKEND = os.environ.get("CCN_KNN_BACKEND", "auto")


# Largest candidate count where the (exact) Pallas brute kernel stays
# cheaper than grid-hash approximation; also bounds shared-table rows.
# Covers real nuScenes sweeps' first search row (36864-pad -> 23040 after
# the calibrated sa-geo budget).  Env-overridable for dispatch A/Bs.
BRUTE_MAX_N = int(os.environ.get("CCN_BRUTE_MAX_N", 24576))


def grid_cap(k: int) -> int:
    """Per-cell candidate cap for the grid path.

    Sized for POST-DOWNSAMPLING row densities — the only rows the dispatch
    routes to the grid (> BRUTE_MAX_N) are products of curve-fps/voxel
    stages whose spacing bounds cell occupancy (measured max ~200/cell on
    the curve-fps 65536 row; cap 192 -> 0.9997 candidate recall there).
    tests/test_grid_recall.py floors exact-set recall at 0.95 at the real
    operating points with this rule; raw full-density rows never reach the
    grid.
    """
    return max(192, 4 * k)


# 8-stencil grid routing for mid-size rows with small radii: the Pallas
# brute kernel's extraction floor makes the flagship 23040-row r=0.04 table
# cost ~13ms/step, while 2r-cell occupancy there maxes at ~156 (3 seeds of
# realistic synthetic sweeps, tools-measured) so an 8-stencil grid at
# cap=192 is LOSSLESS and ~2x cheaper (8 wide-row gathers/query vs a
# (Q, N) distance+extraction sweep).  Radii above GRID8_MAX_R make 2r-cell
# occupancy outgrow any affordable cap (the round-2 hazard: r=0.3 cells
# hold 1000+ points), so those stay on the exact brute path.
GRID8_MIN_N = int(os.environ.get("CCN_GRID8_MIN_N", 12288))
GRID8_MAX_R = float(os.environ.get("CCN_GRID8_MAX_R", 0.05))
GRID8_CAP = int(os.environ.get("CCN_GRID8_CAP", 192))


def _grid8_ok(n: int, radius) -> bool:
    # capped at BRUTE_MAX_N: the cap-192 occupancy measurement covers the
    # rows the brute path serves today; larger rows (KITTI curve-fps
    # 65536: ~200/cell at cell=r -> ~800 at 2r) need a bigger measured cap
    # before the 8-stencil is safe there.
    if os.environ.get("CCN_GRID8", "1") == "0":
        return False
    return (radius is not None and GRID8_MIN_N <= n <= BRUTE_MAX_N
            and float(radius) <= GRID8_MAX_R
            and jax.default_backend() not in ("cpu",))


def _pick_backend(dim: int, radius, n: int) -> str:
    if KNN_BACKEND != "auto":
        return KNN_BACKEND
    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel and dim == 3:
        # Small-radius searches on mid-size-and-up rows take the 8-stencil
        # grid: 2r-cell occupancy is bounded there (cap 192 lossless at
        # the flagship operating points) and it beats the brute kernel's
        # extraction floor ~2x.
        if _grid8_ok(n, radius):
            return "grid8"
        # The Pallas brute kernel is EXACT for fixed-radius kNN (the k
        # nearest within r are a subset of the k nearest overall) and cheap
        # up to mid-level sizes; the grid's per-cell cap truncates dense
        # cells (tests/test_grid_recall.py), so reserve it for full-res
        # rows where brute-force N^2 would dominate.  Exception: LARGE
        # radii on mid-size rows (decoder sgcnn r=0.3 on the KITTI
        # real-pad voxel-0.03 row) put ~1000+ points in one r-sized cell —
        # far beyond any affordable cap — so those stay exact too
        # (~30 ms vs wrong neighbors).
        if radius is not None and n > BRUTE_MAX_N and not (
                n <= 40960 and radius >= 0.15):
            return "grid"
        return "pallas"
    return "xla"


def _merge_topk(d_a, i_a, d_b, i_b, k):
    """Merge two (B, Q, *) candidate sets, keep k smallest distances."""
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    neg_d, sel = jax.lax.top_k(-d, k)
    return -neg_d, jnp.take_along_axis(i, sel, axis=-1)


# Below this k, extracting minima one-by-one (k VPU passes over the block)
# is far cheaper than the sort XLA lowers top_k to: sorting a 4099-wide
# block costs ~35 ms at (16k, 4099) on v5e; 3 min-extraction passes cost <1.
_SMALL_K = 8


def _extract_k_smallest(d2, idx, k):
    """k rounds of masked argmin over the last axis -> (B, Q, k) d/i."""
    b, q, _ = d2.shape

    def body(j, st):
        cand_d, cand_i, d2 = st
        amin = jnp.argmin(d2, axis=-1)                       # (B, Q)
        dmin = jnp.take_along_axis(d2, amin[..., None], -1)  # (B, Q, 1)
        imin = jnp.take_along_axis(idx, amin[..., None], -1)
        cand_d = jax.lax.dynamic_update_index_in_dim(cand_d, dmin[..., 0],
                                                     j, -1)
        cand_i = jax.lax.dynamic_update_index_in_dim(cand_i, imin[..., 0],
                                                     j, -1)
        d2 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
            == amin[..., None], _INF, d2)
        return cand_d, cand_i, d2

    cand_d = jnp.full((b, q, k), _INF)
    cand_i = jnp.full((b, q, k), -1, jnp.int32)
    cand_d, cand_i, _ = jax.lax.fori_loop(0, k, body, (cand_d, cand_i, d2))
    return cand_d, cand_i


def knn(query: jax.Array, points: jax.Array, q_valid: jax.Array,
        p_valid: jax.Array, k: int, radius: float | None = None,
        block: int = 4096, cap_override: int | None = None,
        force_grid: bool = False):
    """Exact masked kNN: for each valid query, the k nearest valid points.

    Args:
      query:  (B, Q, 3) query positions.
      points: (B, N, 3) candidate positions.
      q_valid, p_valid: validity masks (B, Q) / (B, N).
      k: number of neighbors (static).
      radius: if given, neighbors farther than ``radius`` are dropped
        (ball-query semantics; the reference caps ball queries at K=128,
        point_ops.py:81 — here K is the explicit budget).
      block: candidate-block size for the streaming top-k merge.

    Returns:
      idx:  (B, Q, K) int32 neighbor indices into N, -1 where no neighbor.
      dist: (B, Q, K) float32 Euclidean distances (INF where idx == -1).
    """
    b, q, _ = query.shape
    n = points.shape[1]
    k = min(k, n)
    backend = _pick_backend(query.shape[-1], radius, n)
    if force_grid and radius is not None:
        # proven-cap shared tables (see _proven_grid_first): the caller has
        # a spec-level occupancy proof, so the grid is exact there even
        # where _pick_backend's generic rules would choose brute (on CPU
        # the grid's XLA tail runs too — model dispatch gates CPU off via
        # _proven_grid_first, but tests exercise this path directly)
        backend = "grid"
    if backend == "grid8" and radius is not None:
        from . import grid_knn as grid_mod

        return grid_mod.grid_knn(query, points, q_valid, p_valid, k,
                                 radius=float(radius), cap=GRID8_CAP,
                                 stencil=8, overflow_planes=2)
    if backend == "grid" and radius is not None:
        from . import grid_knn as grid_mod

        # 2 shared overflow planes absorb dense-cell cap spills (measured
        # ~0.03% of points at the KITTI operating points) for +2/27 extra
        # extraction width — recall becomes lossless up to 2*cap global
        # overflow instead of silently truncating.  cap_override carries a
        # spec-PROVEN occupancy bound (voxel-produced rows) that shrinks
        # the table rows below the generic measured cap.
        # proven-cap tables run with TIGHT caps (zero headroom by design),
        # so hash collisions merging two near-full cells into one row are
        # the remaining spill source; +2 hash bits cuts occupied-cell
        # collision pairs 4x.  ONLY for small rows: the bump is neutral at
        # the flagship 11520 row (2^16-row table), but at the KITTI 36864
        # row the 2^18 table (268MB) destroyed the plane gathers' DRAM
        # page locality (6.5 -> 18.6 ms measured) — larger rows keep the
        # default bits and rely on the 2 overflow planes + drop telemetry,
        # the same posture every unproven grid row runs with.
        hb = None
        if cap_override:
            hb = grid_mod.default_hash_bits(points.shape[1])
            hb = hb + 2 if hb + 2 <= 16 else hb
        return grid_mod.grid_knn(query, points, q_valid, p_valid, k,
                                 radius=float(radius),
                                 cap=cap_override or grid_cap(k),
                                 hash_bits=hb, overflow_planes=2)
    if backend == "pallas":
        from . import pallas_knn

        return pallas_knn.knn_pallas(query, points, q_valid, p_valid, k,
                                     radius=radius)
    block = min(block, n)
    num_blocks = -(-n // block)
    n_pad = num_blocks * block
    if n_pad != n:
        pad = n_pad - n
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        p_valid = jnp.pad(p_valid, ((0, 0), (0, pad)))

    q_sq = jnp.sum(query * query, axis=-1)  # (B, Q)

    def scan_body(carry, blk):
        best_d, best_i = carry
        p_blk, pv_blk, base = blk  # (B, block, 3), (B, block), ()
        p_sq = jnp.sum(p_blk * p_blk, axis=-1)  # (B, block)
        # (B, Q, block) squared distances via MXU. precision=highest keeps
        # full f32 (default truncates to bf16, which misorders near-ties).
        cross = jnp.einsum(
            "bqc,bnc->bqn", query, p_blk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = q_sq[:, :, None] + p_sq[:, None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(pv_blk[:, None, :], d2, _INF)
        idx_blk = base + jnp.arange(block, dtype=jnp.int32)
        idx_blk = jnp.broadcast_to(idx_blk[None, None, :], d2.shape)
        if k <= _SMALL_K:
            cand_d, cand_i = _extract_k_smallest(d2, idx_blk, k)
            best_d, best_i = _merge_topk(best_d, best_i, cand_d, cand_i, k)
        else:
            best_d, best_i = _merge_topk(best_d, best_i, d2, idx_blk, k)
        return (best_d, best_i), None

    init_d = jnp.full((b, q, k), _INF)
    init_i = jnp.full((b, q, k), -1, dtype=jnp.int32)
    p_blocks = points.reshape(b, num_blocks, block, -1).swapaxes(0, 1)
    pv_blocks = p_valid.reshape(b, num_blocks, block).swapaxes(0, 1)
    bases = (jnp.arange(num_blocks) * block).astype(jnp.int32)
    (best_d2, best_i), _ = jax.lax.scan(
        scan_body, (init_d, init_i), (p_blocks, pv_blocks, bases)
    )

    good = best_d2 < _INF
    if radius is not None:
        good = good & (best_d2 <= radius * radius)
    good = good & q_valid[:, :, None]
    idx = jnp.where(good, best_i, -1)
    dist = jnp.where(good, jnp.sqrt(best_d2), _INF)
    return idx, dist


def ball_query(query, points, q_valid, p_valid, radius: float, k: int,
               block: int = 4096):
    """Radius query returning up to k nearest-in-ball neighbors.

    Note: pytorch3d's ball_query returns the *first* K points inside the ball
    in index order; returning the K *nearest* (as here) is a strictly
    better-behaved superset for max/mean/attention aggregation and keeps one
    code path. Documented deviation.
    """
    return knn(query, points, q_valid, p_valid, k, radius=radius, block=block)


# --- shared per-row neighbor tables ---------------------------------------
#
# Within one forward pass, every 3D neighbor search at a given resolution row
# is a filtered view of ONE exact unbounded k=TABLE_K search on that row's
# positions: the k'-nearest-within-r of any query are a prefix of its
# TABLE_K-nearest (ascending distance) whenever k' <= TABLE_K, and a
# downsampled query's neighbors are just its row of the table.  The reference
# instead re-runs FRNN per module (dgcnn.py:162, pointnet2.py:62-67); sharing
# removes ~half the search cost of the flagship forward.

TABLE_K = 32
TABLE_MAX_N = BRUTE_MAX_N  # beyond this, per-(row, radius) grid tables win
_TABLE_CACHE: dict | None = None


class shared_knn_scope:
    """Trace-scoped cache of per-row neighbor tables (used by the model's
    ``__call__``; keys are trace-time array identities, so the cache must not
    outlive one trace)."""

    def __enter__(self):
        global _TABLE_CACHE
        self._prev = _TABLE_CACHE
        _TABLE_CACHE = {}
        return self

    def __exit__(self, *exc):
        global _TABLE_CACHE
        _TABLE_CACHE = self._prev
        return False


def _row_table(pos: jax.Array, valid: jax.Array,
               bound: float | None = None):
    """Build-or-fetch the row's shared table.

    ``bound`` (max radius over ALL the row's consumers, computed from the
    model spec) makes the search radius-bounded: the Pallas kernel seeds its
    per-query pruning threshold at bound^2, so blocks with no candidate
    inside the bound skip extraction outright.  Every consumer filters at
    radius <= bound, so results are unchanged.
    """
    if _TABLE_CACHE is None or pos.shape[1] > TABLE_MAX_N:
        return None
    # the bound is part of the key: a consumer passing a different (e.g.
    # larger or None) bound for the same row must NOT silently read a table
    # truncated at the first consumer's radius
    key = (id(pos), id(valid), None if bound is None else float(bound))
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is pos and hit[1] is valid:
        return hit[2]
    n = pos.shape[1]
    table = knn(pos, pos, valid, valid, min(TABLE_K, n), radius=bound)
    _TABLE_CACHE[key] = (pos, valid, table)
    return table


def _grid_row_table(pos: jax.Array, valid: jax.Array, radius: float,
                    cap: int | None = None):
    """Shared table for rows ABOVE the brute limit: one grid search per
    (row, radius) — consumers whose radius the table covers share it by
    prefix filtering.  ``cap`` tightens the per-cell budget where the
    spec PROVES occupancy (voxel-produced rows): smaller table rows mean
    proportionally cheaper plane gathers and extraction width."""
    if _TABLE_CACHE is None:
        return None
    key = (id(pos), id(valid), float(radius), cap)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is pos and hit[1] is valid:
        return hit[2]
    table = knn(pos, pos, valid, valid, min(TABLE_K, pos.shape[1]),
                radius=float(radius), cap_override=cap,
                force_grid=cap is not None)
    _TABLE_CACHE[key] = (pos, valid, table)
    return table


def _filter_table(idx, dist, k: int, radius):
    if radius is not None:
        keep = dist <= radius
        idx = jnp.where(keep, idx, -1)
        dist = jnp.where(keep, dist, _INF)
    # entries are ascending by distance, so post-filter valid ones remain a
    # prefix: the first k columns are exactly the k nearest within radius
    return idx[..., :k], dist[..., :k]


def _grid_table_radius(radius, grid_bound):
    """The radius one shared grid table is built at: the spec-computed
    ``grid_bound`` (max grid-eligible consumer radius on the row, declared
    only where voxel spacing proves the wider cell can't overflow the cap)
    when it covers this search, else the search's own radius."""
    if grid_bound is not None and radius is not None \
            and float(grid_bound) >= float(radius):
        return float(grid_bound)
    return radius


# Proven-cap grid tables can also beat the exact brute table BELOW the
# brute limit: the flagship 11520 voxel-0.03 row (bound 0.1, proven cap 64)
# pays 6.4 ms/step on the brute kernel's extraction floor, while a
# 27-stencil cell-0.1 grid scans only 29*64 = 1856 candidates/query.
# Conditions: the grid bound must cover EVERY consumer (grid_bound ==
# table_bound, so the brute table isn't also built) and the candidate
# width must be well under the brute width (factor 3: the grid's
# constant-factor overhead — plane gathers + build sort — costs ~3x a
# brute distance pass per candidate, measured on the 23040 r=0.04 table).
GRID_PROVEN_MIN_N = int(os.environ.get("CCN_GRID_PROVEN_MIN_N", 8192))


def _proven_grid_first(n: int, table_bound, grid_bound, cap) -> bool:
    if grid_bound is None or cap is None or table_bound is None:
        return False
    if os.environ.get("CCN_GRID_PROVEN", "1") == "0":
        return False
    if jax.default_backend() in ("cpu",):
        return False
    if float(grid_bound) != float(table_bound):
        return False   # some consumer outruns the grid table: brute-only
    return n >= GRID_PROVEN_MIN_N and 29 * cap * 3 <= n


def same_set_knn(pos, valid, k: int, radius: float | None = None,
                 table_bound: float | None = None,
                 grid_bound: float | None = None,
                 grid_cap: int | None = None):
    """kNN of a 3D point set against itself via the shared row table."""
    if k <= TABLE_K and pos.shape[-1] == 3:
        if radius is not None and _proven_grid_first(
                pos.shape[1], table_bound, grid_bound, grid_cap):
            table = _grid_row_table(pos, valid, float(grid_bound), grid_cap)
            if table is not None:
                return _filter_table(*table, k, radius)
        table = _row_table(pos, valid, table_bound)
        if table is not None:
            return _filter_table(*table, k, radius)
        if radius is not None and pos.shape[1] > TABLE_MAX_N:
            gr = _grid_table_radius(radius, grid_bound)
            table = _grid_row_table(pos, valid, gr,
                                    grid_cap if gr == grid_bound else None)
            if table is not None:
                return _filter_table(*table, k,
                                     radius if gr != radius else None)
    return knn(pos, pos, valid, valid, k, radius=radius)


def subset_knn(pos, valid, sub_idx, sub_valid, k: int,
               radius: float | None = None,
               table_bound: float | None = None,
               grid_bound: float | None = None,
               grid_cap: int | None = None):
    """kNN of row-subset queries ``pos[sub_idx]`` against the full set."""
    if k <= TABLE_K and pos.shape[-1] == 3:
        table = None
        if radius is not None and _proven_grid_first(
                pos.shape[1], table_bound, grid_bound, grid_cap):
            table = _grid_row_table(pos, valid, float(grid_bound), grid_cap)
        if table is None:
            table = _row_table(pos, valid, table_bound)
        if table is None and radius is not None \
                and pos.shape[1] > TABLE_MAX_N:
            gr = _grid_table_radius(radius, grid_bound)
            table = _grid_row_table(pos, valid, gr,
                                    grid_cap if gr == grid_bound else None)
            if table is not None and gr == radius:
                # only drop the radius filter once the radius-filtered
                # grid table is actually in hand — otherwise the direct
                # fallback below must still run radius-bounded
                radius = None
        if table is not None:
            idx, dist = table
            idx = jnp.take_along_axis(idx, sub_idx[..., None], axis=1)
            dist = jnp.take_along_axis(dist, sub_idx[..., None], axis=1)
            idx = jnp.where(sub_valid[..., None], idx, -1)
            dist = jnp.where(sub_valid[..., None], dist, _INF)
            return _filter_table(idx, dist, k, radius)
    q = jnp.take_along_axis(pos, sub_idx[..., None], axis=1)
    return knn(q, pos, sub_valid, valid, k, radius=radius)


# NEGATIVE RESULT (round 4): serving the fp upsample's subset search as a
# filtered VIEW of the row's shared k=32 table was built and measured, then
# removed.  Correct in principle (every table entry is within the query's
# reach, so >= k kept entries prove the answer), but (a) voxel-kept
# candidates are too sparse inside the small table bounds — 15% of
# flagship fp#4 queries lack 3 kept entries within 0.04, so the counted
# whole-row fallback fired on every scan — and (b) the view's own
# (B, N, 32) rank-gather costs 5.3 ms/step (element gathers pay the HBM
# row rate), with lax.cond dispatch adding 4.8 ms across the fp steps.
# The kept/dropped split (ops/interpolate.knn_interpolate_subset) keeps
# the win without any of that.  Diagnosing the always-unservable tables
# here is also what uncovered the denormal-flush grid-table corruption.


def add_self_loops(idx: jax.Array, q_valid: jax.Array) -> jax.Array:
    """Prepend each query's own index as neighbor 0 (reference dgcnn.py:166-168).

    Assumes query set == point set (self index = query position in row).
    """
    b, q, _ = idx.shape
    self_idx = jnp.broadcast_to(
        jnp.arange(q, dtype=idx.dtype)[None, :, None], (b, q, 1)
    )
    self_idx = jnp.where(q_valid[:, :, None], self_idx, -1)
    return jnp.concatenate([self_idx, idx], axis=-1)


def _tile_gather_on(train: bool) -> bool:
    """Tile-unique gather dispatch: a clear win on the TRAIN step (the
    VJP's unique scatter-add beats the Q*K-row scatter floor) and, once
    the fused edge group kernel consumes the k-major slab directly
    (CCN_FUSED_GROUP includes ``edge``), at eval too — measured on v5e:
    nuScenes 576.8k -> 615.0k, KITTI 504.6k -> 538.9k pts/s (each knob
    alone is ~+1.5%; together +6.6% — the packed-sort prep feeds the
    fused kernel without the relayout that made eval neutral before).
    CCN_TILE_GATHER: 0 = off, train = train steps only, 1 (default) =
    everywhere."""
    mode = os.environ.get("CCN_TILE_GATHER", "1")
    if mode == "0" or jax.default_backend() in ("cpu",):
        return False
    return mode == "1" or (mode == "train" and train)


def _tile_gather_preps(idx: jax.Array, n_src: int):
    """Per-batch-row tile-gather preps, memoized on the idx array.

    The two dense layers of an edge conv (and the with-pos + plain
    fetches of one grouping) gather with the SAME kNN table — the three
    prep sorts (ops/pallas_gather.tile_prep) are identical, so they are
    shared through the trace-scoped memo that models/base.py enters
    (segments.memo_scope).  Keyed by array identity + n_src.
    """
    from . import pallas_gather as pg
    from .segments import _memo

    def build():
        return [pg.gather_prep(idx[b], n_src) for b in range(idx.shape[0])]

    return _memo(f"tile_gather_prep.{n_src}", build, idx)


def gather_neighbors(x: jax.Array, idx: jax.Array,
                     layout: Optional[str] = None,
                     train: bool = False, fill: bool = True) -> jax.Array:
    """Gather features for dense neighbor indices.

    x: (B, N, C); idx: (B, Q, K) with -1 padding -> (B, Q, K, C) with zeros
    at padded slots (the FRNN ``frnn_gather`` equivalent, dgcnn.py:172).

    ``layout="kq"``: idx is (B, K, Q) position-major over *curve-ordered*
    queries -> (B, K, Q, C).  On TPU this dispatches to the tile-unique
    one-hot MXU gather (ops/pallas_gather.py) when profitable: consecutive
    queries share ~7x of their neighbor rows, so fetching each tile's
    unique rows once and routing them on the MXU beats the ~7ns/row HBM
    gather floor — and its VJP replaces the Q*K-row scatter.

    ``fill=False`` skips the invalid-slot zero select: padded slots read
    row 0 (finite garbage).  Only valid when EVERY consumer masks by the
    neighbor-validity mask before anything unmasked (aggregation fills /
    masked BN / attend logits mask) — true for the eval grouped-conv
    paths, where the (B, Q, K, C) select costs a full elementwise pass.
    """
    if layout == "kq" and _tile_gather_on(train):
        from . import pallas_gather as pg

        k, q = idx.shape[1], idx.shape[2]
        if pg.viable(x.shape[1], q, k, x.shape[-1]):
            # python loop over B, NOT vmap: vmapping the spill lax.cond
            # batches its predicate, which lowers to BOTH branches
            # executing plus a select — the fallback gather/scatter then
            # runs every step (measured +40 ms/step)
            preps = _tile_gather_preps(idx, x.shape[1])
            out = jnp.stack([pg.gather_rows(x[b], idx[b], prep=preps[b])
                             for b in range(x.shape[0])])
            # -1 slots read row 0 inside the kernel (idx clamped), same
            # finite-garbage contract as the plain path below
            return (jnp.where((idx >= 0)[..., None], out, 0.0)
                    if fill else out)
    safe = jnp.maximum(idx, 0)
    out = jax.vmap(lambda xb, ib: xb[ib])(x, safe)
    return jnp.where((idx >= 0)[..., None], out, 0.0) if fill else out


@jax.custom_vjp
def _packed_gather_xgrad(x, p_pack, idx):
    """Packed ``(x | p_pack)`` row gather whose BACKWARD scatters ONLY the
    feature channels.

    Train-path companion of :func:`gather_neighbors_with_pos`: the packed
    forward fetch halves the row count vs two separate gathers (HBM
    gathers charge per row), while the custom VJP keeps the backward
    scatter at feature width — packing positions into the *autodiff*
    record would widen every scattered cotangent row by the position
    channels (256-byte segment spill, measured 6.2 -> ~3.1 ms on the
    flagship sa-geo h1 scatter).  Positions are data, never functions of
    parameters (downsampling selects them by integer indexing), so their
    cotangent is dropped — callers stop-gradient them anyway.
    """
    rec = jnp.concatenate([x, p_pack], axis=-1)
    safe = jnp.maximum(idx, 0)
    out = jax.vmap(lambda xb, ib: xb[ib])(rec, safe)
    out = jnp.where((idx >= 0)[..., None], out, 0.0)
    c = x.shape[-1]
    return out[..., :c], out[..., c:]


def _packed_gather_xgrad_fwd(x, p_pack, idx):
    # zero-sized proto carries x's (n, c) and dtype into the bwd rule
    # (custom_vjp residual leaves must be JAX values, not shapes/dtypes)
    proto = jnp.zeros((0,) + x.shape[1:], x.dtype)
    return _packed_gather_xgrad(x, p_pack, idx), (idx, proto)


def _packed_gather_xgrad_bwd(res, g):
    d_xn, _ = g
    idx, proto = res
    _, n, c = proto.shape
    # scatter in the cotangent's own dtype: casting bf16 cotangents to f32
    # would double every scattered row to two 256-byte segments at the
    # segment-aligned widths this path exists for (and the plain autodiff
    # scatter this replaces accumulated in bf16 too)
    d = jnp.where((idx >= 0)[..., None], d_xn, 0)
    safe = jnp.maximum(idx, 0)
    d_x = jax.vmap(
        lambda gb, ib: jnp.zeros((n, c), gb.dtype)
        .at[ib.reshape(-1)].add(gb.reshape(-1, c)))(d, safe)
    return d_x.astype(proto.dtype), None, None


_packed_gather_xgrad.defvjp(_packed_gather_xgrad_fwd,
                            _packed_gather_xgrad_bwd)


def gather_neighbors_with_pos(x: jax.Array, pos: jax.Array,
                              idx: jax.Array,
                              layout: Optional[str] = None,
                              train: bool = False, fill: bool = True):
    """One combined row gather of (features, exact f32 positions).

    HBM gathers charge per ROW (~7ns on v5e regardless of width), so
    fetching the position with a second 3-wide gather costs as much as the
    whole feature gather.  Instead positions ride along in the feature
    record as exact 3x-bf16 residual triplets when features are bf16
    (ops/interpolate.py POS_PACK_CH note: bit-split hi/lo pairs get
    flushed/canonicalized by in-graph compute ops on TPU; casting
    positions to plain bf16 would catastrophically cancel in
    pos_j - pos_i at lidar scales, ADVICE r2).

    x: (B, N, C), pos: (B, N, 3), idx: (B, Q, K) with -1 padding.
    Returns (x_nbr (B, Q, K, C), pos_nbr (B, Q, K, 3) float32); padded
    slots are zero in both.

    ``layout="kq"``: see :func:`gather_neighbors` — idx (B, K, Q), outputs
    (B, K, Q, *), tile-unique kernel path with the same triplet format.
    """
    from .interpolate import (POS_PACK_CH, _pack_pos_bf16,
                              _unpack_pos_bf16)

    pos = pos.astype(jnp.float32)
    if layout == "kq" and _tile_gather_on(train):
        from . import pallas_gather as pg

        k, q = idx.shape[1], idx.shape[2]
        extra = 3 if x.dtype == jnp.float32 else 9
        if pg.viable(x.shape[1], q, k, x.shape[-1] + extra):
            preps = _tile_gather_preps(idx, x.shape[1])
            res = [pg.gather_rows_with_pos(x[b], pos[b], idx[b],
                                           prep=preps[b])
                   for b in range(x.shape[0])]   # no vmap: see above
            x_nbr = jnp.stack([r[0] for r in res])
            p_nbr = jnp.stack([r[1] for r in res])
            if not fill:
                return x_nbr, p_nbr
            m = (idx >= 0)[..., None]
            return jnp.where(m, x_nbr, 0.0), jnp.where(m, p_nbr, 0.0)
    xb = x if x.dtype == jnp.float32 else x.astype(jnp.bfloat16)
    p_pack = pos if x.dtype == jnp.float32 else _pack_pos_bf16(pos)
    if train:
        # Packed forward fetch (one row gather, not two) + a custom VJP
        # that scatters ONLY the feature channels: packing positions into
        # the autodiff record would widen every backward cotangent row by
        # the position channels — at 256-byte-segment-aligned feature
        # widths that spills an extra HBM segment per scattered row
        # (measured 6.2 -> ~3.1 ms on the flagship sa-geo h1 scatter,
        # bf16[368640, 134] -> 128) — while two separate gathers pay a
        # second full-row fetch forward (measured 1.79 ms for the
        # bf16[368640, 6] pos gather alone; gathers are ROW-rate bound).
        x_nbr, p_nbr = _packed_gather_xgrad(
            xb, jax.lax.stop_gradient(p_pack), idx)
        return x_nbr, (p_nbr if x.dtype == jnp.float32
                       else _unpack_pos_bf16(p_nbr))
    if x.dtype == jnp.float32:
        rec = jnp.concatenate([x, pos], axis=-1)
        rec_nbr = gather_neighbors(rec, idx, fill=fill)
        return rec_nbr[..., :-3], rec_nbr[..., -3:]
    rec = jnp.concatenate([xb, p_pack], axis=-1)
    rec_nbr = gather_neighbors(rec, idx, fill=fill)
    return (rec_nbr[..., :-POS_PACK_CH],
            _unpack_pos_bf16(rec_nbr[..., -POS_PACK_CH:]))


def knn_feature_space(x: jax.Array, valid: jax.Array, k: int,
                      block: int = 4096):
    """kNN in feature space (DGCNN dynamic graph, reference dgcnn.py:82)."""
    return knn(x, x, valid, valid, k, block=block)
