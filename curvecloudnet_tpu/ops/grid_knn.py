"""Grid-hash fixed-radius kNN — the FRNN equivalent, in pure XLA.

The reference's hot neighbor searches are fixed-radius kNN through the CUDA
FRNN grid kernel (reference point_ops.py:431-461).  This implementation maps
FRNN's cell-list algorithm to TPU-friendly static shapes, designed around a
measured v5e constraint: HBM gathers cost ~7ns per ROW regardless of row
width, so candidates are fetched at *cell* granularity:

  1. voxelize at cell = radius (27-stencil) or cell = 2*radius
     (8-stencil); pack integer cell coords (7 bits/axis, clipped to ±64
     cells — out-of-range points clamp to boundary cells and are rejected
     by the distance mask);
  2. hash the 21-bit cell id into an adaptive 2^hash_bits bucket table
     (sized ~n so the table write stays small; 2^18 was measured to
     materialize an 805MB fill at KITTI caps) and scatter each point's
     record [x, y, z, orig_idx] into its bucket row at its rank-in-bucket
     (ranks from one sort by bucket id; ranks >= cap drop, FRNN-style cap);
  3. per query, gather the stencil cells' *rows* — (Q·ncells) wide-row
     gathers instead of (Q·ncells·cap) scalar-row gathers (~20x faster);
  4. distances on the VPU, mask by radius, top-k.

Stencils: the classic FRNN stencil is 27 cells of edge r.  With cell
edge 2r the ball [q-r, q+r] spans at most TWO cells per axis (base =
floor((q-r)/cell), base+1), so only EIGHT row gathers per query — 3.4x
fewer of the ~7ns/row fetches — at ~4x the per-cell occupancy (cap rises
accordingly).  The 8-stencil wins whenever occupancy-at-2r stays within an
affordable cap; measured at the nuScenes flagship 23040-row r=0.04 table:
max 156/cell over seeds, so cap=192 is lossless there (tests/
test_grid_recall.py pins the operating points).

Strip rows (3 x-adjacent cells per row, 3x fewer fetches) were built,
measured NEGATIVE at all three operating points, and deleted in round 4
(the 3x rank sort + 14% wider extraction beat the saved fetches; full
numbers in docs/ROADMAP.md "Parked floors").

Hash collisions are harmless for correctness: colliding far cells' points
fail the radius test; colliding near cells' points are genuine in-radius
neighbors.  They only share the per-bucket ``cap`` budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: module constants must be host (numpy) values — this module is
# imported lazily from inside jit traces, and a module-level jnp.array
# created during tracing would leak a tracer.
_INF = 1e30
_BITS = 7                         # cell-coordinate bits per axis
_OFF = 1 << (_BITS - 1)           # center cells around the origin
_MASK = (1 << _BITS) - 1

_NEIGHBOR_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)], np.int32)  # (27, 3)
_NEIGHBOR_OFFSETS8 = np.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1)
     for dz in (0, 1)], np.int32)      # (8, 3)


def default_hash_bits(n: int) -> int:
    """Bucket-table size ~n/8: the plane gathers are DRAM-page-locality
    bound, so SMALLER tables fetch faster at identical row counts —
    v5e sweep at the KITTI 73728 r=0.04 cap=192 table
    (tools/grid_bits_ab.py): bits 17 -> 14 is 85.7 -> 59.1 ms (-31%)
    with IDENTICAL result sets.  More cells per bucket share one cap
    budget, but the caps are sized from measured occupancy with 2 shared
    overflow planes + drop telemetry behind them, and the recall suite
    (tests/test_grid_recall.py) pins the floors at these defaults."""
    bits = 1
    while (1 << bits) < n:
        bits += 1
    return min(18, max(13, bits - 3))


_IDX_BIAS = 0x40000000  # exponent bits of 2.0f: payload stays a normal float


def _decode_idx(f32vals: jax.Array) -> jax.Array:
    """Biased f32 record field -> point index (-1 = empty slot).

    See the encoding note at the record build: indices are stored as
    bitcast(0x40000000 | (idx + 1)) so they can never be flushed (denormal)
    or canonicalized (NaN) by compute ops a fusion routes the table
    through.  Valid for idx + 1 < 2^23 (8.3M points/row).
    """
    bits = jax.lax.bitcast_convert_type(f32vals, jnp.int32)
    return jnp.bitwise_and(bits, jnp.int32(0x7FFFFF)) - 1


def _cell_coords(pos: jax.Array, cell: float) -> jax.Array:
    c = jnp.floor(pos / cell).astype(jnp.int32) + _OFF
    return jnp.clip(c, 0, _MASK)


def _pack(c: jax.Array) -> jax.Array:
    return (c[..., 0] << (2 * _BITS)) | (c[..., 1] << _BITS) | c[..., 2]


def _hash(cell_id: jax.Array, hash_bits: int) -> jax.Array:
    h = cell_id.astype(jnp.uint32) * jnp.uint32(2654435761)
    return (h >> (32 - hash_bits)).astype(jnp.int32)


def _bucket(coords: jax.Array, hash_bits: int) -> jax.Array:
    """Cell coords (..., 3) -> bucket row index.

    Default: multiplicative hash of the packed id (decorrelated, random
    row placement).  CCN_GRID_HASH=morton (measured NEUTRAL, off):
    the LOW 3 bits per axis are Morton-interleaved into the bucket's low
    9 bits and the BLOCK coords (cells >> 3) are hashed into the high
    bits, so a query's stencil lands on adjacent table rows.  At the
    post-locality table sizes (bits 13-14, 25-50MB) this no longer moves
    anything: 58.5 vs 58.6 ms at the 73728 r=0.04 cap=192 case — the
    small random-hash table already page-hits; adjacency pays only when
    the table is large, where shrinking it is the better fix.  Collisions
    in either scheme are harmless for exactness (radius test) and share
    cap budgets identically.
    """
    import os

    if os.environ.get("CCN_GRID_HASH", "hash") != "morton" or hash_bits < 10:
        return _hash(_pack(coords), hash_bits)
    m = 9
    cx, cy, cz = coords[..., 0], coords[..., 1], coords[..., 2]
    low = jnp.zeros(cx.shape, jnp.int32)
    for bit in range(3):
        low = (low
               | (((cx >> bit) & 1) << (3 * bit + 2))
               | (((cy >> bit) & 1) << (3 * bit + 1))
               | (((cz >> bit) & 1) << (3 * bit)))
    block = _pack(coords >> 3)
    high = _hash(block, hash_bits - m)
    return (high << m) | low


def grid_knn_single(query, points, q_valid, p_valid, k: int, radius: float,
                    cap: int = 16, stencil: int = 27,
                    hash_bits: int | None = None, overflow_planes: int = 0):
    """Single-sample grid kNN. query (Q,3), points (N,3) -> (Q,k) idx/dist.

    ``overflow_planes``: points a dense cell drops at ``cap`` spill into
    this many SHARED extra table rows (global overflow rank ordering) that
    every query scans alongside its stencil cells.  Capacity
    overflow_planes*cap bounds total overflow losslessly — measured max
    239 dropped at cap=192 across realistic-seed flagship rows, so 2
    planes (384) make the 8-stencil table exact there at +25% extraction
    width instead of the 2x a lossless per-cell cap would cost.

    """
    import os

    n = points.shape[0]
    if hash_bits is None:
        hash_bits = default_hash_bits(n)
    nbuckets = 1 << hash_bits
    cell = radius if stencil == 27 else 2.0 * radius
    cc = _cell_coords(points, cell)
    bucket = _bucket(cc, hash_bits)
    m = n
    cap_row = cap
    bucket = jnp.where(p_valid, bucket, nbuckets)  # park invalid

    # rank within bucket via one sort.  The secondary key is a hashed
    # index, NOT the raw index: when a dense cell overflows ``cap`` the
    # kept subset is then a spatially unbiased sample instead of a
    # scan-order prefix (scan order sweeps angularly, so a prefix keeps
    # one SIDE of the cell — the worst possible truncation geometry for
    # the max/attend aggregations downstream).  Reference FRNN has no cap,
    # but reference ball queries themselves truncate at K=128 in index
    # order (point_ops.py:81); this is strictly better behaved.
    pos_iota = jnp.arange(m, dtype=jnp.int32)
    shuffled = jnp.bitwise_and(
        (pos_iota % n) * jnp.int32(np.int32(0x9E3779B1 - 2**32)),
        jnp.int32(0x7FFFFFFF))
    _, _, order = jax.lax.sort(
        (bucket, shuffled, pos_iota), num_keys=2)
    sorted_b = bucket[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_b[1:] != sorted_b[:-1]])
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos_iota, 0))
    rank_sorted = pos_iota - start_pos
    rank = jnp.zeros((m,), jnp.int32).at[order].set(rank_sorted)

    # dense bucket matrix of point records [x, y, z, bitcast(orig_idx)]
    # Table rows are one bucket's records, channel-major: [x*cap, y*cap,
    # z*cap, idx*cap] = cap*4 contiguous floats.  A flat 2D table keeps the
    # row gather on contiguous memory (a 3D (.., cap, 4) table made XLA pick
    # a transposed tiling where each gathered "row" touched many tiny tiles).
    # Point indices ride the f32 record BIASED into normal-float range:
    # bitcast(0x40000000 | (idx + 1)) is a float in [2.0, 4.0).  A plain
    # bitcast(idx) is a DENORMAL f32 for idx < 2^23, and when XLA routes
    # the table through any compute op in a larger graph the TPU VPU
    # flushes denormals to zero — every stored index silently became 0 and
    # _finalize's dedup collapsed each query to ONE neighbor (self-only
    # tables in-model while the standalone search was exact; round-4
    # find).  The empty sentinel is the biased zero (2.0f, decodes to -1);
    # a bitcast(-1) NaN sentinel is equally unsafe (payload
    # canonicalization).  _decode_idx is the inverse.
    enc = jax.lax.bitcast_convert_type(
        jnp.int32(_IDX_BIAS) | (jnp.arange(n, dtype=jnp.int32) + 1),
        jnp.float32)
    rec = jnp.concatenate([points, enc[:, None]], axis=-1)
    fill = jnp.repeat(jnp.array([_INF, _INF, _INF, 2.0], jnp.float32),
                      cap_row)
    # rows: [0, nbuckets) cells, nbuckets = parked invalid/overflowed,
    # (nbuckets, nbuckets+overflow_planes] shared overflow rows, and one
    # final always-fill row that deduplicated stencil fetches point at
    table = jnp.broadcast_to(
        fill[None, :], (nbuckets + 2 + overflow_planes, cap_row * 4))
    keep = (rank < cap_row) & p_valid
    safe_bucket = jnp.where(keep, bucket, nbuckets)
    safe_rank = jnp.where(keep, rank, 0)
    dropped = p_valid & ~keep
    if overflow_planes > 0:
        grank = jnp.cumsum(dropped.astype(jnp.int32)) - 1
        okeep = dropped & (grank < overflow_planes * cap_row)
        safe_bucket = jnp.where(okeep, nbuckets + 1 + grank // cap_row,
                                safe_bucket)
        safe_rank = jnp.where(okeep, grank % cap_row, safe_rank)
        dropped = dropped & ~okeep
    # entries dropped by the per-row cap (and past the overflow planes)
    # = potential recall loss; returned so the UNBATCHED wrapper records
    # it (recording here would capture a vmap BatchTracer — and recording
    # inside an inner jit never reaches the model's capture at all, which
    # kept this counter silently dead in-model until round 4)
    n_dropped = jnp.sum(dropped)
    cols = (safe_rank[:, None]
            + cap_row * jnp.arange(4, dtype=jnp.int32)[None, :])
    table = table.at[safe_bucket[:, None], cols].set(rec)

    if stencil == 27:
        qc = _cell_coords(query, cell)  # (Q, 3)
        offs = _NEIGHBOR_OFFSETS
    else:
        # 8-stencil: the ball [q-r, q+r] (width 2r <= cell) spans at most
        # two cells per axis, anchored at floor((q - r) / cell)
        qc = _cell_coords(query - radius, cell)
        offs = _NEIGHBOR_OFFSETS8
    nbr_coords = jnp.clip(qc[:, None, :] + offs[None, :, :], 0, _MASK)
    nbr_buckets = _bucket(nbr_coords, hash_bits)  # (Q, n_stencil_rows)
    # Dedup a query's hash-colliding stencil rows: two distinct stencil
    # cells hashing to one bucket (or coordinate-clipped to the same
    # cell) would fetch the SAME table row twice, and the extraction
    # counts slot positions, not point ids — a duplicated in-radius point
    # could occupy two of the k output slots and evict a genuine
    # neighbor.  Duplicates repoint to a dedicated always-fill row (the
    # parked-invalid row nbuckets is NOT safe: over-cap/invalid points
    # overwrite its slot 0 with real records).
    s_ = nbr_buckets.shape[1]
    eq = nbr_buckets[:, :, None] == nbr_buckets[:, None, :]  # (Q, S, S)
    tri = np.tril(np.ones((s_, s_), bool), -1)
    dup = jnp.any(eq & tri[None], axis=-1)
    fill_row = nbuckets + 1 + overflow_planes
    nbr_buckets = jnp.where(dup, fill_row, nbr_buckets)
    q_ = query.shape[0]
    if overflow_planes > 0:
        ovf_rows = jnp.broadcast_to(
            nbuckets + 1 + jnp.arange(overflow_planes, dtype=jnp.int32),
            (q_, overflow_planes))
        nbr_buckets = jnp.concatenate([nbr_buckets, ovf_rows], axis=1)
    ncells = len(offs) + overflow_planes
    c_ = ncells * cap_row

    # TPU tail options (A/B-measured on v5e at the KITTI 73728 r=0.04
    # search):
    #   * "records" (default): pallas_topk.grid_topk_records — per-cell
    #     record-plane gathers re-read in-kernel, distances on the VPU.
    #   * "d2": per-cell 2D gather->distance fusions emit (Q, ncells*cap)
    #     f32 d2 + i32 idx planes (8B/candidate vs 16) into the
    #     pure-extraction topk kernel.  Measured NEUTRAL vs "records"
    #     (85.4 vs 85.6 ms at 73728): the plane gathers are row-RATE
    #     bound (~7-14ns per gathered row), not bandwidth bound, so
    #     halving bytes doesn't move them.  Kept because it halves peak
    #     HBM scratch.
    accel = jax.default_backend() not in ("cpu",)
    mode = os.environ.get("CCN_GRID_FUSED", "records")
    if accel and mode not in ("0",):
        from . import pallas_topk

        k_eff = min(k, c_)
        if mode == "records":
            top_d2, top_idx = pallas_topk.grid_topk_records(
                table, nbr_buckets, query, q_valid, k_eff, cap_row, radius,
                idx_bound=n)
            return _finalize(top_d2, top_idx, k, k_eff) + (n_dropped,)
        qx, qy, qz = query[:, 0:1], query[:, 1:2], query[:, 2:3]
        r2 = radius * radius
        cr = cap_row
        d2s, idxs = [], []
        for c in range(ncells):
            rec = table[nbr_buckets[:, c]]          # (Q, cap_row*4) gather
            pid = _decode_idx(rec[:, 3 * cr:])
            d2c = ((rec[:, 0 * cr:1 * cr] - qx) ** 2
                   + (rec[:, 1 * cr:2 * cr] - qy) ** 2
                   + (rec[:, 2 * cr:3 * cr] - qz) ** 2)
            good = (pid >= 0) & q_valid[:, None] & (d2c <= r2)
            d2s.append(jnp.where(good, d2c, _INF))
            idxs.append(pid)
        d2 = jnp.concatenate(d2s, axis=1)
        idx = jnp.concatenate(idxs, axis=1)
        top_d2, top_idx = pallas_topk.topk_smallest(d2, idx, k_eff)
        return _finalize(top_d2, top_idx, k, k_eff) + (n_dropped,)

    cand = table[nbr_buckets]  # (Q, ncells, cap_row*4) contiguous gathers
    # distances computed in the table's channel-major layout — transposing
    # to (Q, ncells*cap, 4) first materializes multi-GB relayout copies at
    # the caps real densities need
    cand = cand.reshape(q_, ncells, 4, cap_row)
    d2 = ((cand[:, :, 0] - query[:, None, 0:1]) ** 2
          + (cand[:, :, 1] - query[:, None, 1:2]) ** 2
          + (cand[:, :, 2] - query[:, None, 2:3]) ** 2)     # (Q, 27, cap)
    cand_idx = _decode_idx(cand[:, :, 3])
    good = (cand_idx >= 0) & q_valid[:, None, None] & (d2 <= radius * radius)
    d2 = jnp.where(good, d2, _INF).reshape(q_, c_)
    cand_idx = cand_idx.reshape(q_, c_)

    # top-k by packed min-extraction: lax.top_k (and, on this stack, even
    # approx_min_k) lowers to a full (Q, 27*cap) sort — 100+ ms per search
    # at real caps.  On TPU the extraction runs in a Pallas kernel so the
    # candidate tile stays VMEM-resident across rounds; the plain-XLA loop
    # below (CPU/tests) re-reads HBM per round.
    k_eff = min(k, c_)
    if jax.default_backend() not in ("cpu",):
        from . import pallas_topk

        top_d2, top_idx = pallas_topk.topk_smallest(d2, cand_idx, k_eff)
        return _finalize(top_d2, top_idx, k, k_eff) + (n_dropped,)
    pw = 1
    while pw < c_:
        pw *= 2
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(d2, jnp.int32),
                        jnp.int32(~(pw - 1))), col)
    sent = jnp.int32(0x7F800000 | (pw - 1))
    tops_d2, tops_i = [], []
    for _ in range(k_eff):
        m = jnp.min(packed, axis=-1)                       # (Q,)
        sel_m = col == jnp.bitwise_and(m, pw - 1)[:, None]
        tops_i.append(jnp.sum(jnp.where(sel_m, cand_idx, 0), axis=-1))
        tops_d2.append(jax.lax.bitcast_convert_type(
            jnp.bitwise_and(m, jnp.int32(~(pw - 1))), jnp.float32))
        packed = jnp.where(sel_m, sent, packed)
    top_d2 = jnp.stack(tops_d2, axis=-1)
    top_idx = jnp.stack(tops_i, axis=-1)
    return _finalize(top_d2, top_idx, k, k_eff) + (n_dropped,)


def _finalize(top_d2, top_idx, k: int, k_eff: int):
    """Shared tail: restore INF/-1 fills, dedup clamped cells, pad to k."""
    # restore exact INF/-1 fills (masked bits of 1e30 compare below _INF)
    top_idx = jnp.where(top_d2 < _INF * 0.98, top_idx, -1)
    top_d2 = jnp.where(top_idx >= 0, top_d2, _INF)
    # dedup: boundary-clamped coords can repeat a neighbor cell
    same = top_idx[:, :, None] == top_idx[:, None, :]
    tri = np.tril(np.ones((k_eff, k_eff), bool), k=-1)
    dup = jnp.any(same & tri[None] & (top_d2[:, None, :] < _INF), axis=-1)
    ok = (top_d2 < _INF) & ~dup
    idx = jnp.where(ok, top_idx, -1)
    dist = jnp.where(ok, jnp.sqrt(jnp.maximum(top_d2, 0.0)), _INF)
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        idx = jnp.pad(idx, pad, constant_values=-1)
        dist = jnp.pad(dist, pad, constant_values=_INF)
    return idx, dist


def grid_knn(query, points, q_valid, p_valid, k: int, radius: float,
             cap: int = 16, stencil: int = 27, hash_bits: int | None = None,
             overflow_planes: int = 0):
    """Batched grid-hash fixed-radius kNN (ops.neighbors.knn signature).

    Deliberately NOT wrapped in its own ``jax.jit``: the per-row cap-drop
    telemetry inside grid_knn_single must record into the CALLER's trace
    (an inner-jit boundary swallowed it — the whole in-model drop counter
    was silently dead, a round-4 find).  Model calls inline into the
    outer jit; eager callers (tools/tests) wrap it themselves."""
    from . import telemetry

    fn = functools.partial(grid_knn_single, k=k, radius=radius, cap=cap,
                           stencil=stencil, hash_bits=hash_bits,
                           overflow_planes=overflow_planes)
    idx, dist, n_dropped = jax.vmap(fn)(query, points, q_valid, p_valid)
    if telemetry.active():
        telemetry.record(
            f"grid_cap_drop.n{points.shape[1]}.r{radius:g}.s{stencil}",
            jnp.sum(n_dropped))
    return idx, dist
