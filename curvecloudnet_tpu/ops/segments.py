"""Segmented (per-curve) scan primitives over batch-padded curve clouds.

TPU-native replacement for the reference's CSR-pointer curve utilities
(``curveidx_local2global`` / ``batch2ptr`` at reference
``src/models/utils/point_ops.py:20-54``). Instead of flattened COO tensors with
dynamic pointer arrays, every sample is a fixed-shape row ``(N,)`` with a
``valid`` mask and a nondecreasing ``curve_id``; curve structure is expressed
through *segmented associative scans*, which XLA compiles to fast parallel
scans with no dynamic shapes.

Layout contract (shared by every op in this package):
  * ``pos``      : (B, N, 3) float — points in scan order, padded at the tail.
  * ``feat``     : (B, N, F) float or None.
  * ``valid``    : (B, N) bool — True for real points. Valid points are a
                   prefix of each row (packing invariant).
  * ``curve_id`` : (B, N) int32 — nondecreasing over the valid prefix; points
                   of one curve are contiguous and in scan order (the same
                   invariant the reference asserts at point_ops.py:49).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Sentinel curve id assigned to padding. Never equal to a real curve id.
PAD_CURVE_ID = jnp.int32(2**30)


# Trace-scoped memo for the segmented-scan helpers below: several steps
# consume the same row's curve structure (conv1d masks, sa-geo grouping,
# fp-geo interpolation), and every associative scan lowers to a log-depth
# chain of slices/pads (~hundreds of tiny ops per call at 36864).  The
# model's __call__ enters the scope (models/base.py) so repeated calls on
# the same (curve_id, valid[, x]) arrays return the already-traced value.
# Keys hold the arrays themselves (identity-checked) — same lifetime
# pattern as ops/neighbors shared_knn_scope.
_MEMO: dict | None = None


class memo_scope:
    def __enter__(self):
        global _MEMO
        self._prev = _MEMO
        _MEMO = {}
        return self

    def __exit__(self, *exc):
        global _MEMO
        _MEMO = self._prev
        return False


def _memo(name: str, fn, *arrays):
    if _MEMO is None:
        return fn()
    key = (name,) + tuple(id(a) for a in arrays)
    hit = _MEMO.get(key)
    if hit is not None and all(h is a for h, a in zip(hit[0], arrays)):
        return hit[1]
    out = fn()
    _MEMO[key] = (arrays, out)
    return out


def padded_curve_id(curve_id: jax.Array, valid: jax.Array) -> jax.Array:
    """curve_id with padding positions replaced by the PAD_CURVE_ID sentinel."""
    return jnp.where(valid, curve_id, PAD_CURVE_ID)


def curve_starts(curve_id: jax.Array, valid: jax.Array) -> jax.Array:
    """Boolean (B, N) mask: True at the first point of every curve.

    Padding positions are each treated as their own (degenerate) segment so
    scans never leak values from the last real curve into padding.
    """
    def build():
        cid = padded_curve_id(curve_id, valid)
        prev = jnp.roll(cid, 1, axis=-1)
        starts = cid != prev
        # position 0 always starts a segment
        starts = starts.at[..., 0].set(True)
        # every padding slot is its own segment
        return starts | ~valid

    return _memo("starts", build, curve_id, valid)


def curve_ends(curve_id: jax.Array, valid: jax.Array) -> jax.Array:
    """Boolean (B, N) mask: True at the last point of every curve."""
    starts = curve_starts(curve_id, valid)
    nxt = jnp.roll(starts, -1, axis=-1)
    return nxt.at[..., -1].set(True)


def _seg_combine(op):
    def combine(a, b):
        a_flag, a_val = a
        b_flag, b_val = b
        val = jnp.where(
            _bcast(b_flag, b_val), b_val, op(a_val, b_val)
        )
        return a_flag | b_flag, val

    return combine


def _bcast(flag, val):
    """Broadcast a (B, N) flag against a (B, N, ...) value."""
    extra = val.ndim - flag.ndim
    return flag.reshape(flag.shape + (1,) * extra)


def segmented_scan(x: jax.Array, starts: jax.Array, op=jnp.add,
                   reverse: bool = False) -> jax.Array:
    """Inclusive segmented scan of ``x`` along axis 1, restarting at ``starts``.

    ``op`` must be associative (add, maximum, minimum). With ``reverse=True``
    the scan runs right-to-left and ``starts`` is interpreted as segment *ends*
    (i.e. pass ``curve_ends`` flags).
    """
    flags = starts
    scanned_flags, scanned_vals = jax.lax.associative_scan(
        _seg_combine(op), (flags, x), axis=1, reverse=reverse
    )
    del scanned_flags
    return scanned_vals


def segmented_cumsum(x: jax.Array, starts: jax.Array,
                     reverse: bool = False) -> jax.Array:
    return segmented_scan(x, starts, op=jnp.add, reverse=reverse)


def segmented_cummax(x: jax.Array, starts: jax.Array,
                     reverse: bool = False) -> jax.Array:
    return segmented_scan(x, starts, op=jnp.maximum, reverse=reverse)


def segment_broadcast_first(x: jax.Array, starts: jax.Array) -> jax.Array:
    """Per point, the value of ``x`` at the start of its segment."""
    keep_first = lambda a, b: a  # noqa: E731 - copy-scan carries first value
    return segmented_scan(x, starts, op=keep_first)


def segment_broadcast_last(x: jax.Array, ends: jax.Array) -> jax.Array:
    """Per point, the value of ``x`` at the end of its segment."""
    # In a reverse scan the accumulator argument carries the suffix (elements
    # with higher index), so "keep accumulator" propagates the segment-end
    # value leftwards.
    keep_acc = lambda a, b: a  # noqa: E731
    return segmented_scan(x, ends, op=keep_acc, reverse=True)


def curve_start_index(curve_id: jax.Array, valid: jax.Array) -> jax.Array:
    """(B, N) int32 — index (along N) of the first point of each point's curve.

    Exact plain-cummax form: the latest segment start at or before i IS i's
    segment start, so ``cummax(where(starts, iota, -1))`` equals the
    segmented broadcast of iota without the associative_scan slice tree
    (each scan costs ~50 slices+pads at N=36864; one lax.cummax is a single
    fused op).  Integer-exact, so bit-identical to the scan form.
    """
    def build():
        n = curve_id.shape[-1]
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                curve_id.shape)
        starts = curve_starts(curve_id, valid)
        return jax.lax.cummax(jnp.where(starts, iota, -1), axis=iota.ndim - 1)

    return _memo("start_index", build, curve_id, valid)


def curve_end_index(curve_id: jax.Array, valid: jax.Array) -> jax.Array:
    """(B, N) int32 — index (along N) of the last point of each point's curve.

    Mirror of :func:`curve_start_index`: the nearest segment end at or after
    i is i's segment end (segments partition the row), a reverse cummin.
    """
    def build():
        n = curve_id.shape[-1]
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                curve_id.shape)
        ends = curve_ends(curve_id, valid)
        return jax.lax.cummin(jnp.where(ends, iota, n), axis=iota.ndim - 1,
                              reverse=True)

    return _memo("end_index", build, curve_id, valid)


def edge_lengths(pos: jax.Array, curve_id: jax.Array,
                 valid: jax.Array) -> jax.Array:
    """(B, N) — length of the polyline edge *ending* at each point.

    Edge i connects point i-1 to point i. Edges that cross a curve boundary
    (or touch padding) have length 0, mirroring the reference's edge-validity
    masking (fps_ops.py:19-21).
    """
    prev = jnp.roll(pos, 1, axis=1)
    lens = jnp.linalg.norm(pos - prev, axis=-1)
    starts = curve_starts(curve_id, valid)
    lens = jnp.where(starts, 0.0, lens)
    return lens.at[:, 0].set(0.0)


def geodesic_arclength(pos: jax.Array, curve_id: jax.Array,
                       valid: jax.Array) -> jax.Array:
    """(B, N) — cumulative arclength from the start of each point's curve.

    Parallel of the reference's geodesic-length computation (fps_ops.py:24-27)
    done as one segmented cumsum instead of pointer gathers.
    """
    def build():
        lens = edge_lengths(pos, curve_id, valid)
        starts = curve_starts(curve_id, valid)
        return segmented_cumsum(lens, starts)

    return _memo("arclength", build, pos, curve_id, valid)


def per_curve_total(x: jax.Array, curve_id: jax.Array,
                    valid: jax.Array) -> jax.Array:
    """(B, N) — per point, the sum of ``x`` over that point's whole curve."""
    starts = curve_starts(curve_id, valid)
    ends = curve_ends(curve_id, valid)
    csum = segmented_cumsum(x, starts)
    return segment_broadcast_last(csum, ends)


def points_per_curve(curve_id: jax.Array, valid: jax.Array) -> jax.Array:
    """(B, N) — per point, the number of valid points on its curve.

    Curves are contiguous and fully valid (packing invariant), so the count
    is ``end_index - start_index + 1`` — integer-exact and scan-free.
    Padding slots are their own degenerate segments with zero valid points.
    """
    def build():
        s = curve_start_index(curve_id, valid)
        e = curve_end_index(curve_id, valid)
        return jnp.where(valid, (e - s + 1).astype(jnp.float32), 0.0)

    return _memo("points_per_curve", build, curve_id, valid)


def lengths_from_valid(valid: jax.Array) -> jax.Array:
    """(B,) number of valid points per sample (packing invariant assumed)."""
    return valid.sum(axis=-1).astype(jnp.int32)


def valid_from_lengths(lengths: jax.Array, n: int) -> jax.Array:
    """(B, N) prefix validity mask from per-sample lengths."""
    iota = jnp.arange(n, dtype=lengths.dtype)
    return iota[None, :] < lengths[:, None]


def masked_segment_sum(data: jax.Array, segment_ids: jax.Array,
                       num_segments: int, mask: jax.Array) -> jax.Array:
    """segment_sum with a validity mask (invalid rows contribute zero)."""
    data = jnp.where(_bcast(mask, data), data, 0)
    sid = jnp.where(mask, segment_ids, num_segments)  # park invalid in overflow
    return jax.ops.segment_sum(data, sid, num_segments=num_segments + 1)[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_rows(a: jax.Array, idx: jax.Array, idx_valid: jax.Array):
    """Subset row selection a[:, idx] with an inverse-gather transpose.

    The downsampling row-select of every level (reference keeps ``x[idxs]``
    after FPS, src/models/modules/pointnet2.py:47-61).  XLA's VJP of
    ``take_along_axis`` is a scatter-add — at flagship scale one fused
    (C_total, N) f32 scatter costs ~16 ms/step on v5e.  Because downsample
    indices are STRICTLY ASCENDING over the valid slots (every sampler
    returns sorted unique row ids), the transpose is expressible as a tiny
    int32 inverse-map scatter plus one dense row gather (~0.3 ms).

    Gradient contract: cotangents at ``idx_valid == False`` slots are
    dropped.  Every consumer masks padded slots (masked BN/aggregations/
    losses), so those cotangents are identically zero and the VJP is exact;
    a duplicate *valid* index would silently lose gradient, hence the
    ascending-unique requirement.

    a: (B, N, ...) ; idx: (B, Q) int32 ; idx_valid: (B, Q) bool.
    """
    return jnp.take_along_axis(
        a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), axis=1)


def _take_rows_fwd(a, idx, idx_valid):
    return take_rows(a, idx, idx_valid), (idx, idx_valid, a.shape)


def _take_rows_bwd(res, g):
    idx, idx_valid, ashape = res
    b, n = ashape[:2]
    q = idx.shape[1]
    # out-of-range writes are dropped: invalid slots scatter to row `n`
    safe = jnp.where(idx_valid, idx, n)
    inv = jnp.zeros((b, n), jnp.int32)
    inv = jax.vmap(lambda iv, s, u: iv.at[s].set(u, mode="drop"))(
        inv, safe, jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32), (b, q)))
    hit = jnp.zeros((b, n), bool)
    hit = jax.vmap(lambda h, s: h.at[s].set(True, mode="drop"))(hit, safe)
    ga = jnp.take_along_axis(
        g, inv.reshape((b, n) + (1,) * (g.ndim - 2)), axis=1)
    ga = jnp.where(hit.reshape((b, n) + (1,) * (g.ndim - 2)), ga, 0)
    return ga, None, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)
