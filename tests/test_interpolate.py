"""kNN interpolation vs a NumPy oracle (PointNet++ FP semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import interpolate


def np_knn_interpolate(x, pos_src, pos_dst, k=3):
    """Oracle: 3-NN inverse-d^2 weighted mean (point_ops.py:293-341)."""
    out = np.zeros((len(pos_dst), x.shape[1]), np.float64)
    for i, p in enumerate(pos_dst):
        d2 = ((pos_src - p) ** 2).sum(1)
        nn = np.argsort(d2)[:k]
        w = 1.0 / np.maximum(d2[nn], 1e-16)
        out[i] = (x[nn] * w[:, None]).sum(0) / w.sum()
    return out


def test_knn_interpolate_matches_oracle(rng):
    m, n, c = 50, 120, 7
    pos_src = rng.normal(size=(m, 3)).astype(np.float32)
    pos_dst = rng.normal(size=(n, 3)).astype(np.float32)
    x = rng.normal(size=(m, c)).astype(np.float32)
    got = interpolate.knn_interpolate(
        jnp.asarray(x)[None], jnp.asarray(pos_src)[None],
        jnp.ones((1, m), bool), jnp.asarray(pos_dst)[None],
        jnp.ones((1, n), bool), k=3)
    want = np_knn_interpolate(x, pos_src, pos_dst)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=2e-3, atol=2e-3)


def test_knn_interpolate_ignores_invalid_sources(rng):
    m, n, c = 40, 30, 4
    pos_src = rng.normal(size=(1, m, 3)).astype(np.float32)
    pos_dst = rng.normal(size=(1, n, 3)).astype(np.float32)
    x = rng.normal(size=(1, m, c)).astype(np.float32)
    sv = np.zeros((1, m), bool)
    sv[:, :25] = True
    got = interpolate.knn_interpolate(
        jnp.asarray(x), jnp.asarray(pos_src), jnp.asarray(sv),
        jnp.asarray(pos_dst), jnp.ones((1, n), bool), k=3)
    want = np_knn_interpolate(x[0, :25], pos_src[0, :25], pos_dst[0])
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=2e-3, atol=2e-3)


def test_knn_interpolate_1d_exact_on_kept_points(rng):
    """A kept point's own interpolation is dominated by itself (d=0)."""
    from curvecloudnet_tpu.ops import interpolate as I

    n = 32
    pos = np.cumsum(rng.normal(scale=0.1, size=(1, n, 3)),
                    axis=1).astype(np.float32)
    cid = np.zeros((1, n), np.int32)
    valid = np.ones((1, n), bool)
    kept_idx = np.arange(0, n, 4, dtype=np.int32)[None]
    kept_valid = np.ones_like(kept_idx, bool)
    xk = rng.normal(size=(1, len(kept_idx[0]), 5)).astype(np.float32)
    out = I.knn_interpolate_1d(jnp.asarray(xk), jnp.asarray(kept_idx),
                               jnp.asarray(kept_valid), jnp.asarray(pos),
                               jnp.asarray(cid), jnp.asarray(valid), k=3)
    out = np.asarray(out)
    for s, src in enumerate(kept_idx[0]):
        np.testing.assert_allclose(out[0, src], xk[0, s], rtol=1e-4,
                                   atol=1e-4)


def _subset_case(rng, n=160, m=70, c=6, bound=None):
    import jax

    pos = rng.normal(size=(1, n, 3)).astype(np.float32)
    valid = np.ones((1, n), bool)
    valid[:, n - 7:] = False
    cand_idx = rng.choice(n - 7, size=m, replace=False).astype(np.int32)
    cand_idx.sort()
    cand_idx = cand_idx[None]
    cand_valid = np.ones((1, m), bool)
    cand_valid[:, m - 5:] = False
    x = rng.normal(size=(1, m, c)).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(cand_idx), jnp.asarray(cand_valid),
            jnp.asarray(pos), jnp.asarray(valid))


def test_knn_interpolate_subset_matches_brute(rng):
    """Kept/dropped split fp == the full-sweep search (kept queries are
    self-dominated to ~1e-12 relative)."""
    x, ci, cv, pos, valid = _subset_case(rng)
    want = interpolate.knn_interpolate(
        x, jnp.take_along_axis(pos, ci[..., None], 1), cv, pos, valid, k=3)
    got = interpolate.knn_interpolate_subset(x, ci, cv, pos, valid, k=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_knn_interpolate_subset_overflow_is_counted_and_bounded(rng):
    """When the dropped-query budget overflows, excess queries keep zero
    neighbors (static-budget-plus-telemetry contract, like the grid
    caps); in-budget queries stay exact and telemetry counts the rest."""
    from curvecloudnet_tpu.ops import telemetry
    from curvecloudnet_tpu.ops.interpolate import SPLIT_KEEP_FRAC

    x, ci, cv, pos, valid = _subset_case(rng, n=160, m=40)
    cv = np.array(cv)
    cv[:, 5:] = False  # 5 valid candidates -> dropped >> budget
    cv = jnp.asarray(cv)
    n, m = 160, 40
    budget = min(n, max(3, n - int(SPLIT_KEEP_FRAC * m)))
    kept_rows = set(np.asarray(ci)[0][np.asarray(cv)[0]].tolist())
    dropped_rows = [i for i in range(n)
                    if np.asarray(valid)[0][i] and i not in kept_rows]
    served = set(dropped_rows[:budget]) | kept_rows

    want = interpolate.knn_interpolate(
        x, jnp.take_along_axis(pos, ci[..., None], 1), cv, pos, valid, k=3)
    with telemetry.capture() as cap:
        got = interpolate.knn_interpolate_subset(x, ci, cv, pos, valid, k=3)
        stats = cap.current()
    ov = [v for kk, v in stats.items() if kk.startswith("fp_split_overflow")]
    assert int(ov[0]) == max(0, len(dropped_rows) - budget)
    got, want = np.asarray(got), np.asarray(want)
    for i in sorted(served):
        np.testing.assert_allclose(got[0, i], want[0, i], rtol=1e-5,
                                   atol=1e-5)
    # overflowed queries produce zeros, not garbage
    for i in dropped_rows[budget:]:
        np.testing.assert_array_equal(got[0, i], 0.0)


def test_pos_pack_roundtrip_is_exact(rng):
    """3x-bf16 residual triplets reconstruct f32 positions bit-exactly
    (and, unlike the retired bit-split pairs, contain only NORMAL bf16
    values — safe against TPU denormal flush / NaN canonicalization in
    fused graphs, see tools/tpu_smoke.py)."""
    from curvecloudnet_tpu.ops.interpolate import (_pack_pos_bf16,
                                                   _unpack_pos_bf16)

    p = (rng.normal(size=(4, 9, 3)) * 100).astype(np.float32)
    packed = _pack_pos_bf16(jnp.asarray(p))
    back = np.asarray(_unpack_pos_bf16(packed))
    np.testing.assert_array_equal(back, p)
    # every packed lane is zero or a normal bf16 (|x| >= 2^-126)
    vals = np.abs(np.asarray(packed, np.float32))
    assert ((vals == 0) | (vals >= 2.0 ** -126)).all()
    assert np.isfinite(np.asarray(packed, np.float32)).all()


def test_knn_interpolate_1d_bf16_lidar_scale_weights(rng):
    """bf16 features must NOT quantize positions: at lidar coordinate
    scales (~50 m offsets, ~0.1 m spacing) a bf16 absolute coordinate
    catastrophically cancels in p_nbr - pos (ADVICE r2 medium).  The bf16
    path carries positions as exact bit-split pairs, so inverse-d^2
    weights must match the f32 path."""
    from curvecloudnet_tpu.ops import interpolate as I

    n = 64
    base = np.array([53.7, -41.2, 3.9], np.float32)
    pos = (base + np.cumsum(rng.normal(scale=0.08, size=(1, n, 3)),
                            axis=1)).astype(np.float32)
    cid = np.zeros((1, n), np.int32)
    valid = np.ones((1, n), bool)
    kept_idx = np.arange(0, n, 3, dtype=np.int32)[None]
    kept_valid = np.ones_like(kept_idx, bool)
    xk32 = rng.normal(size=(1, kept_idx.shape[1], 8)).astype(np.float32)

    out32 = np.asarray(I.knn_interpolate_1d(
        jnp.asarray(xk32), jnp.asarray(kept_idx), jnp.asarray(kept_valid),
        jnp.asarray(pos), jnp.asarray(cid), jnp.asarray(valid), k=3))
    out16 = np.asarray(I.knn_interpolate_1d(
        jnp.asarray(xk32).astype(jnp.bfloat16), jnp.asarray(kept_idx),
        jnp.asarray(kept_valid), jnp.asarray(pos), jnp.asarray(cid),
        jnp.asarray(valid), k=3).astype(jnp.float32))
    # the only error allowed is the bf16 quantization of the FEATURES
    np.testing.assert_allclose(out16, out32, rtol=2e-2, atol=2e-2)
