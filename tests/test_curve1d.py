import numpy as np
import jax.numpy as jnp

from curvecloudnet_tpu.ops import curve1d, interpolate, sampling
from conftest import make_curve_cloud


def test_interleaved_offsets():
    offs = np.asarray(curve1d.interleaved_offsets(3))
    np.testing.assert_array_equal(offs, [0, -1, 1, -2, 2, -3, 3])


def test_shift_fill():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    np.testing.assert_array_equal(
        np.asarray(curve1d.shift_fill(x, 2))[0, :, 0],
        [2, 3, 4, 5, 6, 7, 0, 0])
    np.testing.assert_array_equal(
        np.asarray(curve1d.shift_fill(x, -2))[0, :, 0],
        [0, 0, 0, 1, 2, 3, 4, 5])


def test_knn_1d_subset_same_curve_only(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=64)
    idx, ok = sampling.curve_fps(
        jnp.array(pos), jnp.array(curve_id), jnp.array(valid),
        arclen_spacing=0.3, budget=32)
    nbr, mask = curve1d.knn_1d_group_subset(
        idx, ok, jnp.array(curve_id), jnp.array(valid), k=3)
    nbr, mask, idx, ok = map(np.asarray, (nbr, mask, idx, ok))
    for bi in range(2):
        for qi in range(32):
            if not ok[bi, qi]:
                assert not mask[bi, qi].any()
                continue
            q_pt = idx[bi, qi]
            nbrs = nbr[bi, qi][mask[bi, qi]]
            assert len(nbrs) <= 3
            assert len(nbrs) >= 1  # self always included
            assert (curve_id[bi, nbrs] == curve_id[bi, q_pt]).all()
            assert valid[bi, nbrs].all()
            # first neighbor in near-to-far order is self
            assert nbrs[0] == q_pt


def test_radius_1d_matches_reference_cap(rng):
    # straight line, evenly spaced: avg edge ~ 0.1 within one curve
    n = 32
    pos = np.zeros((1, n, 3), np.float32)
    pos[0, :, 0] = np.arange(n) * 0.1
    valid = np.ones((1, n), bool)
    curve_id = np.zeros((1, n), np.int32)
    q_idx = jnp.array([[10, 20]], dtype=jnp.int32)
    q_ok = jnp.ones((1, 2), bool)
    nbr, mask = curve1d.radius_1d_group_subset(
        jnp.array(pos), q_idx, q_ok, jnp.array(curve_id), jnp.array(valid),
        radius=0.35, window=8)
    mask = np.asarray(mask)
    # avg edge = 3.1/32 ≈ 0.0969; ceil(0.35/0.0969)=4 -> per-query count cap 4
    assert mask[0, 0].sum() == 4
    assert mask[0, 1].sum() == 4


def test_superset_grouping_and_1d_interp(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=64)
    kept_idx, kept_ok = sampling.curve_fps(
        jnp.array(pos), jnp.array(curve_id), jnp.array(valid),
        arclen_spacing=0.2, budget=48)
    nbr, mask = curve1d.knn_1d_group_superset(
        jnp.array(pos), kept_idx, kept_ok, jnp.array(curve_id),
        jnp.array(valid), k=2)
    nbr, mask = np.asarray(nbr), np.asarray(mask)
    kept_idx_np, kept_ok_np = np.asarray(kept_idx), np.asarray(kept_ok)
    for bi in range(2):
        for pi in range(64):
            if not valid[bi, pi]:
                continue
            slots = nbr[bi, pi][mask[bi, pi]]
            # curve-fps keeps every curve start, so every point has >= 1
            assert len(slots) >= 1
            pts = kept_idx_np[bi, slots]
            assert (curve_id[bi, pts] == curve_id[bi, pi]).all()

    # interpolation of a linear function of position is near-exact where
    # a point has 2 neighbors spanning it
    x_kept = sampling.gather_rows(jnp.array(pos), kept_idx)  # use pos as feats
    up = interpolate.knn_interpolate_1d(
        x_kept, kept_idx, kept_ok, jnp.array(pos), jnp.array(curve_id),
        jnp.array(valid), k=2)
    up = np.asarray(up)
    # kept points themselves must reconstruct exactly (d=0 dominates)
    for bi in range(2):
        sel = kept_idx_np[bi][kept_ok_np[bi]]
        np.testing.assert_allclose(up[bi, sel], pos[bi, sel], atol=1e-4)


def test_feature_diffs_oracle(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=32, f=4)
    got = np.asarray(curve1d.feature_diffs(
        jnp.array(feat), jnp.array(curve_id), jnp.array(valid)))
    for bi in range(2):
        for pi in range(32):
            if not valid[bi, pi]:
                continue
            terms, cnt = np.zeros(4), 0
            if pi + 1 < 32 and valid[bi, pi + 1] and curve_id[bi, pi + 1] == curve_id[bi, pi]:
                terms += feat[bi, pi + 1] - feat[bi, pi]
                cnt += 1
            if pi - 1 >= 0 and valid[bi, pi - 1] and curve_id[bi, pi - 1] == curve_id[bi, pi]:
                terms += feat[bi, pi] - feat[bi, pi - 1]
                cnt += 1
            oracle = np.abs(terms / max(cnt, 1))
            np.testing.assert_allclose(got[bi, pi], oracle, rtol=1e-4, atol=1e-5)


def test_symmetric_window_concat_matches_dense_conv(rng):
    """The shift-concat form must equal torch-style conv over zero-stuffed curves."""
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=1, n=40, f=3)
    half_k = 2  # kernel size 5
    cat = np.asarray(curve1d.symmetric_window_concat(
        jnp.array(feat), jnp.array(curve_id), jnp.array(valid), half_k))
    # oracle: per curve, numpy correlate with symmetric kernel
    w = np.random.default_rng(1).normal(size=(half_k + 1, 3, 2)).astype(np.float32)
    # y[i] = sum_d w[d] . (x[i-d] + x[i+d]) (d=0 counted once)
    y_got = cat @ w.reshape(-1, 2).reshape((half_k + 1) * 3, 2)
    y_oracle = np.zeros((1, 40, 2), np.float32)
    for c in np.unique(curve_id[0][valid[0]]):
        idxs = np.where(valid[0] & (curve_id[0] == c))[0]
        seg = feat[0, idxs]  # (L, 3)
        L = len(seg)
        for i in range(L):
            acc = seg[i] @ w[0]
            for d in range(1, half_k + 1):
                s = np.zeros(3, np.float32)
                if i - d >= 0:
                    s += seg[i - d]
                if i + d < L:
                    s += seg[i + d]
                acc = acc + s @ w[d]
            y_oracle[0, idxs[i]] = acc
    np.testing.assert_allclose(
        np.asarray(y_got)[valid], y_oracle[valid], rtol=1e-4, atol=1e-4)


def test_gather_window_with_pos_bit_identical(rng):
    from curvecloudnet_tpu.ops import curve1d
    b, n, c, m, w = 2, 64, 8, 24, 3
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    pos = (rng.standard_normal((b, n, 3)) * 30.0
           + np.array([55.0, -40.0, 3.0])).astype(np.float32)
    idx = rng.integers(0, n, (b, m)).astype(np.int32)
    posj = jnp.array(pos)
    for dt in (jnp.float32, jnp.bfloat16):
        xj = jnp.array(x, dt)
        xw, pw = curve1d.gather_window_with_pos(xj, posj, jnp.array(idx), w)
        assert xw.dtype == dt and pw.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(xw),
            np.asarray(curve1d.gather_window_features(xj, jnp.array(idx), w)))
        np.testing.assert_array_equal(
            np.asarray(pw),
            np.asarray(curve1d.gather_window_features(posj, jnp.array(idx), w)))
