import numpy as np
import jax.numpy as jnp

from curvecloudnet_tpu.ops import segments
from conftest import make_curve_cloud


def np_per_curve(fn, x, curve_id, valid):
    """Oracle: apply fn per (sample, curve) over valid points, broadcast back."""
    out = np.zeros_like(x, dtype=np.float64)
    b, n = curve_id.shape
    for bi in range(b):
        for c in np.unique(curve_id[bi][valid[bi]]):
            m = valid[bi] & (curve_id[bi] == c)
            out[bi, m] = fn(x[bi, m])
    return out


def test_curve_starts_and_ends(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng)
    starts = np.asarray(segments.curve_starts(jnp.array(curve_id), jnp.array(valid)))
    ends = np.asarray(segments.curve_ends(jnp.array(curve_id), jnp.array(valid)))
    b, n = curve_id.shape
    for bi in range(b):
        for c in np.unique(curve_id[bi][valid[bi]]):
            idxs = np.where(valid[bi] & (curve_id[bi] == c))[0]
            assert starts[bi, idxs[0]]
            assert not starts[bi, idxs[1:]].any()
            assert ends[bi, idxs[-1]]
            assert not ends[bi, idxs[:-1]].any()


def test_segmented_cumsum_matches_numpy(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng)
    x = feat[..., 0]
    starts = segments.curve_starts(jnp.array(curve_id), jnp.array(valid))
    got = np.asarray(segments.segmented_cumsum(jnp.array(x), starts))
    oracle = np_per_curve(np.cumsum, x, curve_id, valid)
    mask = valid
    np.testing.assert_allclose(got[mask], oracle[mask], rtol=1e-5, atol=1e-5)


def test_per_curve_total_and_counts(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng)
    x = np.abs(feat[..., 1])
    got = np.asarray(segments.per_curve_total(
        jnp.array(x), jnp.array(curve_id), jnp.array(valid)))
    oracle = np_per_curve(lambda v: np.full_like(v, v.sum()), x, curve_id, valid)
    np.testing.assert_allclose(got[valid], oracle[valid], rtol=1e-4, atol=1e-5)

    counts = np.asarray(segments.points_per_curve(
        jnp.array(curve_id), jnp.array(valid)))
    oracle_c = np_per_curve(lambda v: np.full_like(v, len(v)),
                            np.ones_like(x), curve_id, valid)
    np.testing.assert_allclose(counts[valid], oracle_c[valid])


def test_geodesic_arclength(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng)
    got = np.asarray(segments.geodesic_arclength(
        jnp.array(pos), jnp.array(curve_id), jnp.array(valid)))
    b, n = curve_id.shape
    for bi in range(b):
        for c in np.unique(curve_id[bi][valid[bi]]):
            idxs = np.where(valid[bi] & (curve_id[bi] == c))[0]
            seg = pos[bi, idxs]
            arc = np.concatenate([[0.0], np.cumsum(
                np.linalg.norm(np.diff(seg, axis=0), axis=-1))])
            np.testing.assert_allclose(got[bi, idxs], arc, rtol=1e-4, atol=1e-5)


def test_curve_start_index(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng)
    got = np.asarray(segments.curve_start_index(
        jnp.array(curve_id), jnp.array(valid)))
    b, n = curve_id.shape
    for bi in range(b):
        for c in np.unique(curve_id[bi][valid[bi]]):
            idxs = np.where(valid[bi] & (curve_id[bi] == c))[0]
            assert (got[bi, idxs] == idxs[0]).all()
