import jax
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


def test_take_rows_grad_matches_take_along_axis():
    """Inverse-gather VJP == scatter VJP when invalid-slot cotangents are 0."""
    rng = np.random.default_rng(7)
    b, n, q, c = 2, 32, 12, 5
    a = rng.standard_normal((b, n, c)).astype(np.float32)
    idx = np.sort(rng.choice(n, (b, q), replace=False), axis=1).astype(np.int32)
    idx_valid = np.arange(q)[None, :] < np.array([[q], [q - 3]])
    w = rng.standard_normal((b, q, c)).astype(np.float32)

    def loss_custom(aa):
        out = segments.take_rows(aa, jnp.array(idx), jnp.array(idx_valid))
        return jnp.sum(jnp.where(jnp.array(idx_valid)[..., None],
                                 out * w, 0.0))

    def loss_ref(aa):
        out = jnp.take_along_axis(aa, jnp.array(idx)[..., None], axis=1)
        return jnp.sum(jnp.where(jnp.array(idx_valid)[..., None],
                                 out * w, 0.0))

    ga = jax.grad(loss_custom)(jnp.array(a))
    gr = jax.grad(loss_ref)(jnp.array(a))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(segments.take_rows(jnp.array(a), jnp.array(idx),
                                      jnp.array(idx_valid))),
        np.asarray(jnp.take_along_axis(jnp.array(a), jnp.array(idx)[..., None],
                                       axis=1)))
