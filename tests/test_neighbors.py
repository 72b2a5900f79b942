import jax
import numpy as np
import jax.numpy as jnp

from curvecloudnet_tpu.ops import neighbors
from conftest import make_curve_cloud


def np_knn(query, points, q_valid, p_valid, k, radius=None):
    b, q, _ = query.shape
    idx = np.full((b, q, k), -1, np.int64)
    for bi in range(b):
        for qi in range(q):
            if not q_valid[bi, qi]:
                continue
            d = np.linalg.norm(points[bi] - query[bi, qi], axis=-1)
            d[~p_valid[bi]] = np.inf
            if radius is not None:
                d[d > radius] = np.inf
            order = np.argsort(d, kind="stable")[:k]
            keep = d[order] < np.inf
            idx[bi, qi, : keep.sum()] = order[keep]
    return idx


def test_knn_exact(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=48)
    q = pos[:, :16]
    qv = valid[:, :16]
    idx, dist = neighbors.knn(jnp.array(q), jnp.array(pos), jnp.array(qv),
                              jnp.array(valid), k=4, block=16)
    oracle = np_knn(q, pos, qv, valid, 4)
    got = np.asarray(idx)
    # compare distance multisets (ties may reorder indices)
    for bi in range(2):
        for qi in range(16):
            if not qv[bi, qi]:
                assert (got[bi, qi] == -1).all()
                continue
            d_got = sorted(np.linalg.norm(pos[bi, got[bi, qi]] - q[bi, qi], axis=-1))
            d_or = sorted(np.linalg.norm(pos[bi, oracle[bi, qi]] - q[bi, qi], axis=-1))
            np.testing.assert_allclose(d_got, d_or, rtol=1e-4, atol=1e-5)


def test_ball_query_radius_mask(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=48)
    idx, dist = neighbors.ball_query(
        jnp.array(pos), jnp.array(pos), jnp.array(valid), jnp.array(valid),
        radius=0.3, k=8, block=16)
    idx, dist = np.asarray(idx), np.asarray(dist)
    m = idx >= 0
    assert (dist[m] <= 0.3 + 1e-5).all()
    # all returned neighbors valid
    for bi in range(2):
        sel = idx[bi][m[bi]]
        assert valid[bi][sel].all()


def test_gather_and_self_loops(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=32)
    idx, _ = neighbors.knn(jnp.array(pos), jnp.array(pos), jnp.array(valid),
                           jnp.array(valid), k=3, block=8)
    idx2 = neighbors.add_self_loops(idx, jnp.array(valid))
    assert idx2.shape == (2, 32, 4)
    got = np.asarray(idx2)
    for bi in range(2):
        for qi in range(32):
            if valid[bi, qi]:
                assert got[bi, qi, 0] == qi
    g = neighbors.gather_neighbors(jnp.array(feat), idx2)
    g = np.asarray(g)
    for bi in range(2):
        for qi in range(32):
            if valid[bi, qi]:
                np.testing.assert_allclose(g[bi, qi, 0], feat[bi, qi], rtol=1e-6)


def test_gather_neighbors_with_pos_bit_identical(rng):
    """Packed (x, pos) gather == two separate gathers, f32 and bf16."""
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=48)
    # lidar-scale offsets so bf16 cancellation would show if pos were cast
    pos = pos * 30.0 + np.array([55.0, -40.0, 3.0])
    idx = np_knn(pos[:, :16], pos, valid[:, :16], valid, 4)
    idxj = jnp.array(idx)
    posj = jnp.array(pos, jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.array(feat, dt)
        xn, pn = neighbors.gather_neighbors_with_pos(x, posj, idxj)
        assert xn.dtype == dt and pn.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(xn), np.asarray(neighbors.gather_neighbors(x, idxj)))
        np.testing.assert_array_equal(
            np.asarray(pn), np.asarray(neighbors.gather_neighbors(posj, idxj)))
    # 128-channel bf16 rows fill whole 256-byte HBM segments: train takes
    # the split-fetch branch (VJP-scatter win), eval packs (row-rate win).
    # Both must stay bit-identical to the two separate gathers.
    x128 = jnp.array(np.tile(feat, (1, 1, 128 // feat.shape[-1] + 1))
                     [:, :, :128], jnp.bfloat16)
    for train in (False, True):
        xn, pn = neighbors.gather_neighbors_with_pos(x128, posj, idxj,
                                                     train=train)
        np.testing.assert_array_equal(
            np.asarray(xn), np.asarray(neighbors.gather_neighbors(x128, idxj)))
        np.testing.assert_array_equal(
            np.asarray(pn), np.asarray(neighbors.gather_neighbors(posj, idxj)))

    # the train path's custom VJP (packed fwd, feature-only scatter bwd)
    # must produce the same d_x as plain autodiff through the gather
    def loss_train(xv):
        xn, pn = neighbors.gather_neighbors_with_pos(xv, posj, idxj,
                                                     train=True)
        return jnp.sum(xn.astype(jnp.float32) * 0.5) + jnp.sum(pn * 0.0)

    def loss_ref(xv):
        xn = neighbors.gather_neighbors(xv, idxj)
        return jnp.sum(xn.astype(jnp.float32) * 0.5)

    xf = jnp.array(np.asarray(x128), jnp.float32)
    np.testing.assert_allclose(np.asarray(jax.grad(loss_train)(xf)),
                               np.asarray(jax.grad(loss_ref)(xf)),
                               rtol=1e-6)
