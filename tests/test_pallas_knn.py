"""Pallas kNN kernel vs the XLA reference implementation (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import neighbors
from curvecloudnet_tpu.ops.pallas_knn import knn_pallas


# (The aabb / mxu kernel variants and their CCN_KNN_VARIANT dispatch were
# deleted in round 4 — gate-family experiments closed as negative; see
# docs/ROADMAP.md "Parked floors".)


@pytest.mark.parametrize("k,q_n,n", [(4, 100, 300), (16, 257, 513)])
def test_pallas_knn_matches_xla(rng, k, q_n, n):
    query = rng.normal(size=(2, q_n, 3)).astype(np.float32)
    points = rng.normal(size=(2, n, 3)).astype(np.float32)
    qv = rng.random((2, q_n)) > 0.1
    pv = rng.random((2, n)) > 0.1

    idx_p, dist_p = knn_pallas(jnp.array(query), jnp.array(points),
                               jnp.array(qv), jnp.array(pv), k,
                               interpret=True)
    idx_x, dist_x = neighbors.knn(jnp.array(query), jnp.array(points),
                                  jnp.array(qv), jnp.array(pv), k)
    # distances must match exactly-ish; indices can differ on ties
    d_p, d_x = np.asarray(dist_p), np.asarray(dist_x)
    finite = d_x < 1e20
    np.testing.assert_allclose(d_p[finite], d_x[finite], rtol=1e-4, atol=1e-5)
    assert ((d_p >= 1e20) == ~finite).all()
    # indices produce the same distances
    ip = np.asarray(idx_p)
    assert (ip[finite] >= 0).all()
    assert (ip[~finite] == -1).all()


def test_pallas_knn_radius(rng):
    query = rng.normal(size=(1, 64, 3)).astype(np.float32)
    points = rng.normal(size=(1, 128, 3)).astype(np.float32)
    v = np.ones((1, 64), bool)
    pv = np.ones((1, 128), bool)
    idx, dist = knn_pallas(jnp.array(query), jnp.array(points),
                           jnp.array(v), jnp.array(pv), 8, radius=0.5,
                           interpret=True)
    d = np.asarray(dist)
    i = np.asarray(idx)
    assert (d[i >= 0] <= 0.5).all()
    assert (i[d > 0.5] == -1).all()
