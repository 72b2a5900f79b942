"""Grid-hash kNN vs brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import neighbors
from curvecloudnet_tpu.ops.grid_knn import grid_knn


@pytest.mark.parametrize("radius,k", [(0.3, 8), (0.15, 4)])
def test_grid_knn_matches_bruteforce(rng, radius, k):
    b, q_n, n = 2, 128, 400
    # spread points so per-cell occupancy stays under the cap
    points = rng.uniform(-2, 2, size=(b, n, 3)).astype(np.float32)
    query = points[:, :q_n] + rng.normal(0, 0.02, (b, q_n, 3)).astype(
        np.float32)
    qv = rng.random((b, q_n)) > 0.1
    pv = rng.random((b, n)) > 0.1

    idx_g, dist_g = grid_knn(jnp.array(query), jnp.array(points),
                             jnp.array(qv), jnp.array(pv), k, radius, cap=32)
    idx_b, dist_b = neighbors.knn(jnp.array(query), jnp.array(points),
                                  jnp.array(qv), jnp.array(pv), k,
                                  radius=radius)
    d_g, d_b = np.asarray(dist_g), np.asarray(dist_b)
    finite_b = d_b < 1e20
    finite_g = d_g < 1e20
    np.testing.assert_array_equal(finite_g, finite_b)
    # brute force computes |a|^2+|b|^2-2ab (catastrophic cancellation at
    # small distances); grid computes (a-b)^2 directly -> ~1e-4 abs skew
    np.testing.assert_allclose(d_g[finite_g], d_b[finite_b], rtol=5e-2,
                               atol=3e-4)
    # neighbor sets coincide as sets of distances; indices match where the
    # distances are unique
    assert (np.asarray(idx_g)[finite_g] >= 0).all()


def test_grid_knn_radius_strict(rng):
    b, n = 1, 300
    points = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    v = np.ones((b, n), bool)
    idx, dist = grid_knn(jnp.array(points), jnp.array(points),
                         jnp.array(v), jnp.array(v), 8, 0.25, cap=32)
    d = np.asarray(dist)
    i = np.asarray(idx)
    assert (d[i >= 0] <= 0.25 + 1e-6).all()
    # self is always the nearest in-radius neighbor
    np.testing.assert_array_equal(i[0, :, 0], np.arange(n))


def test_grid_knn_no_invalid_neighbors(rng):
    b, n = 1, 200
    points = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    pv = np.zeros((b, n), bool)
    pv[:, :50] = True
    qv = np.ones((b, n), bool)
    idx, _ = grid_knn(jnp.array(points), jnp.array(points),
                      jnp.array(qv), jnp.array(pv), 6, 0.5, cap=32)
    i = np.asarray(idx)
    assert (i < 50).all()  # -1 or a valid index < 50
