"""Shared per-row neighbor tables == per-consumer searches.

Within one forward pass every same-set / subset 3D search is served from one
exact unbounded k=TABLE_K table (ops/neighbors.py shared_knn_scope).  These
tests pin the equivalence that makes the sharing sound: k'-nearest-within-r
is a prefix of the TABLE_K-nearest for any k' <= TABLE_K (the reference
instead re-runs FRNN per module, dgcnn.py:162 / pointnet2.py:62-67).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from curvecloudnet_tpu.ops import neighbors


def _cloud(b=2, n=256, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    counts = np.array([n - 40 * i for i in range(b)])[:, None]
    valid = jnp.asarray(np.arange(n)[None, :] < counts)
    return pos, valid


@pytest.mark.parametrize("radius", [None, 0.5])
def test_same_set_matches_direct(radius):
    pos, valid = _cloud()
    direct_idx, direct_d = neighbors.knn(pos, pos, valid, valid, 8,
                                         radius=radius)
    with neighbors.shared_knn_scope():
        shared_idx, shared_d = neighbors.same_set_knn(pos, valid, 8,
                                                      radius=radius)
    np.testing.assert_array_equal(np.asarray(shared_idx),
                                  np.asarray(direct_idx))
    np.testing.assert_allclose(np.asarray(shared_d), np.asarray(direct_d),
                               rtol=1e-6)


@pytest.mark.parametrize("radius", [None, 0.6])
def test_subset_matches_direct(radius):
    pos, valid = _cloud(seed=1)
    rng = np.random.default_rng(2)
    sub_idx = jnp.asarray(
        np.sort(rng.choice(256, size=(2, 64), replace=False), axis=1)
        .astype(np.int32))
    sub_valid = jnp.take_along_axis(valid, sub_idx, axis=1)
    q = jnp.take_along_axis(pos, sub_idx[..., None], axis=1)
    direct_idx, _ = neighbors.knn(q, pos, sub_valid, valid, 16, radius=radius)
    with neighbors.shared_knn_scope():
        shared_idx, _ = neighbors.subset_knn(pos, valid, sub_idx, sub_valid,
                                             16, radius=radius)
    np.testing.assert_array_equal(np.asarray(shared_idx),
                                  np.asarray(direct_idx))


def test_table_is_cached_and_scoped():
    pos, valid = _cloud(seed=3)
    assert neighbors._row_table(pos, valid) is None  # outside scope
    with neighbors.shared_knn_scope():
        t1 = neighbors._row_table(pos, valid)
        t2 = neighbors._row_table(pos, valid)
        assert t1 is t2  # cached by identity
    assert neighbors._row_table(pos, valid) is None  # scope closed


def test_large_k_bypasses_table():
    pos, valid = _cloud(b=1, n=64, seed=4)
    with neighbors.shared_knn_scope():
        idx, _ = neighbors.same_set_knn(pos, valid, 48)  # > TABLE_K
    ref, _ = neighbors.knn(pos, pos, valid, valid, 48)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))
