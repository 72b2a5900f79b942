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


def test_proven_grid_table_matches_brute():
    """A voxel-proven-cap forced-grid table returns the same neighbor sets
    as the exact brute search (the spec-proof guarantees no cell
    truncates; 2 overflow planes absorb hash-collision spills)."""
    rng = np.random.default_rng(3)
    # voxel-like set: points on a jittered 0.1-spaced grid -> occupancy of
    # a 0.3-cell is provably <= (0.3/0.1 + 1)^3 = 64
    base = rng.uniform(-1.5, 1.5, (1, 2048, 3)).astype(np.float32)
    pos = jnp.asarray(np.round(base / 0.1) * 0.1
                      + rng.normal(0, 0.01, base.shape).astype(np.float32))
    valid = jnp.ones(pos.shape[:2], bool)
    bi, bd = neighbors.knn(pos, pos, valid, valid, 8, radius=0.3)
    gi, gd = neighbors.knn(pos, pos, valid, valid, 8, radius=0.3,
                           cap_override=64, force_grid=True)
    np.testing.assert_array_equal(np.sort(np.asarray(gi), axis=-1),
                                  np.sort(np.asarray(bi), axis=-1))
    # grid-tail distances carry the packed min-extraction's mantissa
    # quantization (~2^-10 relative on d2, see ops/pallas_topk.py) — the
    # neighbor SETS above are exact, distances are within that quantum
    np.testing.assert_allclose(np.sort(np.asarray(gd), axis=-1),
                               np.sort(np.asarray(bd), axis=-1),
                               rtol=5e-3, atol=2e-3)


def test_proven_grid_first_rule(monkeypatch):
    """Dispatch rule: proven rows route grid-first only when the grid
    bound covers every consumer and the candidate width wins."""
    monkeypatch.setattr(neighbors.jax, "default_backend", lambda: "tpu")
    assert neighbors._proven_grid_first(11520, 0.1, 0.1, 64)
    # grid bound doesn't cover the row's max consumer radius
    assert not neighbors._proven_grid_first(11520, 0.3, 0.1, 64)
    # candidate width too close to brute width
    assert not neighbors._proven_grid_first(5760, 0.3, 0.3, 128)
    assert not neighbors._proven_grid_first(4096, 0.1, 0.1, 64)
    monkeypatch.setattr(neighbors.jax, "default_backend", lambda: "cpu")
    assert not neighbors._proven_grid_first(11520, 0.1, 0.1, 64)


def test_voxel_cell_occupancy_proof():
    """The spec-level occupancy proof: exact sweep values, plus an
    empirical check that voxel-downsampled points never exceed it."""
    from curvecloudnet_tpu.models.base import _voxel_cell_occupancy
    from curvecloudnet_tpu.ops.sampling import voxel_downsample

    assert _voxel_cell_occupancy(0.1, 0.03) == 64
    assert _voxel_cell_occupancy(0.1, 0.025) == 64
    # the naive (floor(c/v)+1)^3 formula claims 64 here — alignment drift
    # at ratio 3.9 actually reaches 5 voxels per axis
    assert _voxel_cell_occupancy(0.39, 0.1) == 125

    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.uniform(0, 1.0, (1, 8192, 3)).astype(np.float32))
    valid = jnp.ones((1, 8192), bool)
    for cell, v in [(0.1, 0.03), (0.39, 0.1)]:
        idx, kept = voxel_downsample(pos, valid, v, 8192)
        p = np.asarray(jnp.take_along_axis(pos, idx[..., None], axis=1))[0]
        p = p[np.asarray(kept)[0]]
        cells = np.floor(p / cell).astype(np.int64)
        key = (cells[:, 0] * 1_000_003 + cells[:, 1]) * 1_000_003 \
            + cells[:, 2]
        _, counts = np.unique(key, return_counts=True)
        assert counts.max() <= _voxel_cell_occupancy(cell, v)
