import numpy as np
import jax
import jax.numpy as jnp

from curvecloudnet_tpu.ops import sampling, segments
from conftest import make_curve_cloud


def test_mask_to_indices(rng):
    mask = np.array([[1, 0, 1, 1, 0, 1], [0, 0, 0, 1, 0, 0]], bool)
    idx, ok = sampling.mask_to_indices(jnp.array(mask), budget=3)
    np.testing.assert_array_equal(np.asarray(idx[0]), [0, 2, 3])
    assert np.asarray(ok[0]).all()
    np.testing.assert_array_equal(np.asarray(idx[1])[:1], [3])
    np.testing.assert_array_equal(np.asarray(ok[1]), [True, False, False])


def test_fps_coverage_and_validity(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=64)
    idx, ok = sampling.fps(jnp.array(pos), jnp.array(valid), ratio=0.25)
    idx, ok = np.asarray(idx), np.asarray(ok)
    lengths = valid.sum(axis=1)
    for bi in range(2):
        k = int(np.ceil(lengths[bi] * 0.25))
        assert ok[bi].sum() == k
        sel = idx[bi][ok[bi]]
        assert valid[bi][sel].all()
        assert len(np.unique(sel)) == k  # no duplicates
        assert (np.diff(sel) > 0).all()  # ascending


def test_fps_farthest_property(rng):
    # 1D line: fps from point 0 should pick extremes early
    pos = np.zeros((1, 8, 3), np.float32)
    pos[0, :, 0] = np.arange(8)
    valid = np.ones((1, 8), bool)
    idx, ok = sampling.fps(jnp.array(pos), jnp.array(valid), ratio=0.5)
    sel = np.asarray(idx[0])[np.asarray(ok[0])]
    # start point 0, then farthest is 7, then 3 or 4
    assert 0 in sel and 7 in sel


def test_voxel_downsample(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=64)
    idx, ok = sampling.voxel_downsample(
        jnp.array(pos), jnp.array(valid), voxel_size=0.5, budget=64)
    idx, ok = np.asarray(idx), np.asarray(ok)
    for bi in range(2):
        sel = idx[bi][ok[bi]]
        assert valid[bi][sel].all()
        # exactly one representative per occupied voxel
        vox = np.floor(pos[bi][valid[bi]] / 0.5).astype(int)
        n_vox = len(np.unique(vox, axis=0))
        assert ok[bi].sum() == n_vox
        sel_vox = np.floor(pos[bi][sel] / 0.5).astype(int)
        assert len(np.unique(sel_vox, axis=0)) == len(sel)
        # each representative is the min-distance point of its voxel
        # (no jitter key passed -> deterministic)
        scaled = pos[bi] / 0.5
        d = np.linalg.norm(np.floor(scaled) - scaled, axis=-1)
        for s in sel:
            same = valid[bi] & (np.floor(scaled) == np.floor(scaled[s])).all(-1)
            assert d[s] <= d[same].min() + 1e-6


def test_curve_fps_every_curve_start_kept(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=64)
    idx, ok = sampling.curve_fps(
        jnp.array(pos), jnp.array(curve_id), jnp.array(valid),
        arclen_spacing=0.3, budget=64)
    idx, ok = np.asarray(idx), np.asarray(ok)
    for bi in range(2):
        sel = set(idx[bi][ok[bi]].tolist())
        for c in np.unique(curve_id[bi][valid[bi]]):
            first = np.where(valid[bi] & (curve_id[bi] == c))[0][0]
            assert first in sel


def test_curve_fps_spacing(rng):
    # one straight curve with unit spacing: expect one sample per bin
    n = 32
    pos = np.zeros((1, n, 3), np.float32)
    pos[0, :, 0] = np.arange(n) * 0.1
    valid = np.ones((1, n), bool)
    curve_id = np.zeros((1, n), np.int32)
    idx, ok = sampling.curve_fps(
        jnp.array(pos), jnp.array(curve_id), jnp.array(valid),
        arclen_spacing=0.5, budget=n)
    sel = np.asarray(idx[0])[np.asarray(ok[0])]
    # arclength 3.1 total, spacing 0.5 -> ~7 bins
    assert 5 <= len(sel) <= 9
    gaps = np.diff(pos[0, sel, 0])
    # the forced curve start can sit half a bin from the first round()
    # transition (reference fps_ops.py:31-33 has the same behavior)
    assert (gaps >= 0.2).all()
    assert (gaps[1:] >= 0.4).all()


def test_random_downsample(rng):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=2, n=64)
    key = jax.random.PRNGKey(0)
    idx, ok = sampling.random_downsample(key, jnp.array(valid), ratio=0.5)
    idx, ok = np.asarray(idx), np.asarray(ok)
    lengths = valid.sum(axis=1)
    for bi in range(2):
        k = int(np.ceil(lengths[bi] * 0.5))
        assert ok[bi].sum() == k
        sel = idx[bi][ok[bi]]
        assert valid[bi][sel].all()
        assert len(np.unique(sel)) == k
