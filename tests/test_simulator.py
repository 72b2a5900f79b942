"""Scanning-simulator tests: rasterizer (native vs numpy), scan lines,
curve-cloud building, curvature oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.simulator import curve_cloud as cc
from curvecloudnet_tpu.simulator import generate as gen
from curvecloudnet_tpu.simulator import scanlines
from curvecloudnet_tpu.simulator.rasterizer import (
    Pinhole, look_at_camera, rasterize,
)


@pytest.fixture(scope="module")
def sphere_render():
    verts, faces = gen.uv_sphere(24, 32)
    cam = look_at_camera(verts, distance=2.0)
    res = 128
    pin = Pinhole(fx=res * 1.5, fy=res * 1.5, cx=res / 2, cy=res / 2,
                  h=res, w=res)
    return verts, faces, cam, pin


def test_rasterizer_native_matches_numpy(sphere_render):
    verts, faces, cam, pin = sphere_render
    c1, n1, m1 = rasterize(cam, faces, pin, use_native=True)
    c2, n2, m2 = rasterize(cam, faces, pin, use_native=False)
    # coverage nearly identical (boundary pixels may differ by float ties)
    agree = (m1 == m2).mean()
    assert agree > 0.995, agree
    both = m1 & m2
    np.testing.assert_allclose(c1[both], c2[both], atol=1e-3)
    assert both.sum() > 500  # sphere visibly covers the image


def test_rasterizer_geometry(sphere_render):
    verts, faces, cam, pin = sphere_render
    coords, normals, mask = rasterize(cam, faces, pin)
    # surface points lie on the unit-ish sphere around the mesh center
    center = cam.mean(0)
    r = np.linalg.norm(coords[mask] - center, axis=1)
    assert abs(np.median(r) - 0.5) < 0.05
    # normals are unit and face the camera (-z component)
    nl = np.linalg.norm(normals[mask], axis=1)
    np.testing.assert_allclose(nl, 1.0, atol=1e-4)
    assert (normals[mask][:, 2] < 0).mean() > 0.99
    # depth sanity: visible points are in front of the camera
    assert coords[mask][:, 2].min() > 0


def test_scanlines_exact_count(sphere_render):
    verts, faces, cam, pin = sphere_render
    _, _, mask = rasterize(cam, faces, pin)
    rng = np.random.default_rng(0)
    for pattern in ("random", "parallel", "grid"):
        got = scanlines.generate_scan_lines(rng, mask, 512, pattern=pattern,
                                            density=0.5)
        assert got is not None, pattern
        uv, cid = got
        assert len(uv) == 512
        assert mask[uv[:, 0], uv[:, 1]].all()
        # no duplicate pixels
        flat = uv[:, 0] * pin.w + uv[:, 1]
        assert len(np.unique(flat)) == len(flat)
        assert np.all(np.diff(cid) >= 0)


def test_binary_subdivision_interleaves():
    a = scanlines._binary_subdivision_locations(0, 8)
    b = scanlines._binary_subdivision_locations(1, 8)
    # successive rounds interleave (at most the wrap-around index collides)
    assert len(np.intersect1d(np.round(a, 6), np.round(b, 6))) <= 1
    assert ((a >= 0) & (a < 1)).all()
    # round 1 fills the gaps of round 0's dyadic grid
    mids = np.sort(b)[1:]
    assert np.all((mids * 16) % 2 == 1)  # odd multiples of 1/16


def test_anti_alias_smooths_but_keeps_boundaries():
    n = 64
    t = np.linspace(0, 4 * np.pi, n)
    sig = np.stack([t, np.sign(np.sin(t)), np.zeros(n)], -1).astype(np.float32)
    cid = np.zeros(n, np.int32)
    cid[n // 2:] = 1  # two curves
    valid = np.ones((1, n), bool)
    out = np.asarray(cc.anti_alias(jnp.asarray(sig)[None],
                                   jnp.asarray(cid)[None], jnp.asarray(valid)))[0]
    # smoothing reduces total variation of the square wave
    tv = lambda x: np.abs(np.diff(x[:, 1])).sum()  # noqa: E731
    assert tv(out) < tv(sig)
    # oracle: the reference's F.conv1d(curve, kernel, 'same')/F.conv1d(mask)
    # over each curve independently (curve-padded layout, curve_cloud.py:174)
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    filt = torch.tensor(list(cc.ANTI_ALIAS_KERNEL),
                        dtype=torch.float64).view(1, 1, -1)
    expect = np.zeros_like(sig)
    for c in np.unique(cid):
        seg = torch.tensor(sig[cid == c], dtype=torch.float64).T[:, None, :]
        num = F.conv1d(seg, filt, padding="same")
        den = F.conv1d(torch.ones_like(seg[:1]), filt, padding="same")
        expect[cid == c] = (num / den)[:, 0, :].T.numpy()
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_curvature_of_circle():
    """A circle of radius r has curvature magnitude 1/r pointing inward."""
    r = 2.0
    n = 200
    ang = np.linspace(0, np.pi, n)
    pos = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(n)],
                   -1).astype(np.float32)
    cid = np.zeros((1, n), np.int32)
    valid = np.ones((1, n), bool)
    curv, _ = cc.estimate_curvature_and_grads(
        jnp.asarray(pos)[None], None, jnp.asarray(cid), jnp.asarray(valid),
        k=12)
    curv = np.asarray(curv)[0]
    interior = slice(20, n - 20)
    mag = np.linalg.norm(curv[interior], axis=1)
    np.testing.assert_allclose(mag, 1.0 / r, rtol=0.05)
    # direction: towards circle center (-pos direction)
    dirs = curv[interior] / mag[:, None]
    towards = -pos[interior] / r
    np.testing.assert_allclose(dirs, towards, atol=0.05)


def test_feature_gradient_linear_ramp():
    n = 100
    pos = np.stack([np.linspace(0, 5, n), np.zeros(n), np.zeros(n)],
                   -1).astype(np.float32)
    feat = (3.0 * pos[:, :1]).astype(np.float32)  # df/ds = 3 along +x
    cid = np.zeros((1, n), np.int32)
    valid = np.ones((1, n), bool)
    _, grads = cc.estimate_curvature_and_grads(
        jnp.asarray(pos)[None], jnp.asarray(feat)[None], jnp.asarray(cid),
        jnp.asarray(valid), k=8)
    g = np.asarray(grads)[0][10:-10]  # (N, F=1, 3)
    np.testing.assert_allclose(np.abs(g[:, 0, 0]), 3.0, rtol=0.05)
    np.testing.assert_allclose(g[:, 0, 1:], 0.0, atol=1e-3)


def test_split_and_intersections():
    a = np.stack([np.linspace(-1, 1, 50), np.zeros(50), np.zeros(50)], -1)
    b = np.stack([np.zeros(50), np.linspace(-1, 1, 50), np.zeros(50)], -1)
    pos = np.concatenate([a, b]).astype(np.float32)
    cid = np.repeat([0, 1], 50)
    pairs = cc.find_intersections(pos, cid, thresh=0.05)
    assert pairs.shape[1] >= 1  # the two lines cross at the origin
    i, j = pairs[:, 0]
    assert np.linalg.norm(pos[i] - pos[j]) < 0.05
    assert cid[i] != cid[j]


def test_generate_dataset_roundtrip(tmp_path):
    path = gen.generate_dataset(str(tmp_path), n_samples=3, n_points=256,
                                resolution=96, density=0.5, seed=0)
    blob = np.load(path)
    assert blob["pos"].shape == (3, 256, 3)
    assert blob["valid"].all(axis=1).any()  # at least one fully-valid scan
    for i in range(3):
        v = blob["valid"][i]
        cid = blob["curve_id"][i][v]
        assert np.all(np.diff(cid) >= 0)
        assert blob["labels"][i][v].max() <= 3


def test_generate_qa_viz(tmp_path):
    """Generation-time QA renders (reference
    scanning_simulator/utils/visualization.py:10-153)."""
    gen.generate_dataset(str(tmp_path), n_samples=2, n_points=256,
                         resolution=96, density=0.5, seed=0, viz_every=1)
    qa = tmp_path / "qa"
    curves = sorted(qa.glob("curves_*.png"))
    segs = sorted(qa.glob("seg_*.png"))
    assert len(curves) == 2 and len(segs) == 2
    import matplotlib.image as mpimg

    img = mpimg.imread(curves[0])
    assert img.ndim == 3 and img.shape[0] > 32
    assert img.std() > 0.01  # non-blank render


def test_curve_hash_colors_stable():
    from curvecloudnet_tpu.simulator.qa_viz import curve_hash_colors

    cid = np.array([0, 0, 1, 2, 1])
    c1, c2 = curve_hash_colors(cid), curve_hash_colors(cid)
    np.testing.assert_array_equal(c1, c2)  # deterministic across calls
    assert (c1[0] == c1[1]).all() and not (c1[0] == c1[2]).all()
    assert c1.min() >= 0 and c1.max() <= 1
