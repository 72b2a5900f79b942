"""Procedural curve-cloud generators (lidar sweeps, scanned objects).

Used by tests, the bench harness, and the multichip dry-run so the framework
exercises realistic curve structure without dataset downloads.  Geometry
mimics the real datasets' contracts: rotating-lidar sweeps produce per-beam
rings with range-dependent point spacing (what SemKITTI/SemNuScenes curve
extraction yields — reference ``kitti_dataset.py:73-92``,
``nuscenes_dataset.py:91-118``), scanned objects produce scan-line polylines
over a surface (what the scanning simulator emits).  Positions are scaled by
the same 1/20 normalization the lidar datasets apply (kitti_dataset.py:58).
"""

from __future__ import annotations

import numpy as np


def synthetic_lidar_sweep(rng: np.random.Generator, n_points: int,
                          n_beams: int = 32, n_classes: int = 17,
                          pos_scale: float = 1.0 / 20.0):
    """One rotating-lidar sweep: per-beam azimuth-ordered rings.

    Returns (pos (N,3) f32, reflectance (N,1) f32, curve_id (N,) i32,
    labels (N,) i32).  Points are in scan order per beam; beams are the
    curves. Ground plane + a few boxy 'objects' give spatial label structure.
    """
    pts_per_beam = n_points // n_beams
    elevations = np.deg2rad(np.linspace(-25, 5, n_beams))
    pos, curve_id, labels = [], [], []
    # a few objects: (center_xy, radius, class)
    n_obj = 6
    obj_xy = rng.uniform(-30, 30, size=(n_obj, 2))
    obj_r = rng.uniform(1.5, 4.0, size=n_obj)
    obj_c = rng.integers(1, n_classes, size=n_obj)
    # environment envelope: buildings/walls bound the free range per
    # azimuth sector, like real urban sweeps (an unbounded ground plane
    # out to 60 m makes point spacing unrealistically coarse, which
    # distorts downsample keep-rates and neighbor distributions)
    n_sector = 64
    env_r = rng.uniform(8.0, 55.0, size=n_sector)
    for b in range(n_beams):
        az = np.sort(rng.uniform(0, 2 * np.pi, pts_per_beam))
        el = elevations[b]
        # ground-plane intersection range (sensor at 1.8m) w/ noise, capped
        if el < -1e-3:
            rng_gp = np.minimum(1.8 / np.tan(-el), 60.0)
        else:
            rng_gp = 60.0
        sect = (az / (2 * np.pi) * n_sector).astype(int) % n_sector
        r_bound = env_r[sect] * rng.uniform(0.97, 1.03, pts_per_beam)
        # realistic range noise is a few cm — multiplicative percent-level
        # jitter would dominate the along-curve arclength and distort
        # downsample keep-rates
        r = (np.minimum(np.full(pts_per_beam, rng_gp), r_bound)
             + rng.normal(0.0, 0.03, pts_per_beam))
        xy = np.stack([r * np.cos(az), r * np.sin(az)], -1)
        lab = np.zeros(pts_per_beam, np.int32)
        lab[:] = 1  # driveable surface
        lab = np.where(r_bound < rng_gp, min(2, n_classes - 1), lab)  # walls
        for o in range(n_obj):
            d = np.linalg.norm(xy - obj_xy[o], axis=-1)
            hit = d < obj_r[o]
            # pull hit ranges in to the object's surface
            t = np.clip(np.linalg.norm(obj_xy[o]) - obj_r[o], 1.0, 60.0)
            r = np.where(hit, t + rng.normal(0.0, 0.03, pts_per_beam), r)
            lab = np.where(hit, obj_c[o], lab)
        z = np.full(pts_per_beam, 1.8) + r * np.tan(el)
        p = np.stack([r * np.cos(az), r * np.sin(az), z], -1)
        pos.append(p)
        curve_id.append(np.full(pts_per_beam, b, np.int32))
        labels.append(lab)
    pos = np.concatenate(pos).astype(np.float32) * pos_scale
    curve_id = np.concatenate(curve_id)
    labels = np.concatenate(labels)
    refl = rng.uniform(0, 1, size=(len(pos), 1)).astype(np.float32)
    return pos, refl, curve_id.astype(np.int32), labels.astype(np.int32)


def synthetic_lidar_batch(rng: np.random.Generator, batch: int, n_pad: int,
                          n_points: int | None = None, n_beams: int = 32,
                          n_classes: int = 17):
    """Padded batch of sweeps: (pos, feat, curve_id, valid, labels)."""
    if n_points is None:
        n_points = n_pad
    pos = np.zeros((batch, n_pad, 3), np.float32)
    feat = np.zeros((batch, n_pad, 1), np.float32)
    curve_id = np.zeros((batch, n_pad), np.int32)
    valid = np.zeros((batch, n_pad), bool)
    labels = np.zeros((batch, n_pad), np.int32)
    for i in range(batch):
        n_i = n_points if i == 0 else int(rng.integers(
            int(n_points * 0.9), n_points + 1))
        n_i = min(n_i, n_pad)
        p, f, c, y = synthetic_lidar_sweep(rng, n_i, n_beams, n_classes)
        m = len(p)
        pos[i, :m], feat[i, :m] = p, f
        curve_id[i, :m], labels[i, :m] = c, y
        valid[i, :m] = True
    return pos, feat, curve_id, valid, labels


def synthetic_object_scan(rng: np.random.Generator, n_points: int,
                          n_lines: int = 24, n_parts: int = 4,
                          shape: str | None = None):
    """One scanned object: parallel scan lines over a parametric surface.

    Unit-sphere normalized like the object datasets (object_datasets.py:61-66).
    Returns (pos, curve_id, part_labels, category).
    """
    shapes = ["sphere", "cylinder", "box"]
    if shape is None:
        shape = shapes[int(rng.integers(len(shapes)))]
    category = shapes.index(shape)
    pts_per_line = n_points // n_lines
    pos, curve_id, labels = [], [], []
    vs = np.linspace(-0.9, 0.9, n_lines)
    for li, v in enumerate(vs):
        t = np.linspace(0, 1, pts_per_line) + rng.normal(
            0, 0.002, pts_per_line)
        if shape == "sphere":
            phi = np.arccos(np.clip(v, -1, 1))
            theta = t * np.pi  # half sweep (visible side)
            p = np.stack([np.sin(phi) * np.cos(theta),
                          np.sin(phi) * np.sin(theta),
                          np.full_like(theta, np.cos(phi))], -1)
        elif shape == "cylinder":
            theta = t * np.pi
            p = np.stack([np.cos(theta), np.sin(theta),
                          np.full_like(theta, v)], -1)
        else:  # box front face + top
            x = t * 2 - 1
            p = np.stack([x, np.full_like(x, 0.5 * np.sign(v)),
                          np.full_like(x, v)], -1)
        pos.append(p)
        curve_id.append(np.full(pts_per_line, li, np.int32))
        labels.append(np.digitize(p[:, 2], np.linspace(-1, 1, n_parts + 1)[1:-1]))
    pos = np.concatenate(pos).astype(np.float32)
    pos = pos - pos.mean(0, keepdims=True)
    pos = pos / max(np.linalg.norm(pos, axis=1).max(), 1e-6)
    pos += rng.normal(0, 0.005, pos.shape).astype(np.float32)
    return (pos.astype(np.float32), np.concatenate(curve_id),
            np.concatenate(labels).astype(np.int32), category)


def synthetic_object_batch(rng: np.random.Generator, batch: int, n_pad: int,
                           n_parts: int = 4):
    """Padded classification/part-seg batch of scanned objects."""
    pos = np.zeros((batch, n_pad, 3), np.float32)
    curve_id = np.zeros((batch, n_pad), np.int32)
    valid = np.zeros((batch, n_pad), bool)
    part_labels = np.zeros((batch, n_pad), np.int32)
    categories = np.zeros((batch,), np.int32)
    for i in range(batch):
        p, c, y, cat = synthetic_object_scan(rng, n_pad, n_parts=n_parts)
        m = len(p)
        pos[i, :m], curve_id[i, :m], part_labels[i, :m] = p, c, y
        valid[i, :m] = True
        categories[i] = cat
    return pos, curve_id, valid, part_labels, categories
