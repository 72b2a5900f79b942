"""Mesh rasterization: pinhole z-buffer → per-pixel coords/normals/mask.

Replaces the reference's CUDA ``minimal_pytorch_rasterizer``
(``scanning_simulator/utils/minimal_rasterizer.py:14-51``) with a native C++
kernel (simulator/native/rasterizer.cpp, auto-built with g++ on first use,
loaded via ctypes) and a vectorized NumPy fallback with identical semantics.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librasterizer.so")
_lib = None


@dataclasses.dataclass
class Pinhole:
    """Pinhole intrinsics (reference mpr.Pinhole2D equivalent)."""

    fx: float
    fy: float
    cx: float
    cy: float
    h: int
    w: int


def _build_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "rasterizer.cpp")
    if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, src],
                check=True, capture_output=True)
        except Exception as e:
            print(f"[rasterizer] native build failed ({e}); numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        print(f"[rasterizer] load failed ({e}); numpy fallback")
        return None
    lib.rasterize_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rasterize_mesh.restype = None
    _lib = lib
    return lib


def rasterize(vertices: np.ndarray, faces: np.ndarray, pinhole: Pinhole,
              use_native: bool = True
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rasterize a camera-space mesh.

    Returns (coords (h,w,3), normals (h,w,3), mask (h,w) bool).
    """
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    h, w = pinhole.h, pinhole.w
    lib = _build_native() if use_native else None
    if lib is not None:
        coords = np.zeros((h, w, 3), np.float32)
        normals = np.zeros((h, w, 3), np.float32)
        depth = np.zeros((h, w), np.float32)
        mask = np.zeros((h, w), np.uint8)
        lib.rasterize_mesh(
            vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(vertices),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(faces),
            pinhole.fx, pinhole.fy, pinhole.cx, pinhole.cy, h, w,
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return coords, normals, mask.astype(bool)
    return _rasterize_numpy(vertices, faces, pinhole)


def _rasterize_numpy(vertices, faces, pinhole):
    """Vectorized NumPy z-buffer (per-face bounding boxes, scatter-min)."""
    h, w = pinhole.h, pinhole.w
    coords = np.zeros((h, w, 3), np.float32)
    normals = np.zeros((h, w, 3), np.float32)
    depth = np.full((h, w), np.inf, np.float32)
    mask = np.zeros((h, w), bool)

    tri = vertices[faces]  # (F, 3, 3)
    ok = (tri[:, :, 2] > 1e-6).all(1)
    for A, B, C in tri[ok]:
        n = np.cross(B - A, C - A)
        nl = np.linalg.norm(n)
        if nl < 1e-12:
            continue
        n = n / nl
        if n[2] > 0:
            n = -n
        pts2 = np.stack([
            [pinhole.fx * A[0] / A[2] + pinhole.cx,
             pinhole.fy * A[1] / A[2] + pinhole.cy],
            [pinhole.fx * B[0] / B[2] + pinhole.cx,
             pinhole.fy * B[1] / B[2] + pinhole.cy],
            [pinhole.fx * C[0] / C[2] + pinhole.cx,
             pinhole.fy * C[1] / C[2] + pinhole.cy],
        ])
        x0 = max(int(np.floor(pts2[:, 0].min())), 0)
        x1 = min(int(np.ceil(pts2[:, 0].max())), w - 1)
        y0 = max(int(np.floor(pts2[:, 1].min())), 0)
        y1 = min(int(np.ceil(pts2[:, 1].max())), h - 1)
        if x0 > x1 or y0 > y1:
            continue
        (ax, ay), (bx, by), (cx, cy) = pts2
        det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if abs(det) < 1e-12:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1) + 0.5,
                             np.arange(y0, y1 + 1) + 0.5)
        l0 = ((by - cy) * (xs - cx) + (cx - bx) * (ys - cy)) / det
        l1 = ((cy - ay) * (xs - cx) + (ax - cx) * (ys - cy)) / det
        l2 = 1 - l0 - l1
        inside = (l0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
        iz = l0 / A[2] + l1 / B[2] + l2 / C[2]
        z = np.where(iz > 0, 1.0 / np.maximum(iz, 1e-12), np.inf)
        sub = depth[y0:y1 + 1, x0:x1 + 1]
        closer = inside & (z < sub)
        if not closer.any():
            continue
        wgt = np.stack([l0 / A[2] * z, l1 / B[2] * z, l2 / C[2] * z], -1)
        pt = (wgt[..., 0:1] * A + wgt[..., 1:2] * B + wgt[..., 2:3] * C)
        sub[closer] = z[closer]
        coords[y0:y1 + 1, x0:x1 + 1][closer] = pt[closer]
        normals[y0:y1 + 1, x0:x1 + 1][closer] = n
        mask[y0:y1 + 1, x0:x1 + 1][closer] = True
    return coords, normals, mask


def look_at_camera(mesh_vertices: np.ndarray, distance: float = 2.5,
                   elev_deg: float = 20.0, azim_deg: float = 30.0,
                   return_transform: bool = False):
    """Transform world-space vertices into a camera frame looking at origin.

    With ``return_transform`` also returns ``(rot, eye)`` such that
    ``cam = (v - eye) @ rot.T`` and therefore ``v = cam @ rot + eye`` —
    consumers that must map scan points BACK to the object frame (e.g.
    part-label transfer against an object-space label cloud) invert with
    these instead of matching across frames."""
    el, az = np.deg2rad(elev_deg), np.deg2rad(azim_deg)
    eye = distance * np.array([
        np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    rot = np.stack([right, up2, fwd])  # world -> camera (z forward)
    cam = (mesh_vertices - eye) @ rot.T
    if return_transform:
        return cam, rot, eye
    return cam
