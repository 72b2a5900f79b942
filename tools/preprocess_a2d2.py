#!/usr/bin/env python3
"""Preprocess official Audi A2D2 (camera-lidar-semantic) into per-frame npz.

Capability parallel of the reference's in-dataset A2D2 labeling
(``src/data/audi_dataset.py:60-122``): per-point labels come from the
front-center semantic label image — undistort the image, look up each lidar
point's (row, col) projection, hash the BGR color, and map through the
54-class -> 13-class learning map.  Output frames carry
points / reflectance / lidar_id / timestamp / labels, the layout consumed by
``curvecloudnet_tpu.data.lidar.SemA2D2`` (which does the curve extraction).

Usage:
  python tools/preprocess_a2d2.py --root /path/a2d2 --sensor-config
      /path/cams_lidars.json --outdir ./data/a2d2 --split train

Requires opencv-python for image undistortion (reads proceed without
undistortion if cv2 is missing, with a warning).
"""

import argparse
import glob
import json
import os

import numpy as np

# BGR color hash (b*1 + g*100 + r*10000) -> raw 55-class id, then raw ->
# 13-class training id.  Public A2D2 class-color metadata.
HASHED2LABEL = {
    2550000: 0, 2000000: 1, 1500000: 2, 1280000: 3, 1828906: 4, 1505004: 5,
    903001: 6, 903030: 7, 2055555: 8, 1897455: 9, 2399091: 10, 2562800: 11,
    2012800: 12, 1512800: 13, 25500: 14, 20000: 15, 15000: 16, 13055: 17,
    302958: 18, 602900: 19, 25755: 20, 322220: 21, 615899: 22, 2575500: 23,
    2575700: 24, 2340000: 25, 1111000: 26, 1292800: 27, 2569337: 28,
    640064: 29, 1862287: 30, 100: 31, 1400008: 32, 2105115: 33, 2550128: 34,
    2574743: 35, 1500150: 36, 2065653: 37, 2396373: 38, 334577: 39,
    1805180: 40, 2557185: 41, 2403491: 42, 1495494: 43, 1515200: 44,
    1815200: 45, 741104: 46, 2012710: 47, 1602338: 48, 1280255: 49,
    2550255: 50, 1370855: 51, 2433255: 52, 967043: 53, 534682: 54, 0: 53,
}
# raw 55-class -> 13 training classes (road/sidewalk/buildings/poles/signs/
# nature/person/car/truck/bike/signal/obstacles/other)
LEARNING_MAP = {
    0: 7, 1: 7, 2: 7, 3: 7, 4: 9, 5: 9, 6: 9, 7: 9, 8: 6, 9: 6, 10: 6,
    11: 8, 12: 8, 13: 8, 14: 12, 15: 12, 16: 12, 17: 10, 18: 10, 19: 10,
    20: 4, 21: 4, 22: 4, 23: 12, 24: 12, 25: 11, 26: 0, 27: 1, 28: 0,
    29: 4, 30: 11, 31: 12, 32: 1, 33: 0, 34: 11, 35: 3, 36: 0, 37: 12,
    38: 5, 39: 4, 40: 0, 41: 12, 42: 0, 43: 5, 44: 0, 45: 1, 46: 12,
    47: 0, 48: 4, 49: 0, 50: 0, 51: 12, 52: 2, 53: 12, 54: 12,
}


def color_hash_labels(colors_bgr: np.ndarray) -> np.ndarray:
    """(N, 3) BGR colors -> 13-class training labels."""
    nums = (colors_bgr[:, 0].astype(np.int64)
            + colors_bgr[:, 1].astype(np.int64) * 100
            + colors_bgr[:, 2].astype(np.int64) * 10000)
    raw = np.array([HASHED2LABEL.get(int(n), 53) for n in nums])
    lut = np.zeros(55, np.int32)
    for k, v in LEARNING_MAP.items():
        lut[k] = v
    return lut[raw]


def undistort_front_center(image, sensor_config):
    try:
        import cv2
    except ImportError:
        print("[a2d2] cv2 missing — skipping undistortion")
        return image
    cam = sensor_config["cameras"]["front_center"]
    intr_undist = np.asarray(cam["CamMatrix"])
    intr_dist = np.asarray(cam["CamMatrixOriginal"])
    dist = np.asarray(cam["Distortion"])
    h, w = image.shape[:2]
    mapx, mapy = cv2.initUndistortRectifyMap(
        intr_dist, dist, None, intr_undist, (w, h), 5)
    return cv2.remap(image, mapx, mapy, cv2.INTER_NEAREST)


def lidar_to_label_path(lidar_path: str) -> str:
    seq = lidar_path.split(os.sep)[-4]
    cam = lidar_path.split(os.sep)[-2]
    fname = (os.path.basename(lidar_path)
             .replace("lidar", "label").replace(".npz", ".png"))
    root = os.sep.join(lidar_path.split(os.sep)[:-4])
    return os.path.join(root, seq, "label", cam, fname)


def process_frame(lidar_path: str, sensor_config) -> dict:
    import cv2

    blob = np.load(lidar_path)
    label_img = cv2.imread(lidar_to_label_path(lidar_path))
    label_img = undistort_front_center(label_img, sensor_config)
    rows = (blob["row"] + 0.5).astype(np.int64)
    cols = (blob["col"] + 0.5).astype(np.int64)
    rows = np.clip(rows, 0, label_img.shape[0] - 1)
    cols = np.clip(cols, 0, label_img.shape[1] - 1)
    labels = color_hash_labels(label_img[rows, cols, :])
    return dict(points=blob["points"].astype(np.float32),
                reflectance=blob["reflectance"].astype(np.float32),
                lidar_id=blob["lidar_id"].astype(np.int32),
                timestamp=blob["timestamp"].astype(np.int64),
                labels=labels.astype(np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--sensor-config", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--eval-seqs", nargs="*", default=[
        "20180807_145028", "20180810_142822"])
    args = ap.parse_args()

    with open(args.sensor_config) as f:
        sensor_config = json.load(f)
    lidar_paths = sorted(glob.glob(os.path.join(
        args.root, "*", "lidar", "cam_front_center", "*.npz")))
    outdir = os.path.join(args.outdir, args.split)
    os.makedirs(outdir, exist_ok=True)
    n = 0
    for p in lidar_paths:
        seq = p.split(os.sep)[-4]
        is_eval = seq in args.eval_seqs
        if (args.split == "train") == is_eval:
            continue
        frame = process_frame(p, sensor_config)
        out = os.path.join(outdir, f"{seq}_{os.path.basename(p)[:-4]}.npz")
        np.savez_compressed(out, **frame)
        n += 1
    print(f"wrote {n} frames to {outdir}")


if __name__ == "__main__":
    main()
