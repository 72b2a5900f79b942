"""Dataset constants: class names, ignore labels, CE weights, colormaps.

Parallel of reference ``src/run/globals.py`` — these are public dataset facts
(SemanticKITTI / nuScenes-lidarseg / A2D2 / ShapeNet label sets and the
training class-frequency weights used by the reference).
"""

import numpy as np

# --- nuScenes lidarseg (16 classes + 'noise' ignore at 0) -------------------
NUSCENES_IGNORE_LABEL = 0
NUSCENES_CLASSES = [
    "noise", "barrier", "bicycle", "bus", "car", "construction_vehicle",
    "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
    "driveable_surface", "other_flat", "sidewalk", "terrain", "manmade",
    "vegetation",
]
NUSCENES_CLASS_WEIGHTS = np.array([
    0, 0.05413265, 0.1541931, 0.06454133, 0.03805366, 0.08522725,
    0.11693198, 0.07665045, 0.10206691, 0.06352202, 0.04739051, 0.02240727,
    0.05527531, 0.03266324, 0.03265252, 0.02587772, 0.02841408,
])

# --- SemanticKITTI (19 classes + 'unlabeled' ignore at 0) -------------------
KITTI_IGNORE_LABEL = 0
KITTI_CLASSES = [
    "unlabeled", "car", "bicycle", "motorcycle", "truck", "other-vehicle",
    "person", "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
    "other-ground", "building", "fence", "vegetation", "trunk", "terrain",
    "pole", "traffic-sign",
]
_KITTI_W = np.array([
    3.1557, 8.7029, 7.8281, 6.1354, 6.3161, 7.9937, 8.9704, 10.1922, 1.6155,
    4.2187, 1.9385, 5.5455, 2.0198, 2.6261, 1.3212, 5.1102, 2.5492, 5.8585,
    7.3929,
])
KITTI_CLASS_WEIGHTS = _KITTI_W / _KITTI_W.sum()  # 19 entries, classes 1..19

# --- Audi A2D2 (13 classes, ignore at 12) -----------------------------------
AUDI_IGNORE_LABEL = 12
AUDI_CLASSES = [
    "car", "bicycle", "pedestrian", "truck", "small_vehicle",
    "traffic_signal", "utility_vehicle", "sidebars+curbstone", "poles",
    "road", "buildings", "nature", "ignore",
]

# --- ShapeNet part segmentation ----------------------------------------------
SHAPENET_CATEGORY_NAMES = [
    "Airplane", "Bag", "Cap", "Car", "Chair", "Earphone", "Guitar", "Knife",
    "Lamp", "Laptop", "Motorbike", "Mug", "Pistol", "Rocket", "Skateboard",
    "Table",
]
NUM_SHAPENET_SEG_CLASSES = 50
# category -> global part-label ids (torch_geometric ShapeNet.seg_classes)
SHAPENET_SEG_CLASSES = {
    "Airplane": [0, 1, 2, 3], "Bag": [4, 5], "Cap": [6, 7],
    "Car": [8, 9, 10, 11], "Chair": [12, 13, 14, 15], "Earphone": [16, 17, 18],
    "Guitar": [19, 20, 21], "Knife": [22, 23], "Lamp": [24, 25, 26, 27],
    "Laptop": [28, 29], "Motorbike": [30, 31, 32, 33, 34, 35],
    "Mug": [36, 37], "Pistol": [38, 39, 40], "Rocket": [41, 42, 43],
    "Skateboard": [44, 45, 46], "Table": [47, 48, 49],
}
