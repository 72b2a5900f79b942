"""Geometric operator library for batch-padded curve clouds (pure JAX/XLA).

Layer L1 of the framework (see SURVEY.md §1): the TPU-native equivalents of
the reference's ``src/models/utils/point_ops.py`` + CUDA neighbor kernels.
"""

from . import aggregate, curve1d, interpolate, neighbors, sampling, segments

__all__ = [
    "aggregate",
    "curve1d",
    "interpolate",
    "neighbors",
    "sampling",
    "segments",
]
