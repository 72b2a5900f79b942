"""CurveCloudNet-TPU: a TPU-native (JAX/XLA/Pallas) framework for laser-scanned
point-cloud learning — curve-aware semantic segmentation and classification.

Ground-up re-design of github.com/coltonstearns/curvecloudnet for TPU:
batch-padded static-shape tensors, segmented scans for curve structure, MXU
matmul neighbor search, and pjit/Mesh data parallelism.
"""

__version__ = "0.1.0"
