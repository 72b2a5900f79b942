"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere.
"""

import os

# Skip the axon TPU-tunnel PJRT registration (sitecustomize registers it
# whenever PALLAS_AXON_POOL_IPS is set; startup costs ~2min per process).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_curve_cloud(rng, b=2, n=64, n_curves=4, f=5, frac_valid=1.0):
    """Synthetic batch-padded curve cloud with the packing invariants."""
    pos = np.zeros((b, n, 3), np.float32)
    curve_id = np.zeros((b, n), np.int32)
    valid = np.zeros((b, n), bool)
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    for bi in range(b):
        n_valid = int(n * frac_valid) if bi == 0 else rng.integers(n // 2, n + 1)
        # random curve boundaries
        bounds = np.sort(rng.choice(np.arange(1, n_valid), size=min(n_curves - 1, n_valid - 1), replace=False))
        cid = np.zeros(n_valid, np.int32)
        for k, s in enumerate(bounds):
            cid[s:] = k + 1
        curve_id[bi, :n_valid] = cid
        valid[bi, :n_valid] = True
        # polyline-ish positions: random walk per curve
        p = np.cumsum(rng.normal(scale=0.1, size=(n_valid, 3)), axis=0)
        pos[bi, :n_valid] = p
    return pos, feat, curve_id, valid
