"""Compatibility: the original reference YAML configs parse and build.

These tests read the reference's config files directly (reference mounted at
/root/reference) and are skipped when it is absent.  They validate the
parallel-list schema path of parse_model_config and the interpreter's dim
arithmetic against all six real architectures via abstract init (no FLOPs).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import yaml

from curvecloudnet_tpu.models import (
    CurveCloudNet, cloud_from_arrays, parse_model_config,
)

REF = "/root/reference/configs/curvecloudnet-train"

CONFIGS = [
    ("nuscenes-curvecloudnet.yaml", 4, 17),
    ("kitti-curvecloudnet.yaml", 4, 20),
    ("audi-curvecloudnet.yaml", 4, 13),
    ("shapenet-seg-curvecloudnet.yaml", 3, 50),
    ("shapenet-class-curvecloudnet.yaml", 3, 16),
    ("kortx-testsplit-curvecloudnet.yaml", 3, 50),
]

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


@pytest.mark.parametrize("fname,in_dim,n_out", CONFIGS)
def test_reference_yaml_parses_and_builds(fname, in_dim, n_out):
    with open(os.path.join(REF, fname)) as f:
        cfg = yaml.safe_load(f)
    spec = parse_model_config(cfg["model"], in_dim=in_dim, n_out=n_out)
    assert len(spec.steps) == len(cfg["model"]["steps"])

    n = 256
    model = CurveCloudNet(spec, n_points=n)
    rng = np.random.default_rng(0)
    pos = np.cumsum(rng.normal(scale=0.02, size=(1, n, 3)),
                    axis=1).astype(np.float32)
    cid = np.repeat(np.arange(8), n // 8)[None].astype(np.int32)
    x = (rng.normal(size=(1, n, 1)).astype(np.float32)
         if in_dim == 4 else None)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.ones((1, n), bool),
                              None if x is None else jnp.asarray(x))
    key = jax.random.PRNGKey(0)
    cats = jnp.zeros((1,), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key}, cloud, cats,
                           train=False, key=key))
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree.leaves(shapes["params"]))
    assert n_params > 1e5  # all six models are >0.1M params
