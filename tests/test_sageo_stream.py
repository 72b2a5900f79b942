"""Streaming sa-geo (chunked window + online softmax) == materialized path.

The eval fast path walks the geodesic candidate window in chunks with
online-softmax aggregation instead of materializing (B, M, 2w+1, C)
messages; this pins numerical equivalence (same mask fills, softmax merely
reassociated).  Reference semantics: pointnet2.py:158-181 + point_conv.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import cloud_from_arrays
from curvecloudnet_tpu.models.modules import CurveSAStep
from curvecloudnet_tpu.models.spec import ModelSpec, StepSpec


def _setup(aggr):
    rng = np.random.default_rng(0)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 2, 512)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    step = StepSpec(name="sa-geo", feat_dims=(16, 32), radius=0.02,
                    curve_fps_arclen=0.007, use_curve_fps=True,
                    aggr_type=aggr, normalize_radius=True, with_xyz=True,
                    curve_window=12)
    spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     skip_connect_state_store=())
    mod = CurveSAStep(spec, step, (7, 16, 32), budget=256)
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False,
                  key=jax.random.PRNGKey(1))
    return mod, vs, cloud


@pytest.mark.parametrize("aggr", ["attend", "max"])
def test_stream_matches_materialized(aggr):
    mod, vs, cloud = _setup(aggr)
    kw = dict(train=False, key=jax.random.PRNGKey(1))
    try:
        os.environ["CCN_STREAM_SAGEO"] = "0"
        ref = mod.apply(vs, cloud, **kw)
        os.environ["CCN_STREAM_SAGEO"] = "force"
        out = mod.apply(vs, cloud, **kw)
    finally:
        os.environ["CCN_STREAM_SAGEO"] = "auto"
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  np.asarray(ref.valid))
