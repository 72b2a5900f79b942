"""Batched 12-view TTA == sequential TTA (logit means agree)."""

import numpy as np
import jax
import jax.numpy as jnp

from curvecloudnet_tpu.run import tasks as T
from curvecloudnet_tpu.models import CurveCloudNet, parse_model_config
from tests.test_model import unet_cfg, build_cloud


def test_batched_tta_matches_sequential():
    spec = parse_model_config(unet_cfg(), in_dim=4, n_out=5)
    model = CurveCloudNet(spec, n_points=64)
    rng = np.random.default_rng(0)
    cloud = build_cloud(rng, b=1, n=64)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, cloud,
                           train=False, key=key)

    seq = T.make_tta_eval(model)
    logits_sum = None
    for f in T.TTA_FLIPS:
        for s in T.TTA_SCALES:
            lg, ov = seq(variables, cloud, jnp.asarray(f), jnp.asarray(s))
            logits_sum = lg if logits_sum is None else logits_sum + lg
    seq_mean = np.asarray(logits_sum / 12)

    batched = T.make_batched_tta_eval(model)
    bat_mean, bov, _stats = batched(variables, cloud)
    bat_mean = np.asarray(bat_mean)

    v = np.asarray(ov)[0]
    np.testing.assert_allclose(bat_mean[0][v], seq_mean[0][v], rtol=2e-3, atol=1e-3)
