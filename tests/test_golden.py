"""Golden-file regression: tiny seeded model outputs stay stable.

Guards the numerical behavior of the whole operator stack (samplers,
groupers, convs, aggregation, BN) against silent semantic drift during
optimization work.  Regenerate after *intentional* semantics changes with:
    REGEN_GOLDEN=1 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -m pytest tests/test_golden.py -q
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.models import CurveCloudNet, parse_model_config
from tests.test_model import build_cloud, class_cfg, unet_cfg

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _compute(cfg_fn, in_dim, n_out, n, with_x):
    spec = parse_model_config(cfg_fn(), in_dim=in_dim, n_out=n_out)
    model = CurveCloudNet(spec, n_points=n)
    rng = np.random.default_rng(42)
    cloud = build_cloud(rng, b=2, n=n, with_x=with_x)
    key = jax.random.PRNGKey(7)
    variables = model.init({"params": key, "dropout": key}, cloud,
                           train=False, key=key)
    out, valid = model.apply(variables, cloud, train=False,
                             key=jax.random.PRNGKey(3))
    return np.asarray(out), np.asarray(valid)


CASES = {
    "unet": (unet_cfg, 4, 5, 64, True),
    "classifier": (class_cfg, 3, 7, 48, False),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    out, valid = _compute(*CASES[name])
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if os.environ.get("REGEN_GOLDEN") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, out=out, valid=valid)
        pytest.skip(f"golden {name} regenerated")
    blob = np.load(path)
    np.testing.assert_array_equal(valid, blob["valid"])
    np.testing.assert_allclose(out[valid], blob["out"][blob["valid"]],
                               rtol=5e-4, atol=5e-4)
