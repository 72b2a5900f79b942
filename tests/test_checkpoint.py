"""Checkpoint tests: torch state-dict translation + orbax round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu import checkpoint as ckpt
from curvecloudnet_tpu.models import (
    CurveCloudNet, cloud_from_arrays, parse_model_config,
)


def conv_model_cfg():
    return dict(
        use_bias=True, version=2.0,
        steps=[dict(step_name="conv1d-fast-v2", with_diff=False,
                    with_xyz=False, kernel_size=5, feat_dims=[6])],
        out_mlp=dict(dims=[8], dropout=0.0),
    )


def test_torch_symmetric_conv_translation_matches_reference_math(rng):
    """Converted conv taps reproduce y_i = w0 x_i + sum_d w_d (x_{i-d}+x_{i+d})."""
    spec = parse_model_config(conv_model_cfg(), in_dim=4, n_out=3)
    n = 32
    model = CurveCloudNet(spec, n_points=n)

    x = rng.normal(size=(1, n, 4)).astype(np.float32)
    pos = rng.normal(size=(1, n, 3)).astype(np.float32)
    cloud = cloud_from_arrays(jnp.array(pos), jnp.zeros((1, n), jnp.int32),
                              jnp.ones((1, n), bool), jnp.array(x))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, cloud,
                           train=False, key=key)

    # fake torch state dict: conv taps (O=6, I=4, H=3) + identity BN + head
    o, i_, h = 6, 4, 3
    w = rng.normal(size=(o, i_, h)).astype(np.float32)
    b = rng.normal(size=(o,)).astype(np.float32)
    sd = {
        "steps.0.conv_modules.0.weight": w,
        "steps.0.conv_modules.0.bias": b,
        "steps.0.norm_modules.0.weight": np.ones(o, np.float32),
        "steps.0.norm_modules.0.bias": np.zeros(o, np.float32),
        "steps.0.norm_modules.0.running_mean": np.zeros(o, np.float32),
        "steps.0.norm_modules.0.running_var": np.ones(o, np.float32),
        "mlp.lins.0.weight": rng.normal(size=(8, 6)).astype(np.float32),
        "mlp.lins.0.bias": np.zeros(8, np.float32),
        "mlp.norms.0.weight": np.ones(8, np.float32),
        "mlp.norms.0.bias": np.zeros(8, np.float32),
        "mlp.norms.0.running_mean": np.zeros(8, np.float32),
        "mlp.norms.0.running_var": np.ones(8, np.float32),
        "mlp.lins.1.weight": rng.normal(size=(3, 8)).astype(np.float32),
        "mlp.lins.1.bias": np.zeros(3, np.float32),
    }
    params, batch_stats = ckpt.load_torch_checkpoint(sd, spec)

    # merge into the initialized tree (shapes must agree)
    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = v
    import flax
    vd = flax.core.unfreeze(variables)
    merge(vd["params"], params)
    merge(vd["batch_stats"], batch_stats)

    out, _ = model.apply(vd, cloud, train=False, key=key)

    # oracle: symmetric conv along the row + leaky_relu, then the head MLP
    def sym_conv(xrow):  # (n, 4) -> (n, 6)
        y = np.zeros((n, o), np.float32)
        for t in range(n):
            acc = w[:, :, 0] @ xrow[t]
            for d in range(1, h):
                left = xrow[t - d] if t - d >= 0 else 0
                right = xrow[t + d] if t + d < n else 0
                acc = acc + w[:, :, d] @ (left + right)
            y[t] = acc + b
        return y

    hidden = sym_conv(x[0])
    hidden = np.where(hidden >= 0, hidden, 0.01 * hidden)  # leaky_relu
    head = np.maximum(hidden @ sd["mlp.lins.0.weight"].T, 0)
    logits = head @ sd["mlp.lins.1.weight"].T
    np.testing.assert_allclose(np.asarray(out[0]), logits, rtol=2e-4,
                               atol=2e-4)


def test_orbax_roundtrip(tmp_path):
    from curvecloudnet_tpu.data import datasets as D
    from curvecloudnet_tpu.train import create_train_state, make_schedule
    from tests.test_train_e2e import TINY_MODEL, make_setup

    model, ds, batch = make_setup()
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, batch, key,
                               make_schedule(None, 1e-3, 10))
    ckpt.save_checkpoint(str(tmp_path), "latest", state)
    # perturb then restore
    zeroed = state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params))
    restored = ckpt.restore_checkpoint(str(tmp_path), "latest", zeroed)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.dump_latest_state(str(tmp_path), 3, 0.5)
    st = ckpt.read_latest_state(str(tmp_path))
    assert st == {"epoch": 3, "max_score": 0.5}
