"""conv1d chain kernel (ops/pallas_conv1d.py) vs the exact gap-expanded
path (interpret mode, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import curve1d, pallas_conv1d


def _ref_chain(xe, weights, used, h):
    """The exact path's per-layer computation (SymmetricCurveConvStep V2
    train branch): window concat -> dense -> leaky -> tail mask."""
    a = xe
    n_exp = xe.shape[0]
    mask = (jnp.arange(n_exp) < used)[:, None]
    for w, b in weights:
        win = curve1d.window_concat_nomask(a[None], h)[0]
        y = win @ w + b
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
        a = jnp.where(mask, y, 0.0)
    return a


@pytest.mark.parametrize("c0,dims,h", [(14, (32, 32, 32), 2),
                                       (262, (32, 32, 32), 2),
                                       (8, (16, 16), 1)])
def test_chain_matches_exact(c0, dims, h):
    rng = np.random.default_rng(0)
    n_exp = 1536 + 128  # not a tile multiple
    used = 1400
    xe = rng.normal(size=(n_exp, c0)).astype(np.float32)
    xe[used:] = 0.0
    weights = []
    cin = c0
    for cout in dims:
        w = rng.normal(size=((h + 1) * cin, cout)).astype(np.float32) * 0.1
        b = rng.normal(size=(cout,)).astype(np.float32) * 0.1
        weights.append((jnp.asarray(w), jnp.asarray(b)))
        cin = cout
    got = pallas_conv1d.conv1d_chain_eval(
        jnp.asarray(xe), tuple(weights), used, half_k=h, tile_n=256,
        interpret=True)
    want = _ref_chain(jnp.asarray(xe), weights, used, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fold_conv_bn_eval():
    """BN fold equals dense -> eval BN applied sequentially."""
    rng = np.random.default_rng(1)
    cin, cout = 12, 8
    w = rng.normal(size=(cin, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    params = {"conv_0": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
              "norm_0": {"scale": jnp.asarray(rng.normal(size=cout) ** 2 + .5)
                         .astype(jnp.float32),
                         "bias": jnp.asarray(rng.normal(size=cout))
                         .astype(jnp.float32)}}
    stats = {"norm_0": {"mean": jnp.asarray(rng.normal(size=cout))
                        .astype(jnp.float32),
                        "var": jnp.asarray(rng.normal(size=cout) ** 2 + .1)
                        .astype(jnp.float32)}}
    (wf, bf), = pallas_conv1d.fold_conv_bn_eval(params, stats, 1)
    x = rng.normal(size=(5, cin)).astype(np.float32)
    y = x @ w + b
    s = params["norm_0"]["scale"] / np.sqrt(stats["norm_0"]["var"] + 1e-5)
    want = (y - stats["norm_0"]["mean"]) * s + params["norm_0"]["bias"]
    got = x @ np.asarray(wf) + np.asarray(bf)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)
