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


def _exact_chain_train(xe, params, used, h):
    """The exact path's train-mode math (masked batch stats over live
    slots), differentiable — the autodiff oracle for the kernel VJP."""
    b, n_exp, _ = xe.shape
    mask = (jnp.arange(n_exp)[None, :] < used[:, None])
    n = jnp.maximum(jnp.sum(used).astype(jnp.float32), 1.0)
    u = xe
    stats = []
    for w, bb, gam, bet in params:
        win = curve1d.window_concat_nomask(u, h)
        z = win @ w + bb
        zf = z.astype(jnp.float32)
        mf = mask[..., None].astype(jnp.float32)
        mu = jnp.sum(zf * mf, axis=(0, 1)) / n
        var = jnp.sum((zf - mu) ** 2 * mf, axis=(0, 1)) / n
        stats.append((mu, var))
        y = (zf - mu) * jax.lax.rsqrt(var + 1e-5) * gam + bet
        u = (jax.nn.leaky_relu(y, negative_slope=0.01)
             * mf).astype(xe.dtype)
    return u, stats


def test_train_chain_values_and_grads():
    rng = np.random.default_rng(3)
    h, dims, c0 = 2, (16, 16, 16), 10
    b, n_exp = 2, 640
    used = np.array([600, 512], np.int32)
    xe = rng.normal(size=(b, n_exp, c0)).astype(np.float32)
    for bi in range(b):
        xe[bi, used[bi]:] = 0.0
    params = []
    cin = c0
    for cout in dims:
        params.append((
            jnp.asarray(rng.normal(size=((h + 1) * cin, cout))
                        .astype(np.float32) * 0.2),
            jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1),
            jnp.asarray((rng.normal(size=cout) * 0.3 + 1.0)
                        .astype(np.float32)),
            jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)))
        cin = cout
    xe_j, used_j = jnp.asarray(xe), jnp.asarray(used)

    out_k, stats_k = pallas_conv1d.conv1d_chain_train(
        xe_j, tuple(params), used_j, 2, 128, True)
    out_x, stats_x = _exact_chain_train(xe_j, params, used_j, h)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=3e-5, atol=3e-5)
    for (m_k, v_k, _), (m_x, v_x) in zip(stats_k, stats_x):
        np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_x),
                                   rtol=1e-5, atol=1e-5)

    # gradient parity vs autodiff of the exact path (incl. the paths
    # through the batch statistics)
    cot = jnp.asarray(rng.normal(size=out_x.shape).astype(np.float32))

    def loss_k(xe_, params_):
        o, _ = pallas_conv1d.conv1d_chain_train(xe_, params_, used_j, 2,
                                                128, True)
        return jnp.sum(o.astype(jnp.float32) * cot)

    def loss_x(xe_, params_):
        o, _ = _exact_chain_train(xe_, params_, used_j, h)
        return jnp.sum(o.astype(jnp.float32) * cot)

    gk = jax.grad(loss_k, argnums=(0, 1))(xe_j, tuple(params))
    gx = jax.grad(loss_x, argnums=(0, 1))(xe_j, tuple(params))
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               rtol=2e-4, atol=2e-4)
    for lk, lx in zip(gk[1], gx[1]):
        for ak, ax in zip(lk, lx):
            np.testing.assert_allclose(np.asarray(ak), np.asarray(ax),
                                       rtol=2e-4, atol=2e-4)
