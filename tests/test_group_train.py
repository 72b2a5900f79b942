"""Train-mode grouped megakernel == materialized XLA path (values + grads).

The custom-VJP kernel family (ops/pallas_group_train.py) must reproduce
the materialized train path exactly: forward values, BatchNorm batch
statistics, and gradients wrt h1 and every parameter — INCLUDING the
gradient paths through the batch mean/variance (torch autograd
semantics, reference train loop).  Runs in interpret mode on CPU, f32.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvecloudnet_tpu.ops import aggregate
from curvecloudnet_tpu.ops.pallas_group_train import grouped_train_reduce

EPS = 1e-5


def _lrelu(x):
    return jnp.where(x > 0, x, 0.01 * x)


def _masked_bn(v, maskf, gamma, beta):
    n = jnp.clip(jnp.sum(maskf), min=1.0)
    mf = maskf[..., None]
    mu = jnp.sum(v * mf, axis=(0, 1, 2)) / n
    var = jnp.sum((v - mu) ** 2 * mf, axis=(0, 1, 2)) / n
    y = (v - mu) * jax.lax.rsqrt(var + EPS) * gamma + beta
    return y, mu, var


def _ref_forward(h1_qm, maskf, params, aggr):
    """Materialized reference: h1 (B, M, K, C1) query-major, f32."""
    v = h1_qm
    stats = []
    for (g, be), (w, b) in zip(params["bns"], params["denses"]):
        y, mu, var = _masked_bn(v, maskf, g, be)
        stats.append((mu, var))
        v = _lrelu(y) @ w + b
    msg = v
    mask = maskf > 0
    if aggr == "attend":
        (wa0, ba0), (wa1, ba1) = params["att_denses"]
        ga, bea = params["att_bns"][0]
        g1 = msg @ wa0 + ba0
        ya, mua, vara = _masked_bn(g1, maskf, ga, bea)
        logits = _lrelu(ya) @ wa1 + ba1
        out = aggregate.masked_attend(msg, logits, mask)
        stats.append((mua, vara))
    else:
        out = aggregate.masked_max(msg, mask)
    return out, stats


def _make_params(rng, dims, att_dims):
    def dense(ci, co):
        return (jnp.asarray(rng.normal(size=(ci, co)) * 0.3, jnp.float32),
                jnp.asarray(rng.normal(size=(co,)) * 0.1, jnp.float32))

    def bn(c):
        return (jnp.asarray(1.0 + 0.2 * rng.normal(size=(c,)), jnp.float32),
                jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32))

    params = {
        "bns": tuple(bn(dims[i]) for i in range(len(dims) - 1)),
        "denses": tuple(dense(dims[i], dims[i + 1])
                        for i in range(len(dims) - 1)),
        "att_bns": tuple(bn(att_dims[i + 1])
                         for i in range(max(len(att_dims) - 2, 0))),
        "att_denses": tuple(dense(att_dims[i], att_dims[i + 1])
                            for i in range(max(len(att_dims) - 1, 0))),
    }
    return params


def _pdicts_from(params):
    """Kernel-facing flax-style param dicts (lin_0 excluded upstream)."""
    loc = {}
    for i, ((g, be), (w, b)) in enumerate(zip(params["bns"],
                                              params["denses"])):
        loc[f"norm_{i}"] = {"scale": g, "bias": be}
        loc[f"lin_{i + 1}"] = {"kernel": w, "bias": b}
    att = {}
    for i, (w, b) in enumerate(params["att_denses"]):
        att[f"lin_{i}"] = {"kernel": w, "bias": b}
    for i, (g, be) in enumerate(params["att_bns"]):
        att[f"norm_{i}"] = {"scale": g, "bias": be}
    return loc, att


def _kernel_forward(h1_qm, maskf, params, aggr, dims, att_dims):
    loc, att = _pdicts_from(params)
    h1_km = jnp.swapaxes(h1_qm, 1, 2)
    out, ls, ast = grouped_train_reduce(
        h1_km, maskf > 0, loc, len(dims), att if aggr == "attend" else None,
        max(len(att_dims) - 1, 0),
        aggr=aggr, interpret=True, tile_m=128, k_planes=None)
    return out, ls, ast


@pytest.mark.parametrize("aggr,b,m,k,dims,att_dims", [
    ("attend", 1, 48, 10, (8, 12, 16), (16, 16, 16)),
    ("attend", 2, 40, 15, (8, 16), (16, 8, 16)),
    ("max", 1, 48, 10, (8, 12, 16), ()),
    ("max", 2, 40, 6, (8, 16), ()),
])
def test_group_train_matches_reference(aggr, b, m, k, dims, att_dims):
    rng = np.random.default_rng(0)
    h1 = jnp.asarray(rng.normal(size=(b, m, k, dims[0])), jnp.float32)
    maskf = (rng.random((b, m, k)) > 0.25).astype(np.float32)
    maskf[0, 3, :] = 0.0   # fully-invalid query row (junk-but-masked)
    maskf[0, 5, :] = 1.0
    maskf = jnp.asarray(maskf)
    row_valid = jnp.asarray(np.any(np.asarray(maskf) > 0, axis=-1),
                            jnp.float32)
    params = _make_params(rng, dims, att_dims)
    r = jnp.asarray(rng.normal(size=(b, m, dims[-1])), jnp.float32)

    def loss_ref(h1_, params_):
        out, _ = _ref_forward(h1_, maskf, params_, aggr)
        return jnp.sum(out * r * row_valid[..., None])

    def loss_ker(h1_, params_):
        out, _, _ = _kernel_forward(h1_, maskf, params_, aggr, dims,
                                    att_dims)
        return jnp.sum(out * r * row_valid[..., None])

    # forward values + batch stats
    out_ref, stats_ref = _ref_forward(h1, maskf, params, aggr)
    out_ker, ls, ast = _kernel_forward(h1, maskf, params, aggr, dims,
                                       att_dims)
    rv = np.asarray(row_valid)[..., None]
    np.testing.assert_allclose(np.asarray(out_ker) * rv,
                               np.asarray(out_ref) * rv,
                               rtol=2e-5, atol=2e-5)
    got_stats = list(ls) + list(ast)
    for (mu_r, var_r), (mu_k, var_k, _) in zip(stats_ref, got_stats):
        np.testing.assert_allclose(np.asarray(mu_k), np.asarray(mu_r),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var_k), np.asarray(var_r),
                                   rtol=1e-5, atol=1e-6)

    # gradients wrt h1 and every parameter
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(h1, params)
    g_ker = jax.grad(loss_ker, argnums=(0, 1))(h1, params)
    for (kp, a), (_, bb) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_ker)[0]):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch at {kp}")
