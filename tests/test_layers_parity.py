"""Layer parity vs plain torch: BatchNorm semantics and the MLP stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.models.layers import MLP, MaskedBatchNorm


def test_masked_batchnorm_matches_torch_bn1d(rng):
    import torch

    n, c = 256, 8
    x = rng.normal(size=(n, c)).astype(np.float32) * 2 + 1

    bn = torch.nn.BatchNorm1d(c, momentum=0.1)
    bn.train()
    tx = torch.tensor(x)
    ty1 = bn(tx).detach().numpy()
    ty2 = bn(tx * 0.5).detach().numpy()
    bn.eval()
    ty_eval = bn(tx).detach().numpy()

    mod = MaskedBatchNorm()
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.array(x)[None],
                     use_running_average=False)
    y1, s = mod.apply(vars_, jnp.array(x)[None], use_running_average=False,
                      momentum=0.1, mutable=["batch_stats"])
    vars_ = {**vars_, **s}
    y2, s = mod.apply(vars_, jnp.array(x * 0.5)[None],
                      use_running_average=False, momentum=0.1,
                      mutable=["batch_stats"])
    vars_ = {**vars_, **s}
    y_eval = mod.apply(vars_, jnp.array(x)[None], use_running_average=True)

    np.testing.assert_allclose(np.asarray(y1)[0], ty1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y2)[0], ty2, rtol=2e-4, atol=2e-5)
    # running stats after two updates match torch's (incl. unbiased variance)
    np.testing.assert_allclose(
        np.asarray(s["batch_stats"]["mean"]),
        bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s["batch_stats"]["var"]),
        bn.running_var.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_eval)[0], ty_eval, rtol=2e-4,
                               atol=2e-5)


def test_masked_batchnorm_ignores_invalid_rows(rng):
    n, c = 64, 4
    x = rng.normal(size=(1, n, c)).astype(np.float32)
    mask = np.zeros((1, n), bool)
    mask[:, :40] = True
    mod = MaskedBatchNorm()
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.array(x), mask=jnp.array(mask),
                     use_running_average=False)
    y_a, _ = mod.apply(vars_, jnp.array(x), mask=jnp.array(mask),
                       use_running_average=False, mutable=["batch_stats"])
    trash = x.copy()
    trash[:, 40:] = 99.0
    y_b, _ = mod.apply(vars_, jnp.array(trash), mask=jnp.array(mask),
                       use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_a)[:, :40],
                               np.asarray(y_b)[:, :40], rtol=1e-5)


def test_mlp_matches_torch_stack(rng):
    """Our MLP == torch [Linear->BN->ReLU->Linear] with plain_last."""
    import torch

    n, dims = 128, (6, 16, 5)
    x = rng.normal(size=(n, dims[0])).astype(np.float32)
    w0 = rng.normal(size=(dims[1], dims[0])).astype(np.float32) * 0.3
    w1 = rng.normal(size=(dims[2], dims[1])).astype(np.float32) * 0.3

    lin0 = torch.nn.Linear(dims[0], dims[1], bias=False)
    lin1 = torch.nn.Linear(dims[1], dims[2], bias=False)
    with torch.no_grad():
        lin0.weight.copy_(torch.tensor(w0))
        lin1.weight.copy_(torch.tensor(w1))
    bn = torch.nn.BatchNorm1d(dims[1])
    bn.train()
    ty = lin1(torch.relu(bn(lin0(torch.tensor(x))))).detach().numpy()

    mlp = MLP(dims, act="relu", use_bias=False)
    vars_ = mlp.init(jax.random.PRNGKey(0), jnp.array(x)[None], train=True)
    import flax
    vd = flax.core.unfreeze(vars_)
    vd["params"]["lin_0"]["kernel"] = jnp.array(w0.T)
    vd["params"]["lin_1"]["kernel"] = jnp.array(w1.T)
    y, _ = mlp.apply(vd, jnp.array(x)[None], train=True,
                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y)[0], ty, rtol=2e-4, atol=2e-4)
