"""Core NN layers: validity-masked BatchNorm and the PyG-style shared MLP.

The reference builds every sub-network from ``torch_geometric.nn.MLP``
(Linear -> BatchNorm1d -> act -> dropout per hidden layer, plain last layer;
reference src/models/base.py:32 and modules/mlp.py:13). Here the same stack
operates on batch-padded (B, N, C) tensors, so BatchNorm statistics must be
computed over *valid* points only — padded rows would otherwise bias the
moments (the reference's packed layout has no padding, so plain BN matches).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x):
    # torch's default negative slope
    return jax.nn.leaky_relu(x, negative_slope=0.01)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": leaky_relu,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the flattened (batch, point) axes with a validity mask.

    Equivalent to torch ``BatchNorm1d`` over the reference's packed N' axis.
    ``momentum`` follows torch semantics (new = (1-m)*old + m*batch) and is
    passed per-call so the reference's per-epoch momentum decay
    (main.py:124-125) can be reproduced.
    """

    use_running_average: bool | None = None
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=None, momentum=0.1,
                 stats_override=None, update_running=True):
        """``stats_override=(mean, var, count)`` supplies batch statistics
        computed externally (the streaming sa-geo train path accumulates
        them chunk-by-chunk); they remain differentiable, so gradients
        through the normalization are exactly the standard batch-norm
        gradients.  ``update_running=False`` suppresses the running-stat
        write (chunked callers update once)."""
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            if stats_override is not None:
                mean, var, cnt = stats_override
            else:
                xf = x.reshape(-1, c).astype(jnp.float32)
                if mask is not None:
                    mf = mask.reshape(-1, 1).astype(jnp.float32)
                    cnt = jnp.clip(mf.sum(), min=1.0)
                    mean = (xf * mf).sum(axis=0) / cnt
                    var = ((xf - mean) ** 2 * mf).sum(axis=0) / cnt
                else:
                    cnt = jnp.float32(xf.shape[0])
                    mean = xf.mean(axis=0)
                    var = xf.var(axis=0)
            if not self.is_initializing() and update_running:
                # torch uses the *unbiased* batch variance for running stats
                unbiased = var * cnt / jnp.clip(cnt - 1.0, min=1.0)
                ra_mean.value = (1 - momentum) * ra_mean.value + momentum * mean
                ra_var.value = (1 - momentum) * ra_var.value + momentum * unbiased

        # affine math in f32, result cast back to the compute dtype: without
        # the cast the f32 mean/var broadcast promotes every bf16 activation
        # to f32, doubling the HBM footprint of each intermediate
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class MLP(nn.Module):
    """PyG-style MLP over the last axis of (B, N, C) padded tensors.

    dims[0] is the input width; each subsequent entry adds a layer.
    With ``plain_last`` the final layer is Linear only (dropout applied to its
    input, matching torch_geometric.nn.MLP).
    """

    dims: Sequence[int]
    act: str = "relu"
    use_bias: bool = False
    norm: str = "batch_norm"
    plain_last: bool = True
    dropout: float = 0.0
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, bn_momentum=0.1,
                 first_map=None, bn_stats=None, upto=None,
                 update_running=True):
        """``first_map``, when given, replaces the first layer's plain
        ``dense(x)`` application: it receives the bound ``lin_0`` Dense and
        returns that layer's pre-activation (callers use this to
        re-associate edge-message matmuls without touching the parameter
        tree — see EdgeConvStep).

        Streaming-train hooks: ``bn_stats[i] = (mean, var, count)``
        overrides layer i's batch statistics; ``upto=i`` returns layer i's
        PRE-normalization values (stats-accumulation passes use this);
        ``update_running=False`` suppresses running-stat writes."""
        dims = list(self.dims)
        act_fn = ACTIVATIONS[self.act]
        n_layers = len(dims) - 1
        for i in range(n_layers):
            last = i == n_layers - 1
            plain = last and self.plain_last
            if plain and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            dense = nn.Dense(dims[i + 1], use_bias=self.use_bias,
                             dtype=self.dtype, name=f"lin_{i}")
            if i == 0 and first_map is not None:
                x = first_map(dense)
            else:
                x = dense(x)
            if upto is not None and i == upto:
                return x
            if not plain:
                if self.norm == "batch_norm":
                    x = MaskedBatchNorm(name=f"norm_{i}")(
                        x, mask=mask, use_running_average=not train,
                        momentum=bn_momentum,
                        stats_override=(None if bn_stats is None
                                        else bn_stats[i]),
                        update_running=update_running)
                x = act_fn(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
