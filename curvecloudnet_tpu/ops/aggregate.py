"""Masked neighbor-set aggregation over dense (B, Q, K, C) message tensors.

TPU-native replacement for the reference's torch_scatter reductions and
softmax attention pooling (point_conv.py:71-93, dgcnn.py:181-203): COO
scatter_max/add become masked reductions over the static K axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Mask fills chosen to mirror the reference exactly:
#   SGCNN masked-max fill (dgcnn.py:188) and attention logit fill (dgcnn.py:201)
MAX_FILL = -1e2
ATTEND_FILL = -5e2


def masked_max(msgs: jax.Array, mask: jax.Array,
               fill: float = MAX_FILL) -> jax.Array:
    m = mask[..., None]
    return jnp.max(jnp.where(m, msgs, fill), axis=-2)


def masked_mean(msgs: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask[..., None].astype(msgs.dtype)
    num = jnp.sum(msgs * m, axis=-2)
    den = jnp.clip(jnp.sum(m, axis=-2), min=1.0)
    return num / den


def masked_attend(msgs: jax.Array, logits: jax.Array,
                  mask: jax.Array, fill: float = ATTEND_FILL) -> jax.Array:
    """Softmax-attention pooling over the K axis (per output channel)."""
    logits = jnp.where(mask[..., None], logits, fill)
    # softmax in f32 for stability, weights cast back so a bf16 message
    # pipeline stays bf16 end-to-end
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-2).astype(msgs.dtype)
    return jnp.sum(msgs * w, axis=-2)


def masked_weighted_sum(msgs: jax.Array, logits: jax.Array,
                        mask: jax.Array) -> jax.Array:
    """Sigmoid-gated normalized sum (reference 'weighted-sum', dgcnn.py:190-197)."""
    w = jax.nn.sigmoid(logits)
    w = jnp.where(mask[..., None], w, 0.0)
    total = jnp.sum(w, axis=-2, keepdims=True)
    w = w / jnp.clip(total, min=1e-3)
    return jnp.sum(msgs * w, axis=-2)


def aggregate(msgs: jax.Array, mask: jax.Array, aggr_type: str,
              attend_logits: jax.Array | None = None) -> jax.Array:
    if aggr_type == "max":
        return masked_max(msgs, mask)
    if aggr_type == "mean":
        return masked_mean(msgs, mask)
    if aggr_type == "attend":
        assert attend_logits is not None
        return masked_attend(msgs, attend_logits, mask)
    if aggr_type == "weighted-sum":
        assert attend_logits is not None
        return masked_weighted_sum(msgs, attend_logits, mask)
    raise ValueError(f"unknown aggr_type {aggr_type!r}")
