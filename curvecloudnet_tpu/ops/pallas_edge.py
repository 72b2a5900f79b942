"""Pallas TPU kernel: fused edge-MLP + masked max (sgcnn eval hot path).

The sgcnn message pipeline is ``[x_j, x_i - x_j] -> Dense -> BN -> ReLU ->
Dense -> masked max over K`` (reference dgcnn.py:158-207).  XLA keeps the
two matmuls as separate HLOs, so the (N, K, H) intermediate round-trips HBM
between them (~0.7 GB per full-res layer).  This kernel runs the whole
pipeline per query tile in VMEM: only the gathered neighbor features enter
and the (N, O) pooled output leaves.

Eval-only: BatchNorm is folded into the first matmul (running statistics).
Training uses the unfused XLA path (batch statistics need global reductions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FILL = -1e2  # reference dgcnn.py:188


def _edge_kernel(xj_ref, xi_ref, mask_ref, *rest, k: int, n_layers: int):
    # xj_ref: (K, TN, C) neighbor planes, mask_ref: (K, TN, 1).  One 3D
    # dot_general over all K planes (Mosaic cannot re-layout
    # (TN, K*C) <-> (TN*K, C), and a per-K loop of small matmuls serializes).
    w_refs = rest[:-1][0::2]
    b_refs = rest[:-1][1::2]
    out_ref = rest[-1]
    xj = xj_ref[:]                       # (K, TN, C)
    xi = xi_ref[:][None]                 # (1, TN, C)
    h = jnp.concatenate([xj, xi - xj], axis=-1)  # (K, TN, 2C)
    for li in range(n_layers):
        h = jax.lax.dot_general(
            h, w_refs[li][:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (K, TN, out)
        h = h + b_refs[li][:][None]
        if li < n_layers - 1:            # hidden layers: folded BN + ReLU
            h = jnp.maximum(h, 0.0)
    m = mask_ref[:] > 0                  # (K, TN, 1)
    out_ref[:] = jnp.max(jnp.where(m, h, MAX_FILL), axis=0)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_edge_mlp_max_single(xj, xi, mask, weights, biases,
                              tile_n: int | None = None,
                              interpret: bool = False):
    """One sample: xj (N, K, C), xi (N, C), mask (N, K) -> (N, O).

    weights: tuple of (in, out) matrices with BN folded into hidden layers;
    biases: matching (out,) vectors (zeros where the layer has none).
    """
    n, k, c = xj.shape
    if tile_n is None:
        # keep the (K, TN, C) block (+double buffering) well under VMEM: the
        # 3D pipeline holds ~3 same-shaped intermediates on the stack too
        budget = 2 * 1024 * 1024 // (k * c * 4 * 2)
        tile_n = max(64, min(512, (budget // 64) * 64))
    n_layers = len(weights)
    o = weights[-1].shape[1]
    np_ = _round_up(n, tile_n)
    xj = jnp.moveaxis(xj.astype(jnp.float32), 1, 0)  # (K, N, C)
    xj = jnp.pad(xj, ((0, 0), (0, np_ - n), (0, 0)))
    xi = jnp.pad(xi.astype(jnp.float32), ((0, np_ - n), (0, 0)))
    mask = jnp.pad(mask.astype(jnp.float32).T[:, :, None],
                   ((0, 0), (0, np_ - n), (0, 0)))  # (K, N, 1)

    wb_specs, wb_args = [], []
    for w, b in zip(weights, biases):
        wb_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        wb_args += [w.astype(jnp.float32),
                    b.reshape(1, -1).astype(jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_edge_kernel, k=k, n_layers=n_layers),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((k, tile_n, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + wb_specs,
        out_specs=pl.BlockSpec((tile_n, o), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, o), jnp.float32),
        interpret=interpret,
    )(xj, xi, mask, *wb_args)
    return out[:n]


def fused_edge_mlp_max(xj, xi, mask, weights, biases, interpret=False):
    """Batched fused sgcnn message pipeline (B, N, K, C) -> (B, N, O)."""
    fn = functools.partial(fused_edge_mlp_max_single, interpret=interpret)
    return jax.vmap(lambda a, b_, m: fn(a, b_, m, tuple(weights),
                                        tuple(biases)))(xj, xi, mask)


def slow_order_transform(c: int):
    """(2C, 2C) map folding the slow-path message order into W1.

    fast msg = [x_j, d] with d = x_i - x_j; slow msg = [x_i, x_j - x_i]
    = [x_j + d, -d] = fast @ T with T = [[I, 0], [I, -I]].
    """
    import numpy as np

    eye = np.eye(c, dtype=np.float32)
    top = np.concatenate([eye, np.zeros((c, c), np.float32)], axis=1)
    bot = np.concatenate([eye, -eye], axis=1)
    return np.concatenate([top, bot], axis=0)


def fold_batchnorm(kernel, lin_bias, scale, bias, mean, var,
                   eps: float = 1e-5):
    """Fold BN(Wx + b_lin) into one affine: (W*inv)x + (b_lin-mean)*inv+bias."""
    inv = scale / jnp.sqrt(var + eps)
    w = kernel * inv[None, :]
    b = (lin_bias - mean) * inv + bias
    return w, b
