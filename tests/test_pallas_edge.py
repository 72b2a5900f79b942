"""Fused edge-MLP+max kernel vs the unfused composition (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import pallas_edge


def reference_pipeline(xj, xi, mask, lins, bns, slow_order):
    """Unfused numpy/jnp composition: concat -> [Dense->BN->ReLU]* -> Dense
    -> masked max."""
    xi_b = np.broadcast_to(xi[:, :, None, :], xj.shape)
    if slow_order:
        msg = np.concatenate([xi_b, xj - xi_b], axis=-1)
    else:
        msg = np.concatenate([xj, xi_b - xj], axis=-1)
    h = msg
    for li, (w, b) in enumerate(lins):
        h = h @ w + b
        if li < len(lins) - 1:
            scale, bias, mean, var = bns[li]
            h = (h - mean) / np.sqrt(var + 1e-5) * scale + bias
            h = np.maximum(h, 0.0)
    h = np.where(mask[..., None], h, pallas_edge.MAX_FILL)
    return h.max(axis=2)


@pytest.mark.parametrize("n_layers,slow", [(2, False), (2, True), (3, False)])
def test_fused_edge_matches_reference(rng, n_layers, slow):
    b, n, k, c = 2, 40, 5, 6
    dims = [2 * c] + [8] * (n_layers - 1) + [7]
    xj = rng.normal(size=(b, n, k, c)).astype(np.float32)
    xi = rng.normal(size=(b, n, c)).astype(np.float32)
    mask = rng.random((b, n, k)) > 0.3
    mask[:, :, 0] = True

    lins, bns = [], []
    for li in range(n_layers):
        w = (rng.normal(size=(dims[li], dims[li + 1])) * 0.4).astype(
            np.float32)
        bb = rng.normal(size=(dims[li + 1],)).astype(np.float32)
        lins.append((w, bb))
        if li < n_layers - 1:
            bns.append((rng.random(dims[li + 1]).astype(np.float32) + 0.5,
                        rng.normal(size=dims[li + 1]).astype(np.float32),
                        rng.normal(size=dims[li + 1]).astype(np.float32),
                        rng.random(dims[li + 1]).astype(np.float32) + 0.2))

    want = reference_pipeline(xj, xi, mask, lins, bns, slow)

    weights, biases = [], []
    for li, (w, bb) in enumerate(lins):
        w_j, b_j = jnp.asarray(w), jnp.asarray(bb)
        if li < n_layers - 1:
            s, bi, m, v = map(jnp.asarray, bns[li])
            w_j, b_j = pallas_edge.fold_batchnorm(w_j, b_j, s, bi, m, v)
        if li == 0 and slow:
            w_j = jnp.asarray(pallas_edge.slow_order_transform(c)) @ w_j
        weights.append(w_j)
        biases.append(b_j)

    got = pallas_edge.fused_edge_mlp_max(
        jnp.asarray(xj), jnp.asarray(xi), jnp.asarray(mask), weights, biases,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
