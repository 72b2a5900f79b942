"""Custom VJP of window_slice matches the autodiff of an index oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from curvecloudnet_tpu.ops.curve1d import window_slice
from curvecloudnet_tpu.ops import curve1d


def oracle(x, idx, half_w):
    """Same windows via plain advanced indexing (autodiff'd by JAX)."""
    b, n, c = x.shape
    xp = jnp.pad(x, ((0, 0), (half_w, half_w), (0, 0)))
    cand = idx[:, :, None] + jnp.arange(2 * half_w + 1)[None, None, :]
    return jax.vmap(lambda xr, cr: xr[cr])(xp, cand)


def test_window_slice_grad_matches_oracle(rng):
    b, n, m, c, w = 2, 30, 9, 4, 3
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    # include duplicate and boundary indices
    idx = np.array([[0, 0, 3, 7, 7, 12, 20, 29, 29],
                    [1, 2, 2, 5, 10, 15, 25, 28, 0]], np.int32)
    r = rng.normal(size=(b, m, 2 * w + 1, c)).astype(np.float32)

    f1 = lambda x_: jnp.sum(window_slice(x_, jnp.asarray(idx), w)  # noqa
                            * jnp.asarray(r))
    f2 = lambda x_: jnp.sum(oracle(x_, jnp.asarray(idx), w)  # noqa
                            * jnp.asarray(r))
    out1 = window_slice(jnp.asarray(x), jnp.asarray(idx), w)
    out2 = oracle(jnp.asarray(x), jnp.asarray(idx), w)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)

    g1 = jax.grad(f1)(jnp.asarray(x))
    g2 = jax.grad(f2)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_window_slice_unique_rows_grad_matches_scatter():
    """Inverse-gather transpose == scatter transpose for unique valid idx,
    including invalid padding slots that collide with valid indices."""
    rng = np.random.default_rng(3)
    b, n, c, m, hw = 2, 40, 4, 10, 2
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    # strictly ascending unique valid ids; padding slots repeat id 0
    # (collides with a real query) to exercise the drop path
    idx = np.sort(rng.choice(n, (b, m), replace=False), axis=1).astype(np.int32)
    idx_valid = np.arange(m)[None, :] < np.array([[m], [m - 3]])
    idx = np.where(idx_valid, idx, 0).astype(np.int32)
    w = rng.standard_normal((b, m, 2 * hw + 1, c)).astype(np.float32)
    wm = np.where(idx_valid[..., None, None], w, 0.0)  # masked cotangents

    def loss_unique(xx):
        out = curve1d.window_slice(xx, jnp.array(idx), hw,
                                   idx_valid=jnp.array(idx_valid),
                                   unique_rows=True)
        return jnp.sum(out * wm)

    def loss_scatter(xx):
        out = curve1d.window_slice(xx, jnp.array(idx), hw)
        return jnp.sum(out * wm)

    gu = jax.grad(loss_unique)(jnp.array(x))
    gs = jax.grad(loss_scatter)(jnp.array(x))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gs), atol=1e-6)
    # forwards identical
    np.testing.assert_array_equal(
        np.asarray(curve1d.window_slice(jnp.array(x), jnp.array(idx), hw,
                                        idx_valid=jnp.array(idx_valid),
                                        unique_rows=True)),
        np.asarray(curve1d.window_slice(jnp.array(x), jnp.array(idx), hw)))
