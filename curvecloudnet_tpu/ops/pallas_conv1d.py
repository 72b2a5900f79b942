"""Pallas TPU kernel: the whole symmetric curve-conv chain in one pass.

Eval-mode megakernel for ``SymmetricCurveConvStep`` V2 (reference
fast_conv1d.py:49-74): the gap-expanded sequence (ops/curve1d.
gap_expand_indices — zero slots between curves develop real values from the
second conv on) is processed tile-by-tile with halos, running ALL conv
layers (Dense -> folded-BN affine -> leaky_relu -> tail mask) VMEM-resident.
Replaces the XLA halo-corrected path's ~15 gather/scatter/correction ops
per step (~2.8 ms/step at the flagship 49164-slot rows) with one kernel:
window taps become static sublane-offset slices of the tile slab, each tap
an MXU dot accumulated into the layer output.

Exactness: identical math to the "exact path" in
``SymmetricCurveConvStep.__call__`` (gap_scatter -> window_concat_nomask ->
Dense -> eval-BN -> leaky_relu -> mask per layer -> gap_gather), which is
itself pinned to the executed reference (tests/test_reference_exec.py).
The only reassociation is the per-tap dot accumulation (sum order of the
(h+1) taps), a bf16/f32 matmul-accumulation detail shared by every fused
path in this package.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _chain_kernel(used_ref, x_hbm, *refs, taps, tile_n: int, pad: int,
                  h: int, out_dtype):
    """taps: tuple of per-layer tap counts' weight layouts — list of
    (n_taps, has_bias) is implicit; refs order = [W_l0_tap0.. b_l0,
    W_l1_tap0.., b_l1, ..., out_ref, slab, sem]."""
    n_layers = len(taps)
    # unpack refs: per layer (h+1) tap weights + 1 bias
    ws, bs = [], []
    p = 0
    for _ in range(n_layers):
        ws.append([refs[p + t] for t in range(h + 1)])
        bs.append(refs[p + h + 1])
        p += h + 2
    out_ref = refs[p]
    slab = refs[p + 1]
    sem = refs[p + 2]

    i = pl.program_id(0)
    used = used_ref[0]
    pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_n, tile_n + 2 * pad)], slab, sem).start()
    pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_n, tile_n + 2 * pad)], slab, sem).wait()

    a = slab[:]                                   # (TN + 2P, C0)
    off = i * tile_n - pad                        # global pos of slab row 0
    for li in range(n_layers):
        length = tile_n + 2 * (pad - (li + 1) * h)
        w0 = ws[li][0][:]
        acc = jax.lax.dot_general(
            a[h:h + length], w0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for d in range(1, h + 1):
            pair = a[h - d:h - d + length] + a[h + d:h + d + length]
            acc = acc + jax.lax.dot_general(
                pair, ws[li][d][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc + bs[li][:][None, :]
        acc = jnp.where(acc >= 0, acc, 0.01 * acc)      # leaky_relu
        g = (off + (li + 1) * h
             + jax.lax.broadcasted_iota(jnp.int32, (length, 1), 0))
        acc = jnp.where((g >= 0) & (g < used), acc, 0.0)
        a = acc.astype(a.dtype)
    out_ref[:] = a.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("half_k", "tile_n", "interpret"))
def conv1d_chain_eval(xe: jax.Array, weights, used, half_k: int,
                      tile_n: int = 1024, interpret: bool = False):
    """Run the full symmetric-conv chain over ONE gap-expanded row.

    xe: (n_exp, C0) zero-stuffed sequence (gaps + tail zeros).
    weights: tuple of (W ((h+1)*C_in, C_out), b (C_out,)) per layer —
        BN already folded into W/b (eval affine; see fold_conv_bn_eval).
    used: scalar int32, number of live slots (valid points + gaps);
        positions >= used are forced to zero after every layer, matching
        the exact path's ``mask_exp`` multiply.
    Returns (n_exp, C_last) in xe.dtype.
    """
    h = half_k
    n_layers = len(weights)
    pad = h * n_layers
    n_exp, c0 = xe.shape
    n_tiles = -(-n_exp // tile_n)
    xp = jnp.pad(xe, ((pad, n_tiles * tile_n - n_exp + pad), (0, 0)))

    flat_ops = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    for w, b in weights:
        c_in = w.shape[0] // (h + 1)
        for t in range(h + 1):
            wt = w[t * c_in:(t + 1) * c_in].astype(xe.dtype)
            flat_ops.append(wt)
            in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        bf = b.astype(jnp.float32)
        flat_ops.append(bf)
        in_specs.append(pl.BlockSpec(bf.shape, lambda i: (0,),
                                     memory_space=pltpu.VMEM))
    c_last = weights[-1][0].shape[1]

    kernel = functools.partial(
        _chain_kernel, taps=tuple(h + 1 for _ in weights), tile_n=tile_n,
        pad=pad, h=h, out_dtype=xe.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, c_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, c_last), xe.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_n + 2 * pad, c0), xe.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(used, jnp.int32).reshape(1), xp, *flat_ops)
    return out[:n_exp]


def fold_conv_bn_eval(params, batch_stats, n_layers: int, eps: float = 1e-5):
    """Fold each conv layer's Dense + eval BatchNorm into one (W, b).

    y = BN(x @ W + b) = x @ (W * s) + (b * s + t) with
    s = scale / sqrt(var + eps), t = bias - mean * s — exact at eval
    (running stats; the same fold as pallas_edge.fold_batchnorm).
    """
    out = []
    for li in range(n_layers):
        w = params[f"conv_{li}"]["kernel"]
        b = params[f"conv_{li}"].get(
            "bias", jnp.zeros((w.shape[1],), jnp.float32))
        nrm, st = params[f"norm_{li}"], batch_stats[f"norm_{li}"]
        s = nrm["scale"] / jnp.sqrt(st["var"] + eps)
        t = nrm["bias"] - st["mean"] * s
        out.append((w * s[None, :], b * s + t))
    return tuple(out)
