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

Halo mechanics: Mosaic cannot DMA-slice an HBM ref whose lane dim is not
128-aligned (arbitrary C0), so instead of manual DMA the SAME padded input
is passed THREE times with shifted block index maps (prev/cur/next tile);
their sublane concat gives the (3*TN, C0) window the chain shrinks into.
Costs one extra 2x read of the input — trivially small next to the XLA
path it replaces — and keeps Pallas' automatic double-buffered pipelining.

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


def _chain_kernel(used_ref, prev_ref, cur_ref, next_ref, *refs,
                  n_layers: int, tile_n: int, pad: int, h: int, out_dtype):
    """refs order: [W_l0_tap0..taph, b_l0, W_l1_tap0.., b_l1, ...,
    out_ref]."""
    ws, bs = [], []
    p = 0
    for _ in range(n_layers):
        ws.append([refs[p + t] for t in range(h + 1)])
        bs.append(refs[p + h + 1])
        p += h + 2
    out_ref = refs[p]

    i = pl.program_id(0)
    used = used_ref[0]
    full = jnp.concatenate([prev_ref[:], cur_ref[:], next_ref[:]], axis=0)
    a = full[tile_n - pad:2 * tile_n + pad]       # (TN + 2P, C0)
    off = i * tile_n - pad                        # global pos of slab row 0
    for li in range(n_layers):
        length = tile_n + 2 * (pad - (li + 1) * h)
        acc = jax.lax.dot_general(
            a[h:h + length], ws[li][0][:], (((1,), (0,)), ((), ())),
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
    assert pad <= tile_n
    n_exp, c0 = xe.shape
    n_tiles = -(-n_exp // tile_n)
    # one guard tile of zeros on each side: block i-1 / i / i+1 become
    # blocks i / i+1 / i+2 of the padded array (always in range)
    xp = jnp.pad(xe, ((tile_n, (n_tiles + 1) * tile_n - n_exp), (0, 0)))

    flat_ops = []
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tile_n, c0), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, c0), lambda i: (i + 1, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, c0), lambda i: (i + 2, 0),
                     memory_space=pltpu.VMEM),
    ]
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
        _chain_kernel, n_layers=n_layers, tile_n=tile_n,
        pad=pad, h=h, out_dtype=xe.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, c_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, c_last), xe.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(used, jnp.int32).reshape(1), xp, xp, xp, *flat_ops)
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
