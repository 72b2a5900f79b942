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


# ---------------------------------------------------------------------------
# TRAIN: exact masked-BN forward statistics + exact chain VJP
# ---------------------------------------------------------------------------
#
# The train-mode chain (exact path in SymmetricCurveConvStep.__call__):
#     u_0 = xe
#     z_i = window(u_{i-1}) @ W_i + b_i
#     y_i = (z_i - mu_i) * inv_i * gamma_i + beta_i      (masked batch stats)
#     u_i = leaky(y_i) * mask
# is inherently (2L+1)-pass: layer i+1's input needs layer i's GLOBAL
# masked statistics, and each BN backward needs global reductions of its
# cotangent slab — the same constraint that shapes pallas_group_train's
# pass plan.  Each pass here is one halo-tiled kernel (prev/cur/next
# blocked inputs, as the eval chain) with (1, C) f32 accumulator outputs
# that sum across the sequential Mosaic grid.
#
# Gradient exactness: the backward applies the standard masked-BN backward
#     d_z = inv * (dxh - m * (S1/n + xhat * S2/n)),  dxh = d_a * gamma,
#     d_a = d_u * mask * leaky'(y)
# (matching jax autodiff of the exact path; pinned by
# tests/test_pallas_conv1d.py::test_train_chain_grads).


def _halo_specs(tile_n, c):
    return [pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, c), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, c), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM)]


def _wspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, (lambda i: (0, 0)) if nd == 2
                        else (lambda i: (0,)), memory_space=pltpu.VMEM)


def _acc_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pad_tiles(x, tile_n):
    n, c = x.shape
    n_tiles = -(-n // tile_n)
    return (jnp.pad(x, ((tile_n, (n_tiles + 1) * tile_n - n), (0, 0))),
            n_tiles)


def _u_of(slab, off_row, used, bn):
    """u = leaky(BN-affine(slab)) * mask, or just masked slab (layer 0).

    slab: (R, C); off_row = global position of slab row 0; bn = (mu, inv,
    gamma, beta) row vectors or None."""
    r = slab.shape[0]
    pos = off_row + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    m = ((pos >= 0) & (pos < used)).astype(jnp.float32)
    x = slab.astype(jnp.float32)
    if bn is not None:
        mu, inv, gam, bet = bn
        y = (x - mu) * inv * gam + bet
        x = jnp.where(y >= 0, y, 0.01 * y)
    return x * m, m


def _fwd_layer_kernel(used_ref, p_ref, c_ref, n_ref, *refs, tile_n, h,
                      has_bn, cdtype):
    pos_w = h + 1
    i = 0
    ws = [refs[i + t] for t in range(pos_w)]
    i += pos_w
    bvec = refs[i]; i += 1
    bn = None
    if has_bn:
        bn = (refs[i][:], refs[i + 1][:], refs[i + 2][:], refs[i + 3][:])
        i += 4
    out_z, out_s1, out_s2 = refs[i], refs[i + 1], refs[i + 2]

    gi = pl.program_id(0)
    used = used_ref[0]
    slab = jnp.concatenate([p_ref[:], c_ref[:], n_ref[:]], axis=0)
    off = gi * tile_n - tile_n
    u, _ = _u_of(slab, off, used, bn)
    uc = u.astype(cdtype)
    length = tile_n
    acc = jax.lax.dot_general(
        uc[tile_n:tile_n + length], ws[0][:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    for d in range(1, h + 1):
        pair = (uc[tile_n - d:tile_n - d + length]
                + uc[tile_n + d:tile_n + d + length])
        acc = acc + jax.lax.dot_general(
            pair, ws[d][:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    z = acc + bvec[:][None, :]
    out_z[:] = z.astype(out_z.dtype)

    # masked raw sums of z for this layer's batch stats
    pos = (gi * tile_n
           + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
    m = ((pos >= 0) & (pos < used)).astype(jnp.float32)
    zm = z * m

    @pl.when(gi == 0)
    def _():
        out_s1[:] = jnp.zeros_like(out_s1)
        out_s2[:] = jnp.zeros_like(out_s2)

    out_s1[:] = out_s1[:] + jnp.sum(zm, axis=0, keepdims=True)
    out_s2[:] = out_s2[:] + jnp.sum(zm * z, axis=0, keepdims=True)


def _bwd_reduce_kernel(used_ref, du_ref, z_ref, *refs, tile_n):
    mu_r, inv_r, gam_r, bet_r, out = refs
    gi = pl.program_id(0)
    used = used_ref[0]
    pos = (gi * tile_n
           + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
    m = (pos < used).astype(jnp.float32)
    z = z_ref[:].astype(jnp.float32)
    mu, inv, gam, bet = mu_r[:], inv_r[:], gam_r[:], bet_r[:]
    xhat = (z - mu) * inv
    y = xhat * gam + bet
    dlr = jnp.where(y >= 0, 1.0, 0.01)
    da = du_ref[:].astype(jnp.float32) * m * dlr
    dxh = da * gam

    @pl.when(gi == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    c = z.shape[1]
    row = jnp.concatenate([
        jnp.sum(dxh, axis=0, keepdims=True),
        jnp.sum(dxh * xhat, axis=0, keepdims=True),
        jnp.sum(da, axis=0, keepdims=True),
        jnp.sum(da * xhat, axis=0, keepdims=True)], axis=1)  # (1, 4C)
    del c
    out[:] = out[:] + row


def _bwd_t_kernel(used_ref, dup_ref, duc_ref, dun_ref, zp_ref, zc_ref,
                  zn_ref, pp_ref, pc_ref, pn_ref, *refs, tile_n, h,
                  prev_has_bn, cdtype):
    """One backward step: d_z (elementwise) -> d_u_prev + dW taps + db.

    du*/z* are layer-i slabs (halo'd); p* are layer-(i-1) z slabs (halo'd;
    for layer 1 they carry xe directly and prev_has_bn=False)."""
    pos_w = h + 1
    i = 0
    ws = [refs[i + t] for t in range(pos_w)]
    i += pos_w
    mu_r, inv_r, gam_r, bet_r, c1_r, c2_r = refs[i:i + 6]
    i += 6
    pbn = None
    if prev_has_bn:
        pbn = (refs[i][:], refs[i + 1][:], refs[i + 2][:], refs[i + 3][:])
        i += 4
    out_du, out_dw, out_db = refs[i], refs[i + 1], refs[i + 2]

    gi = pl.program_id(0)
    used = used_ref[0]
    mu, inv, gam, bet = mu_r[:], inv_r[:], gam_r[:], bet_r[:]
    c1, c2 = c1_r[:], c2_r[:]

    du = jnp.concatenate([dup_ref[:], duc_ref[:], dun_ref[:]], axis=0)
    z = jnp.concatenate([zp_ref[:], zc_ref[:], zn_ref[:]], axis=0)
    off = gi * tile_n - tile_n
    pos = off + jax.lax.broadcasted_iota(jnp.int32, (3 * tile_n, 1), 0)
    m = ((pos >= 0) & (pos < used)).astype(jnp.float32)
    zf = z.astype(jnp.float32)
    xhat = (zf - mu) * inv
    y = xhat * gam + bet
    dlr = jnp.where(y >= 0, 1.0, 0.01)
    da = du.astype(jnp.float32) * m * dlr
    dxh = da * gam
    dz = inv * (dxh - m * (c1 + xhat * c2))        # (3TN, C_out)

    # d_u_prev(q) = dz(q) @ W0^T + sum_d (dz(q-d) + dz(q+d)) @ Wd^T
    dzc = dz.astype(cdtype)
    length = tile_n
    acc = jax.lax.dot_general(
        dzc[tile_n:tile_n + length], ws[0][:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    for d in range(1, h + 1):
        pair = (dzc[tile_n - d:tile_n - d + length]
                + dzc[tile_n + d:tile_n + d + length])
        acc = acc + jax.lax.dot_general(
            pair, ws[d][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_du[:] = acc.astype(out_du.dtype)

    # dW_d = sum_p (u_prev(p-d) + u_prev(p+d))^T dz(p), p in this tile
    pslab = jnp.concatenate([pp_ref[:], pc_ref[:], pn_ref[:]], axis=0)
    u_prev, _ = _u_of(pslab, off, used, pbn)
    upc = u_prev.astype(cdtype)
    dzt = dz[tile_n:2 * tile_n].astype(cdtype)     # center tile only

    @pl.when(gi == 0)
    def _():
        out_dw[:] = jnp.zeros_like(out_dw)
        out_db[:] = jnp.zeros_like(out_db)

    c_in = pslab.shape[1]
    parts = []
    for d in range(h + 1):
        if d == 0:
            up = upc[tile_n:2 * tile_n]
        else:
            up = (upc[tile_n - d:2 * tile_n - d]
                  + upc[tile_n + d:2 * tile_n + d])
        parts.append(jax.lax.dot_general(
            up, dzt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))   # (C_in, C_out)
    dw_tile = jnp.concatenate(parts, axis=0)        # ((h+1)*C_in, C_out)
    del c_in
    out_dw[:] = out_dw[:] + dw_tile
    out_db[:] = out_db[:] + jnp.sum(dz[tile_n:2 * tile_n], axis=0,
                                    keepdims=True)


def _run_fwd_layer(z_prev, bn_prev, w, b, used, tile_n, h, interpret,
                   cdt):
    """One layer's forward pass over one sample: z_prev (n_exp, C_in) +
    finalized previous-layer stats -> (z (n_exp, C_out) f32, s1, s2).
    ``cdt`` is the matmul compute dtype (the chain input's dtype, so the
    dots match the exact path's Dense(dtype=compute_dtype))."""
    n_exp, c_in = z_prev.shape
    c_out = w.shape[1]
    xp, n_tiles = _pad_tiles(z_prev, tile_n)
    ops = [jnp.asarray(used, jnp.int32).reshape(1), xp, xp, xp]
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + _halo_specs(
        tile_n, c_in)
    c_in_t = c_in
    for t in range(h + 1):
        wt = w[t * c_in_t:(t + 1) * c_in_t].astype(cdt)
        ops.append(wt)
        specs.append(_wspec(wt.shape))
    ops.append(b.astype(jnp.float32))
    specs.append(_wspec(b.shape))
    if bn_prev is not None:
        for a in bn_prev:
            ops.append(a.reshape(1, -1).astype(jnp.float32))
            specs.append(_wspec((1, c_in)))
    kernel = functools.partial(_fwd_layer_kernel, tile_n=tile_n, h=h,
                               has_bn=bn_prev is not None, cdtype=cdt)
    z, s1, s2 = pl.pallas_call(
        kernel, grid=(n_tiles,), in_specs=specs,
        out_specs=[pl.BlockSpec((tile_n, c_out), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   _acc_spec(c_out), _acc_spec(c_out)],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, c_out),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((1, c_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, c_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)
    return z[:n_exp], s1[0], s2[0]


def _run_bwd_reduce(d_u, z, bn, used, tile_n, interpret):
    n_exp, c = z.shape
    mu, inv, gam, bet = bn
    ztile = -(-n_exp // tile_n)
    zp = jnp.pad(z, ((0, ztile * tile_n - n_exp), (0, 0)))
    dup = jnp.pad(d_u.astype(z.dtype),
                  ((0, ztile * tile_n - n_exp), (0, 0)))
    kernel = functools.partial(_bwd_reduce_kernel, tile_n=tile_n)
    out = pl.pallas_call(
        kernel, grid=(ztile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  _wspec((1, c)), _wspec((1, c)), _wspec((1, c)),
                  _wspec((1, c))],
        out_specs=_acc_spec(4 * c),
        out_shape=jax.ShapeDtypeStruct((1, 4 * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(used, jnp.int32).reshape(1), dup, zp,
      mu.reshape(1, -1), inv.reshape(1, -1), gam.reshape(1, -1),
      bet.reshape(1, -1))[0]
    return out[:c], out[c:2 * c], out[2 * c:3 * c], out[3 * c:]


def _run_bwd_t(d_u, z, z_prev, bn, bn_prev, w, c1, c2, used, tile_n, h,
               interpret, cdt):
    n_exp, c_out = z.shape
    c_in = z_prev.shape[1]
    mu, inv, gam, bet = bn
    dup, n_tiles = _pad_tiles(d_u, tile_n)
    zp, _ = _pad_tiles(z, tile_n)
    pp, _ = _pad_tiles(z_prev, tile_n)
    ops = [jnp.asarray(used, jnp.int32).reshape(1),
           dup, dup, dup, zp, zp, zp, pp, pp, pp]
    specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
             + _halo_specs(tile_n, c_out) + _halo_specs(tile_n, c_out)
             + _halo_specs(tile_n, c_in))
    for t in range(h + 1):
        wt = w[t * c_in:(t + 1) * c_in].astype(cdt)
        ops.append(wt)
        specs.append(_wspec(wt.shape))
    for a in (mu, inv, gam, bet, c1, c2):
        ops.append(a.reshape(1, -1).astype(jnp.float32))
        specs.append(_wspec((1, c_out)))
    if bn_prev is not None:
        for a in bn_prev:
            ops.append(a.reshape(1, -1).astype(jnp.float32))
            specs.append(_wspec((1, c_in)))
    kernel = functools.partial(_bwd_t_kernel, tile_n=tile_n, h=h,
                               prev_has_bn=bn_prev is not None, cdtype=cdt)
    d_u_prev, dw, db = pl.pallas_call(
        kernel, grid=(n_tiles,), in_specs=specs,
        out_specs=[pl.BlockSpec((tile_n, c_in), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(((h + 1) * c_in, c_out), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   _acc_spec(c_out)],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, c_in), d_u.dtype),
                   jax.ShapeDtypeStruct(((h + 1) * c_in, c_out),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((1, c_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)
    return d_u_prev[:n_exp], dw, db[0]


def _finalize_stats(s1, s2, n):
    mu = s1 / n
    var = jnp.maximum(s2 / n - mu * mu, 0.0)
    return mu, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv1d_chain_train(xe, params, used, half_k: int, tile_n: int = 1024,
                       interpret: bool = False):
    """Train-mode chain over a BATCH of gap-expanded rows.

    xe: (B, n_exp, C0); params: tuple of (W ((h+1)C_in, C_out), b, gamma,
    beta) per layer; used: (B,) int32 live-slot counts.
    Returns (u_L (B, n_exp, C_L), stats tuple of (mean, var, count) per
    layer — batch statistics over ALL samples' live slots, exactly
    MaskedBatchNorm's masked moments).  Gradients (through the batch
    statistics included) match the exact XLA path's autodiff.
    """
    out, _ = _chain_train_fwd_impl(xe, params, used, half_k, tile_n,
                                   interpret)
    return out


def _chain_train_fwd_impl(xe, params, used, half_k, tile_n, interpret):
    b, n_exp, _ = xe.shape
    h = half_k
    n = jnp.maximum(jnp.sum(used).astype(jnp.float32), 1.0)
    zs = []          # per layer: (B, n_exp, C) pre-BN
    stats = []       # per layer: (mu, var)
    z_prev = xe
    bn_prev = None
    for li, (w, bb, gam, bet) in enumerate(params):
        cdt = jnp.bfloat16 if xe.dtype == jnp.bfloat16 else jnp.float32
        outs = [_run_fwd_layer(z_prev[bi], bn_prev, w, bb, used[bi],
                               tile_n, h, interpret, cdt)
                for bi in range(b)]
        z = jnp.stack([o[0] for o in outs])
        s1 = sum(o[1] for o in outs)
        s2 = sum(o[2] for o in outs)
        mu, var = _finalize_stats(s1, s2, n)
        inv = jax.lax.rsqrt(var + 1e-5)
        zs.append(z)
        stats.append((mu, var))
        z_prev = z
        bn_prev = (mu, inv, gam, bet)
    # final u_L: plain elementwise in XLA (tiny)
    mu, var = stats[-1]
    inv = jax.lax.rsqrt(var + 1e-5)
    gam, bet = params[-1][2], params[-1][3]
    y = ((zs[-1].astype(jnp.float32) - mu) * inv) * gam + bet
    mask = (jnp.arange(n_exp)[None, :, None]
            < used[:, None, None]).astype(jnp.float32)
    u_l = jnp.where(y >= 0, y, 0.01 * y) * mask
    stats_out = tuple((m, v, n) for m, v in stats)
    return ((u_l.astype(xe.dtype), stats_out),
            (xe, tuple(zs), tuple(stats), used, n))


def _chain_train_fwd(xe, params, used, half_k, tile_n, interpret):
    out, res = _chain_train_fwd_impl(xe, params, used, half_k, tile_n,
                                     interpret)
    return out, (res, params)


def _chain_train_bwd(half_k, tile_n, interpret, carry, cot):
    (xe, zs, stats, used, n), params = carry
    d_out, _ = cot        # stats cotangents are ignored (aux outputs)
    h = half_k
    b = xe.shape[0]
    n_layers = len(params)
    d_u = d_out.astype(jnp.float32)
    d_params = []
    for li in range(n_layers - 1, -1, -1):
        w, bb, gam, bet = params[li]
        mu, var = stats[li]
        inv = jax.lax.rsqrt(var + 1e-5)
        bn = (mu, inv, gam, bet)
        if li > 0:
            mu_p, var_p = stats[li - 1]
            inv_p = jax.lax.rsqrt(var_p + 1e-5)
            bn_prev = (mu_p, inv_p, params[li - 1][2], params[li - 1][3])
            z_prev = zs[li - 1]
        else:
            bn_prev = None
            z_prev = xe
        # reductions over the whole batch
        red = [_run_bwd_reduce(d_u[bi], zs[li][bi], bn, used[bi], tile_n,
                               interpret) for bi in range(b)]
        s_dxh = sum(r[0] for r in red)
        s_dxh_xh = sum(r[1] for r in red)
        dbeta = sum(r[2] for r in red)
        dgamma = sum(r[3] for r in red)
        c1 = (s_dxh / n).reshape(1, -1)
        c2 = (s_dxh_xh / n).reshape(1, -1)
        cdt = jnp.bfloat16 if xe.dtype == jnp.bfloat16 else jnp.float32
        touts = [_run_bwd_t(d_u[bi], zs[li][bi], z_prev[bi], bn, bn_prev,
                            w, c1[0], c2[0], used[bi], tile_n, h,
                            interpret, cdt) for bi in range(b)]
        d_u = jnp.stack([t[0] for t in touts]).astype(jnp.float32)
        dw = sum(t[1] for t in touts)
        db = sum(t[2] for t in touts)
        d_params.append((dw.astype(w.dtype), db.astype(bb.dtype),
                         dgamma.astype(gam.dtype), dbeta.astype(bet.dtype)))
    d_params.reverse()
    return d_u.astype(xe.dtype), tuple(d_params), None


conv1d_chain_train.defvjp(_chain_train_fwd, _chain_train_bwd)
