"""Shared helpers for torch-oracle parity tests.

The oracles here re-derive the reference's math from its documented
semantics (citations inline) with independent per-point/per-curve loops —
slow, obvious, and structurally unlike both the reference and the TPU
implementations, which is what makes them useful as referees.
"""

from __future__ import annotations

import numpy as np


def make_curve_row(rng, lengths, n_pad, feat_dim=0, scale=0.08):
    """One padded row of contiguous curves (smooth polylines).

    Returns dict with pos (1, N, 3), curve_id (1, N), valid (1, N) and
    optionally feat (1, N, F).
    """
    n = sum(lengths)
    assert n <= n_pad
    pos = np.zeros((n_pad, 3), np.float32)
    cid = np.zeros((n_pad,), np.int32)
    at = 0
    for c, ln in enumerate(lengths):
        start = rng.normal(size=3)
        steps = rng.normal(scale=scale, size=(ln, 3))
        pos[at:at + ln] = start + np.cumsum(steps, axis=0)
        cid[at:at + ln] = c
        at += ln
    valid = np.zeros((n_pad,), bool)
    valid[:n] = True
    out = {
        "pos": pos[None].astype(np.float32),
        "curve_id": cid[None],
        "valid": valid[None],
    }
    if feat_dim:
        feat = np.zeros((n_pad, feat_dim), np.float32)
        feat[:n] = rng.normal(size=(n, feat_dim))
        out["feat"] = feat[None].astype(np.float32)
    return out


def torch_mlp_state(prefix, dims, use_bias, rng, act="relu"):
    """Random torch MLP weights in reference naming + an eval apply fn.

    torch_geometric MLP semantics: Linear -> BN -> act per hidden layer,
    plain last (reference src/models/base.py:32).
    """
    import torch

    sd = {}
    lins, bns = [], []
    for i in range(len(dims) - 1):
        lin = torch.nn.Linear(dims[i], dims[i + 1], bias=use_bias)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(
                rng.normal(0, 0.2, (dims[i + 1], dims[i])).astype(np.float32)))
            if use_bias:
                lin.bias.copy_(torch.from_numpy(
                    rng.normal(0, 0.2, dims[i + 1]).astype(np.float32)))
        sd[f"{prefix}.lins.{i}.weight"] = lin.weight.detach().numpy().copy()
        if use_bias:
            sd[f"{prefix}.lins.{i}.bias"] = lin.bias.detach().numpy().copy()
        lins.append(lin)
        if i < len(dims) - 2:
            bn = torch.nn.BatchNorm1d(dims[i + 1]).eval()
            with torch.no_grad():
                bn.weight.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, dims[i + 1]).astype(np.float32)))
                bn.bias.copy_(torch.from_numpy(
                    rng.normal(0, 0.1, dims[i + 1]).astype(np.float32)))
                bn.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, dims[i + 1]).astype(np.float32)))
                bn.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 2.0, dims[i + 1]).astype(np.float32)))
            sd[f"{prefix}.norms.{i}.weight"] = bn.weight.detach().numpy().copy()
            sd[f"{prefix}.norms.{i}.bias"] = bn.bias.detach().numpy().copy()
            sd[f"{prefix}.norms.{i}.running_mean"] = \
                bn.running_mean.numpy().copy()
            sd[f"{prefix}.norms.{i}.running_var"] = \
                bn.running_var.numpy().copy()
            bns.append(bn)

    def apply(x):
        import torch.nn.functional as F

        for i, lin in enumerate(lins):
            x = lin(x)
            if i < len(lins) - 1:
                x = bns[i](x)
                x = (F.leaky_relu(x, 0.01) if act == "leaky_relu"
                     else torch.relu(x))
        return x

    return sd, apply


def torch_symconv_state(prefix, feat_dims, kernel_size, rng, with_diff,
                        v1=True):
    """Random SymmetricCurve1DConv weights in reference naming.

    Stored taps: (out, in, k//2+1), index 0 = center (reference
    fast_conv1d.py:173-184 mirrors indices 1.. at conv time).  Hidden BN
    (norm_modules.{j}) uses eval running statistics.  V1 doubles EVERY
    layer's input for the recomputed diff channel (fast_conv1d.py:93);
    V2 only the first (fast_conv1d.py:26).
    """
    half = kernel_size // 2
    sd = {}
    metas = []
    for j in range(1, len(feat_dims)):
        cin = feat_dims[j - 1] * 2 if (with_diff and (v1 or j == 1)) \
            else feat_dims[j - 1]
        cout = feat_dims[j]
        w = rng.normal(0, 0.3, (cout, cin, half + 1)).astype(np.float32)
        b = rng.normal(0, 0.2, cout).astype(np.float32)
        sd[f"{prefix}.conv_modules.{j-1}.weight"] = w
        sd[f"{prefix}.conv_modules.{j-1}.bias"] = b
        bn = {
            "weight": rng.uniform(0.5, 1.5, cout).astype(np.float32),
            "bias": rng.normal(0, 0.1, cout).astype(np.float32),
            "running_mean": rng.normal(0, 0.3, cout).astype(np.float32),
            "running_var": rng.uniform(0.5, 2.0, cout).astype(np.float32),
        }
        for kk, vv in bn.items():
            sd[f"{prefix}.norm_modules.{j-1}.{kk}"] = vv
        metas.append((w, b, bn))
    return sd, metas


def np_feature_diffs(x, cid):
    """Reference compute_feature_diffs (fast_conv1d.py:190-205) for ONE
    dense curve sequence batch (no padding): |avg of adjacent same-curve
    edge diffs|."""
    n = len(x)
    edges = x[1:] - x[:-1]
    ok = (cid[1:] == cid[:-1])
    edges = edges * ok[:, None]
    z = np.zeros((1, x.shape[1]), x.dtype)
    e = np.concatenate([z, edges, z], axis=0)
    okz = np.concatenate([[False], ok, [False]])
    sums = e[1:] + e[:-1]
    denom = np.clip(okz[1:].astype(np.float32)
                    + okz[:-1].astype(np.float32), 1, None)
    return np.abs(sums / denom[:, None])


def np_symconv_layer(seq, w, b, bn, leak=0.01):
    """One symmetric conv layer over ONE 1D sequence (C_len, Cin) with
    zero 'same' padding, eval BN + leaky relu.  Mirrors
    fast_conv1d.py:173-184's reflected kernel."""
    half = w.shape[2] - 1
    cout = w.shape[0]
    n = seq.shape[0]
    out = np.zeros((n, cout), np.float32)
    for p in range(n):
        acc = b.copy()
        for d in range(-half, half + 1):
            q = p + d
            if 0 <= q < n:
                acc = acc + w[:, :, abs(d)] @ seq[q]
        out[p] = acc
    inv = bn["weight"] / np.sqrt(bn["running_var"] + 1e-5)
    out = (out - bn["running_mean"]) * inv + bn["bias"]
    return np.where(out > 0, out, leak * out)


def merge_variables(variables, params, batch_stats):
    """Graft converted torch weights into a freshly-initialized flax tree."""
    import flax

    vd = flax.core.unfreeze(variables)

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v, path + "/" + k)
            else:
                assert k in dst, path + "/" + k
                assert dst[k].shape == v.shape, (path + "/" + k,
                                                 dst[k].shape, v.shape)
                dst[k] = v

    merge(vd["params"], params)
    merge(vd["batch_stats"], batch_stats)
    return vd
