"""Composite torch-oracle parity (round-2 verdict missing #1).

Covers the module families the per-module oracle file does not: the
symmetric curve conv (+diff channel), geodesic radius grouping, geodesic
superset interpolation — and one multi-step mini-flagship assembled as a
live torch state_dict and compared END-TO-END through
``load_torch_checkpoint`` and the ModelBase interpreter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from curvecloudnet_tpu import checkpoint as ckpt
from curvecloudnet_tpu.models import CurveCloudNet, cloud_from_arrays
from curvecloudnet_tpu.models.modules import SymmetricCurveConvStep
from curvecloudnet_tpu.models.spec import ModelSpec, StepSpec
from curvecloudnet_tpu.ops import curve1d, interpolate, neighbors

from oracle_utils import (
    make_curve_row,
    merge_variables,
    np_feature_diffs,
    np_symconv_layer,
    torch_mlp_state,
    torch_symconv_state,
)


# --- geodesic radius grouping (reference point_ops.py:143-193) -------------


def oracle_radius_groups(pos, cid, n_valid, radius):
    """Per-query neighbor sets per the reference's exact recipe: per-curve
    avg edge length (curve total / POINT count, point_ops.py:157-160),
    per-curve K = ceil(r / avg), interleaved offset window, same-curve
    mask, cumsum cap in window order."""
    sets = []
    # per-curve totals: internal edges only (cross-curve edges zeroed,
    # point_ops.py:150-152), assigned to the right endpoint's curve
    curves = np.unique(cid[:n_valid])
    avg = {}
    for c in curves:
        idxs = np.nonzero(cid[:n_valid] == c)[0]
        e = 0.0
        for a, b in zip(idxs[:-1], idxs[1:]):
            if b == a + 1:
                e += np.linalg.norm(pos[b] - pos[a])
        avg[c] = e / len(idxs)
    per_k = {c: (1 if avg[c] <= 0 else int(np.ceil(radius / avg[c])))
             for c in curves}
    kmax = max(per_k.values())
    offs = [0]
    for d in range(1, kmax + 1):
        offs += [-d, d]
    for q in range(n_valid):
        cap = per_k[cid[q]]
        kept = []
        for o in offs:
            j = q + o
            if 0 <= j < n_valid and cid[j] == cid[q] and len(kept) < cap:
                kept.append(j)
        sets.append(set(kept))
    return sets


def test_radius_1d_group_matches_reference_semantics(rng):
    row = make_curve_row(rng, [30, 41, 17], 96)
    pos, cid, valid = row["pos"], row["curve_id"], row["valid"]
    n_valid = int(valid.sum())
    radius = 0.35
    queries = np.arange(96, dtype=np.int32)[None]

    nbr, mask = curve1d.radius_1d_group_subset(
        jnp.asarray(pos), jnp.asarray(queries), jnp.asarray(valid),
        jnp.asarray(cid), jnp.asarray(valid), radius, window=24)
    nbr, mask = np.asarray(nbr), np.asarray(mask)

    want = oracle_radius_groups(pos[0], cid[0], n_valid, radius)
    for q in range(n_valid):
        got = set(nbr[0, q][mask[0, q]].tolist())
        assert got == want[q], f"query {q}: {got} != {want[q]}"


# --- geodesic superset + 1D interpolation (point_ops.py:196-260,344-355) ---


def oracle_superset(pos, cid, n_valid, kept, k):
    """Reference knn_1d_group_superset: cumsum assignment to the next kept
    slot, +-(k+1) interleaved window of slots, same-curve filter, re-sort
    by euclidean distance, keep first k."""
    sel = np.zeros(n_valid, np.int64)
    sel[kept] += 1
    assign = np.cumsum(sel)
    offs = [0]
    for d in range(1, k + 2):
        offs += [-d, d]
    out = []
    for q in range(n_valid):
        cands = []
        for o in offs:
            s = assign[q] + o
            if 0 <= s < len(kept) and cid[kept[s]] == cid[q]:
                cands.append(s)
        d = [np.linalg.norm(pos[kept[s]] - pos[q]) for s in cands]
        order = np.argsort(d, kind="stable")
        out.append([cands[i] for i in order[:k]])
    return out


def test_knn_1d_superset_matches_reference_semantics(rng):
    row = make_curve_row(rng, [28, 35, 25], 96)
    pos, cid, valid = row["pos"], row["curve_id"], row["valid"]
    n_valid = int(valid.sum())
    kept = np.sort(rng.choice(n_valid, size=24, replace=False)).astype(
        np.int32)
    k = 3

    nbr, mask = curve1d.knn_1d_group_superset(
        jnp.asarray(pos), jnp.asarray(kept[None]),
        jnp.ones((1, 24), bool), jnp.asarray(cid), jnp.asarray(valid), k)
    nbr, mask = np.asarray(nbr), np.asarray(mask)

    want = oracle_superset(pos[0], cid[0], n_valid, kept, k)
    for q in range(n_valid):
        got = set(nbr[0, q][mask[0, q]].tolist())
        assert got == set(want[q]), f"query {q}: {got} != {set(want[q])}"


def test_fp_geo_interpolation_matches_torch(rng):
    """knn_interpolate_1D (reference point_ops.py:344-355): inverse-d^2
    weighted scatter over the superset mapping, computed in torch."""
    row = make_curve_row(rng, [30, 34, 24], 96, feat_dim=0)
    pos, cid, valid = row["pos"], row["curve_id"], row["valid"]
    n_valid = int(valid.sum())
    kept = np.sort(rng.choice(n_valid, size=22, replace=False)).astype(
        np.int32)
    k = 3
    c = 6
    xk = rng.normal(size=(1, 22, c)).astype(np.float32)

    got = np.asarray(interpolate.knn_interpolate_1d(
        jnp.asarray(xk), jnp.asarray(kept[None]), jnp.ones((1, 22), bool),
        jnp.asarray(pos), jnp.asarray(cid), jnp.asarray(valid), k=k))

    sets = oracle_superset(pos[0], cid[0], n_valid, kept, k)
    pt = torch.from_numpy(pos[0])
    xt = torch.from_numpy(xk[0])
    for q in range(n_valid):
        slots = torch.tensor(sorted(sets[q]), dtype=torch.long)
        d2 = ((pt[kept[slots.numpy()]] - pt[q]) ** 2).sum(-1)
        w = 1.0 / torch.clamp(d2, min=1e-16)
        want = (xt[slots] * w[:, None]).sum(0) / w.sum()
        np.testing.assert_allclose(got[0, q], want.numpy(), rtol=2e-4,
                                   atol=2e-4)


# --- symmetric curve conv v1 (+diff) (fast_conv1d.py:79-146,173-205) -------


def oracle_symconv_v1(pos, feat, cid, n_valid, metas, kernel_size,
                      with_diff, with_xyz):
    """Reference V1: per layer, recompute the diff channel, re-stuff zeros
    between curves (pad width k//2 == conv reach, so each curve convolves
    independently with zero 'same' padding), conv, BN eval, leaky relu."""
    x = np.concatenate([feat, pos], axis=1) if with_xyz else feat
    x = x[:n_valid].astype(np.float32)
    cids = cid[:n_valid]
    for (w, b, bn) in metas:
        if with_diff:
            x = np.concatenate([x, np_feature_diffs(x, cids)], axis=1)
        out = np.zeros((n_valid, w.shape[0]), np.float32)
        for c in np.unique(cids):
            m = cids == c
            out[m] = np_symconv_layer(x[m], w, b, bn)
        x = out
    return x


@pytest.mark.parametrize("with_diff", [False, True])
def test_curve_conv_v1_matches_torch_oracle(rng, with_diff):
    row = make_curve_row(rng, [25, 31, 24], 96, feat_dim=2)
    pos, cid, valid, feat = (row["pos"], row["curve_id"], row["valid"],
                             row["feat"])
    n_valid = int(valid.sum())
    feat_dims = [2 + 3, 8, 8]
    step = StepSpec(name="conv1d-fast-v1", feat_dims=(8, 8), kernel_size=5,
                    with_xyz=True, with_diff=with_diff)
    spec = ModelSpec(in_dim=2, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     use_bias=True, skip_connect_state_store=())
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    dims = tuple(feat_dims)
    mod = SymmetricCurveConvStep(spec, step, dims, v1=True)
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False)

    sd, metas = torch_symconv_state("steps.0", feat_dims, 5, rng, with_diff)
    params, bstats = ckpt.load_torch_checkpoint(sd, spec)
    vd = merge_variables(vs, params["step_0_conv1d-fast-v1"],
                         bstats["step_0_conv1d-fast-v1"])
    out = np.asarray(mod.apply(vd, cloud, train=False).x)

    want = oracle_symconv_v1(pos[0], feat[0], cid[0], n_valid, metas, 5,
                             with_diff, with_xyz=True)
    np.testing.assert_allclose(out[0, :n_valid], want, rtol=5e-4, atol=5e-4)


# --- mini-flagship composite through the converter -------------------------


def test_mini_flagship_composite_through_converter(rng):
    """conv1d-fast-v1 -> sgcnn -> skip-connect -> mlp -> head(+category):
    a 4-step model assembled as a live torch state_dict, converted via
    load_torch_checkpoint, and compared end-to-end against a torch oracle
    chain that recomputes every step (reference base.py:159-175,149-157)."""
    row = make_curve_row(rng, [25, 31, 24], 96, feat_dim=2)
    pos, cid, valid, feat = (row["pos"], row["curve_id"], row["valid"],
                             row["feat"])
    n_valid = int(valid.sum())

    steps = (
        StepSpec(name="conv1d-fast-v1", feat_dims=(8, 8), kernel_size=5,
                 with_xyz=True, with_diff=True),
        StepSpec(name="sgcnn", feat_dims=(16, 12), knn=6, radius=0.9,
                 with_xyz=False, aggr_type="max"),
        StepSpec(name="skip-connect", feat_dims=(12 + 8, 16), num_skips=1),
        StepSpec(name="mlp", feat_dims=(12,), with_xyz=True),
    )
    spec = ModelSpec(in_dim=2, n_out=5, steps=steps, out_mlp_dims=(10,),
                     use_bias=True, with_seg_category=True, n_categories=16,
                     skip_connect_state_store=("sgcnn",))
    model = CurveCloudNet(spec, n_points=96)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    cats = jnp.asarray(np.array([3], np.int32))
    key = jax.random.PRNGKey(0)
    vs = model.init({"params": key, "dropout": key}, cloud, cats,
                    train=False, key=key)

    # --- assemble the torch state_dict in reference naming
    conv_dims = [2 + 3, 8, 8]
    sd0, conv_metas = torch_symconv_state("steps.0", conv_dims, 5, rng,
                                          with_diff=True)
    sd1, sgcnn_mlp = torch_mlp_state("steps.1.nn", [2 * 8, 16, 12], True,
                                     rng)
    sd2, skip_mlp = torch_mlp_state("steps.2.nn", [12 + 8, 16], True, rng,
                                    act="leaky_relu")
    sd3, mlp_mlp = torch_mlp_state("steps.3.mlp", [16 + 3, 12], True, rng,
                                   act="leaky_relu")
    sdh, head_mlp = torch_mlp_state("mlp", [12 + 64, 10, 5], True, rng)
    sdc, cat_mlp = torch_mlp_state("lin_categorical", [16, 64, 64], True,
                                   rng)
    sd = {**sd0, **sd1, **sd2, **sd3, **sdh, **sdc}
    params, bstats = ckpt.load_torch_checkpoint(sd, spec)
    vd = merge_variables(vs, params, bstats)

    got = np.asarray(model.apply(vd, cloud, cats, train=False, key=key)[0])

    # --- torch oracle chain
    x0 = oracle_symconv_v1(pos[0], feat[0], cid[0], n_valid, conv_metas, 5,
                           with_diff=True, with_xyz=True)      # (n, 8)

    # sgcnn on xyz graph, fast order [x_j, x_i - x_j], max w/ -1e2 fill
    idx, _ = neighbors.same_set_knn(jnp.asarray(pos), jnp.asarray(valid),
                                    6, radius=0.9)
    idx = neighbors.add_self_loops(idx, jnp.asarray(valid))
    idx = np.asarray(idx)[0]
    xt = torch.from_numpy(x0)
    x1 = np.zeros((n_valid, 12), np.float32)
    for i in range(n_valid):
        nbrs = idx[i][idx[i] >= 0]
        msgs = torch.stack([torch.cat([xt[j], xt[i] - xt[j]]) for j in nbrs])
        h = sgcnn_mlp(msgs)
        filled = torch.full((idx.shape[1], 12), -1e2)
        filled[: len(nbrs)] = h
        x1[i] = filled.max(dim=0).values.detach().numpy()

    # skip-connect: concat [x, stored sgcnn INPUT (= conv output)]
    x2 = skip_mlp(torch.from_numpy(
        np.concatenate([x1, x0], axis=1))).detach().numpy()

    # mlp step with xyz concat
    x3 = mlp_mlp(torch.from_numpy(np.concatenate(
        [x2, pos[0, :n_valid]], axis=1))).detach().numpy()

    # category embedding + head (reference base.py:149-157)
    onehot = np.zeros((1, 16), np.float32)
    onehot[0, 3] = 1.0
    cat64 = cat_mlp(torch.from_numpy(onehot)).detach().numpy()
    head_in = np.concatenate(
        [x3, np.repeat(cat64, n_valid, axis=0)], axis=1)
    want = head_mlp(torch.from_numpy(head_in)).detach().numpy()

    np.testing.assert_allclose(got[0, :n_valid], want, rtol=2e-3, atol=2e-3)


def oracle_symconv_v2(pos, feat, cid, n_valid, metas, kernel_size,
                      with_diff, with_xyz):
    """Reference V2 (fast_conv1d.py:34-77): diff computed ONCE, one
    zero-stuffed sequence with pad=(k//2)*nconvs gap slots at every curve
    boundary (incl. ends) kept through ALL layers — gap slots develop
    non-zero values and BN (eval affine here) sees them too."""
    x = np.concatenate([feat, pos], axis=1) if with_xyz else feat
    x = x[:n_valid].astype(np.float32)
    cids = cid[:n_valid]
    if with_diff:
        x = np.concatenate([x, np_feature_diffs(x, cids)], axis=1)
    half = kernel_size // 2
    pad = half * len(metas)
    # boundary pointers incl. both ends (fast_conv1d.py:52-61)
    bounds = [0] + [i for i in range(1, n_valid)
                    if cids[i] != cids[i - 1]] + [n_valid]
    n_conv = n_valid + len(bounds) * pad
    valid_idx = np.ones(n_conv, bool)
    at = 0
    exp_of = np.zeros(n_valid, np.int64)
    src = 0
    for bi, b in enumerate(bounds):
        gap_start = b + bi * pad
        valid_idx[gap_start:gap_start + pad] = False
    exp_positions = np.nonzero(valid_idx)[0]
    seq = np.zeros((n_conv, x.shape[1]), np.float32)
    seq[exp_positions[:n_valid]] = x
    for (w, b_, bn) in metas:
        seq = np_symconv_layer(seq, w, b_, bn)
    return seq[exp_positions[:n_valid]]


@pytest.mark.parametrize("depth", [2, 3])
def test_curve_conv_v2_matches_torch_oracle(rng, depth):
    row = make_curve_row(rng, [25, 31, 24], 96, feat_dim=2)
    pos, cid, valid, feat = (row["pos"], row["curve_id"], row["valid"],
                             row["feat"])
    n_valid = int(valid.sum())
    feat_dims = [2 + 3] + [8] * depth
    step = StepSpec(name="conv1d-fast-v2", feat_dims=(8,) * depth,
                    kernel_size=5, with_xyz=True, with_diff=True)
    spec = ModelSpec(in_dim=2, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     use_bias=True, skip_connect_state_store=(),
                     curve_budget=8)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    mod = SymmetricCurveConvStep(spec, step, tuple(feat_dims), v1=False)
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False)

    sd, metas = torch_symconv_state("steps.0", feat_dims, 5, rng,
                                    with_diff=True, v1=False)
    params, bstats = ckpt.load_torch_checkpoint(sd, spec)
    vd = merge_variables(vs, params["step_0_conv1d-fast-v2"],
                         bstats["step_0_conv1d-fast-v2"])
    out = np.asarray(mod.apply(vd, cloud, train=False).x)

    want = oracle_symconv_v2(pos[0], feat[0], cid[0], n_valid, metas, 5,
                             with_diff=True, with_xyz=True)
    # the gap feedback is exactly what distinguishes V2 from V1 at
    # boundaries — the whole row must match, not just curve interiors
    np.testing.assert_allclose(out[0, :n_valid], want, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("depth", [2, 3])
def test_curve_conv_v2_halo_equals_expansion(rng, monkeypatch, depth):
    """The eval halo fast path must produce the expansion path's values
    bit-for-bit-ish (same math, different association) — including at the
    row start/end gaps and around short curves, at the flagship's 3-conv
    depth as well."""
    row = make_curve_row(rng, [25, 31, 2, 24, 1, 9], 96, feat_dim=2)
    pos, cid, valid, feat = (row["pos"], row["curve_id"], row["valid"],
                             row["feat"])
    step = StepSpec(name="conv1d-fast-v2", feat_dims=(8,) * depth,
                    kernel_size=5, with_xyz=True, with_diff=True)
    spec = ModelSpec(in_dim=2, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     use_bias=True, skip_connect_state_store=(),
                     curve_budget=16)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    mod = SymmetricCurveConvStep(spec, step, (5,) + (8,) * depth, v1=False)
    vs = mod.init({"params": jax.random.PRNGKey(5)}, cloud, train=False)
    # randomize running stats so BN affine is non-trivial
    import flax

    vd = flax.core.unfreeze(vs)
    for nrm in [f"norm_{i}" for i in range(depth)]:
        st = vd["batch_stats"][nrm]
        st["mean"] = jnp.asarray(
            rng.normal(0, 0.2, st["mean"].shape), jnp.float32)
        st["var"] = jnp.asarray(
            rng.uniform(0.5, 1.5, st["var"].shape), jnp.float32)

    monkeypatch.setenv("CCN_CONV_HALO", "0")
    want = np.asarray(mod.apply(vd, cloud, train=False).x)
    monkeypatch.setenv("CCN_CONV_HALO", "1")
    got = np.asarray(mod.apply(vd, cloud, train=False).x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # the Pallas chain megakernel (ops/pallas_conv1d.py, interpret mode on
    # CPU) must also reproduce the expansion path
    monkeypatch.setenv("CCN_CONV_KERNEL", "interp")
    got_k = np.asarray(mod.apply(vd, cloud, train=False).x)
    monkeypatch.delenv("CCN_CONV_KERNEL")
    np.testing.assert_allclose(got_k, want, rtol=1e-4, atol=1e-4)

    # TRAIN-mode chain kernel: values + updated running stats match the
    # exact gap-expanded path (gradient parity is pinned at the op level,
    # tests/test_pallas_conv1d.py::test_train_chain_values_and_grads)
    monkeypatch.setenv("CCN_CONV_HALO", "0")
    want_t, vt = mod.apply(vd, cloud, train=True, mutable=["batch_stats"])
    monkeypatch.setenv("CCN_CONV_KERNEL_TRAIN", "interp")
    got_t, vk = mod.apply(vd, cloud, train=True, mutable=["batch_stats"])
    monkeypatch.delenv("CCN_CONV_KERNEL_TRAIN")
    np.testing.assert_allclose(np.asarray(got_t.x), np.asarray(want_t.x),
                               rtol=2e-4, atol=2e-4)
    for nrm in [f"norm_{i}" for i in range(depth)]:
        for leaf in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(vk["batch_stats"][nrm][leaf]),
                np.asarray(vt["batch_stats"][nrm][leaf]),
                rtol=2e-4, atol=2e-4)
