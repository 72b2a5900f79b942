"""Model-layer tests: step interpreter, all module types, padding invariance.

The reference has no tests (SURVEY.md §4); strategy here is (1) shape/finite
checks through a miniature U-Net exercising every step type, (2) a padding-
invariance property (values in invalid slots must never affect valid outputs
— the core correctness requirement of the batch-padded redesign), and
(3) classification-head behavior (sa-global + category concat).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.models import (
    CurveCloudNet,
    cloud_from_arrays,
    parse_model_config,
)

from conftest import make_curve_cloud


def unet_cfg():
    """Miniature analogue of the nuScenes architecture (every step type)."""
    return dict(
        use_bias=True,
        version=2.0,
        skip_connect_state_store=["conv1d-fast-v2", "sgcnn"],
        steps=[
            dict(step_name="conv1d-fast-v2", with_diff=True, with_xyz=True,
                 kernel_size=5, feat_dims=[8, 8]),
            dict(step_name="sa-geo", curve_fps_arclen=0.2, use_curve_fps=True,
                 with_xyz=True, aggr_type="attend", normalize_radius=True,
                 radius=0.3, feat_dims=[16, 16], budget_ratio=0.5),
            dict(step_name="mlp", plain_last=False, with_xyz=True,
                 feat_dims=[16, 8]),
            dict(step_name="sgcnn", with_xyz=True, knn=4, feat_dims=[8, 8]),
            dict(step_name="skip-connect", num_skips=1, feat_dims=[16, 16]),
            dict(step_name="sa", aggr_type="attend", downsample_type="voxel",
                 voxel_size=0.2, normalize_radius=True, use_fast_knn=True,
                 knn=4, radius=0.4, feat_dims=[16, 16], budget_ratio=0.5),
            dict(step_name="sgcnn", with_xyz=True, knn=4, feat_dims=[16, 16]),
            dict(step_name="skip-connect", num_skips=1, feat_dims=[32, 16]),
            dict(step_name="fp", with_xyz=True, knn=3, feat_dims=[16, 8]),
            dict(step_name="fp-geo", with_xyz=True, knn=2, feat_dims=[16, 8]),
            dict(step_name="conv1d-fast-v2", with_diff=True, with_xyz=True,
                 kernel_size=3, feat_dims=[8, 8]),
            dict(step_name="skip-connect", num_skips=1, feat_dims=[16, 16]),
        ],
        out_mlp=dict(dims=[16], dropout=0.5),
    )


def class_cfg():
    """Miniature ShapeNet-classification analogue (sa-global head)."""
    return dict(
        use_bias=True,
        version=1.0,
        skip_connect_state_store=["mlp", "sgcnn"],
        steps=[
            dict(step_name="sa-geo", curve_fps_arclen=0.1, use_curve_fps=True,
                 with_xyz=True, aggr_type="attend", normalize_radius=True,
                 radius=0.2, feat_dims=[8, 16], budget_ratio=0.6),
            dict(step_name="mlp", plain_last=False, with_xyz=True,
                 feat_dims=[8, 8]),
            dict(step_name="sgcnn", with_xyz=True, knn=4,
                 use_sparse_feat_agg=True, feat_dims=[8, 8]),
            dict(step_name="skip-connect", num_skips=1, feat_dims=[16, 16]),
            dict(step_name="sa", aggr_type="attend", downsample_type="fps",
                 ratio=0.5, normalize_radius=True, use_fast_knn=False,
                 knn=4, radius=0.3, feat_dims=[16, 16]),
            dict(step_name="dgcnn", knn=4, feat_dims=[16, 16]),
            dict(step_name="sa-global", feat_dims=[32, 32]),
        ],
        out_mlp=dict(dims=[16], dropout=0.0),
    )


def build_cloud(rng, b=2, n=64, with_x=True):
    pos, feat, curve_id, valid = make_curve_cloud(rng, b=b, n=n, f=1)
    x = jnp.array(feat) if with_x else None
    return cloud_from_arrays(jnp.array(pos), jnp.array(curve_id),
                             jnp.array(valid), x)


@pytest.fixture(scope="module")
def unet():
    spec = parse_model_config(unet_cfg(), in_dim=4, n_out=5)
    model = CurveCloudNet(spec, n_points=64)
    rng = np.random.default_rng(0)
    cloud = build_cloud(rng)
    k = jax.random.PRNGKey(0)
    vars_ = model.init({"params": k, "dropout": k}, cloud, train=False, key=k)
    return model, vars_, cloud


def test_unet_forward_shapes(unet):
    model, vars_, cloud = unet
    out, out_valid = model.apply(vars_, cloud, train=False,
                                 key=jax.random.PRNGKey(1))
    assert out.shape == (2, 64, 5)
    assert out_valid.shape == (2, 64)
    assert bool(jnp.isfinite(out[out_valid]).all())


def test_unet_train_mode_updates_batch_stats(unet):
    model, vars_, cloud = unet
    k = jax.random.PRNGKey(2)
    (out, _), mut = model.apply(vars_, cloud, train=True, key=k,
                                rngs={"dropout": k}, mutable=["batch_stats"])
    assert "batch_stats" in mut
    before = jax.tree.leaves(vars_["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    assert changed


def test_unet_gradients_flow(unet):
    model, vars_, cloud = unet

    def loss_fn(params):
        out, ov = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            cloud, train=False, key=jax.random.PRNGKey(0))
        return jnp.sum(jnp.where(ov[..., None], out, 0.0) ** 2)

    grads = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    n_nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
    # every parameter tensor should receive gradient somewhere
    assert n_nonzero > 0.9 * len(leaves), f"{n_nonzero}/{len(leaves)}"


def test_padding_invariance(unet):
    """Garbage in invalid slots must not change valid outputs."""
    model, vars_, cloud = unet
    k = jax.random.PRNGKey(3)
    out1, ov = model.apply(vars_, cloud, train=False, key=k)

    inv = ~cloud.valid
    trash = cloud.replace(
        pos=jnp.where(inv[..., None], 7.7, cloud.pos),
        x=jnp.where(inv[..., None], -3.3, cloud.x),
        curve_id=jnp.where(inv, 9999, cloud.curve_id),
    )
    out2, _ = model.apply(vars_, trash, train=False, key=k)
    np.testing.assert_allclose(
        np.asarray(out1[ov]), np.asarray(out2[ov]), rtol=2e-4, atol=2e-5)


def test_classification_head_and_category_concat():
    spec = parse_model_config(class_cfg(), in_dim=3, n_out=7)
    model = CurveCloudNet(spec, n_points=48)
    rng = np.random.default_rng(1)
    cloud = build_cloud(rng, b=3, n=48, with_x=False)
    k = jax.random.PRNGKey(0)
    vars_ = model.init({"params": k, "dropout": k}, cloud, train=False, key=k)
    out, ov = model.apply(vars_, cloud, train=False, key=k)
    assert out.shape == (3, 1, 7)
    assert bool(ov.all())

    # seg-category variant
    cfg = class_cfg()
    cfg["out_mlp"]["with_seg_category"] = True
    spec2 = parse_model_config(cfg, in_dim=3, n_out=7)
    model2 = CurveCloudNet(spec2, n_points=48)
    cats = jnp.array([0, 3, 15])
    vars2 = model2.init({"params": k, "dropout": k}, cloud, cats,
                        train=False, key=k)
    out2, _ = model2.apply(vars2, cloud, cats, train=False, key=k)
    assert out2.shape == (3, 1, 7)
    assert "lin_categorical" in vars2["params"]


def test_parallel_list_schema_matches_inline():
    """Reference-style parallel lists parse to the same spec as inline."""
    inline = parse_model_config(class_cfg(), in_dim=3, n_out=7)
    cfg = class_cfg()
    steps = cfg["steps"]
    ref_style = dict(
        use_bias=True, version=1.0,
        skip_connect_state_store=["mlp", "sgcnn"],
        steps=[
            {k: v for k, v in s.items()
             if k not in ("feat_dims", "knn", "ratio", "radius", "num_skips",
                          "kernel_size")}
            for s in steps
        ],
        feat_dims=[s["feat_dims"] for s in steps],
        knn=[s.get("knn") for s in steps],
        ratios=[s.get("ratio") for s in steps],
        radii=[s.get("radius") for s in steps],
        num_skips=[s.get("num_skips") for s in steps],
        kernel_sizes=[s.get("kernel_size") for s in steps],
        out_mlp=dict(dims=[16], dropout=0.0),
    )
    ref = parse_model_config(ref_style, in_dim=3, n_out=7)
    assert inline == ref
