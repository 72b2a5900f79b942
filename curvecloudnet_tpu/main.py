"""Driver: config-driven train / eval / test entry point.

Usage parallels the reference (``python -m curvecloudnet_tpu.main --config
configs/nuscenes.yaml [--key=val ...]`` vs reference ``src/main.py:15-151``):
wandb-or-JSONL logging, dataset/model/optimizer/scheduler construction,
auto-resume from the outdir, per-epoch val + best/periodic/rolling
checkpoints, BN-momentum decay, and only_val/only_test dispatch.

TPU-native differences: the train step is one compiled program (optionally
sharded over a device mesh for data parallelism); OOM-catch-and-restart is
unnecessary because shapes are static (memory use is decided at compile
time) — preemption resilience is kept via the rolling checkpoint.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as ckpt
from .config import parse_args
from .data import datasets as D
from .logging_utils import MetricLogger
from .models import CurveCloudNet, parse_model_config
from .parallel import make_mesh, shard_batch, sharded_train_step
from .run import tasks as T
from .train import (
    Batch,
    bn_momentum_for_epoch,
    build_train_step,
    create_train_state,
    make_schedule,
)


def load_datasets(cfg):
    """Dataset factory (reference load_utils.load_dataset:73-126).

    Falls back to procedural synthetic data when the configured data_path
    does not exist (so smoke training works in data-less environments) —
    the fallback is logged loudly.
    """
    src = cfg["dataset_source"]
    if src == "summer-robotics":  # reference alias for the Kortx test split
        src = "kortx"
    task = cfg.get("task", "segmentation")
    data_path = cfg.get("data_path", "")
    n_pad = int(cfg.get("n_pad", 2048 if "shapenet" in src or "kortx" in src
                         or "object" in src else 32768))
    have_data = bool(data_path) and os.path.exists(data_path)

    if src.startswith("synthetic-lidar") or (
            src in ("nuscenes", "kitti", "audi") and not have_data):
        if not src.startswith("synthetic"):
            print(f"[data] {data_path!r} missing -> synthetic lidar stand-in")
        n_cls = T.task_for(src, task).n_out if src in T.TASKS else 17
        train = D.SyntheticLidarSeg(n_samples=cfg.get("n_train", 32),
                                    n_pad=n_pad, n_classes=n_cls, seed=1)
        val = D.SyntheticLidarSeg(n_samples=cfg.get("n_val", 8),
                                  n_pad=n_pad, n_classes=n_cls, seed=2)
        return train, val

    if src in ("nuscenes", "kitti", "audi"):
        from .data import lidar

        return lidar.load_lidar_datasets(cfg, n_pad)

    if src.startswith("synthetic-object") or (
            src in ("shapenet-seg", "shapenet", "kortx") and not have_data):
        if not src.startswith("synthetic"):
            print(f"[data] {data_path!r} missing -> synthetic objects stand-in")
        train = D.SyntheticObjects(n_samples=cfg.get("n_train", 64),
                                   n_pad=n_pad, task=task, seed=1)
        val = D.SyntheticObjects(n_samples=cfg.get("n_val", 16),
                                 n_pad=n_pad, task=task, seed=2)
        return train, val

    if src in ("shapenet-seg", "shapenet", "kortx"):
        gen = cfg.get("data_generation", {})
        stem = "data_{}_{}_{}_{}".format(
            gen.get("num_points", 2048), gen.get("resolution", 2048),
            gen.get("line_density", 0.25), gen.get("laser_motion", "random"))
        paths = {s: os.path.join(data_path, f"{stem}_{s}.pth")
                 for s in ("train", "val")}
        n_cls = (16 if task == "classification"
                 else T.task_for(src, task).n_out)
        use_curv = bool(cfg.get("use_curvature", False))
        train = D.ObjectPthDataset(paths["train"], n_pad=n_pad, task=task,
                                   n_classes=n_cls, use_curvature=use_curv)
        val = D.ObjectPthDataset(paths["val"], n_pad=n_pad, task=task,
                                 n_classes=n_cls, use_curvature=use_curv)
        return train, val

    raise KeyError(f"unknown dataset_source {src!r}")


def run_eval(model, variables, val_ds, info, cfg, log=print, logger=None):
    # lidar scenes evaluate at batch 1 regardless of TTA (reference
    # main.py:32); small-object tasks (ShapeNet/Kortx) batch up
    lidar_scene = info.task == "segmentation" and not info.part_iou
    bs = int(cfg.get("eval_batch_size", 1 if lidar_scene else 8))
    max_b = cfg.get("eval_max_batches")
    if info.task == "classification":
        return T.evaluate_classification(model, variables, val_ds, info,
                                         batch_size=bs, max_batches=max_b,
                                         log=log, media_logger=logger)
    if info.part_iou:
        return T.evaluate_part_segmentation(model, variables, val_ds, info,
                                            batch_size=bs, max_batches=max_b,
                                            log=log)
    return T.evaluate_segmentation(
        model, variables, val_ds, info, batch_size=bs, max_batches=max_b,
        use_tta=cfg.get("use_tta"), log=log,
        test_mode=bool(cfg.get("only_test")), outdir=cfg.get("outdir"))


def run_viz(model, variables, val_ds, info, cfg, outdir, n_samples=4,
            logger=None):
    """Render prediction/GT/curve figures for a few val samples
    (reference viz_seg paths, e.g. nuscenes_seg.py:168-226): per-sample
    curve plot, pred/GT scatter, grouping-edge graph, and path-traced
    pred|GT panels — all routed through ``MetricLogger.log_media`` so they
    land in wandb when available and under ``outdir/media/`` otherwise."""
    import jax.numpy as jnp

    from .data import datasets as D
    from .logging_utils import MetricLogger
    from .ops import neighbors
    from .run import tasks as T
    from .visualization import (
        grouping_edges_figure, label_colormap, plot_curve_cloud,
        plot_segmentation, render_segmentation_panels, vector_cones_figure,
    )

    if logger is None:
        logger = MetricLogger(outdir, use_wandb=cfg.get("use_wandb", False),
                              config=cfg)
    viz_dir = os.path.join(outdir, "viz")
    os.makedirs(viz_dir, exist_ok=True)
    preset = {"kitti": "kitti", "nuscenes": "kitti", "audi": "audi"}.get(
        info.name, "shapenet")
    # the reference renders a CURATED list of scans per dataset
    # (src/run/globals.py:9-14,52-60); config viz_idxs overrides, and
    # datasets shorter than the curated ids fall back to the first samples
    from .run.globals import dataset_viz_idxs

    curated = cfg.get("viz_idxs") or dataset_viz_idxs(info.name) or []
    idxs = [i for i in curated if i < len(val_ds)][:n_samples]
    if len(idxs) < n_samples:
        seen = set(idxs)
        idxs += [i for i in range(len(val_ds)) if i not in seen][
            : n_samples - len(idxs)]
    fwd = T.make_tta_eval(model)
    from .data.datasets import pad_sample

    def _batches():
        rng_v = np.random.default_rng(0)
        for i in idxs:
            s = pad_sample(val_ds.get(int(i), rng=rng_v, augment=False),
                           val_ds.n_pad)
            yield {k: v[None] for k, v in s.items()}

    for i, np_batch in enumerate(_batches()):
        np_batch.pop("_meta", None)
        batch = D.to_device_batch(np_batch, info.task)
        logits, out_valid = fwd(variables, batch.cloud,
                                jnp.asarray(T.TTA_FLIPS[0]),
                                jnp.asarray(T.TTA_SCALES[0]),
                                batch.categories)
        pred = np.asarray(jnp.argmax(logits, -1))[0]
        valid = np.asarray(out_valid)[0]
        pos = np.asarray(batch.cloud.pos)[0]
        curves_png = os.path.join(viz_dir, f"curves_{i}.png")
        plot_curve_cloud(pos, np.asarray(batch.cloud.curve_id)[0], valid,
                         curves_png)
        logger.log_media(f"viz/curves_{i}", curves_png)
        gt = (np.asarray(batch.labels)[0]
              if np.ndim(np.asarray(batch.labels)) > 1 else None)
        from .run.globals import dataset_cmap

        cm = dataset_cmap(info.name)
        if cm is None or len(cm) < info.n_out:
            cm = label_colormap(info.n_out)
        if len(pred) == len(pos):  # classification preds are (1,), no
            seg_png = os.path.join(viz_dir, f"seg_{i}.png")  # per-point map
            plot_segmentation(pos, pred, gt, valid, cmap=cm, path=seg_png)
            logger.log_media(f"viz/seg_{i}", seg_png)
            # interactive plotly figure alongside the PNG, like the
            # reference's wandb plotly logging (visualize_plotly.py:19-331)
            # — lands as wandb.Plotly online, an .html under media/ offline
            from .visualization import to_plotly_figure

            pfig = to_plotly_figure(pos, pred, valid)
            if pfig is not None:
                logger.log_media(f"viz/seg_interactive_{i}", pfig)

        # grouping edges of the first sgcnn/sa radius on this cloud
        # (reference visualize_plotly.py:284-306)
        nbr, _ = neighbors.same_set_knn(
            batch.cloud.pos, batch.cloud.valid, 8)
        fig = grouping_edges_figure(
            pos, np.asarray(nbr)[0], valid=valid,
            path=os.path.join(viz_dir, f"edges_{i}.png"))
        logger.log_media(f"viz/groupings_{i}", fig)

        # curve-direction cones (reference visualize_plotly.py:19-49,195-199
        # renders direction fields as go.Cone): tangent = next-on-curve delta
        cid = np.asarray(batch.cloud.curve_id)[0]
        tan = np.zeros_like(pos)
        tan[:-1] = pos[1:] - pos[:-1]
        same = np.zeros(len(pos), bool)
        same[:-1] = (cid[1:] == cid[:-1]) & valid[1:].astype(bool)
        tan = np.where(same[:, None], tan, 0.0)
        norm = np.linalg.norm(tan, axis=-1, keepdims=True)
        tan = np.divide(tan, norm, out=np.zeros_like(tan), where=norm > 0)
        cones = vector_cones_figure(
            pos, tan, valid=valid & same, title="curve tangents",
            path=os.path.join(viz_dir, f"tangents_{i}.png"))
        logger.log_media(f"viz/tangents_{i}", cones)

        if info.task == "segmentation" and gt is not None:
            panels = render_segmentation_panels(pos, pred, gt, cm,
                                                preset=preset, valid=valid)
            logger.log_media(f"viz/panels_{i}", panels)
    print(f"wrote figures to {viz_dir}")


def score_of(result: dict) -> float:
    for k in ("miou", "instance_miou", "accuracy"):
        if k in result:
            return float(result[k])
    return float("nan")


def init_distributed_from_config(cfg: dict) -> int:
    """Multi-host entry path (SURVEY §2.11: a jax.distributed-initialized
    runtime).  Config block::

        distributed:
          coordinator_address: host0:8476
          num_processes: 4
          process_id: 0        # or env CCN_PROCESS_ID per host

    Launch one process per host, identical configs except process_id:
      CCN_PROCESS_ID=$i python -m curvecloudnet_tpu.main --config cfg.yaml \\
          --distributed.num_processes=4 \\
          --distributed.coordinator_address=host0:8476
    Single-host runs (no block / num_processes <= 1) skip initialization.
    """
    dist = cfg.get("distributed") or {}
    n_proc = int(dist.get("num_processes") or 0)
    if n_proc <= 1:
        return 0
    from .parallel import initialize_distributed

    pid = dist.get("process_id")
    if pid is None:
        pid = int(os.environ.get("CCN_PROCESS_ID", 0))
    idx = initialize_distributed(dist.get("coordinator_address"),
                                 n_proc, int(pid))
    print(f"[distributed] process {idx}/{n_proc} "
          f"({jax.device_count()} devices total)")
    return idx


def main(cfg: dict) -> Optional[float]:
    init_distributed_from_config(cfg)
    outdir = cfg.get("outdir", "./out/run")
    os.makedirs(outdir, exist_ok=True)
    logger = MetricLogger(outdir, use_wandb=cfg.get("use_wandb", False),
                          config=cfg)

    info = T.task_for(cfg["dataset_source"], cfg.get("task", "segmentation"))
    train_ds, val_ds = load_datasets(cfg)
    spec = parse_model_config(cfg["model"], in_dim=train_ds.in_dim,
                              n_out=info.n_out)
    model = CurveCloudNet(spec, n_points=train_ds.n_pad)

    batch_size = int(cfg.get("batch_size", 4))
    seed = int(cfg.get("seed", 0))
    key = jax.random.PRNGKey(seed)
    # per-PROCESS steps: the sharded loader runs ceil(len/nproc)/bs steps
    # per epoch on each host, and the schedule counts optimizer steps —
    # sizing it from the global length would stretch every per-epoch decay
    # by the process count
    shard_len = -(-len(train_ds) // jax.process_count())
    steps_per_epoch = max(1, -(-shard_len // batch_size))
    schedule = make_schedule(cfg.get("scheduler"), float(cfg.get("lr", 1e-3)),
                             steps_per_epoch)

    example_np = next(D.batch_iterator(train_ds, batch_size))
    example = D.to_device_batch(example_np, info.task)
    state = create_train_state(model, example, key, schedule)
    n_params = sum(v.size for v in jax.tree.leaves(state.params))
    print(f"Model Parameters: {n_params:,}")
    logger.log({"model_parameters": int(n_params)})

    # auto-resume (reference load_utils.py:30-34, main.py:60-64)
    start_epoch, max_score = 0, -1e30
    weights = cfg.get("weights", "")
    if weights:
        if weights.endswith((".pth", ".pt")):
            from .checkpoint import load_torch_checkpoint

            params, batch_stats = load_torch_checkpoint(weights, spec)
            state = state.replace(params=params, batch_stats=batch_stats)
            print(f"loaded torch weights from {weights}")
        else:
            state = ckpt.restore_checkpoint(os.path.dirname(weights) or ".",
                                            os.path.basename(weights), state)
    elif ckpt.has_latest(outdir):
        state = ckpt.restore_checkpoint(outdir, "latest", state)
        latest = ckpt.read_latest_state(outdir) or {}
        start_epoch = int(latest.get("epoch", -1)) + 1
        max_score = float(latest.get("max_score", -1e30))
        # run-spanning stats (median-top-5 score) must see pre-resume
        # entries too
        logger.reload_history()
        print(f"resumed from {outdir} at epoch {start_epoch}")

    class_weights = None
    if cfg.get("use_ce_weights") and info.class_weights is not None:
        class_weights = jnp.asarray(info.class_weights, jnp.float32)

    if cfg.get("only_viz"):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        run_viz(model, variables, val_ds, info, cfg, outdir, logger=logger)
        return None

    if cfg.get("only_val") or cfg.get("only_test"):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        result = run_eval(model, variables, val_ds, info, cfg, logger=logger)
        logger.log(result if isinstance(result, dict) and all(
            isinstance(v, (int, float)) for v in result.values()) else
            {k: v for k, v in result.items()
             if isinstance(v, (int, float))})
        return score_of(result)

    # ----- training loop (reference main.py:82-129) -----
    loss_cfg = dataclasses_replace_lovasz(info.loss_cfg, cfg)
    raw_step = build_train_step(model, loss_cfg, class_weights)
    n_dev = cfg.get("data_parallel_devices") or 1
    if n_dev > 1 and len(jax.devices()) >= n_dev:
        mesh = make_mesh(n_dev)
        train_step = sharded_train_step(raw_step, mesh)
        place = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        train_step = jax.jit(raw_step, donate_argnums=(0,))
        place = lambda b: b  # noqa: E731

    epochs = int(cfg.get("epochs", 10))
    val_every = int(cfg.get("val_every", 1))
    save_every = int(cfg.get("save_every", 10))
    bn_decay = float(cfg.get("bn_momentum_decay", 0.97))

    from .data.loader import PrefetchLoader

    loader = PrefetchLoader(train_ds, batch_size, shuffle=True, seed=seed,
                            augment=True,
                            num_workers=int(cfg.get("num_workers", 4)))
    profile_dir = cfg.get("profile_dir")
    step_count = 0
    for epoch in range(start_epoch, epochs):
        t_ep = time.time()
        bn_m = jnp.float32(bn_momentum_for_epoch(epoch, bn_decay))
        losses = []
        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.start_trace(profile_dir)  # skip compile epoch
        for np_batch in loader.epoch(epoch):
            batch = place(D.to_device_batch(np_batch, info.task))
            key, sub = jax.random.split(key)
            state, m = train_step(state, batch, sub, bn_m)
            step_count += 1
            losses.append(m["loss"])
            if step_count % 10 == 0 and len(losses) >= 2:
                # log the PREVIOUS step's loss: float() on the value just
                # dispatched blocks the host until the step completes
                # (~44 ms tunnel round trip measured) — the step-older
                # value is ready while the current step computes
                logger.log({"train_loss": float(losses[-2])},
                           step=step_count - 1)
        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
        ep_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        print(f"epoch {epoch}: loss {ep_loss:.4f} "
              f"({time.time()-t_ep:.1f}s)")

        if (epoch + 1) % val_every == 0:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            result = run_eval(model, variables, val_ds, info, cfg)
            score = score_of(result)
            logger.log({"score": score, "epoch": epoch}, step=step_count)
            # reference 'Median Top 5 IOU' (nuscenes_seg.py:159-161)
            logger.log({"median_top5_score": logger.median_top_k("score")},
                       step=step_count)
            if score > max_score:
                max_score = score
                ckpt.save_checkpoint(outdir, f"best_epoch{epoch}", state)
        if (epoch + 1) % save_every == 0:
            ckpt.save_checkpoint(outdir, f"epoch{epoch}", state)

        # preemption checkpoint (reference main.py:127-141)
        ckpt.save_checkpoint(outdir, "latest", state)
        ckpt.dump_latest_state(outdir, epoch, max_score)

    logger.close()
    return max_score


def dataclasses_replace_lovasz(loss_cfg, cfg):
    import dataclasses

    changes = {}
    if "use_lovasz_loss" in cfg:
        changes["use_lovasz"] = bool(cfg["use_lovasz_loss"])
    return dataclasses.replace(loss_cfg, **changes) if changes else loss_cfg


if __name__ == "__main__":
    main(parse_args())
