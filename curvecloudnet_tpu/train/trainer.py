"""Train/eval steps as pure jitted functions over a TrainState.

TPU-native replacement for the reference's imperative loop
(``src/main.py:82-129`` + per-dataset ``train``/``val`` in ``src/run/``):
optimizer/scheduler/BN-momentum-decay semantics are preserved (Adam,
exponential or cosine-warm-restart LR stepped per epoch, BN momentum
``max(0.01, 0.1·decay^epoch)`` — main.py:124-125), but the step itself is a
single compiled program, and data parallelism is expressed with
``jax.sharding`` instead of a DataParallel wrapper (SURVEY.md §2.11).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.base import CurveCloudNet
from ..models.cloud import Cloud
from ..run import losses as losses_lib


class Batch(struct.PyTreeNode):
    """One training batch: a padded cloud + supervision."""

    cloud: Cloud
    labels: jax.Array                       # (B, N) seg or (B,) class
    categories: Optional[jax.Array] = None  # (B,) ShapeNet object category
    label_valid: Optional[jax.Array] = None  # (B, N) or None -> cloud.valid


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def make_schedule(scheduler_cfg: dict, base_lr: float,
                  steps_per_epoch: int) -> optax.Schedule:
    """LR schedule stepped once per epoch (reference main.py:95).

    ``exp``: lr·gamma^epoch (load_utils.py:49-52).
    ``cosine``: warm restarts with period doubling (load_utils.py:53-60).
    """
    scheduler_cfg = scheduler_cfg or {}
    name = scheduler_cfg.get("name", "exp")
    spe = max(1, steps_per_epoch)
    if name == "exp":
        gamma = scheduler_cfg.get("lr_gamma", 0.97)
        return optax.exponential_decay(
            base_lr, transition_steps=spe, decay_rate=gamma, staircase=True)
    if name == "cosine":
        t0 = scheduler_cfg.get("T_0", 10)
        mult = scheduler_cfg.get("T_mult", 2)
        eta_min = scheduler_cfg.get("eta_min", base_lr * 0.01)
        schedules, boundaries, start, period = [], [], 0, t0
        for _ in range(8):  # 8 restart cycles is > any practical epoch count
            schedules.append(optax.cosine_decay_schedule(
                base_lr - eta_min, decay_steps=period * spe))
            start += period * spe
            boundaries.append(start)
            period *= mult
        sched = optax.join_schedules(schedules, boundaries[:-1])
        # snap to epoch boundaries: the reference steps its scheduler once
        # per EPOCH (load_utils.py:53-60), so the LR must hold constant
        # within an epoch (exp gets this via staircase=True above)
        return lambda count: sched((count // spe) * spe) + eta_min
    raise ValueError(f"unknown scheduler {name!r}")


def create_train_state(model: CurveCloudNet, example: Batch, rng: jax.Array,
                       schedule: optax.Schedule,
                       weight_decay: float = 0.0) -> TrainState:
    variables = jax.jit(
        lambda c, cats: model.init({"params": rng, "dropout": rng}, c, cats,
                                   train=False, key=rng)
    )(example.cloud, example.categories)
    tx = optax.adam(schedule) if weight_decay == 0 else optax.adamw(
        schedule, weight_decay=weight_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


@dataclasses.dataclass(frozen=True)
class LossConfig:
    task: str = "segmentation"          # or "classification"
    ignore_index: Optional[int] = 0
    use_lovasz: bool = False
    lovasz_weight: float = 1.0
    mean_over_all: bool = False          # KITTI NLL semantics
    has_class_weights: bool = False


def _compute_loss(logits, out_valid, batch: Batch, cfg: LossConfig,
                  class_weights):
    if cfg.task == "classification":
        return losses_lib.classification_loss(logits[:, 0, :], batch.labels)
    lv = batch.label_valid if batch.label_valid is not None else out_valid
    return losses_lib.seg_loss(
        logits, batch.labels, lv & out_valid, ignore_index=cfg.ignore_index,
        use_lovasz=cfg.use_lovasz, lovasz_weight=cfg.lovasz_weight,
        class_weights=class_weights, mean_over_all=cfg.mean_over_all)


def build_train_step(model: CurveCloudNet, cfg: LossConfig,
                     class_weights=None) -> Callable:
    """The raw (unjitted) training step: (state, batch, key, bn_momentum).

    Jit directly for single-chip, or wrap with
    ``parallel.mesh.sharded_train_step`` for mesh data parallelism.
    """

    def train_step(state: TrainState, batch: Batch, key: jax.Array,
                   bn_momentum: jax.Array):
        dropout_key, model_key = jax.random.split(key)

        def loss_fn(params):
            (logits, out_valid), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.cloud, batch.categories, train=True,
                bn_momentum=bn_momentum, key=model_key,
                rngs={"dropout": dropout_key}, mutable=["batch_stats"])
            loss = _compute_loss(logits, out_valid, batch, cfg, class_weights)
            return loss, (mut["batch_stats"], logits, out_valid)

        (loss, (new_bs, logits, out_valid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {"loss": loss}
        if cfg.task == "classification":
            pred = jnp.argmax(logits[:, 0, :], axis=-1)
            metrics["acc"] = jnp.mean(pred == batch.labels)
        return new_state, metrics

    return train_step


def make_train_step(model: CurveCloudNet, cfg: LossConfig,
                    class_weights=None, donate: bool = True) -> Callable:
    """Single-chip jitted training step."""
    step = build_train_step(model, cfg, class_weights)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: CurveCloudNet, cfg: LossConfig,
                   class_weights=None) -> Callable:
    """Jitted eval step returning (logits, out_valid, loss)."""

    def eval_step(state: TrainState, batch: Batch):
        logits, out_valid = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.cloud, batch.categories, train=False,
            key=jax.random.PRNGKey(0))
        loss = _compute_loss(logits, out_valid, batch, cfg, class_weights)
        return logits, out_valid, loss

    return jax.jit(eval_step)


def bn_momentum_for_epoch(epoch: int, decay: float = 0.97,
                          initial: float = 0.1, floor: float = 0.01) -> float:
    """Reference BN momentum decay (main.py:144-146)."""
    return max(floor, initial * decay ** epoch)
