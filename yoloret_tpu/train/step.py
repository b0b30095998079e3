"""The jitted training step — TPU-native replacement for the reference's
``AdvLossModel._train_step`` / ``_distributed_epoch``
(reference: code/yolo3/train.py:18-75).

One pure function of (state, batch) that runs forward (bf16-capable),
the three-scale GIoU/BCE loss, backward, the partitioned optimizer
update, BatchNorm statistics updates, optional EMA of the weights
(decay 0.9999, reference :42-45), and optional FGSM-style adversarial
regularization (the reference's neural-structured-learning adversarial
loss: multiplier 0.2, step 0.2, inf-norm, reference :22-35,90-91).

Data parallelism is not in this file: the step is shard-agnostic. Jit it
with a batch sharded over the mesh's ``data`` axis (parallel/mesh.py)
and replicated state, and XLA inserts the gradient all-reduce over ICI —
the pjit equivalent of ``strategy.run`` + implicit NCCL all-reduce
(reference: code/yolo3/train.py:66-70).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from yoloret_tpu.train.losses import yolo_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx, use_ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        )


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static knobs baked into the compiled step."""

    anchors: Tuple[Tuple[float, float], ...]
    num_scales: int = 3
    ignore_thresh: float = 0.5
    box_loss: str = "giou"
    class_loss_kind: str = "bce"  # or "focal"
    backbone_train: bool = True  # False in stage 1 (frozen backbone BN)
    use_adv: bool = False  # adversarial regularization (reference :90-91)
    adv_multiplier: float = 0.2
    adv_step: float = 0.2
    ema_decay: float = 0.9999


def _loss_for_images(model_vars, apply_fn, images, batch, cfg, rngs):
    outs, mutated = apply_fn(
        model_vars,
        images,
        True,
        cfg.backbone_train,
        mutable=["batch_stats"],
        rngs=rngs,
    )
    total, parts = yolo_loss(
        outs,
        (batch["y_true_0"], batch["y_true_1"], batch["y_true_2"])[: cfg.num_scales],
        batch["gt_boxes"],
        batch["gt_valid"],
        jnp.asarray(cfg.anchors, jnp.float32),
        num_scales=cfg.num_scales,
        ignore_thresh=cfg.ignore_thresh,
        box_loss=cfg.box_loss,
        class_loss_kind=cfg.class_loss_kind,
    )
    return total, (parts, mutated)


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    cfg: StepConfig,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. ``batch`` keys: images [B,H,W,3] f32 in [0,1],
    y_true_{0,1,2} dense targets, gt_boxes [B,T,4], gt_valid [B,T]."""
    rngs = {"dropout": jax.random.fold_in(rng, state.step)}
    model_vars = {"params": state.params, "batch_stats": state.batch_stats}
    images = batch["images"]

    def loss_fn(params, imgs):
        return _loss_for_images(
            {"params": params, "batch_stats": state.batch_stats},
            state.apply_fn, imgs, batch, cfg, rngs,
        )

    if cfg.use_adv:
        # FGSM perturbation of the input (inf-norm sign step), as the
        # reference's nsl.keras.adversarial_loss configuration does.
        g_img = jax.grad(lambda im: loss_fn(state.params, im)[0])(images)
        adv_images = images + cfg.adv_step * jnp.sign(g_img)
        adv_images = jnp.clip(adv_images, 0.0, 1.0)

        def total_loss_fn(params):
            base, (parts, mutated) = loss_fn(params, images)
            adv, _ = loss_fn(params, adv_images)
            return base + cfg.adv_multiplier * adv, (parts, mutated, base)
    else:

        def total_loss_fn(params):
            base, (parts, mutated) = loss_fn(params, images)
            return base, (parts, mutated, base)

    (total, (parts, mutated, base)), grads = jax.value_and_grad(
        total_loss_fn, has_aux=True
    )(state.params)

    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    new_ema = state.ema_params
    if new_ema is not None:
        # Warmed-up decay: min(decay, (1+t)/(10+t)) — the num_updates
        # schedule of tf.train.ExponentialMovingAverage. Without it a
        # 0.9999 decay leaves the EMA dominated by the random init for
        # the first ~30k steps.
        t = state.step.astype(jnp.float32)
        d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
        new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params)

    metrics = {
        "loss": base,
        "loss_total": total,
        "box_loss": sum(p.box for p in parts),
        "conf_loss": sum(p.confidence for p in parts),
        "class_loss": sum(p.classification for p in parts),
    }
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=mutated["batch_stats"],
        opt_state=new_opt_state,
        ema_params=new_ema,
    )
    return new_state, metrics


def eval_step(
    state: TrainState, batch: Dict[str, jnp.ndarray], cfg: StepConfig
) -> Dict[str, jnp.ndarray]:
    """Validation loss with frozen statistics (the reference's val pass,
    code/yolo3/train.py:102-118)."""
    outs = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"],
        False,
    )
    total, _ = yolo_loss(
        outs,
        (batch["y_true_0"], batch["y_true_1"], batch["y_true_2"])[: cfg.num_scales],
        batch["gt_boxes"],
        batch["gt_valid"],
        jnp.asarray(cfg.anchors, jnp.float32),
        num_scales=cfg.num_scales,
        ignore_thresh=cfg.ignore_thresh,
        box_loss=cfg.box_loss,
        class_loss_kind=cfg.class_loss_kind,
    )
    return {"val_loss": total}


def make_jit_train_step(cfg: StepConfig):
    """Close over the static config so jit sees only arrays."""
    return jax.jit(partial(train_step, cfg=cfg), donate_argnums=(0,))


def cosine_lr_schedule(base_lr: float, epochs: int, steps_per_epoch: int):
    """Per-EPOCH cosine decay, matching the reference's
    LearningRateScheduler(CosineDecay(lr, epochs)) granularity
    (reference: code/train.py:92-100)."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        frac = epoch.astype(jnp.float32) / float(epochs)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule
