"""Training orchestration — the ``train()`` driver
(reference: code/train.py:20-218), TPU-native.

Two-stage schedule exactly as the reference:
  * stage 1 (``freeze=True``): backbone frozen (optimizer partition +
    inference-mode backbone BN), Adam(lr[0], eps=1e-8), per-epoch cosine
    decay over epochs[0]; saves ``<backbone>_trained_weights_stage_1``.
  * stage 2 (``freeze=False`` + ``train_unfreeze=<ckpt>``): all params
    trainable, Adam(lr[1]); saves ``<backbone>_trained_weights_final``.

Data parallelism: one (data, model) mesh; the batch dict is sharded over
``data`` and the TrainState replicated, XLA inserts the grad all-reduce
(see parallel/mesh.py). Periodic checkpoints + best-val retention via
Orbax (utils/checkpoint.py). Per-50-batch loss prints match the
reference's telemetry (code/yolo3/train.py:72-73). Metrics stream to
``<log_dir>/metrics.jsonl``.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial


import jax
import jax.numpy as jnp
import numpy as np
import optax

from yoloret_tpu.configs import RunConfig
from yoloret_tpu.data import Dataset, DatasetMode, load_anchors, load_classes
from yoloret_tpu.nn import build_detector
from yoloret_tpu.parallel import batch_sharding, make_mesh, replicate
from yoloret_tpu.train.freeze import backbone_freeze_mask, make_frozen_optimizer
from yoloret_tpu.train.step import (
    StepConfig,
    TrainState,
    cosine_lr_schedule,
    eval_step,
    train_step,
)
from yoloret_tpu.utils.checkpoint import CheckpointManager, load_params, save_params


class EarlyStopper:
    """val_loss early stopping (reference code/train.py:101-105:
    ``EarlyStopping(monitor='val_loss', min_delta=0, patience=epochs//2)``).
    ``update()`` returns True when the stage should stop."""

    def __init__(self, patience: int):
        self.patience = max(1, int(patience))
        self.best = float("inf")
        self.stale = 0

    def update(self, val_loss: float) -> bool:
        if not np.isfinite(val_loss):
            # NaN/inf params never recover — stop the stage now rather
            # than burn the remaining epochs (deviation from Keras, which
            # would wait out `patience`; documented in docs/parity.md)
            return True
        if val_loss < self.best:
            self.best, self.stale = val_loss, 0
            return False
        self.stale += 1
        return self.stale >= self.patience


def train(cfg: RunConfig) -> str:
    """Run one training stage; returns the path of the saved weights."""
    assert cfg.train_dataset and cfg.classes_path and cfg.anchors_path, (
        "train_dataset, classes_path and anchors_path are required"
    )
    class_names = load_classes(cfg.classes_path)
    num_classes = len(class_names)
    anchors = load_anchors(cfg.anchors_path)
    stage = 1 if cfg.freeze else 2
    epochs = cfg.epochs[0] if cfg.freeze else cfg.epochs[1]
    lr = cfg.learning_rate[0] if cfg.freeze else cfg.learning_rate[1]

    if cfg.multihost:
        # Multi-host DP over DCN: same mesh code, devices span all hosts
        # (replaces the reference's TPUClusterResolver path,
        # code/train.py:48-53).
        jax.distributed.initialize()
    mesh = make_mesh(data=cfg.mesh_data)
    n_data = mesh.shape["data"]
    global_batch = cfg.batch_size * n_data  # reference train.py:56
    data_shard, repl = batch_sharding(mesh), replicate(mesh)

    log_dir = os.path.join(cfg.log_dir, f"{cfg.backbone}_stage{stage}")
    os.makedirs(log_dir, exist_ok=True)
    metrics_path = os.path.join(log_dir, "metrics.jsonl")

    aug_override = None
    if cfg.augment:
        from yoloret_tpu.data import AugmentConfig

        aug_override = AugmentConfig(**cfg.augment)
    # Multi-scale schedule: one Dataset (and compiled step) per size,
    # round-robin per epoch; weights are size-agnostic (fully-conv).
    train_sizes = [tuple(cfg.input_size)]
    if cfg.multi_scale:
        train_sizes = [(int(s), int(s)) for s in cfg.multi_scale]
        assert all(h % 32 == 0 for h, _ in train_sizes), "sizes must be /32"
    # Per-host input sharding: every process replays the same global RNG
    # stream but decodes only its batch_size*local/global row slice
    # (host decode cost scales 1/n_hosts; the round-2 design had every
    # host decoding the full global batch).
    train_dss = [
        Dataset(
            cfg.train_dataset, global_batch, anchors, num_classes,
            input_hw=hw, num_scales=cfg.num_scales,
            max_boxes=cfg.max_boxes, seed=cfg.seed, augment_config=aug_override,
            aa_policy=cfg.autoaugment_policy,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        for hw in train_sizes
    ]
    train_ds = train_dss[0]
    val_ds = None
    if cfg.val_dataset:
        val_ds = Dataset(
            cfg.val_dataset, global_batch, anchors, num_classes,
            input_hw=tuple(cfg.input_size), num_scales=cfg.num_scales,
            max_boxes=cfg.max_boxes, mode=DatasetMode.VALIDATE, seed=cfg.seed,
        )
    # mAP-during-training: the reference builds MAPCallback as a training
    # callback (code/yolo3/map.py:237-248; mis-wired at train.py:69-70 but
    # clearly intended). Here: every `map_every` epochs + once at stage end.
    map_ds = None
    if cfg.test_dataset:
        map_ds = Dataset(
            cfg.test_dataset, global_batch, anchors, num_classes,
            input_hw=tuple(cfg.input_size), num_scales=cfg.num_scales,
            max_boxes=cfg.max_boxes, mode=DatasetMode.TEST, seed=cfg.seed,
        )
    steps_per_epoch = train_ds.steps_per_epoch()

    model = build_detector(
        cfg.backbone, num_classes=num_classes,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        remat=cfg.remat, rfcr=cfg.rfcr,
    )
    rng = jax.random.PRNGKey(cfg.seed)
    variables = model.init(
        rng, jnp.zeros((1, *cfg.input_size, 3), jnp.float32), False
    )
    # Load weights: stage 2 resumes the stage-1 checkpoint
    # (reference train.py:191-193); --model is a generic warm start.
    # Restore WITHOUT a target tree and subset: the source may carry
    # extra keys (e.g. ema_params from a use_ema stage 1) that a strict
    # `like=` restore rejects.
    init_path = cfg.train_unfreeze if not cfg.freeze else cfg.model
    if init_path:
        restored = load_params(init_path)
        variables = {
            "params": jax.tree.map(jnp.asarray, restored["params"]),
            "batch_stats": jax.tree.map(jnp.asarray, restored["batch_stats"]),
        }

    schedule = cosine_lr_schedule(lr, epochs, steps_per_epoch)
    base_tx = optax.adam(schedule, eps=1e-8)  # reference train.py:158
    if cfg.freeze:
        labels = backbone_freeze_mask(
            variables["params"], upto_block=cfg.truncate_block
        )
        tx = make_frozen_optimizer(base_tx, labels)
    else:
        tx = base_tx
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx,
        use_ema=cfg.use_ema,
    )
    state = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, state
    )

    step_cfg = StepConfig(
        anchors=tuple(map(tuple, anchors.tolist())),
        num_scales=cfg.num_scales,
        ignore_thresh=cfg.ignore_thresh,
        box_loss=cfg.box_loss,
        class_loss_kind=cfg.class_loss,
        backbone_train=not cfg.freeze,
        use_adv=cfg.use_adv,
        ema_decay=cfg.ema_decay,
    )
    jit_train = jax.jit(
        partial(train_step, cfg=step_cfg),
        in_shardings=(repl, data_shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    jit_eval = jax.jit(
        partial(eval_step, cfg=step_cfg), in_shardings=(repl, data_shard)
    )

    ckpt = CheckpointManager(os.path.join(log_dir, "ckpt"), every=cfg.checkpoint_every)
    start_epoch = 0
    stopper = None
    if cfg.early_stopping:
        stopper = EarlyStopper(cfg.early_stopping_patience or epochs // 2)

    def _ckpt_tree():
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema_params is not None:
            tree["ema_params"] = state.ema_params
        if stopper is not None:
            # plain python scalars: orbax's standard handler accepts
            # float/int (np.float64 passes as a float subclass but
            # np.int64 is NOT an int subclass and is rejected)
            tree["stopper"] = {
                "best": float(stopper.best),
                "stale": int(stopper.stale),
            }
        return tree

    if cfg.resume:
        latest = ckpt.latest_epoch()
        if latest is not None:
            restored = ckpt.restore(latest, _ckpt_tree())
            state = state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=restored["step"],
                ema_params=restored.get("ema_params", state.ema_params),
            )
            if stopper is not None and "stopper" in restored:
                stopper.best = float(restored["stopper"]["best"])
                stopper.stale = int(restored["stopper"]["stale"])
            start_epoch = latest + 1
            print(f"resumed from epoch {latest} checkpoint")
    step_rng = jax.random.PRNGKey(cfg.seed + 1)
    mfile = open(metrics_path, "a")
    from yoloret_tpu.utils.tensorboard import SummaryWriter

    tb = SummaryWriter(os.path.join(log_dir, "tb"))

    print(
        f"stage {stage}: {cfg.backbone} @{cfg.input_size}, "
        f"{n_data}-way DP, global batch {global_batch}, "
        f"{steps_per_epoch} steps/epoch x {epochs} epochs"
    )
    from yoloret_tpu.parallel import device_prefetch

    # Step-accurate resume: each dataset's stream fast-forwards past the
    # batches its completed epochs consumed (epoch e draws from iterator
    # e % len(train_dss)), so a resumed run sees exactly the batches the
    # uninterrupted run would have — not an epoch-0 replay.
    train_iters = [
        device_prefetch(
            ds.build(
                epochs=None,
                skip_batches=steps_per_epoch
                * sum(1 for e in range(start_epoch) if e % len(train_dss) == i),
            ),
            data_shard, size=2, local_data=jax.process_count() > 1,
        )
        for i, ds in enumerate(train_dss)
    ]

    def _eval_map(epoch: int) -> float:
        from yoloret_tpu.eval import evaluate_map

        # With --use_ema the evaluated (and stage-end saved) weights are
        # the EMA copy — the intended consumption of the reference's
        # ExponentialMovingAverage (code/yolo3/train.py:42-45, which
        # maintains the average but never reads it back).
        eval_params = (
            state.ema_params
            if cfg.use_ema and state.ema_params is not None
            else state.params
        )
        mAP, _ = evaluate_map(
            model,
            {"params": eval_params, "batch_stats": state.batch_stats},
            map_ds, anchors, class_names,
            nms_iou=cfg.nms_iou, verbose=False, mesh=mesh,
        )
        rec = {"epoch": epoch, "mAP": mAP}
        print(json.dumps(rec))
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()
        tb.add_scalar("mAP", mAP, epoch)
        tb.flush()
        return mAP

    jit_detect = None
    if cfg.tb_images > 0:
        from yoloret_tpu.ops import detect_batch

        anchors_j = jnp.asarray(anchors, jnp.float32)

        @jax.jit
        def jit_detect(params, batch_stats, images):
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats}, images, False
            )
            hw = jnp.broadcast_to(
                jnp.asarray(images.shape[1:3], jnp.float32),
                (images.shape[0], 2),
            )
            return detect_batch(
                outs, anchors_j, num_classes=num_classes, image_hw=hw,
                score_threshold=0.3, iou_threshold=cfg.nms_iou,
            )

    def _tb_images(epoch: int, images) -> None:
        """Write augmented inputs with current-model detections drawn
        (write_images parity, reference code/train.py:71-73)."""
        from PIL import Image

        from yoloret_tpu.infer.predictor import Detection, draw_detections

        n = min(cfg.tb_images, images.shape[0])
        res = jit_detect(state.params, state.batch_stats, images[:n])
        boxes = np.asarray(res.boxes)
        scores = np.asarray(res.scores)
        classes = np.asarray(res.classes)
        valid = np.asarray(res.valid)
        imgs = np.asarray(images[:n])
        for i in range(n):
            u8 = (np.clip(imgs[i], 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
            dets = [
                Detection(
                    (float(b[1]), float(b[0]), float(b[3]), float(b[2])),
                    float(s), int(c), class_names[int(c)],
                )
                for b, s, c in zip(
                    boxes[i][valid[i]], scores[i][valid[i]], classes[i][valid[i]]
                )
            ]
            pil = draw_detections(Image.fromarray(u8), dets, class_names)
            tb.add_image(f"train_input/{i}", np.asarray(pil), epoch)
        tb.flush()

    epoch = max(start_epoch, epochs) - 1  # stage-end epoch if loop is empty
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        it = train_iters[epoch % len(train_iters)]
        if len(train_iters) > 1:
            print(f"epoch {epoch}: input size {train_sizes[epoch % len(train_sizes)]}")
        # Keep losses as device scalars — a float() per step would force a
        # sync and serialize the input pipeline against the device.
        losses = []
        for bstep in range(steps_per_epoch):
            batch = next(it)
            state, m = jit_train(state, batch, step_rng)
            losses.append(m["loss"])
            if (bstep + 1) % 50 == 0:  # reference yolo3/train.py:72-73
                print(
                    f"epoch {epoch} step {bstep + 1}/{steps_per_epoch} "
                    f"loss {float(losses[-1]):.4f}"
                )
        train_loss = float(jnp.mean(jnp.stack(losses)))

        val_loss = float("nan")
        if val_ds is not None:
            vtotal, vn = 0.0, 0
            loss_keys = ("images", "gt_boxes", "gt_valid") + tuple(
                f"y_true_{l}" for l in range(cfg.num_scales)
            )
            for vbatch in device_prefetch(val_ds.build(epochs=1), data_shard, size=2):
                vbatch = {k: vbatch[k] for k in loss_keys}
                vtotal += float(jit_eval(state, vbatch)["val_loss"])
                vn += 1
            val_loss = vtotal / max(vn, 1)

        dt = time.time() - t0
        lr_now = float(schedule(jnp.asarray(epoch * steps_per_epoch)))
        rec = {
            "epoch": epoch, "loss": train_loss, "val_loss": val_loss,
            "lr": lr_now, "sec": round(dt, 2),
            "images_per_sec": round(global_batch * steps_per_epoch / dt, 1),
        }
        print(json.dumps(rec))
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()
        tb.add_scalar("loss", train_loss, epoch)
        if np.isfinite(val_loss):
            tb.add_scalar("val_loss", val_loss, epoch)
        tb.add_scalar("lr", lr_now, epoch)
        tb.flush()
        ckpt.maybe_save(
            epoch,
            _ckpt_tree(),
            val_loss if np.isfinite(val_loss) else train_loss,
        )
        if jit_detect is not None:
            _tb_images(epoch, batch["images"])
        if map_ds is not None and cfg.map_every > 0 and (epoch + 1) % cfg.map_every == 0:
            _eval_map(epoch)
        if stopper is not None:
            # With no val split the monitored metric never exists
            # (Keras EarlyStopping would warn and no-op,
            # reference train.py:101-105); keep only the divergence
            # guard on train_loss there — the stopper's NaN-stop rule
            # is for a genuinely diverged val evaluation.
            if val_ds is not None:
                should_stop = stopper.update(val_loss)
            else:
                should_stop = not np.isfinite(train_loss)
            if should_stop:
                print(
                    f"early stopping at epoch {epoch}: val_loss has not "
                    f"improved for {stopper.patience} epochs "
                    f"(best {stopper.best:.4f})"
                )
                break

    if map_ds is not None:
        mAP = _eval_map(epoch)
        print(f"stage-end mAP: {mAP:.4f}")

    suffix = "stage_1" if cfg.freeze else "final"
    out = os.path.join(log_dir, f"{cfg.backbone}_trained_weights_{suffix}")
    tree = {"params": state.params, "batch_stats": state.batch_stats}
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    save_params(out, tree)
    ckpt.close()
    mfile.close()
    tb.close()
    print(f"saved {out}")
    return out
