"""Ablation study for the paper's two scientific contributions.

YOLO-ReT's claims (reference: paper + code/yolo3/model.py):
  1. RFCR — the learned WeightedSum collect/redistribute fusion
     (model.py:117-168) beats both a plain concat fusion (the legacy
     scarf proto-RFCR, model_computations.py:229-319) and no fusion at
     all (backbone taps straight to the neck).
  2. Truncated transfer learning (model.py:219-224) — stage-1 training
     with a frozen imported backbone, then unfreezing, beats training
     the same architecture from random init.

The reference never ships an ablation harness; its evidence is the
paper's VOC/COCO tables, which need ImageNet weights and real datasets
(both absent from this container). This module measures the same two
effects in-environment on the calibrated crowded-synthetic recipe
(tools/topk_study.py::crowded_train_cfg — the shared partial-convergence
recipe of the accuracy gate), with the device topology pinned per run
(see tools/accuracy_gate.py for why), evaluating both train-set fit and
a held-out set drawn from the same generator.

For the transfer ablation the "imported" backbone is a surrogate: a
detector pretrained on a LARGER disjoint synthetic set (seed 7), whose
backbone subtree is grafted into a fresh init — exactly the mechanism
of `utils/keras_import.py` (which is separately bitwise-tested against
Keras H5s) with an in-environment source of pretrained values. The
target task is low-data (16 images) so transfer has something to do.
Both arms get the same total target-task epoch budget (stage1 30 +
stage2 60 vs 90 unfrozen).

Usage (driver — runs every job in a pinned-topology subprocess,
resumable via results.jsonl):

    nohup python -m yoloret_tpu.tools.ablation --root /tmp/abl \
        --seeds 0 1 > /tmp/abl.log 2>&1 &

Single job (what the driver spawns; topology must be pinned by caller):

    python -m yoloret_tpu.tools.ablation --job rfcr --fusion concat \
        --seed 0 --workdir /tmp/abl/rfcr-concat-s0

Results land in `<root>/results.jsonl`; the driver prints a markdown
table at the end (paste into docs/design.md when the numbers move).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

FUSIONS = ("weighted_sum", "concat", "none")
BACKBONE = "mobilenetv2x75"
SIZE = 160
BATCH = 8


# ---------------------------------------------------------------- data


# Scale-diverse bands (px at 160x160 input), chosen so best-shape-IoU
# anchor matching (ops/targets.py, reference model.py:237-247) assigns
# each band to a DIFFERENT detection scale under the COCO anchor ladder:
#   small  12-26  -> anchors {10,13 / 16,30 / 33,23}   -> /8  head
#   medium 40-72  -> anchors {30,61 / 62,45 / 59,119}  -> /16 head
#   large  96-144 -> anchors {116,90 / 156,198}        -> /32 head
# The round-4 crowded recipe (uniform 18-48 px) put ~everything on the
# /8 and /16 heads — a task where RFCR's cross-scale redistribution has
# little to do, which is why fusion-vs-none measured below seed noise
# (VERDICT r4 weak #2). This generator gives every scale real ownership.
SD_BANDS = (("large", 96, 145, 1), ("medium", 40, 73, 2),
            ("small", 12, 27, 3))


def build_scalediverse(root: str, n: int = 48, hw=(160, 160), seed: int = 0):
    """Scale-diverse scenes: per image 1 large + 2 medium + 3 small
    rectangles of the 4 color classes, drawn large->small so the small
    ones stay visible. Class is resampled when a box would be invisible
    against the same-color region it covers."""
    import os as _os

    import numpy as np
    from PIL import Image

    from yoloret_tpu.tools.topk_study import CLASS_COLORS, CLASS_NAMES

    rng = np.random.RandomState(seed)
    h, w = hw
    lines = []
    for i in range(n):
        arr = np.full((h, w, 3), 24, np.uint8)
        boxes = []
        for _band, lo, hi, count in SD_BANDS:
            for _ in range(count):
                bw = int(rng.randint(lo, hi))
                bh = int(rng.randint(lo, hi))
                x = int(rng.randint(0, w - bw))
                y = int(rng.randint(0, h - bh))
                c = int(rng.randint(0, len(CLASS_COLORS)))
                under = arr[y + bh // 2, x + bw // 2]
                if tuple(under) == CLASS_COLORS[c]:
                    c = (c + 1) % len(CLASS_COLORS)
                arr[y : y + bh, x : x + bw] = CLASS_COLORS[c]
                boxes.append((x, y, x + bw, y + bh, c))
        p = _os.path.join(root, f"sd{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        lines.append(
            p + " " + " ".join(",".join(map(str, b)) for b in boxes)
        )
    ann = _os.path.join(root, f"sd_train_{n}.txt")
    with open(ann, "w") as f:
        f.write("\n".join(lines) + "\n")
    classes = _os.path.join(root, "classes.txt")
    with open(classes, "w") as f:
        f.write("\n".join(CLASS_NAMES) + "\n")
    anchors = _os.path.join(root, "anchors.txt")
    with open(anchors, "w") as f:
        f.write("10,13, 16,30, 33,23, 30,61, 62,45, 59,119, "
                "116,90, 156,198, 373,326\n")
    return ann, classes, anchors


def _sd_datasets(workdir: str):
    """Scale-diverse train (48 img, seed 0) + held-out (32 img, seed 3)."""
    train_dir = os.path.join(workdir, "sddata")
    held_dir = os.path.join(workdir, "sdheldout")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(held_dir, exist_ok=True)
    ann, classes, anchors = build_scalediverse(train_dir, n=48, seed=0)
    held_ann, _, _ = build_scalediverse(held_dir, n=32, seed=3)
    return ann, held_ann, classes, anchors


def _datasets(workdir: str):
    """Shared train (48 img, seed 0) + held-out (32 img, seed 3) sets —
    same generator and distribution, disjoint draws."""
    from yoloret_tpu.tools.topk_study import build_crowded

    train_dir = os.path.join(workdir, "data")
    held_dir = os.path.join(workdir, "heldout")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(held_dir, exist_ok=True)
    ann, classes, anchors = build_crowded(train_dir, n=48, seed=0)
    held_ann, _, _ = build_crowded(held_dir, n=32, seed=3)
    return ann, held_ann, classes, anchors


def _small_datasets(workdir: str):
    """Low-data target task for the transfer ablation: 16 train images
    (transfer only matters when the target task is data-poor)."""
    from yoloret_tpu.tools.topk_study import build_crowded

    train_dir = os.path.join(workdir, "data16")
    held_dir = os.path.join(workdir, "heldout")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(held_dir, exist_ok=True)
    ann, classes, anchors = build_crowded(train_dir, n=16, seed=0)
    held_ann, _, _ = build_crowded(held_dir, n=32, seed=3)
    return ann, held_ann, classes, anchors


def _eval_map(weights: str, ann: str, anchors_path: str,
              fusion: str = "weighted_sum") -> float:
    from yoloret_tpu.data import Dataset, DatasetMode, load_anchors
    from yoloret_tpu.eval import evaluate_map
    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.tools.topk_study import CLASS_NAMES

    anchors = load_anchors(anchors_path)
    pred = Predictor(
        backbone=BACKBONE, weights=weights, class_names=CLASS_NAMES,
        anchors=anchors, input_hw=(SIZE, SIZE), score_threshold=0.0,
        bf16=False, rfcr=fusion,
    )
    ds = Dataset(
        ann, batch_size=BATCH, anchors=anchors,
        num_classes=len(CLASS_NAMES), input_hw=(SIZE, SIZE),
        mode=DatasetMode.TEST, max_boxes=12,
    )
    mAP, _ = evaluate_map(
        pred.model, pred.variables, ds, anchors, CLASS_NAMES, verbose=False
    )
    return float(mAP)


# ---------------------------------------------------------------- jobs


def job_rfcr(workdir: str, fusion: str, seed: int) -> dict:
    """One RFCR-fusion arm on the standard gate recipe (48 img, 60 ep)."""
    from yoloret_tpu.tools.topk_study import crowded_train_cfg
    from yoloret_tpu.train.trainer import train

    ann, held_ann, classes, anchors = _datasets(workdir)
    cfg = crowded_train_cfg(workdir, ann, classes, anchors,
                            epochs=60, size=SIZE, batch=BATCH)
    cfg = cfg.replace(rfcr=fusion, seed=seed)
    weights = train(cfg)
    return {
        "train_mAP": round(_eval_map(weights, ann, anchors, fusion), 6),
        "heldout_mAP": round(_eval_map(weights, held_ann, anchors, fusion), 6),
        "weights": weights,
    }


def job_rfcr_sd(workdir: str, fusion: str, seed: int) -> dict:
    """One RFCR-fusion arm on the SCALE-DIVERSE recipe (48 img, 60 ep):
    the round-5 redesign of the fusion-vs-none experiment — objects own
    all three detection scales, so cross-scale redistribution
    (reference model.py:117-168) has measurable work to do."""
    from yoloret_tpu.tools.topk_study import crowded_train_cfg
    from yoloret_tpu.train.trainer import train

    ann, held_ann, classes, anchors = _sd_datasets(workdir)
    cfg = crowded_train_cfg(workdir, ann, classes, anchors,
                            epochs=60, size=SIZE, batch=BATCH)
    cfg = cfg.replace(rfcr=fusion, seed=seed)
    weights = train(cfg)
    return {
        "train_mAP": round(_eval_map(weights, ann, anchors, fusion), 6),
        "heldout_mAP": round(_eval_map(weights, held_ann, anchors, fusion), 6),
        "weights": weights,
    }


def job_ema(workdir: str, seed: int, decay: float = 0.9999,
            epochs: int = 60) -> dict:
    """Gate recipe with --use_ema: measures what evaluating the EMA copy
    buys over the raw params (the reference maintains the average but
    never consumes it, code/yolo3/train.py:42-45). ``decay`` sizes the
    averaging horizon: the reference's 0.9999 (~10k-step horizon) can
    never warm up on the 360-step gate recipe (round-4 measurement:
    -0.01 mAP); a schedule-matched decay (horizon ~ last third of
    training) is the fair test of whether the average HELPS.

    CAVEAT (round-5 measurement): the num_updates warm-up ramp
    min(decay, (1+t)/(10+t)) dominates any decay >= (1+T)/(10+T) for a
    T-step run — on the 360-step recipe that is every decay >= 0.976,
    so d=0.99 reproduced the d=0.9999 run BITWISE. Decays must sit
    below the ramp's end value (or ``epochs`` must stretch the
    schedule) to measure anything new."""
    from yoloret_tpu.data import Dataset, DatasetMode, load_anchors
    from yoloret_tpu.eval import evaluate_map
    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.tools.topk_study import CLASS_NAMES, crowded_train_cfg
    from yoloret_tpu.train.trainer import train

    ann, held_ann, classes, anchors_path = _datasets(workdir)
    cfg = crowded_train_cfg(workdir, ann, classes, anchors_path,
                            epochs=epochs, size=SIZE, batch=BATCH)
    cfg = cfg.replace(use_ema=True, ema_decay=decay, seed=seed)
    weights = train(cfg)

    anchors = load_anchors(anchors_path)
    out = {"weights": weights}
    for name, use_ema in (("raw", False), ("ema", True)):
        pred = Predictor(
            backbone=BACKBONE, weights=weights, class_names=CLASS_NAMES,
            anchors=anchors, input_hw=(SIZE, SIZE), score_threshold=0.0,
            bf16=False, use_ema=use_ema,
        )
        for tag, a in (("train", ann), ("heldout", held_ann)):
            ds = Dataset(
                a, batch_size=BATCH, anchors=anchors,
                num_classes=len(CLASS_NAMES), input_hw=(SIZE, SIZE),
                mode=DatasetMode.TEST, max_boxes=12,
            )
            mAP, _ = evaluate_map(pred.model, pred.variables, ds, anchors,
                                  CLASS_NAMES, verbose=False)
            out[f"{name}_{tag}_mAP"] = round(float(mAP), 6)
    return out


def job_pretrain(workdir: str, seed: int = 7) -> dict:
    """Surrogate 'ImageNet' source: a detector trained on a larger
    disjoint synthetic set; only its backbone subtree is transferred."""
    from yoloret_tpu.tools.topk_study import build_crowded, crowded_train_cfg
    from yoloret_tpu.train.trainer import train

    pre_dir = os.path.join(workdir, "pretrain_data")
    os.makedirs(pre_dir, exist_ok=True)
    ann, classes, anchors = build_crowded(pre_dir, n=96, seed=seed)
    cfg = crowded_train_cfg(workdir, ann, classes, anchors,
                            epochs=60, size=SIZE, batch=BATCH)
    cfg = cfg.replace(seed=seed)
    weights = train(cfg)
    return {"weights": weights,
            "train_mAP": round(_eval_map(weights, ann, anchors), 6)}


def _graft_backbone(pretrained: str, seed: int, out_path: str) -> str:
    """Fresh init with ONLY the backbone subtree replaced by the
    pretrained values — the truncated-transfer import mechanism
    (reference model.py:219-224 loads backbone weights by name; here the
    'body' collection subtree), heads/RFCR/neck stay random."""
    import jax
    import jax.numpy as jnp

    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.tools.topk_study import CLASS_NAMES
    from yoloret_tpu.utils.checkpoint import load_params, save_params

    model = build_detector(BACKBONE, num_classes=len(CLASS_NAMES))
    fresh = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, SIZE, SIZE, 3)), False
    )
    src = load_params(pretrained)
    params = dict(fresh["params"])
    params["body"] = jax.tree.map(jnp.asarray, src["params"]["body"])
    stats = dict(fresh["batch_stats"])
    if "body" in src["batch_stats"]:
        stats["body"] = jax.tree.map(jnp.asarray, src["batch_stats"]["body"])
    save_params(out_path, {"params": params, "batch_stats": stats})
    return out_path


def job_transfer(workdir: str, arm: str, seed: int, pretrained: str) -> dict:
    """One transfer arm on the low-data target task, equal STEP budget:
      transfer: graft pretrained backbone -> stage1 frozen 30 ep ->
                stage2 unfrozen 60 ep (the reference's two-stage recipe,
                code/train.py:153-216)
      random:   random init, unfrozen, 90 ep
    Batch is 4 (not the gate's 8): 16 images at batch 8 is 2 steps/epoch
    — 1/3 of the gate recipe's 360-step budget at equal epochs, which
    measured as pure underfitting (both arms stall at ~5x the gate's
    final loss, mAP 0.0). Batch 4 gives 4 steps/epoch, so the 90-epoch
    budget is 360 steps — step-equal to the gate recipe AND between
    arms."""
    from yoloret_tpu.tools.topk_study import crowded_train_cfg
    from yoloret_tpu.train.trainer import train

    ann, held_ann, classes, anchors = _small_datasets(workdir)
    base = crowded_train_cfg(workdir, ann, classes, anchors,
                             epochs=60, size=SIZE, batch=4)
    if arm == "transfer":
        graft = _graft_backbone(
            pretrained, seed, os.path.join(workdir, "grafted_init"))
        cfg1 = base.replace(freeze=True, model=graft, epochs=(30, 60),
                            seed=seed)
        stage1 = train(cfg1)
        cfg2 = base.replace(freeze=False, train_unfreeze=stage1,
                            epochs=(30, 60), seed=seed)
        weights = train(cfg2)
    elif arm == "random":
        cfg = base.replace(freeze=False, epochs=(90, 90), seed=seed)
        weights = train(cfg)
    else:
        raise ValueError(f"unknown arm {arm!r}")
    return {
        "train_mAP": round(_eval_map(weights, ann, anchors), 6),
        "heldout_mAP": round(_eval_map(weights, held_ann, anchors), 6),
        "weights": weights,
    }


# -------------------------------------------------------------- driver


def _pinned_env() -> dict:
    """Single XLA CPU device, no axon plugin — the calibration topology
    (training numerics depend on device topology; accuracy_gate.py)."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    return env


def _run_job(root: str, job_id: str, extra_args: list) -> dict:
    workdir = os.path.join(root, job_id)
    os.makedirs(workdir, exist_ok=True)
    cmd = [sys.executable, "-m", "yoloret_tpu.tools.ablation",
           "--workdir", workdir] + extra_args
    print(f"[ablation] {job_id}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, env=_pinned_env(), capture_output=True,
                          text=True, timeout=3 * 3600)
    tail = proc.stdout[-2000:] + proc.stderr[-2000:]
    if proc.returncode != 0:
        raise RuntimeError(f"job {job_id} failed:\n{tail}")
    lines = [l for l in proc.stdout.splitlines()
             if l.startswith("ABLATION_RESULT ")]
    if not lines:
        raise RuntimeError(f"job {job_id} printed no result:\n{tail}")
    return json.loads(lines[-1][len("ABLATION_RESULT "):])


def load_results(root: str) -> dict:
    path = os.path.join(root, "results.jsonl")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    out[rec["id"]] = rec
    return out


def _record(root: str, rec: dict) -> None:
    with open(os.path.join(root, "results.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def drive(root: str, seeds: list) -> dict:
    os.makedirs(root, exist_ok=True)
    done = load_results(root)

    def need(job_id: str, args: list) -> dict:
        if job_id in done:
            print(f"[ablation] {job_id}: cached", flush=True)
            return done[job_id]
        res = _run_job(root, job_id, args)
        rec = {"id": job_id, **res}
        _record(root, rec)
        done[job_id] = rec
        print(f"[ablation] {job_id}: {res}", flush=True)
        return rec

    # (a) RFCR fusion ablation
    for seed in seeds:
        for fusion in FUSIONS:
            need(f"rfcr-{fusion}-s{seed}",
                 ["--job", "rfcr", "--fusion", fusion, "--seed", str(seed)])
    # EMA consumption: one seed is enough for the headline number
    need("ema-s0", ["--job", "ema", "--seed", "0"])
    # (b) truncated transfer vs random init
    pre = need("pretrain-s7", ["--job", "pretrain", "--seed", "7"])
    for seed in seeds:
        for arm in ("transfer", "random"):
            need(f"transfer-{arm}-s{seed}",
                 ["--job", "transfer", "--arm", arm, "--seed", str(seed),
                  "--pretrained", pre["weights"]])

    print(render_table(done, seeds))
    return done


def drive_r5(root: str, seeds: list) -> dict:
    """Round-5 battery, ordered so PAIRS complete early (a lone arm is
    useless): scale-diverse fusion-vs-none pairs for the first two
    seeds, then the truncated-transfer replication on a NEW pretrain
    source (generator seed 11 — the r4 result used seed 7), then the
    schedule-matched EMA, then the remaining fusion seeds."""
    os.makedirs(root, exist_ok=True)
    done = load_results(root)

    def need(job_id: str, args: list) -> dict:
        if job_id in done:
            print(f"[ablation] {job_id}: cached", flush=True)
            return done[job_id]
        res = _run_job(root, job_id, args)
        rec = {"id": job_id, **res}
        _record(root, rec)
        done[job_id] = rec
        print(f"[ablation] {job_id}: {res}", flush=True)
        return rec

    def sd_pair(seed: int):
        for fusion in ("weighted_sum", "none"):
            need(f"rfcrsd-{fusion}-s{seed}",
                 ["--job", "rfcr_sd", "--fusion", fusion,
                  "--seed", str(seed)])

    for seed in seeds[:2]:
        sd_pair(seed)
    # truncated-transfer replication: new surrogate source, seeds {0,1}
    pre = need("pretrain-s11", ["--job", "pretrain", "--seed", "11"])
    for seed in (0, 1):
        for arm in ("transfer", "random"):
            need(f"transfer11-{arm}-s{seed}",
                 ["--job", "transfer", "--arm", arm, "--seed", str(seed),
                  "--pretrained", pre["weights"]])
    # schedule-matched EMA (horizon ~100 steps on the 360-step recipe)
    need("ema-d99-s0", ["--job", "ema", "--seed", "0", "--decay", "0.99"])
    for seed in seeds[2:]:
        sd_pair(seed)

    print(render_table_r5(done, seeds))
    return done


def render_table_r5(done: dict, seeds: list) -> str:
    import numpy as np

    lines = ["", "## RFCR fusion vs none (SCALE-DIVERSE synthetic, "
             "48 img, 60 ep)", "",
             "| fusion | train mAP (per seed) | held-out mAP (per seed) |",
             "|---|---|---|"]
    for fusion in ("weighted_sum", "none"):
        tr = [done[f"rfcrsd-{fusion}-s{s}"]["train_mAP"] for s in seeds
              if f"rfcrsd-{fusion}-s{s}" in done]
        he = [done[f"rfcrsd-{fusion}-s{s}"]["heldout_mAP"] for s in seeds
              if f"rfcrsd-{fusion}-s{s}" in done]
        if tr:
            lines.append(
                f"| {fusion} | {np.mean(tr):.4f} ({', '.join(f'{v:.4f}' for v in tr)}) "
                f"| {np.mean(he):.4f} ({', '.join(f'{v:.4f}' for v in he)}) |")
    pairs = [(done[f"rfcrsd-weighted_sum-s{s}"]["heldout_mAP"],
              done[f"rfcrsd-none-s{s}"]["heldout_mAP"])
             for s in seeds
             if f"rfcrsd-weighted_sum-s{s}" in done
             and f"rfcrsd-none-s{s}" in done]
    if pairs:
        deltas = [w - n for w, n in pairs]
        lines.append(
            f"\npaired held-out deltas (weighted_sum - none): "
            f"{', '.join(f'{d:+.4f}' for d in deltas)} "
            f"(mean {np.mean(deltas):+.4f}, "
            f"{sum(d > 0 for d in deltas)}/{len(deltas)} positive)")
    lines += ["", "## Truncated transfer, NEW pretrain source (seed-11 "
              "surrogate; 16-img target, equal 360-step budget)", "",
              "| arm | train mAP (per seed) | held-out mAP (per seed) |",
              "|---|---|---|"]
    for arm in ("transfer", "random"):
        tr = [done[f"transfer11-{arm}-s{s}"]["train_mAP"] for s in (0, 1)
              if f"transfer11-{arm}-s{s}" in done]
        he = [done[f"transfer11-{arm}-s{s}"]["heldout_mAP"] for s in (0, 1)
              if f"transfer11-{arm}-s{s}" in done]
        if tr:
            lines.append(
                f"| {arm} | {np.mean(tr):.4f} ({', '.join(f'{v:.4f}' for v in tr)}) "
                f"| {np.mean(he):.4f} ({', '.join(f'{v:.4f}' for v in he)}) |")
    if "ema-d99-s0" in done:
        e = done["ema-d99-s0"]
        lines += ["", "## EMA, schedule-matched decay 0.99 (gate recipe, "
                  "seed 0)", "",
                  "| weights | train mAP | held-out mAP |", "|---|---|---|",
                  f"| raw | {e['raw_train_mAP']:.4f} | {e['raw_heldout_mAP']:.4f} |",
                  f"| EMA | {e['ema_train_mAP']:.4f} | {e['ema_heldout_mAP']:.4f} |"]
    return "\n".join(lines)


def render_table(done: dict, seeds: list) -> str:
    import numpy as np

    lines = ["", "## RFCR fusion ablation (48-img crowded synthetic, 60 ep)",
             "", "| fusion | train mAP (per seed) | held-out mAP (per seed) |",
             "|---|---|---|"]
    for fusion in FUSIONS:
        tr = [done[f"rfcr-{fusion}-s{s}"]["train_mAP"] for s in seeds
              if f"rfcr-{fusion}-s{s}" in done]
        he = [done[f"rfcr-{fusion}-s{s}"]["heldout_mAP"] for s in seeds
              if f"rfcr-{fusion}-s{s}" in done]
        if tr:
            lines.append(
                f"| {fusion} | {np.mean(tr):.4f} ({', '.join(f'{v:.4f}' for v in tr)}) "
                f"| {np.mean(he):.4f} ({', '.join(f'{v:.4f}' for v in he)}) |")
    if "ema-s0" in done:
        e = done["ema-s0"]
        lines += ["", "## EMA consumption (gate recipe, --use_ema, seed 0)",
                  "", "| weights | train mAP | held-out mAP |", "|---|---|---|",
                  f"| raw | {e['raw_train_mAP']:.4f} | {e['raw_heldout_mAP']:.4f} |",
                  f"| EMA | {e['ema_train_mAP']:.4f} | {e['ema_heldout_mAP']:.4f} |"]
    lines += ["", "## Truncated transfer vs random init (16-img target, "
              "equal 90-ep budget)", "",
              "| arm | train mAP (per seed) | held-out mAP (per seed) |",
              "|---|---|---|"]
    for arm in ("transfer", "random"):
        tr = [done[f"transfer-{arm}-s{s}"]["train_mAP"] for s in seeds
              if f"transfer-{arm}-s{s}" in done]
        he = [done[f"transfer-{arm}-s{s}"]["heldout_mAP"] for s in seeds
              if f"transfer-{arm}-s{s}" in done]
        if tr:
            lines.append(
                f"| {arm} | {np.mean(tr):.4f} ({', '.join(f'{v:.4f}' for v in tr)}) "
                f"| {np.mean(he):.4f} ({', '.join(f'{v:.4f}' for v in he)}) |")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--job", choices=["rfcr", "rfcr_sd", "ema", "pretrain",
                                     "transfer"],
                   default=None, help="run one job in-process (driver "
                   "mode when omitted)")
    p.add_argument("--workdir", default=None)
    p.add_argument("--fusion", choices=list(FUSIONS), default="weighted_sum")
    p.add_argument("--arm", choices=["transfer", "random"], default="transfer")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--decay", type=float, default=0.9999)
    p.add_argument("--epochs", type=int, default=60,
                   help="ema job only: schedule length (the decay must "
                   "sit below the warm-up ramp's end value to differ "
                   "from the default run — see job_ema)")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--root", default="/tmp/yoloret_ablation")
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    p.add_argument("--battery", choices=["r4", "r5"], default="r4",
                   help="which driver job graph to run (driver mode)")
    a = p.parse_args(argv)

    if a.job is None:
        (drive_r5 if a.battery == "r5" else drive)(a.root, a.seeds)
        return
    assert a.workdir, "--workdir required for a single job"
    if a.job == "rfcr":
        res = job_rfcr(a.workdir, a.fusion, a.seed)
    elif a.job == "rfcr_sd":
        res = job_rfcr_sd(a.workdir, a.fusion, a.seed)
    elif a.job == "ema":
        res = job_ema(a.workdir, a.seed, a.decay, a.epochs)
    elif a.job == "pretrain":
        res = job_pretrain(a.workdir, a.seed)
    else:
        assert a.pretrained, "--pretrained required for transfer jobs"
        res = job_transfer(a.workdir, a.arm, a.seed, a.pretrained)
    print("ABLATION_RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
