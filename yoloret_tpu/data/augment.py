"""On-device, batched training augmentation.

TPU-native redesign of the reference's per-image tf.image chain
(reference: code/yolo3/utils.py:123-295). The reference resizes to a
random (nw, nh), places at a random (dx, dy) with crop/pad, flips,
then applies hue/saturation/gamma/contrast — one host op per image.
Here the ENTIRE geometric chain composes into a single
``jax.image.scale_and_translate`` warp per image (bilinear, zero
padding), and all photometric ops are elementwise — so one jit compiles
the whole batch and it runs on the accelerator next to the model.

Host contract: images arrive decoded and stretch-resized to a fixed
staging square [S, S, 3] in [0, 1], with boxes in [0, 1] coordinates
relative to the ORIGINAL image (the staging stretch cancels out exactly
in the affine; only resampling differs slightly from single-pass
resize — documented deviation).

Parameter distributions match the reference:
  * aspect jitter ``new_ar = (w/h) * u(1-j, 1+j)/u(1-j, 1+j)``, scale
    ``u(0.25, 2)``, ratio >= 1, placement ``dx ~ u(0, w - nw)``
    (reference :168-183),
  * hflip p=0.5 (:210-214), hue +-0.5 (:215-216), saturation
    [0.5, 1.5] (:217-218), gamma [0.8, 2] (:221-222), contrast
    [0.9, 1.1] (:223-224),
  * random JPEG quality is a host-side concern (PIL re-encode in the
    pipeline workers) — a lossy-codec op has no device equivalent,
  * boxes clipped to [0, dim-1], degenerate (<=1px) dropped, padded to
    ``max_boxes`` (:249-289).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    input_hw: Tuple[int, int] = (320, 320)
    min_scale: float = 0.25
    max_scale: float = 2.0
    jitter: float = 0.3
    flip: bool = True
    hue: float = 0.5
    sat: float = 0.5
    val: float = 0.0
    min_gamma: float = 0.8
    max_gamma: float = 2.0
    contrast: float = 0.1
    noise: float = 0.0  # additive uniform noise amplitude (reference
    # utils.py:228-233; default off, matching get_random_data)
    blur: bool = False  # 5x5 gaussian blur p=1 (reference utils.py:234-235
    # random_blur; default off) — device-side depthwise conv here
    max_boxes: int = 20
    mosaic_prob: float = 0.0  # ONLINE 4-image mosaic probability per
    # sample (extension: the reference ships mosaic only as the offline
    # script, augment_data.py:148-192); applied batch-level on device
    # AFTER the per-image chain, see mix_batch
    mixup_prob: float = 0.0  # ONLINE mixup probability per sample
    # (reference offline mixup augment_data.py:122-145); mosaic wins
    # when both fire


# ---------------------------------------------------------------------------
# Color-space helpers (tf.image.rgb_to_hsv semantics).
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        mx == r,
        (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(diff > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# Single-image augment (vmapped over the batch).
# ---------------------------------------------------------------------------


def _augment_one(image, boxes, valid, rng, cfg: AugmentConfig):
    h, w = float(cfg.input_hw[0]), float(cfg.input_hw[1])
    s = image.shape[0]  # staging square side
    keys = jax.random.split(rng, 12)

    # Geometry (reference :168-183).
    j = cfg.jitter
    u = lambda k, lo, hi: jax.random.uniform(keys[k], (), jnp.float32, lo, hi)
    new_ar = (w / h) * u(0, 1 - j, 1 + j) / u(1, 1 - j, 1 + j)
    scale = u(2, cfg.min_scale, cfg.max_scale)
    ratio = jnp.maximum(jnp.where(new_ar < 1, scale * new_ar, scale / new_ar), 1.0)
    nw = jnp.where(new_ar < 1, ratio * h, scale * w)
    nh = jnp.where(new_ar < 1, scale * h, ratio * w)
    dx = u(3, 0.0, 1.0) * (w - nw)
    dy = u(4, 0.0, 1.0) * (h - nh)

    # One warp: output(y, x) <- staged((y - dy) * S / nh, (x - dx) * S / nw).
    scale_yx = jnp.stack([nh / s, nw / s])
    trans_yx = jnp.stack([dy, dx])
    out = jax.image.scale_and_translate(
        image,
        (cfg.input_hw[0], cfg.input_hw[1], 3),
        (0, 1),
        scale_yx,
        trans_yx,
        method="linear",
        antialias=True,
    )

    # Boxes: normalized-original -> output pixels (reference :186-189).
    x1 = boxes[:, 0] * nw + dx
    y1 = boxes[:, 1] * nh + dy
    x2 = boxes[:, 2] * nw + dx
    y2 = boxes[:, 3] * nh + dy

    if cfg.flip:
        do_flip = jax.random.uniform(keys[5], ()) < 0.5
        out = jnp.where(do_flip, out[:, ::-1, :], out)
        x1, x2 = (
            jnp.where(do_flip, w - x2, x1),
            jnp.where(do_flip, w - x1, x2),
        )

    # Photometric chain (reference :215-224), all elementwise.
    if cfg.hue > 0 or cfg.sat > 0:
        hsv = rgb_to_hsv(jnp.clip(out, 0.0, 1.0))
        hh, ss, vv = hsv[..., 0], hsv[..., 1], hsv[..., 2]
        if cfg.hue > 0:
            hh = (hh + u(6, -cfg.hue, cfg.hue)) % 1.0
        if cfg.sat > 0:
            ss = jnp.clip(ss * u(7, 1 - cfg.sat, 1 + cfg.sat), 0.0, 1.0)
        out = hsv_to_rgb(jnp.stack([hh, ss, vv], axis=-1))
    if cfg.val > 0:
        # additive brightness delta in [-val, val] (tf.image.random_brightness,
        # reference utils.py:219-220; default off)
        out = out + u(11, -cfg.val, cfg.val)
    if cfg.min_gamma < cfg.max_gamma:
        out = jnp.clip(out, 0.0, 1.0) ** u(8, cfg.min_gamma, cfg.max_gamma)
    if cfg.contrast > 0:
        f = u(9, 1 - cfg.contrast, 1 + cfg.contrast)
        mean = jnp.mean(out, axis=(0, 1), keepdims=True)
        out = (out - mean) * f + mean
    if cfg.noise > 0:
        out = out + jax.random.uniform(
            keys[10], out.shape, jnp.float32, 0.0, cfg.noise
        )
    if cfg.blur:
        g = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0])
        kern = (g[:, None] * g[None, :]) / 256.0
        kern = jnp.broadcast_to(kern[:, :, None, None], (5, 5, 1, 3))
        out = jax.lax.conv_general_dilated(
            out[None], kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
        )[0]
    out = jnp.clip(out, 0.0, 1.0)

    # Clip boxes, drop degenerate, keep static shape (reference :249-289).
    x1 = jnp.clip(x1, 0.0, w - 1)
    x2 = jnp.clip(x2, 0.0, w - 1)
    y1 = jnp.clip(y1, 0.0, h - 1)
    y2 = jnp.clip(y2, 0.0, h - 1)
    keep = valid & ((x2 - x1) > 1.0) & ((y2 - y1) > 1.0)
    new_boxes = jnp.stack([x1, y1, x2, y2, boxes[:, 4]], axis=-1)
    new_boxes = jnp.where(keep[:, None], new_boxes, 0.0)
    return out, new_boxes, keep


def _to_unit_float(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] or float [0,1] -> f32 [0,1] ON DEVICE. Feeding uint8
    quarters host->device transfer (important over PCIe and vital over a
    tunneled chip)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) * (1.0 / 255.0)
    return images.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(
    images: jnp.ndarray,  # [B, S, S, 3] staging, uint8 or f32 in [0, 1]
    boxes: jnp.ndarray,  # [B, T, 5] (x1, y1, x2, y2, cls) normalized to orig
    valid: jnp.ndarray,  # [B, T] bool
    rng: jax.Array,
    cfg: AugmentConfig,
    rngs: Optional[jax.Array] = None,  # [B, 2] pre-split per-sample keys
    # (per-host input sharding passes the host's slice of the GLOBAL
    # batch split so sharded == unsharded bitwise)
):
    """Returns (images [B, H, W, 3] f32, boxes [B, T, 5] in output pixels,
    valid [B, T])."""
    images = _to_unit_float(images)
    if rngs is None:
        rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda i, b, v, r: _augment_one(i, b, v, r, cfg))(
        images, boxes, valid, rngs
    )


@partial(jax.jit, static_argnames=("cfg",))
def mix_batch(
    images: jnp.ndarray,  # [B, H, W, 3] f32, post augment_batch
    boxes: jnp.ndarray,  # [B, T, 5] (x1, y1, x2, y2, cls) output pixels
    valid: jnp.ndarray,  # [B, T] bool
    rng: jax.Array,
    cfg: AugmentConfig,
):
    """ONLINE mosaic / mixup at the batch level — an extension: the
    reference implements cutout/mixup/mosaic only as an OFFLINE dataset
    script (reference: code/augment_data.py:122-192); here the same ops
    run on device inside the training input stream, after the per-image
    affine/photometric chain and before target assignment.

    Per sample i (independent draws):
      * with p = cfg.mosaic_prob: 2x2 half-scale mosaic of rows
        i, i+1, i+2, i+3 (mod B). Deviation from the offline tool's
        random mosaic center (augment_data.py:156-160): the center is
        fixed at (W/2, H/2) so every tile keeps a static shape under
        jit (docs/parity.md).
      * else with p = cfg.mixup_prob: pixel blend with row i+B/2 at
        lam ~ U(0, 1) (reference augment_data.py:131), box union at
        full weight (:141-145).
      * else: unchanged.

    Returns (images [B, H, W, 3], boxes [B, cap*T, 5], valid [B, cap*T])
    where cap is sized by the ENABLED modes (cfg is a static jit arg):
    4 with mosaic on (4-way box union), 2 for mixup-only (2-way union),
    and 1 — the inputs unchanged — with both probs 0. Untouched rows
    keep their boxes in the first T slots. Mix partners come from the
    SAME (process-local) batch, so a process-sharded input stream with
    mixing enabled is not bitwise an unsharded one (mixing draws use a
    fold_in key and never perturb the default stream — with both probs
    0 the pipeline is bitwise identical to not calling this at all).
    """
    mosaic_on = cfg.mosaic_prob > 0
    mixup_on = cfg.mixup_prob > 0
    if not (mosaic_on or mixup_on):
        return images, boxes, valid

    b, h, w, _ = images.shape
    t = boxes.shape[1]
    cap = (4 if mosaic_on else 2) * t
    fw, fh = float(w), float(h)
    k1, k2, k3 = jax.random.split(rng, 3)
    do_mosaic = jax.random.uniform(k1, (b,)) < cfg.mosaic_prob
    do_mixup = (~do_mosaic) & (jax.random.uniform(k2, (b,)) < cfg.mixup_prob)

    roll = lambda x, s: jnp.roll(x, -s, axis=0)
    boxes = jnp.where(valid[..., None], boxes, 0.0)

    def pad_cap(bx, v):
        extra = cap - bx.shape[1]
        return (
            jnp.concatenate([bx, jnp.zeros((b, extra, 5), bx.dtype)], axis=1),
            jnp.concatenate([v, jnp.zeros((b, extra), bool)], axis=1),
        )

    out_img = images
    out_boxes, out_valid = pad_cap(boxes, valid)

    if mixup_on:
        # Mixup: blend with the half-batch partner, union the boxes.
        p = b // 2
        lam = jax.random.uniform(k3, (b, 1, 1, 1))
        mix_img = images * lam + roll(images, p) * (1.0 - lam)
        mix_boxes, mix_valid = pad_cap(
            jnp.concatenate([boxes, roll(boxes, p)], axis=1),
            jnp.concatenate([valid, roll(valid, p)], axis=1),
        )
        mix_i = do_mixup[:, None, None, None]
        out_img = jnp.where(mix_i, mix_img, out_img)
        out_boxes = jnp.where(do_mixup[:, None, None], mix_boxes, out_boxes)
        out_valid = jnp.where(do_mixup[:, None], mix_valid, out_valid)

    if mosaic_on:
        # Mosaic image: half-scale tiles, fixed 2x2 grid.
        h2, w2 = h // 2, w // 2
        small = jax.image.resize(images, (b, h2, w2, 3), "linear")
        mosaic_img = jnp.concatenate(
            [
                jnp.concatenate([small, roll(small, 1)], axis=2),
                jnp.concatenate([roll(small, 2), roll(small, 3)], axis=2),
            ],
            axis=1,
        )

        def quad(bx, v, ox, oy):
            off = jnp.asarray([ox, oy, ox, oy], jnp.float32)
            xy = jnp.clip(bx[..., :4] * 0.5 + off,
                          jnp.asarray([0.0, 0.0, 0.0, 0.0], jnp.float32),
                          jnp.asarray([fw - 1, fh - 1, fw - 1, fh - 1], jnp.float32))
            keep = v & ((xy[..., 2] - xy[..., 0]) > 1.0) & ((xy[..., 3] - xy[..., 1]) > 1.0)
            return jnp.concatenate([xy, bx[..., 4:5]], -1), keep

        q0, v0 = quad(boxes, valid, 0.0, 0.0)
        q1, v1 = quad(roll(boxes, 1), roll(valid, 1), float(w2), 0.0)
        q2, v2 = quad(roll(boxes, 2), roll(valid, 2), 0.0, float(h2))
        q3, v3 = quad(roll(boxes, 3), roll(valid, 3), float(w2), float(h2))
        mosaic_boxes = jnp.concatenate([q0, q1, q2, q3], axis=1)  # [B, 4T, 5]
        mosaic_valid = jnp.concatenate([v0, v1, v2, v3], axis=1)

        sel_i = do_mosaic[:, None, None, None]
        out_img = jnp.where(sel_i, mosaic_img, out_img)
        out_boxes = jnp.where(do_mosaic[:, None, None], mosaic_boxes, out_boxes)
        out_valid = jnp.where(do_mosaic[:, None], mosaic_valid, out_valid)

    out_boxes = jnp.where(out_valid[..., None], out_boxes, 0.0)
    return out_img, out_boxes, out_valid


def _eval_one(image, boxes, valid, image_hw, cfg: AugmentConfig):
    """Deterministic letterbox path (reference :252-270)."""
    h, w = float(cfg.input_hw[0]), float(cfg.input_hw[1])
    s = image.shape[0]
    ih, iw = image_hw[0], image_hw[1]
    r = jnp.minimum(w / iw, h / ih)
    nw, nh = iw * r, ih * r
    dx, dy = (w - nw) / 2.0, (h - nh) / 2.0
    out = jax.image.scale_and_translate(
        image,
        (cfg.input_hw[0], cfg.input_hw[1], 3),
        (0, 1),
        jnp.stack([nh / s, nw / s]),
        jnp.stack([dy, dx]),
        method="linear",
        antialias=True,
    )
    out = jnp.clip(out, 0.0, 1.0)
    x1 = jnp.clip(boxes[:, 0] * nw + dx, 0.0, w - 1)
    y1 = jnp.clip(boxes[:, 1] * nh + dy, 0.0, h - 1)
    x2 = jnp.clip(boxes[:, 2] * nw + dx, 0.0, w - 1)
    y2 = jnp.clip(boxes[:, 3] * nh + dy, 0.0, h - 1)
    keep = valid & ((x2 - x1) > 1.0) & ((y2 - y1) > 1.0)
    new_boxes = jnp.stack([x1, y1, x2, y2, boxes[:, 4]], axis=-1)
    new_boxes = jnp.where(keep[:, None], new_boxes, 0.0)
    return out, new_boxes, keep


@partial(jax.jit, static_argnames=("cfg",))
def eval_batch(
    images: jnp.ndarray,  # uint8 or f32
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    image_hw: jnp.ndarray,  # [B, 2] original (H, W) floats
    cfg: AugmentConfig,
):
    images = _to_unit_float(images)
    return jax.vmap(lambda i, b, v, s: _eval_one(i, b, v, s, cfg))(
        images, boxes, valid, image_hw
    )
