"""Letterbox resize (aspect-preserving resize + centered pad).

Device-side variant of the reference ``letterbox_image``
(reference: code/yolo3/utils.py:67-83): resize so the longer side fits,
pad the rest with zeros, image centered.

Two flavors:
  * :func:`letterbox_jax` — static input & output shapes; pure XLA (bilinear
    resize like tf.image.resize's default), jit-able, runs on TPU.
  * :func:`letterbox_numpy` — host-side (PIL) for variable-size decode paths.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def letterbox_params(image_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    """(new_h, new_w, dy, dx) of the resized content inside the canvas.

    Uses the same floor arithmetic as the reference (int casts / `// 2`).
    """
    ih, iw = image_hw
    h, w = out_hw
    scale = min(w / iw, h / ih)
    nh = int(ih * scale)
    nw = int(iw * scale)
    dy = (h - nh) // 2
    dx = (w - nw) // 2
    return nh, nw, dy, dx


def letterbox_jax(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Letterbox a [H, W, 3] float image to static out_hw (bilinear).

    Input spatial shape must be static (each distinct shape compiles once).
    """
    ih, iw = int(image.shape[0]), int(image.shape[1])
    nh, nw, dy, dx = letterbox_params((ih, iw), out_hw)
    resized = jax.image.resize(image, (nh, nw, image.shape[-1]), method="bilinear")
    return jnp.pad(
        resized,
        ((dy, out_hw[0] - nh - dy), (dx, out_hw[1] - nw - dx), (0, 0)),
    )


def letterbox_numpy(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host-side letterbox for uint8/float [H, W, 3] (PIL bilinear)."""
    return letterbox_numpy_u8(image, out_hw).astype(np.float32) / 255.0


def letterbox_numpy_u8(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host-side letterbox returning UINT8 (4x smaller host->device
    transfer; normalize on device)."""
    from PIL import Image

    ih, iw = image.shape[:2]
    nh, nw, dy, dx = letterbox_params((ih, iw), out_hw)
    src = image
    if src.dtype != np.uint8:
        src = np.clip(src * 255.0, 0, 255).astype(np.uint8)
    resized = np.asarray(
        Image.fromarray(src).resize((nw, nh), Image.BILINEAR), dtype=np.uint8
    )
    canvas = np.zeros((out_hw[0], out_hw[1], image.shape[-1]), np.uint8)
    canvas[dy : dy + nh, dx : dx + nw] = resized
    return canvas
