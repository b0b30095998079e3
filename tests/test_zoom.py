"""Zoom-ensemble postprocess tests (reference model.py:408-422)."""

import numpy as np
import jax.numpy as jnp

from yoloret_tpu.ops.postprocess import gather_boxes_and_scores

ANCHORS = jnp.asarray(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]], jnp.float32,
)


def _zero_outputs(size):
    return [
        jnp.zeros((size // s, size // s, 3, 25), jnp.float32) for s in (32, 16, 8)
    ]


def test_zoom_doubles_candidates():
    outs = _zero_outputs(416)
    zouts = _zero_outputs(224)
    hw = jnp.asarray([416.0, 416.0])
    b0, s0 = gather_boxes_and_scores(outs, ANCHORS, 20, hw)
    bz, sz = gather_boxes_and_scores(outs, ANCHORS, 20, hw, zoom_outputs=zouts)
    n_main = sum((416 // s) ** 2 * 3 for s in (32, 16, 8))
    n_zoom = sum((224 // s) ** 2 * 3 for s in (32, 16, 8))
    assert b0.shape == (n_main, 4)
    assert bz.shape == (n_main + n_zoom, 4)
    assert sz.shape == (n_main + n_zoom, 20)


def test_zoom_center_maps_to_center_on_finer_scales():
    """Regression: zoom_hw must come from the COARSEST zoom grid; the
    stride-16 and stride-8 zoom scales previously used grid*32 and
    mapped to displaced coordinates."""
    outs = _zero_outputs(416)
    zouts = _zero_outputs(224)
    hw = jnp.asarray([416.0, 416.0])
    bz, _ = gather_boxes_and_scores(outs, ANCHORS, 20, hw, zoom_outputs=zouts)
    n_main_s0 = (416 // 32) ** 2 * 3
    n_zoom_s0 = (224 // 32) ** 2 * 3
    n_main_s1 = (416 // 16) ** 2 * 3
    # scale-1 zoom block: after [main s0][zoom s0][main s1]
    start = n_main_s0 + n_zoom_s0 + n_main_s1
    zoom_s1 = bz[start : start + (224 // 16) ** 2 * 3]
    g = 224 // 16
    center = np.asarray(zoom_s1.reshape(g, g, 3, 4)[g // 2, g // 2, 0])
    cy = (center[0] + center[2]) / 2
    cx = (center[1] + center[3]) / 2
    np.testing.assert_allclose([cy, cx], [208.0, 208.0], atol=8.5)  # within one cell


def test_zoom_center_maps_to_center():
    """A detection at the center of the zoom crop must land at the center
    of the primary frame: xy' = xy*(224/416) + (416-224)/(2*416)."""
    outs = _zero_outputs(416)
    zouts = _zero_outputs(224)
    hw = jnp.asarray([416.0, 416.0])
    bz, _ = gather_boxes_and_scores(outs, ANCHORS, 20, hw, zoom_outputs=zouts)
    n_main_s0 = (416 // 32) ** 2 * 3
    # zoom scale-0 grid is 7x7; its center cell (3,3) anchor 0 comes right
    # after the main scale-0 block in the per-scale concat
    zoom_block = bz[n_main_s0 : n_main_s0 + 7 * 7 * 3]
    center = np.asarray(zoom_block.reshape(7, 7, 3, 4)[3, 3, 0])
    # zero logits -> xy = (3.5/7) in crop frame = crop center -> maps to 0.5
    cy = (center[0] + center[2]) / 2
    cx = (center[1] + center[3]) / 2
    np.testing.assert_allclose([cy, cx], [208.0, 208.0], atol=0.5)
