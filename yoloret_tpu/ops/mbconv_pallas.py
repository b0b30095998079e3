"""Fused inverted-residual (MBConv) Pallas kernel — the conv stack's
HBM-traffic eliminator.

Roofline study (tools/roofline.py, round 3): the flagship detector is
BANDWIDTH-bound — 9.4% of v5e bf16 compute peak but 67% of HBM peak,
with ~40 MB/img of activation traffic, dominated by the 6x-expanded
tensors every MobileNetV2 block materializes between its three convs
(reference backbone: code/yolo3/override.py wraps Keras MobileNetV2;
block structure expand 1x1 -> depthwise 3x3 -> project 1x1).

XLA fuses elementwise ops into convs but never conv-into-conv, so each
block writes + re-reads its expanded tensor (e.g. 160x160x96 bf16 =
4.9 MB, twice, per image, for ONE block). This kernel keeps the
expanded tensor in VMEM: one row-tile of x in (with a 1-px halo via
``Element``-indexed overlapping blocks), one row-tile of the projected
output out — the 6x tensor never touches HBM.

Inference-path only (the backward pass wants XLA's own fusion choices);
BatchNorm is pre-folded into the conv weights/biases (see
``yoloret_tpu.nn.fused_infer.fold_bn``). Supports stride 1 (with
optional residual) and stride 2, with and without the expand conv. The
input is host-side zero-padded so every grid step reads a full-size
block with no boundary conditionals.

STATUS (round 3, measured on v5e): numerically EXACT vs the stock
forward, but 4.7x SLOWER end to end — Element-indexed overlapping
blocks disable pallas's pipelined double-buffering, and the forced
T(8,128) operand layout pads 16-24-channel NHWC tensors ~5x in HBM
(83 MB/img moved vs stock's 40). Kept as an experimental path; the
round-4 plan is a manual-DMA double-buffered variant with merged-lane
layouts (see STATUS.md).

Weight layouts: we [Cin, Ce], wd [3, 3, Ce], wp [Ce, Cout]; biases
[1, C] (2-D for TPU tiling).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Element: block dim whose index_map entry is an ELEMENT start (enables
# overlapping halo windows); Squeezed: length-1 dim dropped inside the
# kernel. Both are accepted BlockDim variants of pl.BlockSpec (the
# public pl.BlockDim union names them); the constructors currently live
# in jax._src.pallas.core.
from jax._src.pallas.core import Element, Squeezed


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _expand(x2d, we_ref, be_ref, dtype):
    e = jnp.dot(x2d, we_ref[...], preferred_element_type=jnp.float32)
    return _relu6(e + be_ref[...]).astype(dtype)


def _zero_pad_ring(e, row_lo, row_hi, col_lo, col_hi, row_off):
    """Zero positions that are image padding: the expand conv ran over
    the zero halo and produced relu6(bias) there, but the depthwise SAME
    semantics pad zeros AFTER the expand. Masks are built from 3-D iotas
    directly — Mosaic cannot shape-cast 1-D i1 vectors to 3-D."""
    h, w, _ = e.shape
    gr = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0) + row_off
    gc = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 1)
    mask = (gr >= row_lo) & (gr < row_hi) & (gc >= col_lo) & (gc < col_hi)
    return jnp.where(mask, e, jnp.zeros_like(e))


def _kernel_s1(x_ref, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref,
               out_ref, *, th, w, cin, ce, cout, expand, residual):
    # x_ref: [1, th+2, w+2, cin] (1-px halo); out_ref: [th, w, cout]
    x = x_ref[0]
    if expand:
        e = _expand(
            x.reshape((th + 2) * (w + 2), cin), we_ref, be_ref, x.dtype
        ).reshape(th + 2, w + 2, ce)
        # halo validity: global padded row g = ri*th + l is image iff
        # 1 <= g <= h (symmetric 1-px pad); cols likewise (W untiled)
        ri = pl.program_id(1)
        h_img = pl.num_programs(1) * th
        e = _zero_pad_ring(e, 1, h_img + 1, 1, w + 1, ri * th)
    else:
        e = x
    acc = jnp.zeros((th, w, ce), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc += (
                e[di:di + th, dj:dj + w, :].astype(jnp.float32)
                * wd_ref[di, dj, :].astype(jnp.float32)[None, None, :]
            )
    d = _relu6(acc + bd_ref[...][0][None, None, :]).astype(x.dtype)
    p = jnp.dot(
        d.reshape(th * w, ce), wp_ref[...],
        preferred_element_type=jnp.float32,
    ) + bp_ref[...]
    p = p.reshape(th, w, cout)
    if residual:
        p = p + x[1:1 + th, 1:1 + w, :].astype(jnp.float32)
    out_ref[...] = p.astype(x.dtype)


def _kernel_s2(x_ref, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref,
               out_ref, *, th, w_out, cin, ce, cout, expand):
    # th = OUTPUT rows per tile. x_ref: [2*th+2, 2*w_out+2, cin] from the
    # 1-px-padded input; out_ref: [th, w_out, cout].
    h_in = 2 * th + 2
    w_in = 2 * w_out + 2
    x = x_ref[0]
    if expand:
        e = _expand(
            x.reshape(h_in * w_in, cin), we_ref, be_ref, x.dtype
        ).reshape(h_in, w_in, ce)
        # stride-2 pad is (0, 2): global padded row g = 2*ri*th + l is
        # image iff g < h (= 2 * h_out); cols iff c < w
        ri = pl.program_id(1)
        h_img = pl.num_programs(1) * 2 * th
        e = _zero_pad_ring(e, 0, h_img, 0, w_in - 2, 2 * ri * th)
    else:
        e = x
    # Output (i, j) reads padded rows 2i + di, cols 2j + dj (di, dj in
    # 0..2). Deinterleave by parity with reshape + static slices:
    er = e.reshape(th + 1, 2, w_in, ce)
    rows = (
        er[:th, 0],       # di = 0: rows 0, 2, ...
        er[:th, 1],       # di = 1: rows 1, 3, ...
        er[1:th + 1, 0],  # di = 2: rows 2, 4, ...
    )
    acc = jnp.zeros((th, w_out, ce), jnp.float32)
    for di in range(3):
        rc = rows[di].reshape(th, w_out + 1, 2, ce)
        cols = (rc[:, :w_out, 0], rc[:, :w_out, 1], rc[:, 1:w_out + 1, 0])
        for dj in range(3):
            acc += (
                cols[dj].astype(jnp.float32)
                * wd_ref[di, dj, :].astype(jnp.float32)[None, None, :]
            )
    d = _relu6(acc + bd_ref[...][0][None, None, :]).astype(x.dtype)
    p = jnp.dot(
        d.reshape(th * w_out, ce), wp_ref[...],
        preferred_element_type=jnp.float32,
    ) + bp_ref[...]
    out_ref[...] = p.reshape(th, w_out, cout).astype(x.dtype)


def fused_mbconv(
    x: jnp.ndarray,  # [B, H, W, Cin]
    we: Optional[jnp.ndarray],  # [Cin, Ce] or None (expand_ratio == 1)
    be: Optional[jnp.ndarray],  # [1, Ce]
    wd: jnp.ndarray,  # [3, 3, Ce]
    bd: jnp.ndarray,  # [1, Ce]
    wp: jnp.ndarray,  # [Ce, Cout]
    bp: jnp.ndarray,  # [1, Cout]
    *,
    stride: int = 1,
    residual: bool = False,
    row_tile: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused expand(1x1)+relu6 -> depthwise(3x3, SAME)+relu6 ->
    project(1x1) [+ residual]. BN must already be folded into the
    weights/biases. Returns [B, H/stride, W/stride, Cout]."""
    b, h, w, cin = x.shape
    expand = we is not None
    ce = wd.shape[-1]
    cout = wp.shape[-1]
    assert stride in (1, 2)
    assert not (residual and stride != 1), "residual requires stride 1"
    if not expand:
        assert ce == cin, "no-expand MBConv runs depthwise over Cin"
        we = jnp.zeros((cin, 8), x.dtype)  # unused placeholder refs
        be = jnp.zeros((1, 8), x.dtype)
    h_out, w_out = h // stride, w // stride

    if row_tile is None:
        # 16 output rows/tile keeps the expanded f32 scratch under the
        # 16 MB VMEM budget at every stage (whole-image tiles OOM'd at
        # 40x40x144 on v5e); the divisibility loop shrinks it for small
        # or odd maps
        row_tile = 16
    while h_out % row_tile:
        row_tile //= 2
    th = max(row_tile, 1)

    # Zero halo via one x-sized XLA pad, so every grid step reads a
    # full block with no boundary conditionals. Stride 1 SAME pads
    # symmetrically ((1,1)); stride 2 SAME on even input pads (0,1) —
    # (0,2) here so the last overlapping block stays in range (the extra
    # zero row/col is never read by a valid output position).
    if stride == 1:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        xp = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))

    grid = (b, h_out // th)
    if stride == 1:
        kern = functools.partial(
            _kernel_s1, th=th, w=w, cin=cin, ce=ce, cout=cout,
            expand=expand, residual=residual,
        )
        # Mosaic requires all-or-none Element dims per spec
        x_spec = pl.BlockSpec(
            (Element(1), Element(th + 2), Element(w + 2), Element(cin)),
            lambda bi, ri: (bi, ri * th, 0, 0),
        )
    else:
        kern = functools.partial(
            _kernel_s2, th=th, w_out=w_out, cin=cin, ce=ce, cout=cout,
            expand=expand,
        )
        x_spec = pl.BlockSpec(
            (Element(1), Element(2 * th + 2), Element(w + 2), Element(cin)),
            lambda bi, ri: (bi, ri * 2 * th, 0, 0),
        )

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=pl.BlockSpec(
            (Squeezed(), th, w_out, cout), lambda bi, ri: (bi, ri, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, cout), x.dtype),
        interpret=interpret,
    )(xp, we, be, wd, bd, wp, bp)


def reference_mbconv(x, we, be, wd, bd, wp, bp, *, stride=1, residual=False):
    """XLA oracle with the same math (f32 accumulation) for testing."""
    y = x
    if we is not None:
        y = _relu6(
            jax.lax.conv_general_dilated(
                y.astype(jnp.float32), we[None, None].astype(jnp.float32),
                (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + be[0]
        ).astype(x.dtype)
    ce = wd.shape[-1]
    y = jax.lax.conv_general_dilated(
        y.astype(jnp.float32),
        wd.astype(jnp.float32).reshape(3, 3, 1, ce),
        (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ce,
    )
    y = _relu6(y + bd[0]).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y.astype(jnp.float32), wp[None, None].astype(jnp.float32),
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bp[0]
    if residual:
        y = y + x.astype(jnp.float32)
    return y.astype(x.dtype)
