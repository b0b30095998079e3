"""Fused inverted-residual (MBConv) Pallas kernel, v2: channels-major
"CP" layout + manual double-buffered DMA.

Why v2 exists — measured failure modes of v1 (ops/mbconv_pallas.py):

  1. v1's ``Element``-indexed overlapping halo windows disable Mosaic's
     automatic pipelined double-buffering, so every tile's HBM->VMEM
     copy serializes with compute.
  2. v1 passes NHWC operands whose lane (minor) dim is the 16-32
     channel count; the forced T(8,128) Mosaic operand layout pads that
     to 128 lanes — ~5x the HBM bytes (83 MB/img moved vs the stock
     conv stack's 40).

v2's layout makes both problems structurally impossible. Activations
travel between fused blocks as ``[B, C, HWp]`` (bf16, HWp =
H*(W+2) rounded up to 128 — each image row carries one zero pad
column on each side): the tiled trailing dims are (C, HWp) — channels
on sublanes, pixels on lanes. MNv2's make_divisible(·, 8) channel
counts keep the sublane dim aligned (bf16's (16, 128) tile pads only
the C ∈ {24, 72, 120} slabs, 7-33%, vs v1's flat ~5x), and B is the
untiled major dim, so the per-image DMA ``x_hbm.at[b]`` is a
major-dim slice — always layout-legal (a ``[C, B, HWp]`` variant
putting B on sublanes was probed first: Mosaic rejects the size-1
sublane-dim DMA slice, "must be aligned to tiling"). One image = one
tile: the kernel is gridless and loops over images with explicit
``make_async_copy`` double buffering (two in slots, two out slots —
the Pallas-guide DMA pipeline pattern), so image b+1's fetch and image
b-1's writeback overlap image b's compute.

The in-row pad columns are what make the depthwise cheap: a 3x3 tap
shift ``(di-1)*(W+2) + (dj-1)`` can only ever read (a) a valid pixel,
(b) an in-row pad column, or (c) the kernel's outer zero pad — never a
wrapped pixel from the adjacent row. So instead of nine per-tap masked
selects over the full [Ce, HWp] map (the first measured iteration of
this kernel: 1.7x SLOWER than stock XLA, VPU-bound on exactly those
selects), one validity mask applied to the expanded map zeroes the pad
columns/tail once, and each tap is a bare slice+fma.

In this layout the block's three convs need NO in-kernel relayout at
all (this Mosaic version rejects lane-splitting shape casts — probed):

  * expand / project 1x1 convs: plain 2-D MXU dots with transposed
    weights, ``[Ce, Cin] x [Cin, HWp]`` — channels contract on the
    natural operand dims;
  * 3x3 depthwise: nine statically lane-shifted copies of the expanded
    map (lane pad + static lane slice — ``pltpu.roll`` fails this
    backend's server-side Mosaic compile; pad+slice probed COMPILED),
    each masked by iota-derived row/col validity (the SAME zero-pad
    applied post-expand, matching v1's ``_zero_pad_ring`` semantics)
    and scaled by its tap's ``[Ce, 1]`` column;
  * residual: direct add, same layout.

Like v1 this is inference-only (training keeps XLA's own fusions) and
BN must be pre-folded (nn/fused_infer.fold_bn). Stride-1 blocks (with
optional residual, with or without expand) are supported; stride-2
blocks stay on stock XLA (a stride-2 tap needs a stride-2 lane gather,
which Mosaic has no cheap primitive for). Reference block semantics:
expand 1x1 + relu6 -> depthwise 3x3 SAME + relu6 -> project 1x1,
residual when stride 1 and Cin == Cout (reference:
code/yolo3/override.py wrapping Keras MobileNetV2; same structure in
code/yolo3/efficientnet.py:467-536).

CP weight layouts: weT [Ce, Cin], wd [Ce, 9] (tap-minor), wp T [Cout,
Ce]; biases [C, 1] f32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cp_kernel(
    x_hbm, weT_ref, be_ref, wd_ref, bd_ref, wpT_ref, bp_ref, out_hbm,
    in_buf, out_buf, in_sem, out_sem,
    *, n_img, h, w, cin, ce, cout, expand, residual,
):
    """Gridless fused stride-1 MBConv, one image per double-buffered
    tile. x_hbm: [B, Cin, HWp]; out_hbm: [B, Cout, HWp]."""
    hwp = x_hbm.shape[-1]
    dtype = in_buf.dtype

    def in_dma(slot, b):
        return pltpu.make_async_copy(
            x_hbm.at[b], in_buf.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, b):
        return pltpu.make_async_copy(
            out_buf.at[slot], out_hbm.at[b], out_sem.at[slot]
        )

    # Single pixel-validity mask, [1, HWp]: lane p holds pixel
    # (r, c) = (p // (w+2), p % (w+2) - 1); pad columns (p % (w+2) in
    # {0, w+1}) and the [h*(w+2), HWp) tail are invalid. Applied ONCE
    # to the expanded map, it guarantees every tap slice reads either a
    # valid pixel or a zero — the per-tap masks this replaces were the
    # kernel's VPU bottleneck (measured 1.7x slower than stock XLA).
    ws = w + 2
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, hwp), 1)
    col = pix % ws
    valid = jnp.logical_and(
        pix < h * ws, jnp.logical_and(col >= 1, col <= w)
    )

    def body(b, carry):
        s = b % 2

        @pl.when(b == 0)
        def _():
            in_dma(0, 0).start()

        @pl.when(b + 1 < n_img)
        def _():
            in_dma((b + 1) % 2, b + 1).start()

        in_dma(s, b).wait()
        x_cp = in_buf[s]  # [Cin, HWp]

        if expand:
            e = _relu6(
                jnp.dot(weT_ref[...], x_cp, preferred_element_type=jnp.float32)
                + be_ref[...]
            ).astype(dtype)
        else:
            e = x_cp
        # zero the pad columns/tail (previous block's bias lands there)
        e = jnp.where(valid, e, jnp.zeros((), dtype))

        acc = jnp.zeros((ce, hwp), jnp.float32)
        ep = jnp.pad(e, ((0, 0), (ws + 1, ws + 1)))
        for di in range(3):
            for dj in range(3):
                o = (di - 1) * ws + (dj - 1)
                seg = jax.lax.slice_in_dim(
                    ep, o + ws + 1, o + ws + 1 + hwp, axis=1
                )
                tap = wd_ref[:, di * 3 + dj : di * 3 + dj + 1].astype(jnp.float32)
                acc = acc + seg.astype(jnp.float32) * tap
        d = _relu6(acc + bd_ref[...]).astype(dtype)

        p = (
            jnp.dot(wpT_ref[...], d, preferred_element_type=jnp.float32)
            + bp_ref[...]
        )
        if residual:
            p = p + x_cp.astype(jnp.float32)

        @pl.when(b >= 2)
        def _():
            out_dma(s, b - 2).wait()

        out_buf[s] = p.astype(dtype)
        out_dma(s, b).start()
        return carry

    jax.lax.fori_loop(0, n_img, body, 0)

    @pl.when(n_img >= 2)
    def _():
        out_dma((n_img - 2) % 2, n_img - 2).wait()

    out_dma((n_img - 1) % 2, n_img - 1).wait()


def fused_mbconv2_cp(
    x_cp: jnp.ndarray,  # [B, Cin, HWp]
    weT: Optional[jnp.ndarray],  # [Ce, Cin] or None (expand_ratio == 1)
    be: Optional[jnp.ndarray],  # [Ce, 1] f32
    wd: jnp.ndarray,  # [Ce, 9] tap-minor (tap k = di*3 + dj)
    bd: jnp.ndarray,  # [Ce, 1] f32
    wpT: jnp.ndarray,  # [Cout, Ce]
    bp: jnp.ndarray,  # [Cout, 1] f32
    *,
    h: int,
    w: int,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chainable CP-layout fused stride-1 block: [B, Cin, HWp] ->
    [B, Cout, HWp] with HWp >= H*(W+2) (see module docstring for the
    row-padded lane layout). Pad-column/tail lanes of the OUTPUT carry
    the project bias (don't-care): consumers must mask or use from_cp,
    and chained blocks re-mask internally."""
    n_img, cin, hwp = x_cp.shape
    expand = weT is not None
    ce = wd.shape[0]
    cout = wpT.shape[0]
    assert hwp >= h * (w + 2) and hwp % 128 == 0, (hwp, h, w)
    if not expand:
        assert ce == cin
        weT = jnp.zeros((8, cin), x_cp.dtype)
        be = jnp.zeros((8, 1), jnp.float32)
    kern = functools.partial(
        _cp_kernel,
        n_img=n_img, h=h, w=w, cin=cin, ce=ce, cout=cout,
        expand=expand, residual=residual,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[any_spec, vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((n_img, cout, hwp), x_cp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cin, hwp), x_cp.dtype),
            pltpu.VMEM((2, cout, hwp), x_cp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the 80x80 run's f32 accumulator + tap temporaries exceed
            # the default 16M scoped-vmem limit; v5e has 128M physical
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_cp, weT, be, wd, bd, wpT, bp)


def to_cp(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, C, HWp]: insert one zero pad column per row
    side, flatten rows onto lanes, pad lanes to a 128 multiple (one XLA
    pad + transpose)."""
    b, h, w, c = x.shape
    ws = w + 2
    hwp = _round_up(h * ws, 128)
    m = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    m = m.reshape(b, h * ws, c).transpose(0, 2, 1)
    return jnp.pad(m, ((0, 0), (0, 0), (0, hwp - h * ws)))


def from_cp(x_cp: jnp.ndarray, shape: Tuple[int, int, int, int]) -> jnp.ndarray:
    """[B, C, HWp] -> [B, H, W, C] (drops pad columns/tail lanes)."""
    b, h, w, c = shape
    ws = w + 2
    y = (
        jax.lax.slice_in_dim(x_cp, 0, h * ws, axis=2)
        .transpose(0, 2, 1)
        .reshape(b, h, ws, c)
    )
    return y[:, :, 1 : w + 1, :]


def cp_block_args(we, be, wd, bd, wp, bp, dtype=jnp.bfloat16):
    """v1 weight layouts (we [Cin,Ce], biases [1,C], wd [3,3,Ce],
    wp [Ce,Cout]) -> CP layouts."""
    weT = we.T.astype(dtype) if we is not None else None
    be_c = be.T.astype(jnp.float32) if be is not None else None
    wd_c = wd.reshape(9, wd.shape[-1]).T.astype(dtype)
    bd_c = bd.T.astype(jnp.float32)
    wpT = wp.T.astype(dtype)
    bp_c = bp.T.astype(jnp.float32)
    return weT, be_c, wd_c, bd_c, wpT, bp_c


def fused_mbconv2(
    x: jnp.ndarray,  # [B, H, W, Cin]
    we, be, wd, bd, wp, bp,
    *,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """4-D convenience wrapper (stride 1 only), v1 weight layouts."""
    b, h, w, cin = x.shape
    weT, be_c, wd_c, bd_c, wpT, bp_c = cp_block_args(
        we, be, wd, bd, wp, bp, dtype=x.dtype
    )
    y_cp = fused_mbconv2_cp(
        to_cp(x), weT, be_c, wd_c, bd_c, wpT, bp_c,
        h=h, w=w, residual=residual, interpret=interpret,
    )
    return from_cp(y_cp, (b, h, w, wp.shape[-1]))
