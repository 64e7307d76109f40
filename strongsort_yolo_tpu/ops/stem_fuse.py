"""Letterbox folded INTO the stem convolution — zero-preprocess inference.

The reference pipeline letterboxes every frame on the host with cv2
(ultralytics ``LetterBox``, entered via
/root/reference/yolo_multi_model.py:41 — SURVEY.md D2) and then runs
the model on the 640x640 result. Round-1 of this repo already moved
the letterbox on-device (ops/letterbox.py), but profiling the S=32
batched step on the v5e showed the resize contraction + pad + /255 +
BGR-flip chain still costing ~2ms/step — comparable to the whole v8n
backbone — because at 1080p the dense bilinear operator does ~7
GFLOP/frame of mostly-zero work and materializes two full-frame
intermediates in HBM.

The TPU-native fix: for the common video geometries the letterbox is
PURE DECIMATION (1920x1080 -> 640x360 is an exact 3x under
cv2.INTER_LINEAR sampling: src = 3*dst + 1, zero fractional weight),
and decimation composed with the s2d-fused stem (ops/pack.py
``fuse_stem_s2d``: a 6x6/s4 conv) is just the SAME conv with dilated
taps on the RAW frame:

    stem6(letterbox(x))  ==  conv(x_raw, W, stride=4*s, rhs_dilation=s)

with the gray letterbox bars handled analytically: output rows whose
receptive field sees only bars are a constant map (computed by running
the stem once on an all-gray tile, batch 1 — microseconds), and the
two boundary rows come out of the band conv by padding the raw frame
with a few gray rows. /255 and BGR->RGB fold into the conv weights.

Net effect: the model consumes the decoded 1080p frame DIRECTLY — no
resize, no pad, no normalize, no layout copy; the only full-frame HBM
read is the conv itself.

Everything is trace-time static: ``stem_fuse_plan`` inspects the
letterbox geometry (python ints) and returns None when the fold does
not apply (non-integer scale, horizontal bars, thin bars), in which
case callers fall back to ops/letterbox.py.

MEASUREMENT NOTE (v5e, S=32 batched step): the full fold — dilated
conv straight on the 1080p frame — lowered BADLY (XLA materialized a
~3ms layout copy of the padded frame and scalarized the
stride-12/dilation-3 conv). What the pipeline actually uses is the
*identity-decimation* plan: resize on the MXU
(ops/letterbox.resize_bilinear_matmul, ~130 TFLOP/s measured), then
``fused_stem_apply`` on the resized bars-free image with sy=sx=1 —
that still folds the gray bars, the 640x640 pad materialization,
/255 and BGR->RGB into the stem conv, and it applies to EVERY
landscape geometry, not just integer scales.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.models import common as C
from strongsort_yolo_tpu.ops.letterbox import (
    LetterboxParams,
    _decimation_stride,
)

Params = dict[str, Any]


class StemFusePlan(NamedTuple):
    """Static geometry for the letterbox->stem fold (python ints)."""

    sy: int  # vertical decimation stride (src_h / new_h)
    sx: int  # horizontal decimation stride
    i_lo: int  # first stem-output row computed by the band conv
    i_hi: int  # last stem-output row computed by the band conv
    pad_top: int  # gray raw rows prepended (letterbox bar taps)
    pad_bot: int  # gray raw rows appended
    pad_left: int  # ZERO raw cols prepended (stem conv border padding)
    pad_right: int  # zero raw cols appended
    h_out: int  # stem output height (= imgsz/4)
    w_out: int  # stem output width
    gray: float  # letterbox bar value at raw scale (114.0)


def stem_fuse_plan(
    lp: LetterboxParams, src_h: int, src_w: int, *, gray: float = 114.0
) -> StemFusePlan | None:
    """Check whether letterbox(src) -> stem6 folds into one dilated
    conv on the raw frame; return the static plan, or None.

    Requirements (all checked, not assumed):
    - both axes are exact integer decimations under INTER_LINEAR
      sampling (odd factors: 3x for 1080p/360p..., 1x passthrough);
    - no horizontal bars (new_w == size — the 16:9-video case) so
      every out-of-frame column tap is the stem's own zero padding;
    - vertical bars at least 4 model-pixels thick, so band-conv
      windows never straddle the stem's zero padding AND gray bars
      at the same edge.
    """
    if lp.size % 4:
        return None
    dec_y = _decimation_stride(lp.new_h, src_h)
    dec_x = _decimation_stride(lp.new_w, src_w)
    if dec_y is None or dec_x is None:
        return None
    off_y, sy = dec_y
    off_x, sx = dec_x
    top = int(round(lp.pad_y - 0.1))
    left = int(round(lp.pad_x - 0.1))
    if left != 0 or lp.new_w != lp.size:
        return None
    if top < 4:
        return None
    h_out = w_out = lp.size // 4
    # stem-output rows whose 6-tap window (model rows 4I-2 .. 4I+3)
    # touches the image band [top, top+new_h)
    i_lo = -((-(top - 3)) // 4)  # ceil((top-3)/4) >= 1 since top >= 4
    i_hi = min((top + lp.new_h + 1) // 4, h_out - 1)
    n_band = i_hi - i_lo + 1

    # vertical: raw row of model-row y is sy*(y-top)+off_y; the first
    # band tap is always negative (gray bar), so the band conv starts
    # exactly at padded row 0
    raw_start = sy * (4 * i_lo - 2 - top) + off_y
    assert raw_start < 0, (raw_start, i_lo, top)
    pad_top = -raw_start
    ext_y = 5 * sy + 1  # dilated 6-tap extent
    # negative = the raw frame already covers the last window's taps
    # (spare rows); the conv output is sliced to n_band/w_out windows
    pad_bot = max(0, (4 * sy * (n_band - 1) + ext_y) - pad_top - src_h)
    # horizontal: column taps left of the frame are the stem's zero
    # padding (model cols -2,-1); right side likewise (cols size..)
    pad_left = 2 * sx - off_x
    ext_x = 5 * sx + 1
    pad_right = max(
        0, (4 * sx * (w_out - 1) + ext_x) - pad_left - src_w
    )
    if pad_left < 0:
        return None
    return StemFusePlan(
        sy, sx, i_lo, i_hi, pad_top, pad_bot, pad_left, pad_right,
        h_out, w_out, gray,
    )


def fused_stem_apply(
    stem6: Params,
    frame_u8: jnp.ndarray,
    plan: StemFusePlan,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """stem6(letterbox(frame)) as one dilated conv on the raw frame.

    frame_u8: (..., src_h, src_w, 3) uint8 BGR. Returns
    (..., h_out, w_out, C) ``dtype`` — the packed-prefix stem output
    (feed to down1 of ops/pack.pack_backbone_prefix).
    """
    p = plan
    x = frame_u8.astype(dtype)
    lead = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    b = x.shape[0]
    # gray rows first, zero cols second: corners are zero, matching the
    # stem conv's zero border padding (outside-frame columns win over
    # bar rows, exactly as in letterbox->conv)
    x = jnp.pad(
        x, ((0, 0), (p.pad_top, p.pad_bot), (0, 0), (0, 0)),
        constant_values=p.gray,
    )
    x = jnp.pad(x, ((0, 0), (0, 0), (p.pad_left, p.pad_right), (0, 0)))

    # fold BGR->RGB (channel flip) and /255 into the weights
    w = stem6["w"].astype(dtype)
    w = w[:, :, ::-1, :] * jnp.asarray(1.0 / 255.0, dtype)
    band = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(4 * p.sy, 4 * p.sx),
        padding=[(0, 0), (0, 0)],
        rhs_dilation=(p.sy, p.sx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    band = band[:, : p.i_hi - p.i_lo + 1, : p.w_out]
    band = C.bn_act(stem6, band, eps=eps)
    assert band.shape[1] == p.i_hi - p.i_lo + 1, band.shape
    assert band.shape[2] == p.w_out, band.shape

    # bar rows: constant map from the stem over an all-gray tile.
    # Batch-1 and 16x smaller than a frame — noise next to the band
    # conv (and XLA hoists it across scan/vmap bodies since it only
    # depends on the weights).
    size = 4 * p.h_out
    gray_img = jnp.full((1, size, size, 3), p.gray / 255.0, dtype)
    g = C.conv_apply(stem6, gray_img, stride=4, pad=2, eps=eps)
    c_out = g.shape[-1]
    out = jnp.concatenate(
        [
            jnp.broadcast_to(g[:, : p.i_lo], (b, p.i_lo, p.w_out, c_out)),
            band,
            jnp.broadcast_to(
                g[:, p.i_hi + 1 :],
                (b, p.h_out - 1 - p.i_hi, p.w_out, c_out),
            ),
        ],
        axis=1,
    )
    return out.reshape(lead + out.shape[1:])
