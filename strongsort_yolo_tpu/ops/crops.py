"""Batched crop-gather: detection boxes -> fixed-size ReID crops.

The reference-era StrongSORT pipelines cut person crops with
per-detection Python/OpenCV loops (SURVEY.md H1 notes the rebuild
batches this). Here all M crops are produced on device as DENSE MXU
contractions — no gathers at all:

1. the frame is (optionally) downscaled once with the shared
   matmul-bilinear resize (ops/letterbox.py);
2. each crop's bilinear sampling becomes two data-dependent two-tap
   interpolation matrices (built with pure comparisons/elementwise
   ops), applied as a columns-first separable einsum.

Why not gathers: per-crop row-slab indexing (``img[yi][:, xi]``)
materializes (oh, W, C) intermediates — ~1.5 GB of HBM traffic per
128-crop 1080p batch, 7.5 ms measured on a v5e; direct 2-D point
gathers lower to scalar-ish gather kernels and measured 29 ms. The
einsum form is ~19 G MACs at downscale=2 and runs in ~0.4 ms, with
the frame never returning to the host between detection and
embedding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _tap_matrices(starts, sizes, n_out: int, src: int, dtype):
    """(M,) box starts/sizes -> (M, n_out, src) two-tap bilinear
    interpolation matrices (half-pixel-center sampling)."""
    frac = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) / n_out  # (n_out,)
    pos = starts[:, None] + frac[None, :] * sizes[:, None] - 0.5  # (M, n_out)
    lo = jnp.floor(pos)
    w_hi = jnp.clip(pos - lo, 0.0, 1.0)
    lo0 = jnp.clip(lo, 0, src - 1).astype(jnp.int32)
    lo1 = jnp.clip(lo + 1, 0, src - 1).astype(jnp.int32)
    grid = jnp.arange(src, dtype=jnp.int32)[None, None, :]
    # when lo0 == lo1 (edge clip) the two indicators coincide and the
    # weights sum to 1 — still exact
    m = (grid == lo0[..., None]) * (1.0 - w_hi[..., None]) + (
        grid == lo1[..., None]
    ) * w_hi[..., None]
    return m.astype(dtype)


def crop_and_resize(
    image: jnp.ndarray,  # (H, W, C) float (or uint8)
    boxes: jnp.ndarray,  # (M, 4) xyxy in image pixels
    out_hw: tuple[int, int] = (128, 64),
    *,
    downscale: int = 2,
) -> jnp.ndarray:
    """-> (M, out_h, out_w, C) float32 bilinear crops. Degenerate boxes
    yield zeros-ish samples; callers mask by det validity.

    downscale: pre-shrink factor for the shared source image (2 keeps
    full fidelity for persons up to ~2x the 128-row crop height and
    quarters the contraction cost; 1 samples the original pixels).
    """
    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul

    dt = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    img = image.astype(dt)
    h, w = img.shape[:2]
    if downscale > 1:
        sh, sw = max(h // downscale, 1), max(w // downscale, 1)
        img = resize_bilinear_matmul(img, sh, sw)
        sy, sx = sh / h, sw / w
    else:
        sh, sw, sy, sx = h, w, 1.0, 1.0
    oh, ow = out_hw

    x1, y1, x2, y2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    row_w = _tap_matrices(
        y1 * sy, jnp.maximum(y2 - y1, 1e-3) * sy, oh, sh, dt
    )  # (M, oh, sh)
    col_w = _tap_matrices(
        x1 * sx, jnp.maximum(x2 - x1, 1e-3) * sx, ow, sw, dt
    )  # (M, ow, sw)

    # columns first: ow (64) < oh (128) shrinks the intermediate early
    tmp = jnp.einsum("mow,hwc->mhoc", col_w, img)  # (M, sh, ow, C)
    out = jnp.einsum("mrh,mhoc->mroc", row_w, tmp)  # (M, oh, ow, C)
    return out.astype(jnp.float32)


def crop_and_resize_packed(
    image: jnp.ndarray,  # (H, W, C) float (or uint8)
    boxes: jnp.ndarray,  # (M, 4) xyxy in image pixels
    out_hw: tuple[int, int] = (128, 64),
    *,
    downscale: int = 2,
) -> jnp.ndarray:
    """-> (M, oh/2, ow/2, 4C) crops in :func:`~strongsort_yolo_tpu.ops.
    pack.space_to_depth` packing order — bit-comparable to
    ``space_to_depth(crop_and_resize(...))`` but the unpacked
    (M, oh, ow, C) tensor never exists: the output rows/cols are split
    into (pixel, sub-position) INSIDE the interpolation einsums, so the
    packed layout falls out of the contraction with no extra copy.

    Feeds ``osnet_apply(..., packed_input=True)`` (the 7x7/2 stem in
    transition form, ops/pack.pack_stem7_weight) — removing the
    measured ~460us/dispatch crop-tensor layout copy + MXU-starved
    3-channel stem conv from the S=16 StrongSORT step (NOTES.md).
    """
    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul

    oh, ow = out_hw
    assert oh % 2 == 0 and ow % 2 == 0, out_hw
    dt = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    img = image.astype(dt)
    h, w = img.shape[:2]
    if downscale > 1:
        sh, sw = max(h // downscale, 1), max(w // downscale, 1)
        img = resize_bilinear_matmul(img, sh, sw)
        sy, sx = sh / h, sw / w
    else:
        sh, sw, sy, sx = h, w, 1.0, 1.0

    x1, y1, x2, y2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    m = boxes.shape[0]
    # output row r = 2I + oy: splitting the r axis of the tap matrix
    # IS the (pixel, sub-position) factorization
    row_w = _tap_matrices(
        y1 * sy, jnp.maximum(y2 - y1, 1e-3) * sy, oh, sh, dt
    ).reshape(m, oh // 2, 2, sh)
    col_w = _tap_matrices(
        x1 * sx, jnp.maximum(x2 - x1, 1e-3) * sx, ow, sw, dt
    ).reshape(m, ow // 2, 2, sw)

    tmp = jnp.einsum("mjpw,hwc->mhjpc", col_w, img)  # (M, sh, ow/2, 2, C)
    out = jnp.einsum("miqh,mhjpc->mijcqp", row_w, tmp)
    # (M, oh/2, ow/2, C, oy, ox) -> channel index c*4 + oy*2 + ox
    return out.reshape(m, oh // 2, ow // 2, 4 * img.shape[2]).astype(
        jnp.float32
    )


# ---------------------------------------------------------------------------
# Banded pyramid sampling (round 4): the crop einsums above contract
# every crop against the FULL ds2 frame — measured 5.9 ms of the
# 19.8 ms S=16 StrongSORT step (30%), scaling with the 128 fixed crop
# slots. The banded form restricts each crop's contraction to a fixed
# (BH, BW) band of a pyramid level chosen per crop so the band always
# covers the box:
#   level 0 = the ds2 image (identical taps to crop_and_resize for
#             every box that fits its band — persons always do);
#   level L = 2x bilinear decimation of level L-1 (big boxes sample a
#             coarser level — LESS aliased than 2-tapping ds2).
# Two implementations share this exact semantic:
#   - crop_and_resize_pyramid: jit-able stacked-pyramid einsum (CPU
#     fallback + test oracle);
#   - ops/pallas/crop_kernel.banded_crop: the TPU kernel (per-crop
#     banded MXU matmuls, ~8x fewer FLOPs than the dense form).
# ---------------------------------------------------------------------------

BAND_H = 256  # band rows  (y0 aligned to 8  -> covers spans <= 247)
BAND_W = 512  # band cols  (x0 aligned to 128 -> covers spans <= 383)


def pyramid_dims(h: int, w: int, downscale: int = 2) -> list[tuple[int, int]]:
    """Static level dims: level 0 = (h//downscale, w//downscale); add
    2x-decimated levels until one fits entirely inside a band (that
    level can represent ANY box)."""
    dims = [(max(h // downscale, 1), max(w // downscale, 1))]
    while dims[-1][0] > BAND_H - 8 or dims[-1][1] > BAND_W - 128:
        ph, pw = dims[-1]
        dims.append((max(ph // 2, 1), max(pw // 2, 1)))
    return dims


def build_pyramid(image: jnp.ndarray, downscale: int = 2) -> list[jnp.ndarray]:
    """(..., H, W, C) -> list of level images (..., h_l, w_l, C), each
    level a bilinear 2x decimation chain from the previous (level 0
    matches crop_and_resize's ds2 staging exactly)."""
    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul

    h, w = image.shape[-3], image.shape[-2]
    dims = pyramid_dims(h, w, downscale)
    levels = [resize_bilinear_matmul(image, *dims[0])
              if dims[0] != (h, w) else image]
    for ph, pw in dims[1:]:
        levels.append(resize_bilinear_matmul(levels[-1], ph, pw))
    return levels


def _pad_dims(dims):
    """Per level, the padded (rows, cols) the band slides in."""
    return [
        (max(-(-ph // 8) * 8, BAND_H), max(-(-pw // 128) * 128, BAND_W))
        for ph, pw in dims
    ]


def banded_prep(boxes: jnp.ndarray, src_hw, dims, out_hw):
    """Per-crop banding parameters (shared by the Pallas kernel and the
    stacked-einsum oracle). boxes: (M, 4) xyxy in SOURCE pixels.

    -> scal (M, 6) f32 [y_base, y_step, x_base, x_step, h_l, w_l]
       (pos(r) = y_base + r*y_step in the SELECTED level's pixels),
       ints (M, 3) i32 [y0, x0, level]  (y0 8-aligned, x0 128-aligned,
       both relative to the level's padded image).
    """
    H, W = src_hw
    oh, ow = out_hw
    x1, y1, x2, y2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    size_y = jnp.maximum(y2 - y1, 1e-3)
    size_x = jnp.maximum(x2 - x1, 1e-3)
    pads = _pad_dims(dims)

    sel = None
    for lvl, ((hl, wl), (hp, wp)) in enumerate(zip(dims, pads)):
        sy, sx = hl / H, wl / W
        y_step = size_y * sy / oh
        y_base = (y1 + 0.5 * size_y / oh) * sy - 0.5
        x_step = size_x * sx / ow
        x_base = (x1 + 0.5 * size_x / ow) * sx - 0.5
        lo_y = jnp.floor(y_base)
        hi_y = jnp.floor(y_base + (oh - 1) * y_step)
        lo_x = jnp.floor(x_base)
        hi_x = jnp.floor(x_base + (ow - 1) * x_step)
        whole = hl <= BAND_H - 8 and wl <= BAND_W - 128  # static
        fits = whole | (
            (hi_y - lo_y + 9 <= BAND_H) & (hi_x - lo_x + 129 <= BAND_W)
        )
        lo_y_c = jnp.clip(lo_y, 0, hl - 1)
        lo_x_c = jnp.clip(lo_x, 0, wl - 1)
        y0 = jnp.minimum((lo_y_c // 8) * 8, hp - BAND_H).astype(jnp.int32)
        x0 = jnp.minimum((lo_x_c // 128) * 128, wp - BAND_W).astype(jnp.int32)
        row = dict(
            scal=jnp.stack(
                [y_base, y_step, x_base, x_step,
                 jnp.full_like(y_base, hl), jnp.full_like(y_base, wl)], -1
            ),
            ints=jnp.stack(
                [y0, x0, jnp.full_like(y0, lvl, dtype=jnp.int32)], -1
            ),
            fits=fits,
        )
        if sel is None:
            sel = row
            sel["done"] = fits
        else:
            take = row["fits"] & ~sel["done"]
            sel["scal"] = jnp.where(take[:, None], row["scal"], sel["scal"])
            sel["ints"] = jnp.where(take[:, None], row["ints"], sel["ints"])
            sel["done"] = sel["done"] | row["fits"]
    # the last level fits any box by construction (pyramid_dims)
    return sel["scal"], sel["ints"]


def _rel_taps(base, step, n_out: int, span: int, src_len, off, dtype):
    """Two-tap interpolation matrix RELATIVE to a band: (..., n_out,
    span) with indicators at (clip(floor(pos),0,src-1) - off) and the
    +1 tap. base/step/src_len/off: (...,) per-crop scalars."""
    r = jnp.arange(n_out, dtype=jnp.float32)
    pos = base[..., None] + r * step[..., None]           # (..., n_out)
    lo = jnp.floor(pos)
    w = jnp.clip(pos - lo, 0.0, 1.0)
    lim = src_len[..., None] - 1.0
    lo0 = jnp.clip(lo, 0.0, lim) - off[..., None]
    lo1 = jnp.clip(lo + 1.0, 0.0, lim) - off[..., None]
    grid = jnp.arange(span, dtype=jnp.float32)
    m = (grid == lo0[..., None]) * (1.0 - w[..., None]) + (
        grid == lo1[..., None]
    ) * w[..., None]
    return m.astype(dtype)


def crop_and_resize_pyramid(
    image: jnp.ndarray,   # (H, W, C) float (or uint8)
    boxes: jnp.ndarray,   # (M, 4) xyxy in image pixels
    out_hw: tuple[int, int] = (128, 64),
    *,
    downscale: int = 2,
    levels: list[jnp.ndarray] | None = None,  # prebuilt build_pyramid()
) -> jnp.ndarray:
    """Banded-pyramid sampling as a jit-able STACKED einsum — the exact
    semantic of the Pallas kernel (same taps, same band clamps, same
    intermediate rounding points), usable on any backend. The levels
    are stacked vertically (each padded to its band-padded dims) and
    each crop's taps index its selected level's rows/cols; everything
    outside contributes exact zeros to the f32 accumulation."""
    dt = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    img = image.astype(dt)
    h, w = img.shape[:2]
    c = img.shape[2]
    oh, ow = out_hw
    dims = pyramid_dims(h, w, downscale)
    pads = _pad_dims(dims)
    if levels is None:
        levels = build_pyramid(img, downscale)
    max_w = max(wp for _, wp in pads)
    stacked = jnp.concatenate(
        [
            jnp.pad(lv.astype(dt), ((0, hp - ph), (0, max_w - pw), (0, 0)))
            for lv, (ph, pw), (hp, _) in zip(levels, dims, pads)
        ],
        axis=0,
    )
    scal, ints = banded_prep(boxes, (h, w), dims, out_hw)
    row_off = np.cumsum([0] + [hp for hp, _ in pads[:-1]])
    lvl = ints[:, 2]
    # absolute row index of each crop's level-0 row inside the stack
    y_off = -jnp.asarray(row_off, jnp.float32)[lvl]   # taps get -(-off)=+off
    row_w = _rel_taps(
        scal[:, 0], scal[:, 1], oh, stacked.shape[0],
        scal[:, 4], y_off, dt,
    )  # (M, oh, sumH) — off=-row_off makes indices absolute in the stack
    col_w = _rel_taps(
        scal[:, 2], scal[:, 3], ow, stacked.shape[1],
        scal[:, 5], jnp.zeros_like(scal[:, 5]), dt,
    )  # (M, ow, maxW)
    tmp = jnp.einsum("mow,hwc->mhoc", col_w, stacked)   # (M, sumH, ow, C)
    out = jnp.einsum("mrh,mhoc->mroc", row_w, tmp)      # (M, oh, ow, C)
    return out.astype(jnp.float32)
