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

import jax
import jax.numpy as jnp


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
