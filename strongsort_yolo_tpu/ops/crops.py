"""Batched crop-gather: detection boxes -> fixed-size ReID crops.

The reference-era StrongSORT pipelines cut person crops with
per-detection Python/OpenCV loops (SURVEY.md H1 notes the rebuild
batches this). Here all M crops are produced by one vmapped bilinear
gather on device — the frame never returns to the host between
detection and embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_and_resize(
    image: jnp.ndarray,  # (H, W, C) float or uint8
    boxes: jnp.ndarray,  # (M, 4) xyxy in image pixels
    out_hw: tuple[int, int] = (128, 64),
) -> jnp.ndarray:
    """-> (M, out_h, out_w, C) bilinear crops. Degenerate boxes yield
    zeros-ish samples; callers mask by det validity."""
    img = image.astype(jnp.float32)
    h, w = img.shape[:2]
    oh, ow = out_hw

    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh  # (oh,)
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow  # (ow,)

    def one(box):
        x1, y1, x2, y2 = box
        gy = y1 + ys * jnp.maximum(y2 - y1, 1e-3) - 0.5  # (oh,)
        gx = x1 + xs * jnp.maximum(x2 - x1, 1e-3) - 0.5  # (ow,)
        y0 = jnp.clip(jnp.floor(gy), 0, h - 1)
        x0 = jnp.clip(jnp.floor(gx), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        wy = jnp.clip(gy - y0, 0.0, 1.0)[:, None, None]  # (oh,1,1)
        wx = jnp.clip(gx - x0, 0.0, 1.0)[None, :, None]  # (1,ow,1)
        a = img[y0i][:, x0i]  # (oh, ow, C)
        b = img[y0i][:, x1i]
        c = img[y1i][:, x0i]
        d = img[y1i][:, x1i]
        top = a * (1 - wx) + b * wx
        bot = c * (1 - wx) + d * wx
        return top * (1 - wy) + bot * wy

    return jax.vmap(one)(boxes)
