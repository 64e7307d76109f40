"""Box geometry ops (jit-safe, fixed shape).

Covers the coordinate plumbing the reference delegates to ultralytics
(`utils/ops.xywh2xyxy` / `scale_boxes`, pulled in via
/root/reference/yolo_multi_model.py:41,:173 — SURVEY.md D6/D7): box
format conversion, IoU matrices, and mapping letterboxed-image boxes
back to original frame coordinates.

All functions are pure jnp and broadcast over leading batch dims, so
they can sit inside the single jitted per-frame step.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Last dim must be 4."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy2xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Last dim must be 4."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def xyxy2xyah(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, aspect=w/h, h) — DeepSORT KF state."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, w / jnp.maximum(h, 1e-6), h], axis=-1
    )


def xyah2xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, aspect, h) -> (x1, y1, x2, y2)."""
    cx, cy, a, h = jnp.split(boxes, 4, axis=-1)
    w = a * h
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; clamps negative extents to zero."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU matrix between xyxy boxes.

    a: (..., N, 4), b: (..., M, 4) -> (..., N, M). Runs entirely on the
    VPU as fused elementwise ops; N*M stays fixed-shape so it jits once.
    """
    a = a[..., :, None, :]  # (..., N, 1, 4)
    b = b[..., None, :, :]  # (..., 1, M, 4)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(a)
    area_b = box_area(b)
    return inter / (area_a + area_b - inter + eps)


def box_diou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise Distance-IoU (used by some NMS variants / losses)."""
    iou = box_iou(a, b, eps)
    ac = (a[..., :, None, :2] + a[..., :, None, 2:]) * 0.5
    bc = (b[..., None, :, :2] + b[..., None, :, 2:]) * 0.5
    center_d2 = jnp.sum((ac - bc) ** 2, axis=-1)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    diag2 = jnp.sum((rb - lt) ** 2, axis=-1)
    return iou - center_d2 / (diag2 + eps)


def ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise Complete-IoU between aligned xyxy boxes (..., 4).

    Used by the detection regression loss (train/loss.py). Returns
    (...,) CIoU values.
    """
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(a)
    area_b = box_area(b)
    union = area_a + area_b - inter + eps
    iou = inter / union

    # enclosing box diagonal
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    diag2 = jnp.sum((erb - elt) ** 2, axis=-1) + eps
    ac = (a[..., :2] + a[..., 2:]) * 0.5
    bc = (b[..., :2] + b[..., 2:]) * 0.5
    center_d2 = jnp.sum((ac - bc) ** 2, axis=-1)

    wa = jnp.maximum(a[..., 2] - a[..., 0], eps)
    ha = jnp.maximum(a[..., 3] - a[..., 1], eps)
    wb = jnp.maximum(b[..., 2] - b[..., 0], eps)
    hb = jnp.maximum(b[..., 3] - b[..., 1], eps)
    v = (4.0 / jnp.pi**2) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    alpha = v / (1.0 - iou + v + eps)
    return iou - center_d2 / diag2 - alpha * v


def scale_boxes(
    boxes: jnp.ndarray,
    gain: jnp.ndarray,
    pad: jnp.ndarray,
    orig_hw: jnp.ndarray,
) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to the original frame.

    Mirrors the rescale ultralytics applies after NMS (reference result
    boxes arrive in original-frame pixels: yolo_multi_model.py:74-77).

    gain: scalar scale that was applied to the source frame.
    pad: (2,) = (pad_x, pad_y) letterbox padding in model-input pixels.
    orig_hw: (2,) = (height, width) of the original frame for clipping.
    """
    x1 = (boxes[..., 0] - pad[0]) / gain
    y1 = (boxes[..., 1] - pad[1]) / gain
    x2 = (boxes[..., 2] - pad[0]) / gain
    y2 = (boxes[..., 3] - pad[1]) / gain
    h, w = orig_hw[0], orig_hw[1]
    x1 = jnp.clip(x1, 0, w)
    y1 = jnp.clip(y1, 0, h)
    x2 = jnp.clip(x2, 0, w)
    y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
