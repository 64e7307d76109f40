"""Anchor grid + DFL box decode for anchor-free YOLO heads (v8/v11).

Re-creates the decode ultralytics performs inside
``nn/modules/head.Detect`` (reached from /root/reference/
yolo_multi_model.py:41,:173 — SURVEY.md D3): anchor-free heads emit,
per location, ``4 * reg_max`` distribution-focal-loss logits over
discrete offsets plus ``nc`` class logits at strides 8/16/32. Decoding:

  dist = sum_k softmax(logits)[k] * k          (DFL expectation)
  box  = (anchor - dist_lt, anchor + dist_rb) * stride

Everything is fixed-shape: the anchor table is built once per input
size at trace time and folded into the jitted program as a constant.

Anchor-based decode for YOLOv5/v7 heads (SURVEY.md H8) lives in
models/yolov5.py next to its anchor tables.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def make_anchors(
    feat_hw: Sequence[tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centers + per-anchor stride for a set of FPN levels.

    feat_hw: [(h, w)] per level, e.g. [(80, 80), (40, 40), (20, 20)]
    for a 640 input. Returns (anchors (A, 2) in feature units,
    strides (A, 1)) with A = sum(h*w).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), s in zip(feat_hw, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), float(s), jnp.float32))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def anchors_from_indices(
    idx: jnp.ndarray,  # (K,) i32 flat anchor indices
    feat_hw: Sequence[tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centers + strides computed ARITHMETICALLY from flat
    anchor indices — row-for-row identical to ``make_anchors(...)``
    gathered at ``idx``, without the gather: (K,)-indexed gathers from
    the constant tables lower to 1-lane scalarized loads inside big
    fused programs (v5e roofline audit: one (32768,) f32 gather ran at
    1461x its bytes bound, ~233 us/step at S=64). Pure VPU int
    arithmetic instead: level by base comparison, then divmod by the
    level width. Exact — all quantities are small ints in f32 range.

    Returns (anchors (K, 2) f32, strides (K, 1) f32).
    """
    idx = idx.astype(jnp.int32)
    base = jnp.zeros_like(idx)
    wl = jnp.full_like(idx, feat_hw[0][1])
    st = jnp.full_like(idx, int(strides[0]))
    acc = 0
    for (h, w), s in zip(feat_hw, strides):
        sel = idx >= acc
        base = jnp.where(sel, acc, base)
        wl = jnp.where(sel, w, wl)
        st = jnp.where(sel, int(s), st)
        acc += h * w
    rel = idx - base
    gy = rel // wl
    gx = rel - gy * wl
    anchors = jnp.stack(
        [gx.astype(jnp.float32) + grid_cell_offset,
         gy.astype(jnp.float32) + grid_cell_offset], axis=-1
    )
    return anchors, st.astype(jnp.float32)[:, None]


def dfl_expectation(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """DFL: softmax over ``reg_max`` bins -> expected offset.

    box_logits: (..., 4, reg_max) -> (..., 4) expected ltrb distances.
    The bin-index contraction is expressed as a dot so XLA maps it to
    the MXU instead of a reduce chain.
    """
    probs = jax.nn.softmax(box_logits, axis=-1)
    bins = jnp.arange(reg_max, dtype=probs.dtype)
    return probs @ bins


def decode_boxes(
    box_logits: jnp.ndarray,
    anchors: jnp.ndarray,
    strides: jnp.ndarray,
    reg_max: int = 16,
) -> jnp.ndarray:
    """DFL logits -> xyxy boxes in model-input pixels.

    box_logits: (A, 4 * reg_max); anchors: (A, 2); strides: (A, 1).
    """
    a = box_logits.shape[0]
    dist = dfl_expectation(box_logits.reshape(a, 4, reg_max), reg_max)
    lt, rb = dist[:, :2], dist[:, 2:]
    x1y1 = (anchors - lt) * strides
    x2y2 = (anchors + rb) * strides
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def decode_boxes_xywh(
    box_logits: jnp.ndarray,
    anchors: jnp.ndarray,
    strides: jnp.ndarray,
    reg_max: int = 16,
) -> jnp.ndarray:
    """Same as decode_boxes but emitting (cx, cy, w, h) — used by the
    training loss which regresses in center form."""
    a = box_logits.shape[0]
    dist = dfl_expectation(box_logits.reshape(a, 4, reg_max), reg_max)
    lt, rb = dist[:, :2], dist[:, 2:]
    c = (anchors + (rb - lt) * 0.5) * strides
    wh = (lt + rb) * strides
    return jnp.concatenate([c, wh], axis=-1)
