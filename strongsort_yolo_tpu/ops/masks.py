"""Instance mask synthesis (device) + polygonization (host).

Segmentation capability the reference uses through ultralytics
(`utils/ops.process_mask` + ``.masks.xy`` polygon export — SURVEY.md
D4, consumed at /root/reference/yolo_multi_model.py:71,:112).

Device side: mask = sigmoid(coef · proto) cropped to the detection box
is one (max_det, nm) @ (nm, H·W) matmul — MXU work for all detections
at once, vs the reference stack's per-detection loop. Host side:
cv2.findContours turns thresholded masks into the ``.masks.xy``
polygon lists the drawing code expects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def process_masks(
    coefs: jnp.ndarray,  # (M, nm) mask coefficients of kept detections
    proto: jnp.ndarray,  # (Hm, Wm, nm) prototype tensor
    boxes: jnp.ndarray,  # (M, 4) xyxy in model-input pixels
    input_hw: tuple[int, int],
) -> jnp.ndarray:
    """-> (M, Hm, Wm) float masks in [0,1], zeroed outside each box."""
    hm, wm, nm = proto.shape
    logits = jnp.einsum(
        "mc,hwc->mhw", coefs, proto, precision=jax.lax.Precision.HIGHEST
    )
    masks = jax.nn.sigmoid(logits)
    # crop to boxes (boxes are in input pixels; proto grid is input/4)
    sx = wm / input_hw[1]
    sy = hm / input_hw[0]
    x = (jnp.arange(wm, dtype=jnp.float32) + 0.5)[None, None, :]  # (1,1,Wm)
    y = (jnp.arange(hm, dtype=jnp.float32) + 0.5)[None, :, None]  # (1,Hm,1)
    x1 = boxes[:, 0, None, None] * sx
    y1 = boxes[:, 1, None, None] * sy
    x2 = boxes[:, 2, None, None] * sx
    y2 = boxes[:, 3, None, None] * sy
    inside = (x >= x1) & (x < x2) & (y >= y1) & (y < y2)
    return jnp.where(inside, masks, 0.0)


def masks_to_polygons(
    masks: np.ndarray,  # (M, Hm, Wm) float masks (host numpy)
    count: int,
    gain: float,
    pad: tuple[float, float],
    orig_hw: tuple[int, int],
    input_hw: tuple[int, int],
    threshold: float = 0.5,
) -> list[np.ndarray]:
    """Largest-contour polygon per mask in ORIGINAL frame coords —
    the ``.masks.xy`` surface (one (P, 2) float array per detection).
    """
    import cv2

    out: list[np.ndarray] = []
    hm, wm = masks.shape[1:]
    # proto-grid -> input-pixels -> original-frame
    sx_in = input_hw[1] / wm
    sy_in = input_hw[0] / hm
    for i in range(count):
        m = (masks[i] > threshold).astype(np.uint8)
        contours, _ = cv2.findContours(
            m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        if not contours:
            out.append(np.zeros((0, 2), np.float32))
            continue
        c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
        c[:, 0] = (c[:, 0] * sx_in - pad[0]) / gain
        c[:, 1] = (c[:, 1] * sy_in - pad[1]) / gain
        c[:, 0] = np.clip(c[:, 0], 0, orig_hw[1])
        c[:, 1] = np.clip(c[:, 1], 0, orig_hw[0])
        out.append(c)
    return out
