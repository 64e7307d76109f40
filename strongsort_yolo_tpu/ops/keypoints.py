"""Pose keypoint decode (anchor-free head, SURVEY.md D5).

The pose head emits, per anchor, 17 × (dx, dy, logit-conf); decode is

    x = (2·dx + anchor_x − 0.5) · stride
    y = (2·dy + anchor_y − 0.5) · stride
    conf = sigmoid(logit)

matching the ``.keypoints.xy`` surface the reference walks at
/root/reference/yolo_multi_model.py:58-67 (invisible keypoints show up
as (0, 0) there; we carry confidence instead and let the annotator
filter, which reproduces that behavior without destroying data).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_keypoints(
    kpt_raw: jnp.ndarray,  # (M, nk) raw head output rows (kept dets)
    anchors: jnp.ndarray,  # (M, 2) anchor centers (feature units)
    strides: jnp.ndarray,  # (M, 1)
    n_kpt: int = 17,
) -> jnp.ndarray:
    """-> (M, n_kpt, 3): x, y in model-input pixels, conf in [0,1]."""
    m = kpt_raw.shape[0]
    k = kpt_raw.reshape(m, n_kpt, -1)
    x = (k[..., 0] * 2.0 + (anchors[:, None, 0] - 0.5)) * strides
    y = (k[..., 1] * 2.0 + (anchors[:, None, 1] - 0.5)) * strides
    if k.shape[-1] == 3:
        conf = jax.nn.sigmoid(k[..., 2])
    else:
        conf = jnp.ones_like(x)
    return jnp.stack([x, y, conf], axis=-1)


def scale_keypoints(
    kpts: jnp.ndarray,  # (M, n_kpt, 3)
    gain: jnp.ndarray,
    pad: jnp.ndarray,  # (2,)
    orig_hw: jnp.ndarray,  # (2,) h, w
) -> jnp.ndarray:
    """Model-input coords -> original frame coords (conf untouched)."""
    x = jnp.clip((kpts[..., 0] - pad[0]) / gain, 0, orig_hw[1])
    y = jnp.clip((kpts[..., 1] - pad[1]) / gain, 0, orig_hw[0])
    return jnp.stack([x, y, kpts[..., 2]], axis=-1)
