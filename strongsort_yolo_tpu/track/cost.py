"""Association cost matrices — fused, fixed-shape, on device.

Re-creates ultralytics ``trackers/utils/matching.py`` (SURVEY.md D12)
and the StrongSORT cost design (SURVEY.md H4) as vectorized jnp:
IoU cost, detection-score fusion, cosine appearance distance,
Mahalanobis gating. The (K, N) matrices are tiny; XLA fuses the whole
cost construction into the surrounding tracking step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.boxes import box_iou
from strongsort_yolo_tpu.track import kalman

INF_COST = 1.0e4  # forbidden-pair cost (assignment treats as unmatchable)


def iou_cost(
    track_boxes: jnp.ndarray, det_boxes: jnp.ndarray
) -> jnp.ndarray:
    """1 - IoU between slot boxes (K, 4) and det boxes (N, 4), xyxy."""
    return 1.0 - box_iou(track_boxes, det_boxes)


def fuse_score(cost: jnp.ndarray, det_scores: jnp.ndarray) -> jnp.ndarray:
    """ByteTrack fuse_score: similarity *= det confidence.

    cost (K, N), det_scores (N,) -> fused cost.
    """
    sim = (1.0 - cost) * det_scores[None, :]
    return 1.0 - sim


def embedding_distance(
    track_feats: jnp.ndarray, det_feats: jnp.ndarray
) -> jnp.ndarray:
    """Cosine distance between EMA track features (K, D) and detection
    features (N, D). Features are L2-normalized by callers; a zero
    feature (empty slot) yields distance 1. One (K, D) @ (D, N) matmul
    — MXU work, unlike the reference stack's scipy cdist."""
    sim = jnp.matmul(
        track_feats, det_feats.T, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.clip(1.0 - sim, 0.0, 2.0)


def botsort_fused_cost(
    d_iou: jnp.ndarray,
    emb_dist: jnp.ndarray | None,
    det_scores: jnp.ndarray,
    *,
    proximity_thresh: float = 0.5,
    appearance_thresh: float = 0.25,
    with_fuse_score: bool = True,
) -> jnp.ndarray:
    """BoT-SORT ``get_dists``: IoU cost (score-fused) min'd with a
    thresholded half appearance distance (SURVEY.md D10)."""
    far = d_iou > proximity_thresh  # proximity gate
    cost = fuse_score(d_iou, det_scores) if with_fuse_score else d_iou
    if emb_dist is None:
        return cost
    emb = emb_dist / 2.0
    emb = jnp.where(emb > appearance_thresh, 1.0, emb)
    emb = jnp.where(far, 1.0, emb)
    return jnp.minimum(cost, emb)


def strongsort_cost(
    maha: jnp.ndarray,
    emb_dist: jnp.ndarray,
    *,
    lambda_appearance: float = 0.98,
    gate: float = kalman.CHI2_95_4DOF,
) -> jnp.ndarray:
    """StrongSORT association cost (SURVEY.md H4):

    λ-weighted blend of appearance (cosine) and motion (Mahalanobis,
    normalized by the chi-square gate), with pairs outside the gate
    forbidden. StrongSORT drops DeepSORT's matching cascade and solves
    one global assignment over this matrix.
    """
    motion = maha / gate
    cost = lambda_appearance * (emb_dist / 2.0) + (1.0 - lambda_appearance) * motion
    return jnp.where(maha > gate, INF_COST, cost)


def mask_cost(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Forbid padded rows/cols (assignment also masks, but keeping the
    matrix clean makes gating thresholds exact)."""
    ok = jnp.logical_and(row_valid[:, None], col_valid[None, :])
    return jnp.where(ok, cost, INF_COST)
