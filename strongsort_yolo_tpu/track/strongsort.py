"""StrongSORT tracker as one jitted fixed-slot step.

The algorithm the repo is named for (SURVEY.md §2.4): DeepSORT
upgraded with an EMA appearance bank [H2], NSA Kalman noise [H3], a
motion+appearance blended cost with chi-square gating and NO matching
cascade [H4], ECC camera-motion compensation [H5] and the
tentative/confirmed/deleted lifecycle [H6]. The offline StrongSORT++
extras (AFLink, GSI) live in track/postprocess.py.

Per-frame update (all masked fixed-shape ops, one auction solve for
the appearance stage + one for the IoU fallback):

1. NSA-KF predict all live tracks (+ optional ECC warp).
2. Confirmed tracks × detections: cost =
   λ·(cosine/2) + (1-λ)·(Mahalanobis/gate), pairs outside the
   chi-square gate or appearance gate forbidden; global assignment.
3. IoU fallback: unconfirmed tracks + just-missed confirmed leftovers
   × leftover detections (max_iou_distance).
4. Matched: NSA-KF update (confidence-scaled R), EMA feature update,
   hits+1, confirm at n_init.
5. Unmatched tentative tracks die immediately; confirmed tracks die
   after max_age missed frames. Unmatched detections spawn tentative
   tracks.

State reuses track/state.py: TRACKED+activated == confirmed,
TRACKED+!activated == tentative.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from strongsort_yolo_tpu.ops.assignment import solve_assignment
from strongsort_yolo_tpu.ops.boxes import xyah2xyxy, xyxy2xyah
from strongsort_yolo_tpu.track import cost as costs
from strongsort_yolo_tpu.track import kalman
from strongsort_yolo_tpu.track.bytetrack import apply_warp
from strongsort_yolo_tpu.track.state import (
    STATUS_EMPTY,
    STATUS_TRACKED,
    TrackOutputs,
    TrackState,
)


@dataclasses.dataclass(frozen=True)
class StrongSortConfig:
    """StrongSORT knobs (paper defaults; SURVEY.md H2-H6)."""

    det_thresh: float = 0.3  # min confidence to consider a detection
    max_cosine_distance: float = 0.45  # appearance gate (cos dist / 2)
    lambda_appearance: float = 0.98  # λ weight on appearance in the blend
    match_thresh: float = 0.45  # assignment cost limit, stage 1
    max_iou_distance: float = 0.7  # IoU fallback stage
    max_age: int = 30  # missed frames before a confirmed track dies
    n_init: int = 3  # hits to confirm
    ema_alpha: float = 0.9  # appearance bank EMA [H2]
    gmc_method: str = "ecc"  # camera-motion compensation [H5]
    gate: float = kalman.CHI2_95_4DOF

    @property
    def form(self) -> str:
        return kalman.XYAH  # DeepSORT-family state


def _kf_update_slots(state, matched, slot_det, det_meas, det_scores, det_cls,
                     det_feats, cfg, has_app=None):
    idx = jnp.clip(slot_det, 0, det_meas.shape[0] - 1)
    meas = det_meas[idx]
    conf = det_scores[idx]
    new_mean, new_cov = kalman.update(
        state.mean, state.cov, meas, cfg.form, conf=conf  # NSA [H3]
    )
    m = matched
    new_hits = state.hits + 1
    confirmed = jnp.logical_or(state.activated, new_hits >= cfg.n_init)
    feat = state.feat
    if det_feats is not None:
        a = cfg.ema_alpha
        mixed = a * state.feat + (1.0 - a) * det_feats[idx]
        has_old = jnp.sum(jnp.abs(state.feat), axis=1, keepdims=True) > 1e-8
        mixed = jnp.where(has_old, mixed, det_feats[idx])
        mixed = mixed / jnp.maximum(
            jnp.linalg.norm(mixed, axis=1, keepdims=True), 1e-12
        )
        upd = m if has_app is None else jnp.logical_and(m, has_app)
        feat = jnp.where(upd[:, None], mixed, state.feat)
    return state._replace(
        mean=jnp.where(m[:, None], new_mean, state.mean),
        cov=jnp.where(m[:, None, None], new_cov, state.cov),
        score=jnp.where(m, det_scores[idx], state.score),
        cls=jnp.where(m, det_cls[idx], state.cls),
        activated=jnp.where(m, confirmed, state.activated),
        hits=jnp.where(m, new_hits, state.hits),
        end_frame=jnp.where(m, state.frame_id, state.end_frame),
        feat=feat,
    )


def strongsort_step(
    state: TrackState,
    det_boxes: jnp.ndarray,  # (N, 4) xyxy
    det_scores: jnp.ndarray,  # (N,)
    det_cls: jnp.ndarray,  # (N,) int32
    det_valid: jnp.ndarray,  # (N,) bool
    det_feats: jnp.ndarray,  # (N, D) L2-normalized ReID embeddings
    cfg: StrongSortConfig = StrongSortConfig(),
    *,
    warp: jnp.ndarray | None = None,  # (2, 3) ECC affine [H5]
    has_app: jnp.ndarray | None = None,  # scalar bool: det_feats are
    # real this frame. None (static) = always. When a traced False, the
    # frame's dets carry NO appearance (embed-cadence skip frame —
    # features are all-zero): stage 1 falls back to a motion-only cost
    # (Mahalanobis within the chi2 gate, scaled so the match_thresh
    # acceptance spans the whole gate) and the EMA bank holds.
) -> tuple[TrackState, TrackOutputs]:
    form = cfg.form
    state = state._replace(frame_id=state.frame_id + 1)
    usable = jnp.logical_and(det_valid, det_scores >= cfg.det_thresh)
    det_meas = xyxy2xyah(det_boxes)

    alive = state.status == STATUS_TRACKED
    confirmed = jnp.logical_and(alive, state.activated)
    tentative = jnp.logical_and(alive, jnp.logical_not(state.activated))

    # 1. predict everything alive
    pred_mean, pred_cov = kalman.predict(state.mean, state.cov, form)
    state = state._replace(
        mean=jnp.where(alive[:, None], pred_mean, state.mean),
        cov=jnp.where(alive[:, None, None], pred_cov, state.cov),
    )
    if warp is not None:
        state = apply_warp(state, warp, form)

    # 2. appearance+motion association over confirmed tracks [H4]
    emb = costs.embedding_distance(state.feat, det_feats)  # (K, N)
    maha = kalman.gating_distance(state.mean, state.cov, det_meas, form)
    blended = costs.strongsort_cost(
        maha, emb, lambda_appearance=cfg.lambda_appearance, gate=cfg.gate
    )
    blended = jnp.where(
        emb / 2.0 > cfg.max_cosine_distance, costs.INF_COST, blended
    )
    if has_app is not None:
        # embed-cadence skip frame: every det feature is zero, so the
        # cosine gate above would forbid EVERY pair (emb == 1). Use
        # motion only: Mahalanobis normalized to the gate, scaled so
        # ``match_thresh`` accepts the full in-gate range (ranking is
        # unchanged by the monotone scale).
        motion_only = jnp.where(
            maha > cfg.gate, costs.INF_COST,
            (maha / cfg.gate) * cfg.match_thresh,
        )
        blended = jnp.where(has_app, blended, motion_only)
    c1 = costs.mask_cost(blended, confirmed, usable)
    a1 = solve_assignment(c1, cfg.match_thresh, confirmed, usable)
    m1 = a1.row_to_col >= 0

    # 3. IoU fallback: tentative + freshly-missed confirmed tracks.
    # Stage sets are disjoint and costs use predicted means, so the KF
    # update for both stages is deferred and applied once.
    just_missed = jnp.logical_and(
        confirmed,
        jnp.logical_and(
            jnp.logical_not(m1),
            state.end_frame == state.frame_id - 1,
        ),
    )
    iou_rows = jnp.logical_or(tentative, just_missed)
    left = jnp.logical_and(usable, a1.col_to_row < 0)
    slot_boxes = xyah2xyxy(state.mean[:, :4])
    c2 = costs.mask_cost(costs.iou_cost(slot_boxes, det_boxes), iou_rows, left)
    a2 = solve_assignment(c2, cfg.max_iou_distance, iou_rows, left)
    m2 = a2.row_to_col >= 0

    matched = jnp.logical_or(m1, m2)
    slot_det = jnp.where(m1, a1.row_to_col, a2.row_to_col)
    state = _kf_update_slots(
        state, matched, slot_det, det_meas, det_scores, det_cls,
        det_feats, cfg, has_app=has_app,
    )

    # 4. deaths: unmatched tentative now; confirmed past max_age
    missed = jnp.logical_and(alive, jnp.logical_not(matched))
    kill_tent = jnp.logical_and(missed, jnp.logical_not(state.activated))
    too_old = (state.frame_id - state.end_frame) > cfg.max_age
    kill_conf = jnp.logical_and(
        jnp.logical_and(missed, state.activated), too_old
    )
    kill = jnp.logical_or(kill_tent, kill_conf)
    state = state._replace(
        status=jnp.where(kill, STATUS_EMPTY, state.status),
        track_id=jnp.where(kill, 0, state.track_id),
        activated=jnp.where(kill, False, state.activated),
    )

    # 5. births: unmatched usable detections -> tentative tracks
    det_matched = jnp.logical_or(a1.col_to_row >= 0, a2.col_to_row >= 0)
    birth = jnp.logical_and(usable, jnp.logical_not(det_matched))
    state, spawn_mask, spawn_det = _spawn_strongsort(
        state, birth, det_meas, det_scores, det_cls, det_feats, cfg
    )

    # 6. outputs: confirmed tracks updated this frame
    active = jnp.logical_and(
        jnp.logical_and(state.status == STATUS_TRACKED, state.activated),
        state.end_frame == state.frame_id,
    )
    det_index = jnp.where(
        m1, a1.row_to_col,
        jnp.where(m2, a2.row_to_col, jnp.where(spawn_mask, spawn_det, -1)),
    ).astype(jnp.int32)
    out = TrackOutputs(
        boxes=xyah2xyxy(state.mean[:, :4]),
        track_id=state.track_id,
        score=state.score,
        cls=state.cls,
        active=active,
        det_index=det_index,
    )
    return state, out


def _spawn_strongsort(state, birth, det_meas, det_scores, det_cls, det_feats, cfg):
    """Claim EMPTY slots for new tentative tracks (det-index order)."""
    k = state.status.shape[0]
    n = birth.shape[0]
    empty = state.status == STATUS_EMPTY
    birth_rank = jnp.cumsum(birth.astype(jnp.int32)) - 1
    slot_rank = jnp.cumsum(empty.astype(jnp.int32)) - 1
    n_birth = jnp.sum(birth.astype(jnp.int32))
    n_empty = jnp.sum(empty.astype(jnp.int32))
    ranks = jnp.where(jnp.logical_and(birth, birth_rank < k), birth_rank, k)
    det_of_rank = (
        jnp.full((k + 1,), -1, jnp.int32)
        .at[ranks]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:k]
    )
    slot_det = det_of_rank[jnp.clip(slot_rank, 0, k - 1)]
    sm = jnp.logical_and(
        empty, jnp.logical_and(slot_rank < n_birth, slot_det >= 0)
    )
    idx = jnp.clip(slot_det, 0, n - 1)
    new_mean, new_cov = kalman.initiate(det_meas[idx], cfg.form)
    new_id = state.next_id + jnp.clip(birth_rank[idx], 0, None)
    nf = det_feats[idx]
    nf = nf / jnp.maximum(jnp.linalg.norm(nf, axis=1, keepdims=True), 1e-12)
    # n_init == 1 confirms immediately
    return state._replace(
        mean=jnp.where(sm[:, None], new_mean, state.mean),
        cov=jnp.where(sm[:, None, None], new_cov, state.cov),
        track_id=jnp.where(sm, new_id, state.track_id),
        status=jnp.where(sm, STATUS_TRACKED, state.status),
        activated=jnp.where(sm, cfg.n_init <= 1, state.activated),
        score=jnp.where(sm, det_scores[idx], state.score),
        cls=jnp.where(sm, det_cls[idx], state.cls),
        end_frame=jnp.where(sm, state.frame_id, state.end_frame),
        hits=jnp.where(sm, 1, state.hits),
        feat=jnp.where(sm[:, None], nf, state.feat),
        next_id=state.next_id + jnp.minimum(n_birth, n_empty),
        dropped_births=state.dropped_births + jnp.maximum(n_birth - n_empty, 0),
    ), sm, slot_det
