"""ByteTrack / BoT-SORT as one jitted fixed-shape step.

Semantics target: the tracker the reference actually runs —
ultralytics BYTETracker with the BoT-SORT extensions, selected by
``tracker="botsort.yaml"`` at /root/reference/yolo_multi_model.py:41
(SURVEY.md D8-D10, D13). The per-frame update is the exact ByteTrack
two-stage cascade:

  1. predict all active+lost tracks (KF), apply camera-motion warp;
  2. stage 1: high-confidence dets vs (active ∪ lost) tracks,
     IoU cost (score-fused; + ReID appearance min-fusion for BoT-SORT),
     assignment threshold ``match_thresh``;
  3. stage 2: low-confidence rescue — remaining *tracked* tracks vs
     low dets, plain IoU, threshold 0.5; unmatched tracked → LOST;
  4. unconfirmed tracks vs leftover high dets, threshold 0.7;
     unmatched unconfirmed → removed;
  5. births: leftover high dets with score ≥ ``new_track_thresh``
     claim EMPTY slots (activated only on frame 1 — tracks surface in
     the output from their second hit, reference behavior per
     SURVEY.md D9);
  6. lost tracks older than ``track_buffer`` frames → removed.

but with every list operation replaced by masked fixed-shape array
ops and every ``lap.lapjv`` call replaced by the in-jit auction solver
(ops/assignment.py). The whole step — three assignment solves included
— is one XLA program: no recompiles, no host syncs, vmappable across
streams.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.assignment import solve_assignment
from strongsort_yolo_tpu.ops.boxes import xywh2xyxy, xyxy2xywh, xyah2xyxy, xyxy2xyah
from strongsort_yolo_tpu.track import cost as costs
from strongsort_yolo_tpu.track import kalman
from strongsort_yolo_tpu.track.state import (
    STATUS_EMPTY,
    STATUS_LOST,
    STATUS_TRACKED,
    TrackOutputs,
    TrackState,
)


@dataclasses.dataclass(frozen=True)
class ByteTrackConfig:
    """Tracker config — key set mirrors ultralytics cfg/trackers/*.yaml
    (SURVEY.md D13).

    Threshold provenance: the reference snapshot (2024-12-23) pulls in
    ultralytics 8.3.x, whose cfg/trackers/botsort.yaml at that date
    reads track_high_thresh 0.25 / track_low_thresh 0.1 /
    new_track_thresh 0.25 / track_buffer 30 / match_thresh 0.8 /
    fuse_score True / gmc_method sparseOptFlow / proximity_thresh 0.5 /
    appearance_thresh 0.25 / with_reid False — these are the defaults
    below. (The ORIGINAL 8.0-era yaml used 0.5/0.1/0.6; ultralytics
    lowered high/new to 0.25 during 2024. SURVEY.md D9 cites the
    8.0-era values; this pin supersedes it for ID parity.)"""

    tracker_type: str = "botsort"  # "bytetrack" | "botsort"
    track_high_thresh: float = 0.25
    track_low_thresh: float = 0.1
    new_track_thresh: float = 0.25
    track_buffer: int = 30
    match_thresh: float = 0.8
    fuse_score: bool = True
    # BoT-SORT extras
    gmc_method: str = "sparseOptFlow"  # host cv2 (track/gmc.py) or
    # "flow_tpu": device dense pyramidal LK (track/gmc_tpu.py)
    proximity_thresh: float = 0.5
    appearance_thresh: float = 0.25
    with_reid: bool = False
    # derived
    second_match_thresh: float = 0.5
    unconfirmed_match_thresh: float = 0.7
    reid_ema_alpha: float = 0.9

    @property
    def form(self) -> str:
        """KF measurement form: BoT-SORT filters xywh, ByteTrack xyah."""
        return kalman.XYWH if self.tracker_type == "botsort" else kalman.XYAH


def _to_meas(boxes_xyxy: jnp.ndarray, form: str) -> jnp.ndarray:
    return xyxy2xywh(boxes_xyxy) if form == kalman.XYWH else xyxy2xyah(boxes_xyxy)


def _to_xyxy(mean4: jnp.ndarray, form: str) -> jnp.ndarray:
    return xywh2xyxy(mean4) if form == kalman.XYWH else xyah2xyxy(mean4)


def apply_warp(state: TrackState, warp: jnp.ndarray, form: str) -> TrackState:
    """Apply a host-computed GMC affine warp (2, 3) to all track means
    (SURVEY.md D10/H5).

    XYWH (BoT-SORT): exact ultralytics ``STrack.multi_gmc`` semantics —
    R8x8 = kron(I4, R) hits every state pair (position, size, and both
    velocity pairs), then the translation is added to the position;
    covariance gets the full R8x8 congruence. XYAH (StrongSORT/ECC):
    position-only transform (aspect is rotation-invariant; the
    DeepSORT-family ECC papers warp centroids)."""
    hi = jax.lax.Precision.HIGHEST
    r = warp[:, :2]  # (2, 2)
    t = warp[:, 2]  # (2,)
    if form == kalman.XYWH:
        r8 = jnp.kron(jnp.eye(4), r)  # (8, 8)
        mean = jnp.matmul(state.mean, r8.T, precision=hi)
        mean = mean.at[:, :2].add(t[None, :])
    else:
        xy = jnp.matmul(state.mean[:, :2], r.T, precision=hi) + t[None, :]
        mean = jnp.concatenate([xy, state.mean[:, 2:]], axis=1)
        r8 = jnp.eye(8).at[:2, :2].set(r)
    cov = jnp.matmul(
        jnp.matmul(r8, state.cov, precision=hi), r8.T, precision=hi
    )
    nonempty = state.status != STATUS_EMPTY
    return state._replace(
        mean=jnp.where(nonempty[:, None], mean, state.mean),
        cov=jnp.where(nonempty[:, None, None], cov, state.cov),
    )


def _masked_kf_update(
    state: TrackState,
    slot_matched: jnp.ndarray,  # (K,) bool
    slot_det: jnp.ndarray,  # (K,) int32 det index (valid where matched)
    det_meas: jnp.ndarray,  # (N, 4)
    det_scores: jnp.ndarray,
    det_cls: jnp.ndarray,
    det_feats: jnp.ndarray | None,
    cfg: ByteTrackConfig,
    *,
    nsa: bool = False,
) -> TrackState:
    """KF-update matched slots with their detections; set track fields."""
    idx = jnp.clip(slot_det, 0, det_meas.shape[0] - 1)
    meas = det_meas[idx]  # (K, 4)
    conf = det_scores[idx] if nsa else None
    new_mean, new_cov = kalman.update(
        state.mean, state.cov, meas, cfg.form, conf=conf
    )
    m = slot_matched
    feat = state.feat
    if det_feats is not None:
        a = cfg.reid_ema_alpha
        mixed = a * state.feat + (1.0 - a) * det_feats[idx]
        # first feature (fresh track / zero EMA) is taken as-is
        has_old = jnp.sum(jnp.abs(state.feat), axis=1, keepdims=True) > 1e-8
        mixed = jnp.where(has_old, mixed, det_feats[idx])
        norm = jnp.linalg.norm(mixed, axis=1, keepdims=True)
        mixed = mixed / jnp.maximum(norm, 1e-12)
        feat = jnp.where(m[:, None], mixed, state.feat)
    return state._replace(
        mean=jnp.where(m[:, None], new_mean, state.mean),
        cov=jnp.where(m[:, None, None], new_cov, state.cov),
        score=jnp.where(m, det_scores[idx], state.score),
        cls=jnp.where(m, det_cls[idx], state.cls),
        status=jnp.where(m, STATUS_TRACKED, state.status),
        activated=jnp.logical_or(state.activated, m),
        end_frame=jnp.where(m, state.frame_id, state.end_frame),
        hits=jnp.where(m, state.hits + 1, state.hits),
        feat=feat,
    )


def bytetrack_step(
    state: TrackState,
    det_boxes: jnp.ndarray,  # (N, 4) xyxy (model-input or frame coords)
    det_scores: jnp.ndarray,  # (N,)
    det_cls: jnp.ndarray,  # (N,) int32
    det_valid: jnp.ndarray,  # (N,) bool
    cfg: ByteTrackConfig = ByteTrackConfig(),
    *,
    det_feats: jnp.ndarray | None = None,  # (N, D) L2-normed ReID embeddings
    warp: jnp.ndarray | None = None,  # (2, 3) GMC affine
) -> tuple[TrackState, TrackOutputs]:
    """One tracker frame. Pure function; jit/vmap/scan-safe."""
    form = cfg.form
    use_reid = cfg.with_reid and det_feats is not None
    state = state._replace(frame_id=state.frame_id + 1)

    high = jnp.logical_and(det_valid, det_scores >= cfg.track_high_thresh)
    low = jnp.logical_and(
        det_valid,
        jnp.logical_and(
            det_scores >= cfg.track_low_thresh,
            det_scores < cfg.track_high_thresh,
        ),
    )
    det_meas = _to_meas(det_boxes, form)

    tracked_act = jnp.logical_and(state.status == STATUS_TRACKED, state.activated)
    unconfirmed = jnp.logical_and(
        state.status == STATUS_TRACKED, jnp.logical_not(state.activated)
    )
    pool = jnp.logical_or(tracked_act, state.status == STATUS_LOST)

    # --- KF predict (pool only; lost tracks keep size velocity zeroed) ---
    still = state.status == STATUS_LOST
    pred_mean, pred_cov = kalman.predict(
        state.mean, state.cov, form, still_mask=still
    )
    state = state._replace(
        mean=jnp.where(pool[:, None], pred_mean, state.mean),
        cov=jnp.where(pool[:, None, None], pred_cov, state.cov),
    )
    if warp is not None:
        state = apply_warp(state, warp, form)

    slot_boxes = _to_xyxy(state.mean[:, :4], form)

    # --- stage 1: pool vs high dets ---
    d_iou = costs.iou_cost(slot_boxes, det_boxes)
    emb = None
    if use_reid:
        emb = costs.embedding_distance(state.feat, det_feats)
    if cfg.tracker_type == "botsort":
        c1 = costs.botsort_fused_cost(
            d_iou,
            emb if use_reid else None,
            det_scores,
            proximity_thresh=cfg.proximity_thresh,
            appearance_thresh=cfg.appearance_thresh,
            with_fuse_score=cfg.fuse_score,
        )
    else:
        c1 = costs.fuse_score(d_iou, det_scores) if cfg.fuse_score else d_iou
    c1 = costs.mask_cost(c1, pool, high)
    a1 = solve_assignment(c1, cfg.match_thresh, pool, high)
    m1 = a1.row_to_col >= 0  # (K,) slots matched in stage 1
    det_matched1 = a1.col_to_row >= 0  # (N,)

    # NOTE: the three stages match DISJOINT slot sets, and each stage's
    # cost rows use the pre-update (predicted) means of its own slots —
    # so all KF/field updates can be deferred and applied ONCE below
    # (saves two full batched KF updates per frame).

    # --- stage 2: unmatched *tracked* tracks vs low dets (IoU only) ---
    r_tracked = jnp.logical_and(tracked_act, jnp.logical_not(m1))
    c2 = costs.mask_cost(costs.iou_cost(slot_boxes, det_boxes), r_tracked, low)
    a2 = solve_assignment(c2, cfg.second_match_thresh, r_tracked, low)
    m2 = a2.row_to_col >= 0
    # unmatched previously-tracked -> LOST (after the deferred update)
    to_lost = jnp.logical_and(r_tracked, jnp.logical_not(m2))

    # --- stage 3: unconfirmed tracks vs leftover high dets ---
    left_high = jnp.logical_and(high, jnp.logical_not(det_matched1))
    d_iou3 = d_iou
    if cfg.tracker_type == "botsort":
        emb3 = costs.embedding_distance(state.feat, det_feats) if use_reid else None
        c3 = costs.botsort_fused_cost(
            d_iou3, emb3, det_scores,
            proximity_thresh=cfg.proximity_thresh,
            appearance_thresh=cfg.appearance_thresh,
            with_fuse_score=cfg.fuse_score,
        )
    else:
        c3 = costs.fuse_score(d_iou3, det_scores) if cfg.fuse_score else d_iou3
    c3 = costs.mask_cost(c3, unconfirmed, left_high)
    a3 = solve_assignment(c3, cfg.unconfirmed_match_thresh, unconfirmed, left_high)
    m3 = a3.row_to_col >= 0

    # --- deferred combined update for all three (disjoint) stages ---
    matched = jnp.logical_or(m1, jnp.logical_or(m2, m3))
    slot_det = jnp.where(
        m1, a1.row_to_col, jnp.where(m2, a2.row_to_col, a3.row_to_col)
    )
    state = _masked_kf_update(
        state, matched, slot_det, det_meas, det_scores, det_cls,
        det_feats if use_reid else None, cfg,
    )
    state = state._replace(
        status=jnp.where(to_lost, STATUS_LOST, state.status)
    )
    # unmatched unconfirmed -> removed
    drop_unconf = jnp.logical_and(unconfirmed, jnp.logical_not(m3))
    state = state._replace(
        status=jnp.where(drop_unconf, STATUS_EMPTY, state.status),
        track_id=jnp.where(drop_unconf, 0, state.track_id),
        activated=jnp.where(drop_unconf, False, state.activated),
    )

    # --- births: leftover high dets above new_track_thresh ---
    det_matched3 = a3.col_to_row >= 0
    birth = jnp.logical_and(
        left_high,
        jnp.logical_and(
            jnp.logical_not(det_matched3),
            det_scores >= cfg.new_track_thresh,
        ),
    )
    state, spawn_mask, spawn_det = _spawn(
        state, birth, det_meas, det_scores, det_cls, det_feats, cfg
    )

    # --- prune stale lost tracks ---
    stale = jnp.logical_and(
        state.status == STATUS_LOST,
        (state.frame_id - state.end_frame) > cfg.track_buffer,
    )
    state = state._replace(
        status=jnp.where(stale, STATUS_EMPTY, state.status),
        track_id=jnp.where(stale, 0, state.track_id),
        activated=jnp.where(stale, False, state.activated),
    )

    active = jnp.logical_and(state.status == STATUS_TRACKED, state.activated)
    det_index = jnp.where(
        m1,
        a1.row_to_col,
        jnp.where(
            m2,
            a2.row_to_col,
            jnp.where(
                m3,
                a3.row_to_col,
                jnp.where(spawn_mask, spawn_det, -1),
            ),
        ),
    ).astype(jnp.int32)
    out = TrackOutputs(
        boxes=_to_xyxy(state.mean[:, :4], form),
        track_id=state.track_id,
        score=state.score,
        cls=state.cls,
        active=active,
        det_index=det_index,
    )
    return state, out


def _spawn(
    state: TrackState,
    birth: jnp.ndarray,  # (N,) bool dets to become new tracks
    det_meas: jnp.ndarray,
    det_scores: jnp.ndarray,
    det_cls: jnp.ndarray,
    det_feats: jnp.ndarray | None,
    cfg: ByteTrackConfig,
) -> tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Allocate EMPTY slots to birth detections, in det-index order
    (track ids then match the reference's sequential next_id order).
    Returns (state, spawn_mask (K,), slot_det (K,))."""
    k = state.status.shape[0]
    n = birth.shape[0]
    empty = state.status == STATUS_EMPTY

    birth_rank = jnp.cumsum(birth.astype(jnp.int32)) - 1  # rank per det
    slot_rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # rank per slot
    n_birth = jnp.sum(birth.astype(jnp.int32))
    n_empty = jnp.sum(empty.astype(jnp.int32))

    # det with rank r -> the slot whose rank is r (both index-ordered)
    # build slot -> det map: for each slot, find det with same rank
    det_rank_scatter = jnp.full((k + 1,), -1, jnp.int32)
    ranks = jnp.where(jnp.logical_and(birth, birth_rank < k), birth_rank, k)
    det_of_rank = det_rank_scatter.at[ranks].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )[:k]
    slot_det = det_of_rank[jnp.clip(slot_rank, 0, k - 1)]  # (K,)
    spawn_mask = jnp.logical_and(
        empty,
        jnp.logical_and(slot_rank < n_birth, slot_det >= 0),
    )

    idx = jnp.clip(slot_det, 0, n - 1)
    meas = det_meas[idx]
    new_mean, new_cov = kalman.initiate(meas, cfg.form)
    new_id = state.next_id + jnp.clip(birth_rank[idx], 0, None)
    first_frame = state.frame_id == 1

    sm = spawn_mask
    feat = state.feat
    if det_feats is not None:
        nf = det_feats[idx]
        norm = jnp.linalg.norm(nf, axis=1, keepdims=True)
        nf = nf / jnp.maximum(norm, 1e-12)
        feat = jnp.where(sm[:, None], nf, state.feat)
    return state._replace(
        mean=jnp.where(sm[:, None], new_mean, state.mean),
        cov=jnp.where(sm[:, None, None], new_cov, state.cov),
        track_id=jnp.where(sm, new_id, state.track_id),
        status=jnp.where(sm, STATUS_TRACKED, state.status),
        activated=jnp.where(sm, first_frame, state.activated),
        score=jnp.where(sm, det_scores[idx], state.score),
        cls=jnp.where(sm, det_cls[idx], state.cls),
        end_frame=jnp.where(sm, state.frame_id, state.end_frame),
        hits=jnp.where(sm, 1, state.hits),
        feat=feat,
        next_id=state.next_id + jnp.minimum(n_birth, n_empty),
        dropped_births=state.dropped_births
        + jnp.maximum(n_birth - n_empty, 0),
    ), sm, slot_det
