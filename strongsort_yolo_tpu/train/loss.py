"""Anchor-free detection loss: Task-Aligned assignment + CIoU + DFL.

The v8-family training objective (public spec; SURVEY.md D3's head
defines the output format this loss consumes):

- TAL assigner: per gt, pick top-k anchors by
  ``score^alpha * IoU^beta`` among anchors whose center lies inside
  the gt box; anchors claimed by several gts go to the best-aligned
  one. Target class scores are the align metric normalized per gt.
- classification: BCE against the soft target scores (sum-normalized);
- box: (1 - CIoU) weighted by target score on assigned anchors;
- DFL: cross-entropy on the two integer bins bracketing each true
  ltrb distance (stride units).

Everything is fixed-shape: gts are padded to ``max_gt`` per image and
masked, so the loss jits once and shards over the batch axis (dp) with
no data-dependent shapes. vmapped over the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.boxes import box_iou, ciou
from strongsort_yolo_tpu.ops.decode import dfl_expectation


class LossWeights(NamedTuple):
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    seg: float = 2.5   # mask BCE (segment task; ultralytics box/2-ish)
    kpt: float = 6.0   # keypoint location (pose task)
    kobj: float = 1.0  # keypoint visibility BCE (pose task)


def _assign(
    pred_scores,  # (A, nc) sigmoid probs
    pred_boxes,  # (A, 4) xyxy pixels
    anchor_points,  # (A, 2) pixels
    gt_boxes,  # (M, 4) xyxy pixels
    gt_cls,  # (M,) int32
    gt_valid,  # (M,) bool
    *,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """TAL: -> (assigned_gt (A,), fg_mask (A,), target_scores (A, nc))."""
    m, a = gt_boxes.shape[0], pred_boxes.shape[0]
    # anchors inside gt boxes
    inside = (
        (anchor_points[None, :, 0] >= gt_boxes[:, None, 0])
        & (anchor_points[None, :, 0] < gt_boxes[:, None, 2])
        & (anchor_points[None, :, 1] >= gt_boxes[:, None, 1])
        & (anchor_points[None, :, 1] < gt_boxes[:, None, 3])
    )  # (M, A)
    iou = box_iou(gt_boxes, pred_boxes)  # (M, A)
    cls_score = jnp.take_along_axis(
        pred_scores.T, jnp.clip(gt_cls, 0, pred_scores.shape[1] - 1)[:, None], axis=0
    )  # (M, A) — score of each anchor for the gt's class
    align = (cls_score**alpha) * (iou**beta)
    align = jnp.where(inside & gt_valid[:, None], align, 0.0)

    # top-k anchors per gt
    k = min(topk, a)
    topk_vals, topk_idx = jax.lax.top_k(align, k)  # (M, k)
    sel = jnp.zeros((m, a), bool)
    rows = jnp.repeat(jnp.arange(m)[:, None], k, axis=1)
    sel = sel.at[rows, topk_idx].set(topk_vals > 1e-9)

    cand_align = jnp.where(sel, align, 0.0)
    # resolve conflicts: anchor goes to the gt with max align
    best_gt = jnp.argmax(cand_align, axis=0)  # (A,)
    best_val = jnp.max(cand_align, axis=0)
    fg = best_val > 1e-9
    assigned = jnp.where(fg, best_gt, -1)

    # normalized target scores (per gt: align / max_align * max_iou)
    pos_align = jnp.where(sel, align, 0.0)
    max_align = jnp.max(pos_align, axis=1, keepdims=True)  # (M, 1)
    max_iou = jnp.max(jnp.where(sel, iou, 0.0), axis=1, keepdims=True)
    norm = pos_align * max_iou / jnp.maximum(max_align, 1e-9)  # (M, A)
    t_anchor = norm[jnp.clip(assigned, 0, m - 1), jnp.arange(a)]
    t_anchor = jnp.where(fg, t_anchor, 0.0)
    t_cls = jnp.clip(gt_cls[jnp.clip(assigned, 0, m - 1)], 0, pred_scores.shape[1] - 1)
    target_scores = (
        jax.nn.one_hot(t_cls, pred_scores.shape[1]) * t_anchor[:, None]
    )
    target_scores = jnp.where(fg[:, None], target_scores, 0.0)
    return assigned, fg, target_scores


def _dfl_loss(box_logits, target_ltrb, reg_max):
    """Distribution focal loss on the bracketing bins.

    box_logits: (A, 4, reg_max); target_ltrb: (A, 4) in [0, reg_max-1].
    """
    t = jnp.clip(target_ltrb, 0.0, reg_max - 1.01)
    tl = jnp.floor(t)
    tr = tl + 1.0
    wl = tr - t
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    il = tl.astype(jnp.int32)
    ir = jnp.clip(il + 1, 0, reg_max - 1)
    ll = jnp.take_along_axis(logp, il[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, ir[..., None], axis=-1)[..., 0]
    return -(wl * ll + wr * lr).mean(axis=-1)  # (A,)


def detection_loss(
    outputs: dict,
    targets: dict,
    anchors: jnp.ndarray,  # (A, 2) feature units
    strides: jnp.ndarray,  # (A, 1)
    *,
    nc: int = 80,
    reg_max: int = 16,
    weights: LossWeights = LossWeights(),
):
    """Batched detection loss.

    outputs: {"box_logits" (B, A, 4*reg_max), "cls_logits" (B, A, nc)}
    targets: {"boxes" (B, M, 4) xyxy pixels, "cls" (B, M) int32,
              "valid" (B, M) bool}
    Returns (scalar loss, metrics dict).

    Task extras, keyed on presence (SURVEY.md D4/D5 head formats):
    - segment: outputs carry "mask_coef" (B, A, nm) + "proto"
      (B, Hm, Wm, nm) and targets carry "masks" (B, M, Hm, Wm) {0,1}
      at proto resolution (input/4). Adds per-fg-anchor mask BCE
      cropped to the gt box and normalized by its proto-cell area.
    - pose: outputs carry "kpt_raw" (B, A, K*3) and targets carry
      "kpts" (B, M, K, 3) [x_px, y_px, vis]. Adds a gt-box-area-
      normalized squared-distance term on visible keypoints of fg
      anchors (decoded exactly like ops/keypoints.decode_keypoints)
      plus visibility BCE.
    """
    anchor_px = anchors * strides  # (A, 2) pixels
    has_seg = "mask_coef" in outputs and "masks" in targets
    has_pose = "kpt_raw" in outputs and "kpts" in targets

    def per_image(box_logits, cls_logits, gt_boxes, gt_cls, gt_valid,
                  *extras):
        a = box_logits.shape[0]
        dist = dfl_expectation(box_logits.reshape(a, 4, reg_max), reg_max)
        lt, rb = dist[:, :2], dist[:, 2:]
        pred_boxes = jnp.concatenate(
            [anchor_px - lt * strides, anchor_px + rb * strides], axis=-1
        )
        pred_scores = jax.nn.sigmoid(cls_logits)
        # The assigner is a TARGET builder — no gradients flow through
        # it (ultralytics runs TAL under no_grad). Detaching also kills
        # the NaN path: align = score**0.5 has an infinite gradient at
        # score == 0 (sigmoid underflow), which poisoned training after
        # a few steps.
        assigned, fg, t_scores = jax.tree.map(
            jax.lax.stop_gradient,
            _assign(
                pred_scores, pred_boxes, anchor_px, gt_boxes, gt_cls, gt_valid
            ),
        )
        t_sum = jnp.maximum(jnp.sum(t_scores), 1.0)

        # BCE over all anchors against soft targets
        bce = jnp.sum(
            _bce_logits(cls_logits, t_scores)
        ) / t_sum

        # box + dfl on foreground anchors
        gi = jnp.clip(assigned, 0, gt_boxes.shape[0] - 1)
        tgt_box = gt_boxes[gi]
        w = jnp.sum(t_scores, axis=-1)  # (A,) anchor weight
        c = ciou(pred_boxes, tgt_box)
        box_l = jnp.sum(jnp.where(fg, (1.0 - c) * w, 0.0)) / t_sum

        # dfl targets: gt ltrb distances in stride units
        t_lt = (anchor_px - tgt_box[:, :2]) / strides
        t_rb = (tgt_box[:, 2:] - anchor_px) / strides
        t_ltrb = jnp.concatenate([t_lt, t_rb], axis=-1)
        dfl = _dfl_loss(box_logits.reshape(a, 4, reg_max), t_ltrb, reg_max)
        dfl_l = jnp.sum(jnp.where(fg, dfl * w, 0.0)) / t_sum
        n_fg = jnp.sum(fg.astype(jnp.float32))

        seg_l = jnp.zeros(())
        kpt_l = jnp.zeros(())
        kobj_l = jnp.zeros(())
        ex = list(extras)
        if has_seg:
            mask_coef, proto, gt_masks = ex[:3]
            ex = ex[3:]
            hm, wm = proto.shape[:2]
            # all-anchor mask logits: O(A*Hm*Wm) floats — ~3 MB/image
            # at imgsz 160, ~860 MB at 640. Fine for the synthetic
            # tasks this trains; large-image seg training would need a
            # fg-only gather (dynamic shapes) or per-level chunking.
            logits_m = jnp.einsum("ac,hwc->ahw", mask_coef, proto)
            t_mask = gt_masks[gi]  # (A, Hm, Wm)
            # crop to the gt box at proto resolution (input/4)
            xx = (jnp.arange(wm, dtype=jnp.float32) + 0.5)[None, None, :]
            yy = (jnp.arange(hm, dtype=jnp.float32) + 0.5)[None, :, None]
            bx = tgt_box / 4.0
            inside = (
                (xx >= bx[:, 0, None, None]) & (xx < bx[:, 2, None, None])
                & (yy >= bx[:, 1, None, None]) & (yy < bx[:, 3, None, None])
            )
            area = jnp.maximum(
                (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1]), 1.0
            )
            per_a = (
                jnp.sum(_bce_logits(logits_m, t_mask) * inside, axis=(1, 2))
                / area
            )
            seg_l = jnp.sum(jnp.where(fg, per_a * w, 0.0)) / t_sum
        if has_pose:
            kpt_raw, gt_kpts = ex[:2]
            kk = kpt_raw.reshape(a, -1, 3)
            px = (kk[..., 0] * 2.0 + (anchors[:, 0:1] - 0.5)) * strides
            py = (kk[..., 1] * 2.0 + (anchors[:, 1:2] - 0.5)) * strides
            tk = gt_kpts[gi]  # (A, K, 3)
            vis = tk[..., 2]
            areas = jnp.maximum(
                (tgt_box[:, 2] - tgt_box[:, 0])
                * (tgt_box[:, 3] - tgt_box[:, 1]),
                1.0,
            )[:, None]
            d2 = (px - tk[..., 0]) ** 2 + (py - tk[..., 1]) ** 2
            e = 1.0 - jnp.exp(-d2 / (2.0 * areas * 0.04))
            nvis = jnp.maximum(jnp.sum(vis, axis=-1), 1.0)
            per_a = jnp.sum(vis * e, axis=-1) / nvis
            kpt_l = jnp.sum(jnp.where(fg, per_a * w, 0.0)) / t_sum
            kb = jnp.mean(_bce_logits(kk[..., 2], vis), axis=-1)
            kobj_l = jnp.sum(jnp.where(fg, kb * w, 0.0)) / t_sum
        return bce, box_l, dfl_l, n_fg, seg_l, kpt_l, kobj_l

    vm_args = [
        outputs["box_logits"],
        outputs["cls_logits"],
        targets["boxes"],
        targets["cls"],
        targets["valid"],
    ]
    if has_seg:
        vm_args += [outputs["mask_coef"], outputs["proto"], targets["masks"]]
    if has_pose:
        vm_args += [outputs["kpt_raw"], targets["kpts"]]
    bce, box_l, dfl_l, n_fg, seg_l, kpt_l, kobj_l = jax.vmap(per_image)(
        *vm_args
    )
    loss = (
        weights.cls * bce.mean()
        + weights.box * box_l.mean()
        + weights.dfl * dfl_l.mean()
        + weights.seg * seg_l.mean()
        + weights.kpt * kpt_l.mean()
        + weights.kobj * kobj_l.mean()
    )
    metrics = {
        "loss": loss,
        "cls_loss": bce.mean(),
        "box_loss": box_l.mean(),
        "dfl_loss": dfl_l.mean(),
        "num_fg": n_fg.mean(),
    }
    if has_seg:
        metrics["seg_loss"] = seg_l.mean()
    if has_pose:
        metrics["kpt_loss"] = kpt_l.mean()
        metrics["kobj_loss"] = kobj_l.mean()
    return loss, metrics


def _bce_logits(logits, targets):
    """Numerically-stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
