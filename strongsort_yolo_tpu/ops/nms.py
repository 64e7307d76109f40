"""Fixed-shape class-aware NMS under jit.

Re-creates the postprocess the reference configures through
``model.overrides`` (conf=0.3, iou=0.4, agnostic_nms=False,
max_det=1000, optional class filter — /root/reference/
yolo_multi_model.py:18-22; SURVEY.md D6/N5), which ultralytics runs via
torchvision's C++/CUDA NMS. Here it is a pure fixed-shape XLA program
(with a Pallas-fused variant in ops/pallas/) so it lives inside the one
jitted per-frame step with no host sync and no recompiles:

- candidates are ranked by best-class confidence and truncated to a
  static ``pre_nms_topk`` (invalid slots get score 0);
- class-aware behaviour uses the coordinate-offset trick (shift each
  box by ``cls * MAX_WH`` so different classes can never overlap) —
  same trick ultralytics uses, and it keeps the kernel branch-free;
- greedy suppression is computed as the fixpoint of
  ``keep[i] = valid[i] & ~any_{j<i}(keep[j] & iou[j,i] > thr)``
  iterated from ``keep = valid``. Each iteration is one masked
  (K, K) @ (K,) contraction (MXU work), and the fixpoint equals the
  sequential greedy result; chains are short in practice so it
  converges in a handful of iterations.

Output is a padded ``(max_det, 6)`` array ``[x1,y1,x2,y2,conf,cls]``
sorted by confidence, plus a valid-count scalar.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax

from strongsort_yolo_tpu.ops import runtime
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.boxes import box_iou

# Class-offset magnitude: larger than any model-input coordinate, so
# boxes of different classes never intersect after offsetting.
MAX_WH = 7680.0


class Detections(NamedTuple):
    """Fixed-shape NMS output. Rows beyond ``count`` are zero padding."""

    boxes: jnp.ndarray  # (max_det, 4) xyxy
    scores: jnp.ndarray  # (max_det,)
    classes: jnp.ndarray  # (max_det,) int32
    count: jnp.ndarray  # () int32 — number of valid rows
    valid: jnp.ndarray  # (max_det,) bool mask
    index: jnp.ndarray  # (max_det,) int32 — row in the raw prediction
    # array each detection came from (gathers kpts/mask coefs downstream)


def _greedy_keep_fixpoint(
    iou: jnp.ndarray, valid: jnp.ndarray, iou_thres: float
) -> jnp.ndarray:
    """Fixpoint iteration equal to sequential greedy NMS.

    iou: (K, K) IoU of score-desc-sorted candidates. valid: (K,) bool.
    """
    k = iou.shape[0]
    # suppress[j, i] = 1 where an earlier kept box j would kill box i.
    upper = jnp.triu(jnp.ones((k, k), jnp.float32), 1)
    sup_mat = (iou > iou_thres).astype(jnp.float32) * upper

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        killed = (keep.astype(jnp.float32) @ sup_mat) > 0.5
        new_keep = jnp.logical_and(valid, jnp.logical_not(killed))
        return new_keep, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
    )
    return keep


def _topk_packed_bf16(best_logit: jnp.ndarray, k: int):
    """Exact top-k of a (A,) bf16 vector via ONE single-key s32 sort.

    ``jax.lax.top_k`` lowers to a variadic (f32 key, s32 iota payload)
    sort — at S=64/A=8400 the v5e roofline audit bills it 573 us (54x
    bytes) plus a 461 us iota/payload fusion. Packing rank into one
    int32 removes the payload stream and the iota pass:

        key = monotone(bf16 bits) << 14 | (16383 - anchor_idx)

    where monotone() is the standard order-preserving float->uint flip
    (negatives reversed, sign cleared). bf16 ranks == f32-cast ranks
    (the cast is exact), and for EQUAL logits the complemented index
    makes the descending order prefer the LOWER anchor index — exactly
    ``top_k``'s stable tie-break, asserted in tests/test_nms.py.

    Returns (top_logit f32, top_idx s32), both (k,)."""
    a = best_logit.shape[0]
    assert a <= 16384, a
    u = jax.lax.bitcast_convert_type(best_logit, jnp.uint16)
    u = u.astype(jnp.int32)
    flip = jnp.where(u >= 0x8000, 0xFFFF, 0x8000)
    key = ((u ^ flip) << 14) | (16383 - jnp.arange(a, dtype=jnp.int32))
    top = jnp.flip(jax.lax.sort(key, dimension=-1)[-k:], axis=-1)
    top_idx = 16383 - (top & 16383)
    mono = (top >> 14) & 0xFFFF
    bits = mono ^ jnp.where(mono >= 0x8000, 0x8000, 0xFFFF)
    top_logit = jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return top_logit, top_idx


def nms_from_logits(
    box_logits: jnp.ndarray,  # (A, 4*reg_max) raw DFL logits
    cls_logits: jnp.ndarray,  # (A, nc) raw class logits
    anchors: jnp.ndarray,  # (A, 2)
    strides: jnp.ndarray,  # (A, 1)
    *,
    reg_max: int = 16,
    conf_thres: float = 0.3,
    iou_thres: float = 0.4,
    max_det: int = 300,
    pre_nms_topk: int = 512,
    agnostic: bool = False,
    class_filter: jnp.ndarray | None = None,
    backend: str = "auto",
    approx_topk: bool = False,
    feat_dims=None,       # [(h, w)] per FPN level — enables arithmetic
    level_strides=None,   # per-level strides     — anchor/stride compute
) -> Detections:
    """Candidate-select FIRST, decode second — the fused fast path for
    anchor-free heads. Selecting the top-K anchors by best-class score
    before the DFL softmax/expectation means only K rows are decoded
    and gathered.

    approx_topk defaults OFF since round 4. The v5e roofline audit
    flagged the candidate sort (430 us/step at S=64, 47x its bytes
    bound) and the A/B (tools/prof/_prof_topk.py + in-step
    _prof_step_quick) found:
      - ``jax.lax.top_k`` is ~10x faster than ``approx_max_k`` in the
        chained-scan harness and PERF-NEUTRAL in the full step
        (2916 vs 2929 fps/chip S=64 — the sort is overlapped);
      - ``approx_max_k`` was genuinely approximate on the bench load:
        per-stream det counts ROSE from [45,38,42,45] to [49,42,43,47]
        under exact top-k — the default 0.95 recall target silently
        dropped ~8%% of real above-threshold detections.
    Exact is parity (ultralytics sorts exactly) and costs nothing;
    approx_topk=True remains only as a measured-negative record."""
    from strongsort_yolo_tpu.ops.decode import decode_boxes

    a, nc = cls_logits.shape
    # best-class confidence per anchor without materializing probs:
    # sigmoid is monotone, so rank by max logit and sigmoid the winner
    if class_filter is not None:
        cls_logits = jnp.where(class_filter[None, :], cls_logits, -1e9)
    # logits may arrive in the compute dtype (bf16 on TPU); ranking
    # compares the same values either way, and only the K candidate
    # rows are cast up for sigmoid/DFL below — the (A, nc) full-tensor
    # f32 casts were two of the hottest HBM passes in the batched step
    best_logit = jnp.max(cls_logits, axis=-1)
    k = min(pre_nms_topk, a)
    if approx_topk:
        top_logit, top_idx = jax.lax.approx_max_k(
            best_logit.astype(jnp.float32), k
        )
    elif (best_logit.dtype == jnp.bfloat16 and a <= 16384
          and os.environ.get("SSYT_TOPK", "lax") == "packed"):
        # single-key packed sort: exact (tie-exact) and removes the
        # variadic payload+iota passes the roofline audit bills at
        # ~1 ms device time — but measured PERF-NEUTRAL in-step at
        # S=64 (2858 vs 2848 fps/chip): the sort overlaps with other
        # work, so the device-time line does not convert to wall
        # clock. Kept opt-in as the round-5 record (VERDICT r4 #3).
        top_logit, top_idx = _topk_packed_bf16(best_logit, k)
    else:
        top_logit, top_idx = jax.lax.top_k(best_logit.astype(jnp.float32), k)
    top_conf = jax.nn.sigmoid(top_logit)
    # argmax over ALL anchors fuses into the same (A, nc) HBM pass as
    # the max above; the (K,) int gather it leaves is 10x less data
    # than gathering the (K, nc) logit rows and re-argmaxing (the v5e
    # roofline audit put that row gather at 374 us/step, 4x its bound)
    cls_all = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
    top_cls = cls_all[top_idx]
    top_valid = top_conf >= conf_thres

    if feat_dims is not None:
        from strongsort_yolo_tpu.ops.decode import anchors_from_indices

        top_anchors, top_strides = anchors_from_indices(
            top_idx, feat_dims, level_strides
        )
    else:
        top_anchors, top_strides = anchors[top_idx], strides[top_idx]
    top_boxes = decode_boxes(
        box_logits[top_idx].astype(jnp.float32),
        top_anchors, top_strides, reg_max,
    )
    return _nms_on_candidates(
        top_boxes, top_conf, top_cls, top_valid,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
        agnostic=agnostic, backend=backend,
        row_ids=top_idx,  # emit anchor indices directly
    )


def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    conf_thres: float = 0.3,
    iou_thres: float = 0.4,
    max_det: int = 300,
    pre_nms_topk: int = 512,
    agnostic: bool = False,
    class_filter: jnp.ndarray | None = None,
    backend: str = "auto",
) -> Detections:
    """Class-aware greedy NMS over one frame's raw predictions.

    boxes: (N, 4) xyxy in model-input coords.
    scores: (N, nc) per-class confidences (already sigmoid'd).
    class_filter: optional (nc,) bool mask of allowed classes
      (reference's commented ``model.overrides['classes']``,
      yolo_multi_model.py:22).

    Defaults mirror the reference NMS config except ``max_det``: the
    reference uses 1000 (yolo_multi_model.py:21); callers wanting exact
    parity pass ``max_det=1000``.
    """
    n, nc = scores.shape
    if class_filter is not None:
        scores = jnp.where(class_filter[None, :], scores, 0.0)

    conf = jnp.max(scores, axis=-1)
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    cand = conf >= conf_thres

    k = min(pre_nms_topk, n)
    # Rank by confidence; push non-candidates to the bottom.
    ranked_conf = jnp.where(cand, conf, -1.0)
    top_conf, top_idx = jax.lax.top_k(ranked_conf, k)
    top_boxes = boxes[top_idx]
    top_cls = cls[top_idx]
    top_valid = top_conf >= conf_thres

    return _nms_on_candidates(
        top_boxes, top_conf, top_cls, top_valid,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
        agnostic=agnostic, backend=backend,
        row_ids=top_idx,
    )


def _nms_on_candidates(
    top_boxes: jnp.ndarray,  # (K, 4) score-desc-sorted
    top_conf: jnp.ndarray,  # (K,)
    top_cls: jnp.ndarray,  # (K,) int32
    top_valid: jnp.ndarray,  # (K,) bool
    *,
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    agnostic: bool,
    backend: str,
    row_ids: jnp.ndarray | None = None,
) -> Detections:
    """Suppression + final selection over pre-ranked candidates.
    Returned ``index`` is ``row_ids[sel]`` when given (the caller's
    original anchor/row numbering), else the row within the candidate
    arrays."""
    k = top_boxes.shape[0]
    offset = jnp.where(
        top_valid, top_cls.astype(jnp.float32), 0.0
    ) * (0.0 if agnostic else MAX_WH)
    shifted = top_boxes + offset[:, None] * jnp.ones((1, 4), top_boxes.dtype)

    if backend == "auto":
        on_tpu = runtime.target_platform() == "tpu"
        backend = "pallas" if (on_tpu and k % 128 == 0 and k <= 512) else "xla"
    if backend == "pallas":
        from strongsort_yolo_tpu.ops.pallas.nms_kernel import pallas_nms_keep

        # the kernel fuses IoU-matrix build + suppression in VMEM
        keep = pallas_nms_keep(
            shifted, jnp.where(top_valid, top_conf, -1.0),
            iou_thres=iou_thres, conf_thres=conf_thres,
        )
    else:
        iou = box_iou(shifted, shifted)
        keep = _greedy_keep_fixpoint(iou, top_valid, iou_thres)

    # Select top max_det kept rows (already score-sorted). If fewer
    # candidates than max_det exist, pad the fixed-shape output.
    kept_conf = jnp.where(keep, top_conf, -1.0)
    out_k = min(max_det, k)
    out_conf, out_sel = jax.lax.top_k(kept_conf, out_k)
    if out_k < max_det:
        out_conf = jnp.pad(out_conf, (0, max_det - out_k), constant_values=-1.0)
        out_sel = jnp.pad(out_sel, (0, max_det - out_k))
    out_valid = out_conf >= conf_thres
    out_scores = jnp.where(out_valid, out_conf, 0.0)

    # The (max_det,)-indexed row gathers lower as slow scalarized
    # gathers on TPU (~300us each at S=32); one masked one-hot matmul
    # on the MXU fetches boxes+cls+index in a single pass, and the
    # zeroed invalid rows reproduce the where(valid, ..., 0) padding
    # exactly (ids < 2^24 are exact in f32).
    if row_ids is None:
        row_ids = jnp.arange(k, dtype=jnp.int32)
    sel_oh = jnp.logical_and(
        out_sel[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :],
        out_valid[:, None],
    ).astype(jnp.float32)  # (max_det, k)
    table = jnp.concatenate(
        [
            top_boxes.astype(jnp.float32),
            top_cls.astype(jnp.float32)[:, None],
            row_ids.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # (k, 6)
    # HIGHEST: default TPU matmul does bf16 multiplies, which would
    # round ids/coords (NOTES.md precision lesson)
    gathered = jnp.matmul(
        sel_oh, table, precision=jax.lax.Precision.HIGHEST
    )
    out_boxes = gathered[:, :4].astype(top_boxes.dtype)
    out_cls = gathered[:, 4].astype(jnp.int32)
    out_index = gathered[:, 5].astype(jnp.int32)
    count = jnp.sum(out_valid.astype(jnp.int32))
    return Detections(out_boxes, out_scores, out_cls, count, out_valid, out_index)
