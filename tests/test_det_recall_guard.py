"""Detection-recall regression guard (VERDICT r4 #4).

Round 4 found that ``approx_max_k`` — the NMS candidate-select default
since round 2 — silently dropped ~8% of real above-threshold
detections, and EVERY quality fixture stayed green for two rounds (the
MOT rows, trained-e2e tests, and sequence guards all tolerate a few
missing dets). This test closes that hole: the FULL pipeline's
detections on a dense bench-recipe load must match a sequential NumPy
oracle NMS run over the same decoded candidates — EXACT per-frame
counts and box-set parity. Any future "fast" candidate select that
loses detections fails here, not in a bench A/B two rounds later.

Load recipe = bench.py's: random-init yolov8n with the cls-head bias
calibrated so ~TARGET candidates clear the confidence threshold
(bench.calibrate_candidates), on the same moving-rectangle frame pool.
Oracle = decode ALL anchors (ops.decode.decode_boxes), sigmoid scores,
then tests/test_nms.greedy_nms_oracle (torchvision semantics) with the
class-offset trick — the same oracle the op-level NMS tests trust.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline

from tests.test_nms import greedy_nms_oracle

CONF, IOU, MAX_DET, TARGET = 0.3, 0.4, 64, 48


@pytest.fixture(scope="module")
def dense_pipe():
    import bench

    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=320, conf=CONF, iou=IOU,
                       max_det=MAX_DET, half=False),
        tracker="bytetrack.yaml", track_slots=64, tracker_max_dets=64,
    )
    frames = bench.make_frames(640, 640, n=4, seed=3)
    bench.calibrate_candidates(pipe, frames[0], CONF, TARGET)
    return pipe, frames


def _oracle_dets(pipe, frame):
    """Decode EVERYTHING -> numpy greedy NMS -> source-coord boxes,
    score-desc, capped at max_det. Returns (boxes, scores, classes)."""
    from strongsort_yolo_tpu.models.yolo import feat_hw, model_apply
    from strongsort_yolo_tpu.ops.boxes import scale_boxes
    from strongsort_yolo_tpu.ops.decode import decode_boxes, make_anchors
    from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params

    size = pipe.det_cfg.imgsz
    lp = letterbox_params(*frame.shape[:2], size)
    img = letterbox(jnp.asarray(frame), lp, dtype=pipe.compute_dtype)
    out = model_apply(pipe.params, img[None], pipe.model_cfg,
                      compute_dtype=pipe.compute_dtype)
    anchors, strides = make_anchors(
        feat_hw((size, size), pipe.model_cfg.strides),
        pipe.model_cfg.strides,
    )
    boxes = np.asarray(
        decode_boxes(out["box_logits"][0], anchors, strides),
        np.float32,
    )
    scores = np.asarray(jax.nn.sigmoid(out["cls_logits"][0]), np.float32)

    best = scores.max(1)
    cls = scores.argmax(1)
    cand = np.where(best >= CONF)[0]
    # class-aware: offset boxes per class so cross-class pairs never
    # suppress (same trick as ops/nms.py and the op-level oracle)
    shifted = boxes[cand] + (cls[cand] * 7680.0)[:, None]
    keep_local = greedy_nms_oracle(shifted, best[cand], IOU)
    kept = cand[np.asarray(keep_local, int)]
    order = np.argsort(-best[kept], kind="stable")[:MAX_DET]
    kept = kept[order]
    src_boxes = np.asarray(
        scale_boxes(
            jnp.asarray(boxes[kept]),
            jnp.float32(lp.gain),
            jnp.asarray([lp.pad_x, lp.pad_y], jnp.float32),
            jnp.asarray(frame.shape[:2], jnp.float32),
        )
    )
    return src_boxes, best[kept], cls[kept]


def test_pipeline_dets_match_oracle_exactly(dense_pipe):
    pipe, frames = dense_pipe
    total = 0
    for t, frame in enumerate(frames):
        r = pipe.predict(frame)
        ob, osc, ocls = _oracle_dets(pipe, frame)
        # EXACT count parity: one lost det == failure
        assert len(r.boxes) == len(ob), (
            f"frame {t}: pipeline {len(r.boxes)} dets vs oracle {len(ob)}"
        )
        # both are score-desc; verify full box/score/class parity
        np.testing.assert_allclose(
            np.asarray(r.boxes.conf), osc, atol=2e-3,
            err_msg=f"frame {t} scores",
        )
        np.testing.assert_array_equal(
            np.asarray(r.boxes.cls, int), ocls.astype(int),
            err_msg=f"frame {t} classes",
        )
        np.testing.assert_allclose(
            np.asarray(r.boxes.xyxy), ob, atol=0.1,
            err_msg=f"frame {t} boxes",
        )
        total += len(ob)
    # the load really is dense — the guard is vacuous on sparse scenes
    assert total >= 3 * len(frames), f"load too sparse: {total} dets"
