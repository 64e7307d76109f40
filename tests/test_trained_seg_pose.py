"""Trained SEGMENT and POSE models end-to-end on real signal.

Round-2 proved detect-quality on real signal (assets/yolov8n_synth160);
these close the same gap for the other two task heads (SURVEY.md
D4/D5): models trained in-repo by tools/train.py on synthetic tasks
constructed so the extra head CANNOT cheat off the box —

- segment: objects are ELLIPSES, the gt mask is the ellipse and the
  box its bounding rect, so a mask that repaints the box scores
  measurably worse against the ellipse than the true mask shape;
- pose: keypoints are DRAWN dots at random in-box positions, so the
  kpt head must localize them visually rather than regress box
  geometry.

Both run the full user surface: uint8 frame -> Pipeline.predict ->
Results.masks.xy polygons / Results.keypoints.xy.
"""

import os

import numpy as np
import pytest

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")
SEG_CKPT = os.path.join(ASSETS, "yolov8n_seg_synth160.npz")
POSE_CKPT = os.path.join(ASSETS, "yolov8n_pose_synth160.npz")
# the reference's literal default model (yolo_multi_model.py:17 —
# yolo11n-pose), trained by the same recipe
POSE11_CKPT = os.path.join(ASSETS, "yolo11n_pose_synth160.npz")


def _ellipse_frame(size=320):
    """One ellipse on noise; returns (frame_u8, ellipse_mask, box)."""
    rng = np.random.default_rng(3)
    frame = (rng.uniform(0, 0.3, (size, size, 3)) * 255).astype(np.uint8)
    cx, cy, rw, rh = 170.0, 150.0, 52.0, 38.0
    yy, xx = np.mgrid[0:size, 0:size]
    ell = ((xx - cx) / rw) ** 2 + ((yy - cy) / rh) ** 2 <= 1.0
    frame[ell] = int((0.5 + 0.16 * 1) * 255)  # class 1 shade
    box = (cx - rw, cy - rh, cx + rw, cy + rh)
    return frame, ell, box


@pytest.mark.skipif(not os.path.exists(SEG_CKPT), reason="asset not built")
def test_trained_seg_mask_is_the_ellipse_not_the_box():
    pipe = Pipeline(
        DetectorConfig(weights=SEG_CKPT, imgsz=160, conf=0.3, iou=0.4,
                       max_det=8, half=False),
        track_slots=8, tracker_max_dets=8,
    )
    frame, ell, box = _ellipse_frame()
    r = pipe.predict(frame)
    assert len(r.boxes) >= 1
    best = int(np.argmax(r.boxes.conf))
    x1, y1, x2, y2 = r.boxes.xyxy[best]
    assert abs(x1 - box[0]) < 16 and abs(y2 - box[3]) < 16
    assert r.masks is not None and len(r.masks.xy) > best

    # rasterize the predicted polygon in frame coords
    import cv2

    poly = np.asarray(r.masks.xy[best], np.int32)
    assert len(poly) >= 3
    pred = np.zeros(frame.shape[:2], np.uint8)
    cv2.fillPoly(pred, [poly], 1)
    pred = pred.astype(bool)

    box_mask = np.zeros_like(pred)
    bx = [int(v) for v in box]
    box_mask[bx[1]:bx[3], bx[0]:bx[2]] = True

    def iou(a, b):
        return (a & b).sum() / max((a | b).sum(), 1)

    iou_ell = iou(pred, ell)
    iou_box = iou(pred, box_mask)
    # the mask must BE the ellipse: better fit to the ellipse than the
    # box fits it (pi/4 ~= 0.785), and better than the same mask
    # scored against the box
    assert iou_ell > 0.75, (iou_ell, iou_box)
    assert iou_ell > iou_box, (iou_ell, iou_box)


@pytest.mark.parametrize("ckpt", [POSE_CKPT, POSE11_CKPT],
                         ids=["yolov8n-pose", "yolo11n-pose"])
def test_trained_pose_finds_drawn_dots(ckpt):
    if not os.path.exists(ckpt):
        pytest.skip("asset not built")
    pipe = Pipeline(
        DetectorConfig(weights=ckpt, imgsz=160, conf=0.3, iou=0.4,
                       max_det=8, half=False),
        track_slots=8, tracker_max_dets=8,
    )
    rng = np.random.default_rng(11)
    size = 320
    frame = (rng.uniform(0, 0.3, (size, size, 3)) * 255).astype(np.uint8)
    x1, y1, w, h = 90.0, 70.0, 120.0, 100.0
    frame[int(y1):int(y1 + h), int(x1):int(x1 + w)] = int(
        (0.5 + 0.16 * 0) * 255
    )
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)))
    )
    from strongsort_yolo_tpu.tools.train import POSE_KPT_COLORS

    gt = []
    for k in range(5):
        while True:  # keep dots from covering each other
            kx = x1 + rng.uniform(0.15, 0.85) * w
            ky = y1 + rng.uniform(0.15, 0.85) * h
            if not gt or min(
                max(abs(px - kx), abs(py - ky)) for px, py in gt
            ) > 18:
                break
        iy, ix = int(ky), int(kx)
        # frame is 2x the 160 training scale -> draw 2x the dot size.
        # Pipeline frames are BGR (cv2 convention; letterbox flips to
        # RGB before the stem) while the trainer feeds model-order
        # channels directly — so draw the BGR mirror of the color.
        frame[iy - 7 : iy + 8, ix - 7 : ix + 8] = (
            POSE_KPT_COLORS[k][::-1] * 255
        ).astype(np.uint8)
        gt.append((kx, ky))
    gt = np.asarray(gt)

    r = pipe.predict(frame)
    assert len(r.boxes) >= 1
    best = int(np.argmax(r.boxes.conf))
    assert r.keypoints is not None
    kxy = np.asarray(r.keypoints.xy[best])  # (K, 2) frame coords
    kconf = np.asarray(r.keypoints.conf[best])
    assert kxy.shape[0] == 5
    # keypoint k must land on ITS OWN color-k dot (index-correct
    # localization, not just any-dot proximity)
    err = np.linalg.norm(kxy - gt, axis=-1)
    assert float(err.mean()) < 10.0, err
    assert float(kconf.mean()) > 0.5, kconf
