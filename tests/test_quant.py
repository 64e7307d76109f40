"""int8 PTQ accuracy guards (VERDICT r3 ask #2): the quantized conv
stack must not cost tracking quality on the trained pipeline, and the
quantized layer set must be what the docstring promises."""

import os

import numpy as np
import pytest

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.media.video import SyntheticDetSource
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.utils.metrics import evaluate_mot

CKPT = os.path.join(os.path.dirname(__file__), "..", "assets",
                    "yolov8n_synth160.npz")


def _run(quant):
    pipe = Pipeline(
        DetectorConfig(weights=CKPT, imgsz=160, conf=0.3, iou=0.4,
                       max_det=16, half=False, quant=quant),
        tracker="bytetrack.yaml", track_slots=16, tracker_max_dets=16,
    )
    src = SyntheticDetSource(num_frames=30, size=(320, 320),
                             num_objects=3, seed=1)
    gt, hyp = [], []
    for t, frame in enumerate(src):
        r = pipe.track(frame)
        gt.append([tuple(g) for g in src.truth(t)])
        hyp.append([(int(r.boxes.id[i]), *r.boxes.xyxy[i])
                    for i in range(len(r.boxes))])
    return evaluate_mot(gt, hyp)


def test_int8_mota_within_guard():
    mf = _run(None)
    mq = _run("int8")
    assert mq["mota"] >= mf["mota"] - 0.01, (mf, mq)
    assert mq["idf1"] >= mf["idf1"] - 0.01, (mf, mq)


def test_quantize_model_covers_backbone_not_head():
    from strongsort_yolo_tpu.models.porting import load_checkpoint
    from strongsort_yolo_tpu.models.yolo import fuse_model
    from strongsort_yolo_tpu.ops.quant import quantize_model

    params, cfg, _ = load_checkpoint(CKPT)
    fused = fuse_model(params)
    q, n = quantize_model(fused)
    assert n >= 20, n  # the backbone+neck conv stack

    def count(node, pred, path=""):
        if isinstance(node, dict):
            if pred(node, path):
                return 1
            return sum(count(v, pred, f"{path}/{k}")
                       for k, v in node.items())
        if isinstance(node, (list, tuple)):
            return sum(count(v, pred, f"{path}/{i}")
                       for i, v in enumerate(node))
        return 0

    n_q_head = count(q, lambda d, p: "wq" in d and "/detect" in p)
    assert n_q_head == 0, "head must stay float"
    # the packed-prefix narrow stages stay float (ops/pack re-indexes
    # their weights at trace time; int8 measured ~nothing there)
    n_q_prefix = count(
        q, lambda d, p: "wq" in d and any(
            s in p for s in ("/stem", "/down1", "/stage1", "/down2",
                             "/stage2")
        )
    )
    assert n_q_prefix == 0, "packed-prefix stages must stay float"
    n_q_deep = count(
        q, lambda d, p: "wq" in d
        and ("/stage3" in p or "/stage4" in p or "/sppf" in p
             or "/neck" in p)
    )
    assert n_q_deep >= 10, n_q_deep


def test_int8_weight_roundtrip_error_bounded():
    from strongsort_yolo_tpu.ops.quant import quantize_conv
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.2, (3, 3, 32, 64)).astype(np.float32)
    p = quantize_conv({"w": jnp.asarray(w), "b": jnp.zeros((64,))})
    deq = np.asarray(p["wq"], np.float32) * np.asarray(p["wscale"])
    per_ch_max = np.abs(w).max(axis=(0, 1, 2))
    err = np.abs(deq - w).max(axis=(0, 1, 2))
    assert (err <= per_ch_max / 127.0 * 0.5 + 1e-7).all()
