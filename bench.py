"""Benchmark: end-to-end 1080p detect+track FPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

The measured path is the full per-frame pipeline the app runs
(pipeline.Pipeline.track): host frame -> device upload -> letterbox ->
YOLOv8n (bf16, BN-fused) -> DFL decode -> NMS -> rescale -> ByteTrack/
BoT-SORT fixed-slot update -> outputs fetched to host. GMC off for the
headline number (host optical flow is a separate, CPU-bound stage).

No pretrained checkpoints exist in this offline image, so the model
runs with random weights — but detection *statistics* drive the cost
of the NMS fixpoint and the association solves. To make the measured
load realistic the class-head bias is calibrated so ~TARGET_DETS
candidates clear the confidence threshold per frame (a trained v8n on
busy 1080p street scenes yields a similar load).

Baseline: the reference publishes no numbers (BASELINE.md); the
north-star target is 300 FPS e2e 1080p on one v5e chip, so
vs_baseline = fps / 300.
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_DETS = 120
WARMUP = 10
FRAMES = 200


def make_frames(h, w, n=8, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)
    pool = []
    for t in range(n):
        f = base.copy()
        for k in range(6):
            x = (100 + 211 * k + 9 * t) % (w - 200)
            y = (80 + 137 * k + 5 * t) % (h - 260)
            f[y : y + 240, x : x + 180] = (40 * k + 40) % 255
        pool.append(f)
    return pool


def calibrate_candidates(pipe, frame, conf, target):
    """Shift cls-head biases until ~target candidates clear conf."""
    import jax
    import jax.numpy as jnp

    from strongsort_yolo_tpu.models.yolo import model_apply
    from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params

    lp = letterbox_params(*frame.shape[:2], pipe.det_cfg.imgsz)
    img = letterbox(jnp.asarray(frame), lp, dtype=pipe.compute_dtype)

    @jax.jit
    def max_logits(params):
        out = model_apply(params, img[None], pipe.model_cfg,
                          compute_dtype=pipe.compute_dtype)
        return jnp.max(out["cls_logits"][0], axis=-1)

    logits = np.asarray(max_logits(pipe.params))  # (A,)
    want_logit = np.log(conf / (1 - conf))
    # offset so that exactly ~target anchors exceed the conf threshold
    kth = np.partition(logits, -target)[-target]
    offset = float(want_logit - kth)

    def shift(node):
        if isinstance(node, dict):
            return {k: shift(v) for k, v in node.items()}
        if isinstance(node, list):
            return [shift(v) for v in node]
        return node

    # apply to the three cls tower output biases
    params = jax.tree.map(lambda x: x, pipe.params)  # shallow copy tree
    for br in params["detect"]["cls"]:
        br["out"]["b"] = br["out"]["b"] + offset
    pipe.params = params


def main() -> None:
    import jax

    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    h, w = 1080, 1920
    det_cfg = DetectorConfig(weights="yolov8n", half=True, max_det=300)
    tracker = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
    pipe = Pipeline(det_cfg, tracker=tracker, track_slots=256)

    pool = make_frames(h, w)
    calibrate_candidates(pipe, pool[0], det_cfg.conf, TARGET_DETS)

    counts = []
    for i in range(WARMUP):
        r = pipe.track(pool[i % len(pool)])
        counts.append(len(r))

    t0 = time.perf_counter()
    for i in range(FRAMES):
        pipe.track(pool[i % len(pool)])
    elapsed = time.perf_counter() - t0
    fps = FRAMES / elapsed

    platform = jax.devices()[0].platform
    result = {
        "metric": f"e2e_1080p_track_fps_yolov8n_{platform}",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 300.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
