"""Scratch: in-pipeline A/B of the packed ReID crop/stem path
(ops/crops.crop_and_resize_packed + 7x7-stem transition form) vs the
plain path, on the S-stream batched StrongSORT step — the packed
path's predicted win is the (S*M,128,64,3) layout copy + 3-lane stem
conv that showed up at 461us+/dispatch in the S=16 profile.

Usage: python tools/prof/_prof_reid_packed.py [S] [topk]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 16
topk = int(sys.argv[2]) if len(sys.argv) > 2 else 128
h, w = 1080, 1920
pool = B.make_frames(h, w)
frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1))


def run(packed):
    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", half=True, max_det=1000),
        tracker="strongsort.yaml",
        track_slots=256,
        reid_topk=topk,
        reid_packed=packed,
    )
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
    bp = pipe.track_batch_prepare(S, (h, w))
    # drive the public step_async path (advisor r3: private
    # bp._steps.batch_step breaks across pipeline refactors); the
    # staged device arrays pass through its jnp.asarray unchanged, so
    # no per-tick tunnel upload
    for _ in range(3):
        bp.step_async(frames, warps)
    jax.block_until_ready(bp.states)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        bp.step_async(frames, warps)
    jax.block_until_ready(bp.states)
    dt = time.perf_counter() - t0
    fps = n * S / dt
    print(
        f"packed={packed} topk={topk}: {fps:.1f} fps/chip "
        f"({dt/n*1e3:.2f} ms/dispatch, S={S})",
        flush=True,
    )
    return fps


a = run(False)
b = run(True)
print(f"packed delta: {100*(b/a-1):+.1f}%", flush=True)
