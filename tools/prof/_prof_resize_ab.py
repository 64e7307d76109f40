"""Scratch: interleaved same-process A/B of the letterbox resize
routes (SSYT_RESIZE) on the S-stream batched step. Run-to-run process
variance on the v5e is ~±2%, larger than the effect size at S=64 — so
this builds one Pipeline per route IN ONE PROCESS and alternates timed
blocks A,B,A,B,... to cancel clock/thermal drift.

Usage: python tools/prof/_prof_resize_ab.py [S] [routes...]
"""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

import bench as B  # noqa: E402
from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
routes = sys.argv[2:] or ["dense", "kernelp"]

h, w = 1080, 1920
pool = B.make_frames(h, w)
frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None],
                 (S, 1, 1))

arms = {}
for r in routes:
    os.environ["SSYT_RESIZE"] = r
    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", half=True, max_det=1000),
        tracker=ByteTrackConfig(tracker_type="botsort", gmc_method="none"),
        track_slots=256,
    )
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
    bp = pipe.track_batch_prepare(S, (h, w))
    st = bp.states
    step = bp._steps.batch_step
    for _ in range(3):
        st, d, o, e = step(pipe.params, st, frames, warps)
    jax.block_until_ready(st)
    arms[r] = (pipe, step, st)
    print(f"{r}: warm, dets {np.asarray(d.count)[:4]}", flush=True)

N_BLOCK, N_ROUNDS = 10, 6
acc = {r: [] for r in routes}
for k in range(N_ROUNDS):
    for r in routes:
        pipe, step, st = arms[r]
        t0 = time.perf_counter()
        for _ in range(N_BLOCK):
            st, d, o, e = step(pipe.params, st, frames, warps)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / N_BLOCK
        arms[r] = (pipe, step, st)
        acc[r].append(dt)
for r in routes:
    ms = np.array(acc[r]) * 1e3
    print(f"{r} S={S}: median {np.median(ms):.3f} ms/dispatch "
          f"({S/np.median(ms)*1e3:.1f} fps/chip)  blocks="
          + ",".join(f"{m:.2f}" for m in ms), flush=True)
