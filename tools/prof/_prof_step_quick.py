"""Scratch: quick fps of the S-stream batched step for A/B of small
routing changes (3 warm + 30 timed dispatches, staged frames).

Usage: python tools/prof/_prof_step_quick.py [weights] [S] [tracker|none]
"""
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

weights = sys.argv[1] if len(sys.argv) > 1 else "yolov8n"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64
tracker = sys.argv[3] if len(sys.argv) > 3 else "none"
if tracker == "none":
    tracker = ByteTrackConfig(tracker_type="botsort", gmc_method="none")

h, w = 1080, 1920
pipe = Pipeline(
    DetectorConfig(weights=weights, half=True, max_det=1000),
    tracker=tracker, track_slots=256,
)
pool = B.make_frames(h, w)
if pipe._is_v5 or pipe._is_v7:
    B.calibrate_anchor_based(pipe, pool[0], 0.3, B.TARGET_DETS)
else:
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
bp = pipe.track_batch_prepare(S, (h, w))
frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None],
                 (S, 1, 1))
states = bp.states
step = bp._steps.batch_step
t0 = time.perf_counter()
for _ in range(3):
    states, d, o, e = step(pipe.params, states, frames, warps)
jax.block_until_ready(states)
print(f"compile+warm {time.perf_counter()-t0:.1f}s; "
      f"dets {np.asarray(d.count)[:4]}", flush=True)
n = 30
t0 = time.perf_counter()
for _ in range(n):
    states, d, o, e = step(pipe.params, states, frames, warps)
jax.block_until_ready(states)
dt = time.perf_counter() - t0
print(f"{weights} S={S}: {S*n/dt:.1f} fps/chip  "
      f"({dt/n*1e3:.2f} ms/dispatch)", flush=True)
