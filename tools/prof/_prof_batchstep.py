"""Scratch: quick S=32 batch_step + single-stream chunk timing —
used to A/B the unvmapped batched model forward (round 3)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

S = 32
h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
pipe = Pipeline(
    DetectorConfig(weights="yolov8n", half=True, max_det=1000),
    tracker=tcfg, track_slots=256,
)
pool = B.make_frames(h, w)
print("frames made", flush=True)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
print("calibrated", flush=True)

steps = pipe._get_step((h, w))

# single-stream chunked
chunk = 10
dev_frames = jnp.asarray(np.stack(pool + pool[:2]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (chunk, 1, 1))
state = pipe.track_state
state, outs, _ = steps.track_chunk(pipe.params, state, dev_frames, warps)
jax.block_until_ready(outs)
print("chunk compiled", flush=True)
t0 = time.perf_counter()
for _ in range(20):
    state, outs, _ = steps.track_chunk(pipe.params, state, dev_frames, warps)
jax.block_until_ready((state, outs))
dt = time.perf_counter() - t0
print(f"single-stream chunked: {200/dt:.1f} fps", flush=True)

# S=32 batch step
bp = pipe.track_batch_prepare(S, (h, w))
frames_s = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
warps_s = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1))
for _ in range(3):
    bp.states, dets_s, touts, _ = bp._steps.batch_step(
        pipe.params, bp.states, frames_s, warps_s
    )
jax.block_until_ready(bp.states)
print("batch warm; dets", np.asarray(dets_s.count)[:8].tolist(), flush=True)
t0 = time.perf_counter()
n = 50
for _ in range(n):
    bp.states, dets_s, touts, _ = bp._steps.batch_step(
        pipe.params, bp.states, frames_s, warps_s
    )
jax.block_until_ready(bp.states)
dt = time.perf_counter() - t0
print(f"S={S}: {S*n/dt:.1f} fps/chip ({1000*dt/n:.2f} ms/step)", flush=True)
