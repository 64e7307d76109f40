"""Scratch: StrongSORT path breakdown (VERDICT r2 #8) — times the
single-stream chunk with (a) plain botsort, (b) strongsort full, and
isolates the embed stage (crop + OSNet) cost by FLOPs/trace."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline

h, w = 1080, 1920
det_cfg = DetectorConfig(weights="yolov8n", half=True, max_det=1000)
pool = B.make_frames(h, w)
chunk = 10
dev_frames = jnp.asarray(np.stack(pool + pool[:2]))
warps = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (chunk, 1, 1))


def run(tracker, label, reid_topk=128):
    pipe = Pipeline(det_cfg, tracker=tracker, track_slots=256,
                    reid_topk=reid_topk)
    B.calibrate_candidates(pipe, pool[0], 0.3, 120)
    steps = pipe._get_step((h, w))
    state = pipe.track_state
    state, outs, _ = steps.track_chunk(pipe.params, state, dev_frames, warps)
    jax.block_until_ready(outs)
    fl = B.step_flops(steps.track_chunk, pipe.params, state, dev_frames, warps)
    t0 = time.perf_counter()
    for _ in range(20):
        state, outs, _ = steps.track_chunk(pipe.params, state, dev_frames, warps)
    jax.block_until_ready((state, outs))
    dt = time.perf_counter() - t0
    print(f"{label}: {200/dt:.1f} fps  ({fl/chunk/1e9:.1f} GFLOP/frame)",
          flush=True)
    return 200 / dt


from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

run(ByteTrackConfig(tracker_type="botsort", gmc_method="none"), "botsort")
run("strongsort.yaml", "strongsort topk=128")
run("strongsort.yaml", "strongsort topk=64", reid_topk=64)

# embed stage in isolation: crop+OSNet on a fixed det set
from strongsort_yolo_tpu.models.osnet import osnet_apply
from strongsort_yolo_tpu.ops.crops import crop_and_resize

pipe = Pipeline(det_cfg, tracker="strongsort.yaml", track_slots=256)
boxes = jnp.asarray(
    np.random.default_rng(0).uniform(100, 800, (128, 4)).astype(np.float32)
)
boxes = boxes.at[:, 2:].set(boxes[:, :2] + 150.0)
frame = dev_frames[0]


@jax.jit
def crops_only(frame, boxes):
    return crop_and_resize(
        frame.astype(jnp.bfloat16) / 255.0, boxes, (128, 64)
    )


@jax.jit
def embed_full(params, frame, boxes):
    crops = crop_and_resize(
        frame.astype(jnp.bfloat16) / 255.0, boxes, (128, 64)
    )
    return osnet_apply(params, crops, compute_dtype=jnp.bfloat16)


for label, fn, args in [
    ("crops only", crops_only, (frame, boxes)),
    ("crop+osnet", embed_full, (pipe.reid_params, frame, boxes)),
]:
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(50):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{label}: {(time.perf_counter()-t0)/50*1e3:.3f} ms/frame", flush=True)
