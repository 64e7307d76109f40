"""StrongSORT path timing: OSNet embed + NSA tracker at 1080p."""
import time, numpy as np, jax, jax.numpy as jnp

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
import bench as B

h, w = 1080, 1920
pipe = Pipeline(
    DetectorConfig(weights="yolov8n", half=True, max_det=1000),
    tracker="strongsort.yaml", track_slots=256,
)
print("reid variant:", pipe.reid_cfg.variant, "feat", pipe.reid_cfg.feat_dim,
      "topk", pipe.reid_topk, flush=True)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
steps = pipe._get_step((h, w))
frames10 = jnp.asarray(np.stack(pool + pool[:2]))
warps10 = jnp.tile(jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (10, 1, 1))

def timeit(name, fn, st0, n=15):
    st = fn(st0); jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(n): st = fn(st)
    jax.block_until_ready(st)
    print(f"{name:46s} {(time.perf_counter()-t0)/n/10*1e3:7.3f} ms/frame", flush=True)

def prod(st):
    st, o, e = steps.track_chunk(pipe.params, st, frames10, warps10)
    return st
timeit("strongsort track_chunk (gmc warps fed)", prod, pipe.track_state)

# embed alone: crops + osnet on 128 crops
from strongsort_yolo_tpu.models.osnet import osnet_apply
from strongsort_yolo_tpu.ops.crops import crop_and_resize

rng = np.random.default_rng(0)
boxes = jnp.asarray(rng.uniform(0, 900, (128, 4)).astype(np.float32))
frame = frames10[0]

@jax.jit
def embed(params, frame, boxes):
    crops = crop_and_resize(frame.astype(jnp.bfloat16) / 255.0, boxes, (128, 64))
    return osnet_apply(params, crops, compute_dtype=jnp.bfloat16)

r = embed(pipe.reid_params, frame, boxes); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(50): r = embed(pipe.reid_params, frame, boxes)
jax.block_until_ready(r)
print(f"{'embed 128 crops (crop+osnet_x0_25)':46s} {(time.perf_counter()-t0)/50*1e3:7.3f} ms", flush=True)

@jax.jit
def crops_only(frame, boxes):
    return crop_and_resize(frame.astype(jnp.bfloat16) / 255.0, boxes, (128, 64))
r = crops_only(frame, boxes); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(50): r = crops_only(frame, boxes)
jax.block_until_ready(r)
print(f"{'crop_and_resize only':46s} {(time.perf_counter()-t0)/50*1e3:7.3f} ms", flush=True)
