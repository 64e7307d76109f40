"""Serialized (state-chained) latency decomposition of the track step."""
import time, numpy as np, jax, jax.numpy as jnp

def bench(name, fn, *args, n=20):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/n*1e3
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return r, dt

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.state import init_track_state
import bench as B

h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
pipe = Pipeline(DetectorConfig(weights="yolov8n", half=True, max_det=1000), tracker=tcfg, track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
steps = pipe._get_step((h, w))
frames10 = jnp.asarray(np.stack(pool + pool[:2]))
warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))
warps10 = jnp.tile(warp[None], (10, 1, 1))

# full chunk (reference number)
st = pipe.track_state
st, d, o, _ = steps.track_chunk(pipe.params, st, frames10, warps10)
jax.block_until_ready(o)
def full_chunk(s):
    s2, d, o, e = steps.track_chunk(pipe.params, s, frames10, warps10)
    return o
_, dt_full = bench("track_chunk T=10 (per-frame = /10)", full_chunk, st)

# detect-only scan over the same 10 frames
@jax.jit
def detect_scan(params, frames):
    def step(carry, f):
        det, _ = steps.detect_step.__wrapped__(params, f) if hasattr(steps.detect_step, "__wrapped__") else (None, None)
        return carry, det.count
    return None
# can't unwrap jit; rebuild detect-only scan via pipeline internals:
from strongsort_yolo_tpu.models.yolo import model_apply, feat_hw
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.nms import nms_from_logits
from strongsort_yolo_tpu.ops.decode import make_anchors
lp = letterbox_params(h, w, 640)
anchors, strides = make_anchors(feat_hw((640, 640), pipe.model_cfg.strides), pipe.model_cfg.strides)

def detect_one(params, frame):
    img = letterbox(frame, lp, dtype=jnp.bfloat16)
    out = model_apply(params, img[None], pipe.model_cfg, compute_dtype=jnp.bfloat16)
    det = nms_from_logits(out["box_logits"][0], out["cls_logits"][0], anchors, strides,
        reg_max=16, conf_thres=0.3, iou_thres=0.4, max_det=1000)
    return det

@jax.jit
def detect_scan(params, frames):
    def step(c, f):
        det = detect_one(params, f)
        return c, (det.count, det.boxes[:128], det.scores[:128], det.classes[:128], det.valid[:128])
    _, outs = jax.lax.scan(step, None, frames)
    return outs
outs, dt_det = bench("detect-only scan T=10", detect_scan, pipe.params, frames10)
counts, B128, S128, C128, V128 = [np.asarray(x) for x in outs]
print("   per-frame detect:", round(dt_det/10, 3), "ms; dets:", counts.tolist(), flush=True)

# tracker-only scan chained over the 10 real det sets
@jax.jit
def tracker_scan(state, b, s, c, v):
    def step(st, inp):
        st, out = bytetrack_step(st, *inp, tcfg)
        return st, out.active.sum()
    st, outs = jax.lax.scan(step, state, (b, s, c, v))
    return st, outs
args = (jnp.asarray(B128), jnp.asarray(S128), jnp.asarray(C128), jnp.asarray(V128))
st0 = init_track_state(256)
(st1, _), dt_trk = bench("bytetrack-only scan T=10 (cold state)", tracker_scan, st0, *args)
(_, _), dt_trk2 = bench("bytetrack-only scan T=10 (warm state)", tracker_scan, st1, *args)
print("   per-frame tracker (warm):", round(dt_trk2/10, 3), "ms", flush=True)

# auction sensitivity: realistic first-stage cost matrix
from strongsort_yolo_tpu.ops.assignment import solve_assignment
rng = np.random.default_rng(0)
cost = rng.uniform(0.5, 1.0, (256, 128)).astype(np.float32)
# ~46 tracks nearly matching ~46 dets
for i in range(46):
    cost[i, i] = rng.uniform(0.05, 0.3)
rv = np.zeros(256, bool); rv[:46] = True
cv = np.zeros(128, bool); cv[:46] = True
cost_j = jnp.asarray(cost); rv_j = jnp.asarray(rv); cv_j = jnp.asarray(cv)
for eps in (3e-3, 1e-2, 3e-2):
    f = jax.jit(lambda co, r, c: solve_assignment(co, 0.8, r, c, eps_rel=eps))
    bench(f"solve_assignment 256x128 eps={eps}", f, cost_j, rv_j, cv_j, n=50)
