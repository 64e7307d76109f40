"""Component-level timing of the 1080p track step at max_det=1000."""
import time, numpy as np, jax, jax.numpy as jnp

def bench(name, fn, *args, n=100):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:38s} {(time.perf_counter()-t0)/n*1e3:7.3f} ms", flush=True)
    return r

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.models.yolo import model_apply
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.nms import nms_from_logits
from strongsort_yolo_tpu.ops.decode import make_anchors
from strongsort_yolo_tpu.models.yolo import feat_hw
import bench as B

h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
pipe = Pipeline(DetectorConfig(weights="yolov8n", half=True, max_det=1000), tracker=tcfg, track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
steps = pipe._get_step((h, w))
frame = jnp.asarray(pool[0])
warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))

# stage state
st = pipe.track_state
for i in range(8):
    st, det, out, _ = steps.track_step(pipe.params, st, frame, warp)
jax.block_until_ready(st)
print("dets:", int(det.count), "tracks:", int(np.asarray(out.active).sum()), flush=True)

lp = letterbox_params(h, w, 640)
lbx = jax.jit(lambda f: letterbox(f, lp, dtype=jnp.bfloat16))
img = bench("letterbox", lbx, frame)

fwd = jax.jit(lambda p, im: model_apply(p, im[None], pipe.model_cfg, compute_dtype=jnp.bfloat16))
outm = bench("model fwd", fwd, pipe.params, img)

anchors, strides = make_anchors(feat_hw((640, 640), pipe.model_cfg.strides), pipe.model_cfg.strides)
nmsf = jax.jit(lambda bo, cl: nms_from_logits(bo[0], cl[0], anchors, strides,
    reg_max=16, conf_thres=0.3, iou_thres=0.4, max_det=1000))
det1 = bench("nms_from_logits", nmsf, outm["box_logits"], outm["cls_logits"])

det_only = jax.jit(lambda p, f: steps.detect_step(p, f))
bench("detect_step (lbx+fwd+nms+scale)", lambda p, f: steps.detect_step(p, f), pipe.params, frame)

tstep = jax.jit(bytetrack_step, static_argnums=(5,))
tb, ts_, tc, tv = det.boxes[:128], det.scores[:128], det.classes[:128], det.valid[:128]
def run_tracker(state):
    s2, o = tstep(state, tb, ts_, tc, tv, tcfg)
    return o
bench("bytetrack_step (steady state)", run_tracker, st)

bench("full track_step", lambda: steps.track_step(pipe.params, st, frame, warp)[1])

# batched: where does S=8 spend?
bp = pipe.track_batch_prepare(8, (h, w))
frames8 = jnp.asarray(np.stack([pool[i % 8] for i in range(8)]))
warps8 = jnp.tile(warp[None], (8, 1, 1))
for _ in range(3):
    bp.states, d8, o8, _ = bp._steps.batch_step(pipe.params, bp.states, frames8, warps8)
jax.block_until_ready(bp.states)
def run_b():
    s, d, o, e = bp._steps.batch_step(pipe.params, bp.states, frames8, warps8)
    return o
bench("batch_step S=8 (whole)", run_b, n=50)

fwd8 = jax.jit(lambda p, ims: model_apply(p, ims, pipe.model_cfg, compute_dtype=jnp.bfloat16))
imgs8 = jax.jit(lambda fs: jax.vmap(lambda f: letterbox(f, lp, dtype=jnp.bfloat16))(fs))(frames8)
bench("model fwd S=8", fwd8, pipe.params, imgs8, n=50)
bench("letterbox S=8", lambda fs: jax.vmap(lambda f: letterbox(f, lp, dtype=jnp.bfloat16))(fs), frames8, n=50)
