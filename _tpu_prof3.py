import time, numpy as np, jax, jax.numpy as jnp, functools
def bench(name, fn, *args, n=100):
    r = fn(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(name, round((time.perf_counter()-t0)/n*1e3,3), 'ms', flush=True)

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.models.yolo import model_apply, feat_hw
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.decode import make_anchors
from strongsort_yolo_tpu.ops.nms import nms_from_logits
from strongsort_yolo_tpu.ops.boxes import scale_boxes
import bench as B
h, w = 1080, 1920
pipe = Pipeline(DetectorConfig(weights='yolov8n', half=True, max_det=300), tracker=ByteTrackConfig(tracker_type='botsort', gmc_method='none'), track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
f = jnp.asarray(pool[0])
cfg = pipe.model_cfg
lp = letterbox_params(h, w, 640)
anchors, strides = make_anchors(feat_hw((640,640), cfg.strides), cfg.strides)

lb = jax.jit(lambda fr: letterbox(fr, lp, dtype=jnp.bfloat16))
bench('letterbox', lb, f)

mdl = jax.jit(lambda p, fr: model_apply(p, letterbox(fr, lp, dtype=jnp.bfloat16)[None], cfg, compute_dtype=jnp.bfloat16)['cls_logits'])
bench('lb+model', mdl, pipe.params, f)

det_fn = jax.jit(lambda p, fr: nms_from_logits(
    *( (o:=model_apply(p, letterbox(fr, lp, dtype=jnp.bfloat16)[None], cfg, compute_dtype=jnp.bfloat16))['box_logits'][0], o['cls_logits'][0]),
    anchors, strides, conf_thres=0.3, iou_thres=0.4, max_det=300).boxes)
bench('lb+model+nms', det_fn, pipe.params, f)

detect_step, track_step, _ = pipe._get_step((h, w))
bench('detect_step(full)', lambda: detect_step(pipe.params, f)[0].boxes)

warp = jnp.asarray(np.eye(2,3,dtype=np.float32))
st = pipe.track_state
for i in range(8):
    st, det, out, _ = track_step(pipe.params, st, jnp.asarray(pool[i%8]), warp)
bench('track_step(full)', lambda: track_step(pipe.params, st, f, warp)[2].boxes)

# tracker step alone with realistic dets
det, _ = detect_step(pipe.params, f)
tcfg = ByteTrackConfig(tracker_type='botsort', gmc_method='none')
bt = jax.jit(functools.partial(bytetrack_step, cfg=tcfg))
tb, ts, tc, tv = det.boxes[:128], det.scores[:128], det.classes[:128], det.valid[:128]
bench('tracker_alone', lambda: bt(st, tb, ts, tc, tv)[1].boxes)
print('valid dets:', int(det.count), flush=True)
