import time, functools, numpy as np, jax, jax.numpy as jnp
def bench(name, fn, *args, n=50):
    r = fn(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(name, round((time.perf_counter()-t0)/n*1e3,3), 'ms', flush=True)

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
import bench as B
h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type='botsort', gmc_method='none')
pipe = Pipeline(DetectorConfig(weights='yolov8n', half=True, max_det=300), tracker=tcfg, track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
detect_step, track_step, _ = pipe._get_step((h, w))
f = jnp.asarray(pool[0])
warp = jnp.asarray(np.eye(2,3,dtype=np.float32))

det, _ = detect_step(pipe.params, f)
print('det count:', int(det.count), flush=True)
bench('detect_step', lambda: detect_step(pipe.params, f)[0].boxes)

st = pipe.track_state
for i in range(8):
    st, d2, out, _ = track_step(pipe.params, st, jnp.asarray(pool[i%8]), warp)
jax.block_until_ready(out)
print('active tracks:', int(np.asarray(out.active).sum()), flush=True)

bt = jax.jit(functools.partial(bytetrack_step, cfg=tcfg))
tb, ts, tc, tv = det.boxes[:128], det.scores[:128], det.classes[:128], det.valid[:128]
# populated state + real dets, state NOT carried (isolate one step cost)
bench('bytetrack_alone(real)', lambda: bt(st, tb, ts, tc, tv)[1].boxes)
bench('track_step(full)', lambda: track_step(pipe.params, st, f, warp)[2].boxes)
