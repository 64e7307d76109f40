import time, functools, numpy as np, jax, jax.numpy as jnp
def bench(name, fn, *args, n=50):
    r = fn(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(name, round((time.perf_counter()-t0)/n*1e3,3), 'ms', flush=True)

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, _to_xyxy
from strongsort_yolo_tpu.track import kalman, cost as costs
from strongsort_yolo_tpu.track.state import STATUS_TRACKED, STATUS_LOST
from strongsort_yolo_tpu.ops.assignment import solve_assignment
import bench as B
h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type='botsort', gmc_method='none')
pipe = Pipeline(DetectorConfig(weights='yolov8n', half=True, max_det=300), tracker=tcfg, track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
detect_step, track_step, _ = pipe._get_step((h, w))
warp = jnp.asarray(np.eye(2,3,dtype=np.float32))
st = pipe.track_state
for i in range(8):
    st, det, out, _ = track_step(pipe.params, st, jnp.asarray(pool[i%8]), warp)
det, _ = detect_step(pipe.params, jnp.asarray(pool[0]))
tb, ts, tc, tv = det.boxes[:128], det.scores[:128], det.classes[:128], det.valid[:128]
print('status counts:', {k:int((np.asarray(st.status)==v).sum()) for k,v in [('empty',0),('tracked',1),('lost',2)]}, flush=True)

# KF pieces
bench('kf_predict_256', lambda m,c: kalman.predict(m,c,'xywh'), st.mean, st.cov)
meas = jnp.tile(jnp.asarray([100.,100.,50.,80.]), (256,1))
bench('kf_update_256', lambda m,c: kalman.update(m,c,meas,'xywh'), st.mean, st.cov)

# stage-1 cost matrix exactly as in the step
tracked_act = jnp.logical_and(st.status == STATUS_TRACKED, st.activated)
pool_m = jnp.logical_or(tracked_act, st.status == STATUS_LOST)
high = jnp.logical_and(tv, ts >= tcfg.track_high_thresh)
slot_boxes = _to_xyxy(st.mean[:, :4], 'xywh')
d_iou = costs.iou_cost(slot_boxes, tb)
c1 = costs.botsort_fused_cost(d_iou, None, ts, with_fuse_score=True)
c1 = costs.mask_cost(c1, pool_m, high)
print('valid rows', int(pool_m.sum()), 'cols', int(high.sum()), flush=True)
for epsr in [5e-3, 5e-2]:
    fn = jax.jit(functools.partial(solve_assignment, thresh=tcfg.match_thresh, eps_final_rel=epsr))
    bench(f'auction_stage1 eps{epsr}', lambda c,r,v: fn(c, row_valid=r, col_valid=v), c1, pool_m, high)
np.savez('/tmp/real_cost.npz', c1=np.asarray(c1), rv=np.asarray(pool_m), cv=np.asarray(high))
