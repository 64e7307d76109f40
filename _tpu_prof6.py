import time, numpy as np, jax, jax.numpy as jnp
def bench(name, fn, *args, n=50):
    r = fn(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(name, round((time.perf_counter()-t0)/n*1e3,3), 'ms', flush=True)
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig
from strongsort_yolo_tpu.track import kalman
import bench as B
h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type='botsort', gmc_method='none')
pipe = Pipeline(DetectorConfig(weights='yolov8n', half=True, max_det=300), tracker=tcfg, track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
_, track_step, _ = pipe._get_step((h, w))
warp = jnp.asarray(np.eye(2,3,dtype=np.float32))
st = pipe.track_state
for i in range(8):
    st, det, out, _ = track_step(pipe.params, st, jnp.asarray(pool[i%8]), warp)
jax.block_until_ready(st)
m_host = np.asarray(st.mean); c_host = np.asarray(st.cov)
print('mean finite:', np.isfinite(m_host).all(), 'cov finite:', np.isfinite(c_host).all(), flush=True)
print('cov absmax:', np.abs(c_host).max(), 'mean absmax:', np.abs(m_host).max(), flush=True)
fn = jax.jit(lambda m,c: kalman.predict(m,c,'xywh'))
bench('predict on st arrays', fn, st.mean, st.cov)
m2 = jax.device_put(m_host); c2 = jax.device_put(c_host)
bench('predict on fresh copies', fn, m2, c2)
z1 = jnp.zeros_like(st.mean); z2 = jnp.zeros_like(st.cov)
bench('predict on zeros', fn, z1, z2)
bench('sum(st.cov)', jax.jit(lambda c: jnp.sum(c)), st.cov)
