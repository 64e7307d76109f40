import time, numpy as np, jax, jax.numpy as jnp
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.models.yolo import YoloConfig, init_model, fuse_model
from strongsort_yolo_tpu.parallel.streams import StreamBatch
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig
import bench as B
h, w = 1080, 1920
model_cfg = YoloConfig(family='v8', scale='n')
params = fuse_model(init_model(jax.random.PRNGKey(0), model_cfg))
det_cfg = DetectorConfig(imgsz=640, half=True, max_det=128)
for S in [2, 4]:
    sb = StreamBatch(params, model_cfg, det_cfg, ByteTrackConfig(gmc_method='none'),
                     num_streams=S, src_hw=(h, w), track_slots=128)
    pool = B.make_frames(h, w, n=4)
    frames = jnp.asarray(np.stack([pool[i % 4] for i in range(S)]))
    for _ in range(5):
        states, dets, touts = sb._step(sb.params, sb.states, frames)
        sb.states = states
    jax.block_until_ready(states)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        states, dets, touts = sb._step(sb.params, sb.states, frames)
        sb.states = states
    jax.block_until_ready(states)
    dt = (time.perf_counter() - t0) / n
    print(f'streams={S}: {dt*1e3:.2f} ms/step = {S/dt:.1f} aggregate fps/chip', flush=True)
