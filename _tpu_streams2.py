import time, numpy as np, jax, jax.numpy as jnp
from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.parallel.streams import StreamBatch
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig
import bench as B
h, w = 1080, 1920
det_cfg = DetectorConfig(imgsz=640, half=True, max_det=128)
pipe = Pipeline(DetectorConfig(weights='yolov8n', half=True, max_det=128), tracker=ByteTrackConfig(gmc_method='none'), track_slots=128)
pool = B.make_frames(h, w, n=4)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
for S in [4]:
    sb = StreamBatch(pipe.params, pipe.model_cfg, det_cfg, ByteTrackConfig(gmc_method='none'),
                     num_streams=S, src_hw=(h, w), track_slots=128)
    frames = jnp.asarray(np.stack([pool[i % 4] for i in range(S)]))
    for _ in range(8):
        sb.states, dets, touts = sb._step(sb.params, sb.states, frames)
    jax.block_until_ready(sb.states)
    print('per-stream dets:', np.asarray(dets.count), 'active:', np.asarray(touts.active).sum(1), flush=True)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        sb.states, dets, touts = sb._step(sb.params, sb.states, frames)
    jax.block_until_ready(sb.states)
    dt = (time.perf_counter() - t0) / n
    print(f'streams={S} CALIBRATED: {dt*1e3:.2f} ms/step = {S/dt:.1f} aggregate fps/chip', flush=True)
