import time, numpy as np, jax, jax.numpy as jnp
from strongsort_yolo_tpu.ops.nms import _greedy_keep_fixpoint, non_max_suppression
from strongsort_yolo_tpu.ops.boxes import box_iou
from strongsort_yolo_tpu.ops.pallas.nms_kernel import pallas_nms_keep

rng = np.random.default_rng(0)
k = 512
centers = rng.uniform(50, 600, (8, 2))
idx = rng.integers(0, 8, k)
cx = centers[idx,0] + rng.normal(0, 15, k); cy = centers[idx,1] + rng.normal(0, 15, k)
w = rng.uniform(20, 100, k); h = rng.uniform(20, 100, k)
boxes = np.stack([cx-w/2, cy-h/2, cx+w/2, cy+h/2],1).astype(np.float32)
conf = np.sort(rng.uniform(0,1,k))[::-1].copy().astype(np.float32)
# make realistic: only ~120 above 0.3
conf = conf * 0.45; conf[:120] += 0.35
b, c = jnp.asarray(boxes), jnp.asarray(conf)

got = np.asarray(pallas_nms_keep(b, c, iou_thres=0.4, conf_thres=0.3))
want = np.asarray(_greedy_keep_fixpoint(box_iou(b,b), c>=0.3, 0.4))
print('tpu pallas == xla:', np.array_equal(got, want), 'kept', got.sum(), flush=True)

xla_fn = jax.jit(lambda b,c: _greedy_keep_fixpoint(box_iou(b,b), c>=0.3, 0.4))
pal_fn = lambda b,c: pallas_nms_keep(b, c, iou_thres=0.4, conf_thres=0.3)
for name, fn in [('xla', xla_fn), ('pallas', pal_fn)]:
    r = fn(b,c); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(50): r = fn(b,c)
    jax.block_until_ready(r)
    print(name, 'nms', round((time.perf_counter()-t0)/50*1e6,1), 'us', flush=True)
