"""Bisect bytetrack_step cost: which piece scales with K=256."""
import time, numpy as np, jax, jax.numpy as jnp

from strongsort_yolo_tpu.track import kalman
from strongsort_yolo_tpu.track import cost as costs
from strongsort_yolo_tpu.track.bytetrack import (
    ByteTrackConfig, _to_meas, _to_xyxy, _masked_kf_update, bytetrack_step,
)
from strongsort_yolo_tpu.track.state import init_track_state, STATUS_TRACKED, STATUS_LOST
from strongsort_yolo_tpu.ops.assignment import solve_assignment

K, N, T = 256, 128, 50
cfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
rng = np.random.default_rng(0)

# realistic det streams: ~46 moving boxes
def make_dets(t):
    b = np.zeros((N, 4), np.float32)
    s = np.zeros((N,), np.float32)
    v = np.zeros((N,), bool)
    for i in range(46):
        x = 50 + 37 * i % 1700 + 3 * t
        y = 40 + 23 * i % 900 + 2 * t
        b[i] = (x, y, x + 120, y + 180)
        s[i] = 0.5 + 0.4 * ((i * 13) % 10) / 10
        v[i] = True
    return b, s, v

B = jnp.asarray(np.stack([make_dets(t)[0] for t in range(T)]))
S = jnp.asarray(np.stack([make_dets(t)[1] for t in range(T)]))
V = jnp.asarray(np.stack([make_dets(t)[2] for t in range(T)]))
C = jnp.zeros((T, N), jnp.int32)

def timeit(name, scan_fn, st0, n=10):
    st = scan_fn(st0)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(n):
        st = scan_fn(st)
    jax.block_until_ready(st)
    print(f"{name:46s} {(time.perf_counter()-t0)/n/T*1e3:7.4f} ms/frame", flush=True)
    return st

# full tracker
@jax.jit
def scan_full(st):
    def step(st, inp):
        b, s, c, v = inp
        st, out = bytetrack_step(st, b, s, c, v, cfg)
        return st, out.active.sum()
    st, _ = jax.lax.scan(step, st, (B, S, C, V))
    return st
stw = timeit("full bytetrack_step", scan_full, init_track_state(K))
timeit("full bytetrack_step (warm)", scan_full, stw)

# predict only
@jax.jit
def scan_predict(st):
    def step(st, inp):
        b, s, c, v = inp
        pm, pc = kalman.predict(st.mean, st.cov, cfg.form)
        st = st._replace(mean=pm, cov=pc, frame_id=st.frame_id + 1)
        return st, pm.sum()
    st, _ = jax.lax.scan(step, st, (B, S, C, V))
    return st
timeit("predict only", scan_predict, stw)

# predict + masked update (no assoc: match slot i -> det i%N)
@jax.jit
def scan_pred_upd(st):
    def step(st, inp):
        b, s, c, v = inp
        pm, pc = kalman.predict(st.mean, st.cov, cfg.form)
        st = st._replace(mean=pm, cov=pc, frame_id=st.frame_id + 1)
        meas = _to_meas(b, cfg.form)
        matched = st.status == STATUS_TRACKED
        slot_det = jnp.arange(K, dtype=jnp.int32) % N
        st = _masked_kf_update(st, matched, slot_det, meas, s, c, None, cfg)
        return st, st.mean.sum()
    st, _ = jax.lax.scan(step, st, (B, S, C, V))
    return st
timeit("predict + masked_kf_update", scan_pred_upd, stw)

# predict + 3 auction solves (no update)
@jax.jit
def scan_pred_solves(st):
    def step(st, inp):
        b, s, c, v = inp
        pm, pc = kalman.predict(st.mean, st.cov, cfg.form)
        st = st._replace(mean=pm, cov=pc, frame_id=st.frame_id + 1)
        slot_boxes = _to_xyxy(st.mean[:, :4], cfg.form)
        pool = st.status != 0
        high = jnp.logical_and(v, s >= cfg.track_high_thresh)
        d = costs.iou_cost(slot_boxes, b)
        acc = jnp.int32(0)
        for thr in (0.8, 0.5, 0.7):
            a = solve_assignment(d, thr, pool, high)
            acc = acc + (a.row_to_col >= 0).sum()
        return st, acc
    st, _ = jax.lax.scan(step, st, (B, S, C, V))
    return st
timeit("predict + iou + 3 solves", scan_pred_solves, stw)

# cost-matrix building only (iou + botsort fuse) x2
@jax.jit
def scan_costs(st):
    def step(st, inp):
        b, s, c, v = inp
        slot_boxes = _to_xyxy(st.mean[:, :4], cfg.form)
        d = costs.iou_cost(slot_boxes, b)
        c1 = costs.botsort_fused_cost(d, None, s, proximity_thresh=0.5,
                                      appearance_thresh=0.25, with_fuse_score=True)
        c3 = costs.botsort_fused_cost(d, None, s, proximity_thresh=0.5,
                                      appearance_thresh=0.25, with_fuse_score=True)
        return st, c1.sum() + c3.sum()
    st, _ = jax.lax.scan(step, st, (B, S, C, V))
    return st
timeit("iou + 2x fused cost only", scan_costs, stw)
