"""Chained (bench-identical) serialized timing + auction round counts."""
import time, numpy as np, jax, jax.numpy as jnp

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig
import bench as B

h, w = 1080, 1920
tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
pipe = Pipeline(DetectorConfig(weights="yolov8n", half=True, max_det=1000), tracker=tcfg, track_slots=256)
pool = B.make_frames(h, w)
B.calibrate_candidates(pipe, pool[0], 0.3, 120)
steps = pipe._get_step((h, w))
warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))

def chained(T, n_chunks=20):
    frames = jnp.asarray(np.stack([pool[i % 8] for i in range(T)]))
    warps = jnp.tile(warp[None], (T, 1, 1))
    st = pipe.track_state
    st, o, _ = steps.track_chunk(pipe.params, st, frames, warps)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        st, o, _ = steps.track_chunk(pipe.params, st, frames, warps)
    jax.block_until_ready((st, o))
    dt = time.perf_counter() - t0
    fps = T * n_chunks / dt
    print(f"chained chunk T={T:3d}: {fps:7.1f} fps ({dt/n_chunks/T*1e3:.3f} ms/frame)", flush=True)

chained(10)
chained(20)
chained(40, n_chunks=10)

# auction rounds on contested matrices (reimplemented with counter)
from strongsort_yolo_tpu.ops import assignment as A

def solve_rounds(cost, thresh, row_valid, col_valid, eps_rel=3e-3, unroll=2):
    r, c = cost.shape
    n_obj = c + r
    thresh = jnp.asarray(thresh, jnp.float32)
    finite_cost = jnp.clip(cost.astype(jnp.float32), -1e6, 1e6)
    valid_pair = row_valid[:, None] & col_valid[None, :]
    cmin = jnp.minimum(jnp.min(jnp.where(valid_pair, finite_cost, thresh)), thresh)
    cmax = jnp.maximum(jnp.max(jnp.where(valid_pair, finite_cost, thresh)), thresh)
    crange = jnp.maximum(cmax - cmin, 1e-6)
    forbid = jnp.float32(-4.0)
    w_real = jnp.where(valid_pair, (thresh - finite_cost) / crange, forbid)
    sent = jnp.where(jnp.eye(r, dtype=bool), 0.0, forbid)
    benefit = jnp.concatenate([w_real, sent], axis=1)
    idx_r = jnp.arange(r, dtype=jnp.int32)
    idx_o = jnp.arange(n_obj, dtype=jnp.int32)
    eps = jnp.float32(eps_rel)

    def one_round(assign, owner, price):
        values = benefit - price[None, :]
        best_j = jnp.argmax(values, axis=1).astype(jnp.int32)
        best_v = jnp.max(values, axis=1)
        masked = values.at[idx_r, best_j].set(A._NEG)
        second_v = jnp.max(masked, axis=1)
        bid = price[best_j] + (best_v - second_v) + eps
        unassigned = assign < 0
        bid_mat = jnp.where(unassigned[:, None] & (best_j[:, None] == idx_o[None, :]), bid[:, None], A._NEG)
        win_bid = jnp.max(bid_mat, axis=0)
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        has_bid = win_bid > A._NEG * 0.5
        new_owner = jnp.where(has_bid, winner, owner)
        new_price = jnp.where(has_bid, win_bid, price)
        owner_safe = jnp.where(new_owner >= 0, new_owner, r)
        new_assign = jnp.full((r + 1,), -1, jnp.int32).at[owner_safe].set(idx_o)[:r]
        return new_assign, new_owner, new_price

    def cond(state):
        assign, owner, price, rounds = state
        return jnp.logical_and(jnp.any(assign < 0), rounds < 16 * r)

    def body(state):
        assign, owner, price, rounds = state
        for _ in range(unroll):
            assign, owner, price = one_round(assign, owner, price)
        return assign, owner, price, rounds + unroll

    a0 = jnp.full((r,), -1, jnp.int32)
    o0 = jnp.full((n_obj,), -1, jnp.int32)
    p0 = jnp.zeros((n_obj,), jnp.float32)
    assign, _, _, rounds = jax.lax.while_loop(cond, body, (a0, o0, p0, jnp.int32(0)))
    return rounds

rng = np.random.default_rng(0)
for n_tracks, jitter in ((46, 0.05), (46, 0.25), (100, 0.25)):
    cost = rng.uniform(0.5, 1.0, (256, 128)).astype(np.float32)
    for i in range(n_tracks):
        cost[i, i] = rng.uniform(0.05, jitter + 0.05)
        # contested: neighbor dets nearly as good
        if i + 1 < n_tracks:
            cost[i, i + 1] = cost[i, i] + rng.uniform(0, jitter)
    rv = np.zeros(256, bool); rv[:n_tracks] = True
    cv = np.zeros(128, bool); cv[:n_tracks] = True
    f = jax.jit(lambda co, r, c: solve_rounds(co, 0.8, r, c))
    rounds = int(f(jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv)))
    print(f"rounds tracks={n_tracks} contested-jitter={jitter}: {rounds}", flush=True)

# timing: unroll 2 vs 4 on the contested case
cost_j = jnp.asarray(cost); rv_j = jnp.asarray(rv); cv_j = jnp.asarray(cv)
for unroll in (2, 4):
    f = jax.jit(lambda co, r, c, u=unroll: solve_rounds(co, 0.8, r, c, unroll=u))
    f(cost_j, rv_j, cv_j)
    t0 = time.perf_counter()
    for _ in range(50):
        r_ = f(cost_j, rv_j, cv_j)
    jax.block_until_ready(r_)
    print(f"solve unroll={unroll}: {(time.perf_counter()-t0)/50*1e3:.3f} ms", flush=True)
