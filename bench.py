"""Benchmark: end-to-end 1080p detect+track FPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N,
   "extra": {per-mode figures incl. MFU and the gmc=sparseOptFlow
   default-config number}}

Headline = AGGREGATE per-chip throughput with 8 batched streams
(pipeline.BatchedPipeline — the same batch_step the app's concurrent
multi-source path runs) at the REFERENCE-PARITY NMS config
(conf=0.3, iou=0.4, max_det=1000 — /root/reference/
yolo_multi_model.py:18-21). The single-stream latency-mode figure, its
MFU, and the gmc-enabled figure are in "extra" and logged to stderr.

The measured path is the device program the app runs per frame
(pipeline track_step): letterbox -> YOLOv8n (bf16, BN-fused) -> DFL
decode -> NMS -> rescale -> ByteTrack/BoT-SORT fixed-slot update, with
frame-to-frame tracker-state dependency (steps execute sequentially on
device, no fake overlap). The gmc figure runs the host sparse-optflow
warp for every frame, overlapped with the device chunk (same overlap
the app loop uses).

Frames are pre-staged on device and outputs synced at the end: in this
rig the single TPU chip is reached through a development network
tunnel, so per-frame host<->device transfers measure the tunnel (~1s
per 6MB 1080p upload), not the v5e's PCIe/DMA path. The device
pipeline is the thing this framework optimizes; host-side decode
overlap is the media layer's job (SURVEY.md §7 step 1).

No pretrained checkpoints exist in this offline image, so the model
runs with random weights — but detection *statistics* drive the cost
of the NMS fixpoint and the association solves. To make the measured
load realistic the class-head bias is calibrated so ~TARGET_DETS
candidates clear the confidence threshold per frame (a trained v8n on
busy 1080p street scenes yields a similar load).

MFU: FLOPs per frame come from XLA's compiled cost analysis of the
exact step executable; peak is the v5e bf16 figure (197 TFLOP/s).

Baseline: the reference publishes no numbers (BASELINE.md); the
north-star target is 300 FPS e2e 1080p on one v5e chip, so
vs_baseline = fps / 300.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_DETS = 120
FRAMES = 200
V5E_BF16_PEAK = 197e12  # TFLOP/s, one v5e chip

T0 = time.perf_counter()


def log(msg):
    print(f"[bench +{time.perf_counter()-T0:.1f}s] {msg}", file=sys.stderr, flush=True)


def make_frames(h, w, n=8, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)
    pool = []
    for t in range(n):
        f = base.copy()
        for k in range(6):
            x = (100 + 211 * k + 9 * t) % (w - 200)
            y = (80 + 137 * k + 5 * t) % (h - 260)
            f[y : y + 240, x : x + 180] = (40 * k + 40) % 255
        pool.append(f)
    return pool


def calibrate_candidates(pipe, frame, conf, target):
    """Shift cls-head biases until ~target candidates clear conf."""
    import jax
    import jax.numpy as jnp

    from strongsort_yolo_tpu.models.yolo import model_apply
    from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params

    lp = letterbox_params(*frame.shape[:2], pipe.det_cfg.imgsz)
    img = letterbox(jnp.asarray(frame), lp, dtype=pipe.compute_dtype)

    @jax.jit
    def max_logits(params):
        out = model_apply(params, img[None], pipe.model_cfg,
                          compute_dtype=pipe.compute_dtype)
        return jnp.max(out["cls_logits"][0], axis=-1)

    logits = np.asarray(max_logits(pipe.params))  # (A,)
    want_logit = np.log(conf / (1 - conf))
    # offset so the target-th anchor clears the threshold with margin —
    # bf16 logits quantize coarsely, so landing exactly on the boundary
    # flips the whole (tie-heavy) tail below it
    kth = np.partition(logits, -target)[-target]
    offset = float(want_logit + 0.7 - kth)

    # apply to the three cls tower output biases
    import jax

    params = jax.tree.map(lambda x: x, pipe.params)  # shallow copy tree
    for br in params["detect"]["cls"]:
        br["out"]["b"] = br["out"]["b"] + offset
    pipe.params = params


def calibrate_anchor_based(pipe, frame, conf, target):
    """v5/v7 load calibration: their heads emit fully-decoded
    sigmoid scores (obj*cls), so the cls-logit trick above doesn't
    apply. Instead the objectness bias entries are shifted by a delta
    found by bisection on the compiled forward (score is monotone in
    the obj logit): ~10 cheap evals of one jitted program."""
    import jax
    import jax.numpy as jnp

    from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params

    lp = letterbox_params(*frame.shape[:2], pipe.det_cfg.imgsz)
    img = letterbox(jnp.asarray(frame), lp, dtype=pipe.compute_dtype)
    if pipe._is_v5:
        from strongsort_yolo_tpu.models.yolov5 import yolov5_apply as fn
    else:
        from strongsort_yolo_tpu.models.yolov7 import yolov7_apply as fn
    cfg = pipe.model_cfg

    def shift(params, delta):
        def bump(b):
            g = b.reshape(cfg.na, -1).at[:, 4].add(delta)
            return g.reshape(b.shape)

        det = params["detect"]
        return {
            **params,
            "detect": {**det, "m": [{**m, "b": bump(m["b"])} for m in det["m"]]},
        }

    @jax.jit
    def count_over(params, delta):
        out = fn(shift(params, delta), img[None], cfg,
                 compute_dtype=pipe.compute_dtype)
        return jnp.sum(jnp.max(out["scores"][0], -1) >= conf)

    lo, hi = -25.0, 25.0
    for _ in range(14):
        mid = 0.5 * (lo + hi)
        n = int(count_over(pipe.params, jnp.float32(mid)))
        if n < target:
            lo = mid
        else:
            hi = mid
    pipe.params = shift(pipe.params, jnp.float32(hi))
    return int(count_over(pipe.params, jnp.float32(0.0)))


def step_flops(jitted, *args) -> float:
    """FLOPs of one compiled step from XLA's cost analysis."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort
        log(f"cost_analysis unavailable: {e}")
        return 0.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    h, w = 1080, 1920
    # reference-parity NMS config: conf .3 / iou .4 / max_det 1000
    # (yolo_multi_model.py:18-21)
    det_cfg = DetectorConfig(weights="yolov8n", half=True, max_det=1000)
    tracker = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
    pipe = Pipeline(det_cfg, tracker=tracker, track_slots=256)

    pool = make_frames(h, w)
    log("frames made")
    calibrate_candidates(pipe, pool[0], det_cfg.conf, TARGET_DETS)
    log("calibrated")

    steps = pipe._get_step((h, w))
    chunk = 10
    dev_frames = jnp.asarray(np.stack(pool + pool[:2]))  # (10, H, W, 3)
    log("frames staged")
    warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))
    warps = jnp.tile(warp[None], (chunk, 1, 1))
    state = pipe.track_state

    # warm up + report load via the single-step path
    for i in range(3):
        state, det, out, _ = steps.track_step(
            pipe.params, state, dev_frames[i % chunk], warp
        )
        if i == 0:
            jax.block_until_ready(out)
            log("first step done (compile)")
    jax.block_until_ready(out)
    log(
        f"warmup done; load: {int(det.count)} dets/frame, "
        f"{int(np.asarray(out.active).sum())} active tracks"
    )
    flops_frame = step_flops(
        steps.track_step, pipe.params, state, dev_frames[0], warp
    )
    log(f"compiled step: {flops_frame/1e9:.2f} GFLOP/frame")

    state, outs_c, _ = steps.track_chunk(
        pipe.params, state, dev_frames, warps
    )
    jax.block_until_ready(outs_c)
    log("chunk compiled")

    t0 = time.perf_counter()
    for i in range(FRAMES // chunk):
        state, outs_c, _ = steps.track_chunk(
            pipe.params, state, dev_frames, warps
        )
    jax.block_until_ready((state, outs_c))
    elapsed = time.perf_counter() - t0
    fps_single = FRAMES / elapsed
    mfu_single = fps_single * flops_frame / V5E_BF16_PEAK
    log(
        f"single-stream: {fps_single:.1f} fps (chunked dispatch), "
        f"MFU {100*mfu_single:.1f}%"
    )

    # default-config figure: gmc=sparseOptFlow host warps overlapped
    # with the device chunk (VERDICT r01 weak #3) — the host computes
    # chunk i+1's warps while the device runs chunk i
    from concurrent.futures import ThreadPoolExecutor

    from strongsort_yolo_tpu.track.gmc import make_gmc

    gmc = make_gmc("sparseOptFlow")
    host_frames = pool + pool[:2]

    def compute_warps():
        return jnp.asarray(
            np.stack([gmc.apply(f) for f in host_frames]), jnp.float32
        )

    compute_warps()  # prime gmc state
    pending_warps = compute_warps()
    n_chunks = FRAMES // chunk
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=1) as ex:
        for i in range(n_chunks):
            fut = ex.submit(compute_warps)  # host: next chunk's warps
            state, outs_c, _ = steps.track_chunk(
                pipe.params, state, dev_frames, pending_warps
            )
            pending_warps = fut.result()
    jax.block_until_ready((state, outs_c))
    fps_gmc = FRAMES / (time.perf_counter() - t0)
    log(f"single-stream gmc=sparseOptFlow (overlapped): {fps_gmc:.1f} fps")

    # device GMC figure: gmc=flow_tpu (track/gmc_tpu.py) — the warp is
    # estimated IN the jitted chunk (pyramidal LK on a 320x180 gray),
    # zero host work, one program (program-alternation through the
    # axon tunnel costs ~100ms/switch — measured, see _StepSet)
    from strongsort_yolo_tpu.pipeline import Pipeline as _P
    from strongsort_yolo_tpu.track import gmc_tpu

    flow_pipe = _P(
        det_cfg,
        tracker=ByteTrackConfig(
            tracker_type="botsort", gmc_method="flow_tpu"
        ),
        track_slots=256,
    )
    flow_pipe.params = pipe.params  # reuse the calibrated detector
    fsteps = flow_pipe._get_step((h, w))
    pg = gmc_tpu.frame_to_gray(dev_frames[-1])
    hp = jnp.asarray(True)
    fstate = flow_pipe.track_state
    fstate, outs_f, _, pg = fsteps.track_chunk_flow(
        flow_pipe.params, fstate, dev_frames, pg, hp
    )
    jax.block_until_ready(outs_f)
    t0 = time.perf_counter()
    for _ in range(FRAMES // chunk):
        fstate, outs_f, _, pg = fsteps.track_chunk_flow(
            flow_pipe.params, fstate, dev_frames, pg, hp
        )
    jax.block_until_ready((fstate, outs_f))
    fps_gmc_tpu = FRAMES / (time.perf_counter() - t0)
    log(f"single-stream gmc=flow_tpu (in-step device LK): {fps_gmc_tpu:.1f} fps")

    # StrongSORT path: full OSNet ReID embed in the loop (appearance
    # costs on every det; random weights, same compute)

    ss_pipe = _P(det_cfg, tracker="strongsort.yaml", track_slots=256)
    ss_pipe.params = pipe.params  # reuse the calibrated detector
    ss_steps = ss_pipe._get_step((h, w))
    ss_state = ss_pipe.track_state
    ss_state, ss_outs, _ = ss_steps.track_chunk(
        ss_pipe.params, ss_state, dev_frames, warps
    )
    jax.block_until_ready(ss_outs)
    t0 = time.perf_counter()
    for _ in range(FRAMES // chunk):
        ss_state, ss_outs, _ = ss_steps.track_chunk(
            ss_pipe.params, ss_state, dev_frames, warps
        )
    jax.block_until_ready((ss_state, ss_outs))
    fps_ss = FRAMES / (time.perf_counter() - t0)
    log(f"single-stream strongsort (OSNet ReID in-loop): {fps_ss:.1f} fps")

    # aggregate per-chip throughput: S batched streams through the
    # app's real batch_step (GMC warps as inputs, identity here)
    def run_batched(S, n=50):
        bp = pipe.track_batch_prepare(S, (h, w))
        frames_s = jnp.asarray(
            np.stack([pool[i % len(pool)] for i in range(S)])
        )
        warps_s = jnp.tile(warp[None], (S, 1, 1))
        for _ in range(3):
            bp.states, dets_s, touts_s, _ = bp._steps.batch_step(
                pipe.params, bp.states, frames_s, warps_s
            )
        jax.block_until_ready(bp.states)
        log(
            f"S={S} batch warm; per-stream dets "
            f"{np.asarray(dets_s.count).tolist()}"
        )
        flops_batch = step_flops(
            bp._steps.batch_step, pipe.params, bp.states, frames_s, warps_s
        )
        t0 = time.perf_counter()
        for _ in range(n):
            bp.states, dets_s, touts_s, _ = bp._steps.batch_step(
                pipe.params, bp.states, frames_s, warps_s
            )
        jax.block_until_ready(bp.states)
        fps = S * n / (time.perf_counter() - t0)
        mfu = (fps / S) * flops_batch / V5E_BF16_PEAK
        log(f"aggregate {S}-stream: {fps:.1f} fps/chip, MFU {100*mfu:.1f}%")
        return fps, mfu

    fps8, mfu8 = run_batched(8)
    fps16, mfu16 = run_batched(16)
    fps32, mfu32 = run_batched(32)
    fps64, mfu64 = run_batched(64, n=25)
    scaling = [(8, fps8, mfu8), (16, fps16, mfu16), (32, fps32, mfu32),
               (64, fps64, mfu64)]
    S, fps_agg, mfu_agg = max(scaling, key=lambda t: t[1])

    # int8 PTQ rows DROPPED from the per-round run (round 5): the path
    # is opt-in and measured-negative in-step (BASELINE.md; last
    # measured BENCH_r04: single 1240 / S=64 2437 fps/chip vs 1304 /
    # 2907 bf16) — the two compiles cost ~3 min of bench budget that
    # round 5 spends on the StrongSORT auto/cadence rows instead.
    # tests/test_quant.py still guards the path; re-measure via
    # tools/prof/_prof_int8_ab.py when the quantizer changes.

    # reference-default-config batched figure: botsort GMC active on
    # every stream (device flow_tpu, estimated in-step)
    sb = 16
    frames_sb = jnp.asarray(np.stack([pool[i % len(pool)] for i in range(sb)]))
    bpf = flow_pipe.track_batch_prepare(sb, (h, w))
    states_f = bpf.states
    pgs = gmc_tpu.frame_to_gray(frames_sb)
    hps = jnp.ones((sb,), bool)
    for _ in range(3):
        states_f, _d, out_f, _e, pgs = fsteps.batch_step_flow(
            flow_pipe.params, states_f, frames_sb, pgs, hps
        )
    jax.block_until_ready(states_f)
    t0 = time.perf_counter()
    for _ in range(50):
        states_f, _d, out_f, _e, pgs = fsteps.batch_step_flow(
            flow_pipe.params, states_f, frames_sb, pgs, hps
        )
    jax.block_until_ready(states_f)
    fps_flow_b = sb * 50 / (time.perf_counter() - t0)
    log(f"aggregate {sb}-stream gmc=flow_tpu: {fps_flow_b:.1f} fps/chip")

    # S=32 flow_tpu figure (VERDICT r2 #7: GMC cost at the headline
    # batch size, with the shared-luma resize)
    sb2 = 32
    frames_sb2 = jnp.asarray(
        np.stack([pool[i % len(pool)] for i in range(sb2)])
    )
    bpf2 = flow_pipe.track_batch_prepare(sb2, (h, w))
    states_f2 = bpf2.states
    pgs2 = gmc_tpu.frame_to_gray(frames_sb2)
    hps2 = jnp.ones((sb2,), bool)
    for _ in range(3):
        states_f2, _d, out_f2, _e, pgs2 = fsteps.batch_step_flow(
            flow_pipe.params, states_f2, frames_sb2, pgs2, hps2
        )
    jax.block_until_ready(states_f2)
    t0 = time.perf_counter()
    for _ in range(35):
        states_f2, _d, out_f2, _e, pgs2 = fsteps.batch_step_flow(
            flow_pipe.params, states_f2, frames_sb2, pgs2, hps2
        )
    jax.block_until_ready(states_f2)
    fps_flow_b32 = sb2 * 35 / (time.perf_counter() - t0)
    log(f"aggregate {sb2}-stream gmc=flow_tpu: {fps_flow_b32:.1f} fps/chip")

    # batched StrongSORT (VERDICT r2 #8): S=16 streams with the OSNet
    # ReID embed in every stream's step
    bps = ss_pipe.track_batch_prepare(sb, (h, w))
    frames_ss = jnp.asarray(np.stack([pool[i % len(pool)] for i in range(sb)]))
    warps_ss = jnp.tile(warp[None], (sb, 1, 1))
    for _ in range(3):
        bps.states, _d, _o, _e = bps._steps.batch_step(
            ss_pipe.params, bps.states, frames_ss, warps_ss
        )
    jax.block_until_ready(bps.states)
    t0 = time.perf_counter()
    for _ in range(35):
        bps.states, _d, _o, _e = bps._steps.batch_step(
            ss_pipe.params, bps.states, frames_ss, warps_ss
        )
    jax.block_until_ready(bps.states)
    fps_ss_b = sb * 35 / (time.perf_counter() - t0)
    log(f"aggregate {sb}-stream strongsort: {fps_ss_b:.1f} fps/chip")

    # serving-config StrongSORT: --reid-topk 64 (identical behavior for
    # scenes under 64 dets; the 128-slot embed tax is the batch-scaling
    # bottleneck — NOTES.md round-3 profile)
    ss64_pipe = _P(det_cfg, tracker="strongsort.yaml", track_slots=256,
                   reid_topk=64)
    ss64_pipe.params = pipe.params
    bps64 = ss64_pipe.track_batch_prepare(sb, (h, w))
    for _ in range(3):
        bps64.states, _d, _o, _e = bps64._steps.batch_step(
            ss64_pipe.params, bps64.states, frames_ss, warps_ss
        )
    jax.block_until_ready(bps64.states)
    t0 = time.perf_counter()
    for _ in range(35):
        bps64.states, _d, _o, _e = bps64._steps.batch_step(
            ss64_pipe.params, bps64.states, frames_ss, warps_ss
        )
    jax.block_until_ready(bps64.states)
    fps_ss_b64 = sb * 35 / (time.perf_counter() - t0)
    log(f"aggregate {sb}-stream strongsort reid_topk=64: {fps_ss_b64:.1f} fps/chip")

    # StrongSORT scaling points past S=16 (VERDICT r3 ask #1: the
    # north-star metric includes ReID — record where ITS curve knees)
    def run_ss_batched(S, n=25, auto=False, pipe_=None, tag2=""):
        bp_s = (pipe_ or ss_pipe).track_batch_prepare(
            S, (h, w), auto_topk=auto
        )
        fr = jnp.asarray(np.stack([pool[i % len(pool)] for i in range(S)]))
        wp = jnp.tile(warp[None], (S, 1, 1))
        # auto_topk goes through step_async (the bucket dispatch lives
        # there) and warms past the 30-tick hysteresis so the timed
        # loop measures the converged embed bucket (behavior stays
        # exact — overflow ticks replay at full width); the fixed-width
        # rows keep timing raw batch_step for continuity with r03
        if auto:
            for _ in range(35):
                bp_s.step_async(fr, wp)
            jax.block_until_ready(bp_s.states)
            t0 = time.perf_counter()
            for _ in range(n):
                bp_s.step_async(fr, wp)
            jax.block_until_ready(bp_s.states)
        else:
            for _ in range(3):
                bp_s.states, _d, _o, _e = bp_s._steps.batch_step(
                    (pipe_ or ss_pipe).params, bp_s.states, fr, wp
                )
            jax.block_until_ready(bp_s.states)
            t0 = time.perf_counter()
            for _ in range(n):
                bp_s.states, _d, _o, _e = bp_s._steps.batch_step(
                    (pipe_ or ss_pipe).params, bp_s.states, fr, wp
                )
            jax.block_until_ready(bp_s.states)
        fps = S * n / (time.perf_counter() - t0)
        tag = (" auto_topk" if auto else "") + tag2
        nrep = bp_s.n_replays if auto else None
        rep = f" (n_replays={nrep})" if auto else ""
        log(f"aggregate {S}-stream strongsort{tag}: {fps:.1f} fps/chip{rep}")
        return (fps, nrep) if auto else fps

    fps_ss_b32 = run_ss_batched(32)
    fps_ss_b64s = run_ss_batched(64, n=18)
    # adaptive embed width (auto_topk): bit-identical behavior to
    # topk=128 (exact replay on overflow), cost tracks the live det
    # count — the production serving default
    fps_ss_auto16, rep16 = run_ss_batched(16, auto=True)
    fps_ss_auto32, rep32 = run_ss_batched(32, auto=True)
    fps_ss_auto64, rep64 = run_ss_batched(64, n=18, auto=True)

    # embed cadence 2 (round 5): each stream's appearance refreshes
    # every 2nd tick (staggered), skip frames associate motion-only —
    # NOT exact; relay-clip quality deltas in BASELINE.md round-5
    ssc2_pipe = _P(det_cfg, tracker="strongsort.yaml", track_slots=256,
                   reid_cadence=2)
    ssc2_pipe.params = pipe.params
    fps_ss_c2_32, repc32 = run_ss_batched(
        32, auto=True, pipe_=ssc2_pipe, tag2=" cadence2")
    fps_ss_c2_64, repc64 = run_ss_batched(
        64, n=18, auto=True, pipe_=ssc2_pipe, tag2=" cadence2")

    # ---- BASELINE.json config matrix (VERDICT r2 #4): the reference's
    # default model is yolo11n-pose (yolo_multi_model.py:17), and the
    # BASELINE configs name seg and the v5s/v7 StrongSORT backends.
    # Single-stream chunked + S=16 batched for each.
    def bench_config(weights, task_label):
        cfg_i = DetectorConfig(weights=weights, half=True, max_det=1000)
        p_i = Pipeline(cfg_i, tracker=tracker, track_slots=256)
        if p_i._is_v5 or p_i._is_v7:
            ndet = calibrate_anchor_based(
                p_i, pool[0], cfg_i.conf, TARGET_DETS
            )
        else:
            calibrate_candidates(p_i, pool[0], cfg_i.conf, TARGET_DETS)
            ndet = None
        st_i = p_i._get_step((h, w))
        state_i = p_i.track_state
        state_i, outs_i, _ = st_i.track_chunk(
            p_i.params, state_i, dev_frames, warps
        )
        jax.block_until_ready(outs_i)
        n_frames = 100
        t0 = time.perf_counter()
        for _ in range(n_frames // chunk):
            state_i, outs_i, _ = st_i.track_chunk(
                p_i.params, state_i, dev_frames, warps
            )
        jax.block_until_ready((state_i, outs_i))
        fps_1 = n_frames / (time.perf_counter() - t0)

        bp_i = p_i.track_batch_prepare(sb, (h, w))
        for _ in range(3):
            bp_i.states, dets_i, _o, _e = bp_i._steps.batch_step(
                p_i.params, bp_i.states, frames_ss, warps_ss
            )
        jax.block_until_ready(bp_i.states)
        if ndet is None:
            ndet = int(np.asarray(dets_i.count)[0])
        t0 = time.perf_counter()
        for _ in range(20):
            bp_i.states, dets_i, _o, _e = bp_i._steps.batch_step(
                p_i.params, bp_i.states, frames_ss, warps_ss
            )
        jax.block_until_ready(bp_i.states)
        fps_b = sb * 20 / (time.perf_counter() - t0)
        log(
            f"config {weights}{task_label}: single {fps_1:.1f} fps, "
            f"S={sb} {fps_b:.1f} fps/chip ({ndet} dets/frame)"
        )
        return round(fps_1, 2), round(fps_b, 2)

    matrix = {}
    for wname, key in [
        ("yolo11n-pose", "yolo11n_pose"),   # reference default model
        ("yolov8n-seg", "yolov8n_seg"),
        ("yolov5s", "yolov5s"),
        ("yolov7", "yolov7"),
    ]:
        f1, fb = bench_config(wname, "")
        matrix[f"cfg_{key}_fps"] = f1
        matrix[f"cfg_{key}_s16_fps"] = fb

    platform = jax.devices()[0].platform
    result = {
        # "device_e2e" + "_staged_frames": the measured path is the full
        # per-frame DEVICE program (letterbox->detect->NMS->rescale->
        # associate) on frames pre-staged in HBM — host decode/draw/
        # encode are NOT in this number (measured separately in
        # BASELINE.md's media table; the tunnel's ~1s/frame host<->device
        # transfer makes per-frame upload timing meaningless here).
        "metric": f"device_e2e_1080p_track_fps_per_chip_{S}stream_yolov8n_maxdet1000_staged_frames_{platform}",
        "value": round(fps_agg, 2),
        "unit": "fps",
        "vs_baseline": round(fps_agg / 300.0, 4),
        "extra": {
            "scope": "device step on pre-staged frames; host decode/"
            "draw/encode excluded (see BASELINE.md media table)",
            "single_stream_fps": round(fps_single, 2),
            "single_stream_mfu": round(mfu_single, 4),
            "single_stream_gmc_sparseoptflow_fps": round(fps_gmc, 2),
            "single_stream_gmc_flowtpu_fps": round(fps_gmc_tpu, 2),
            "aggregate_fps_s16_gmc_flowtpu": round(fps_flow_b, 2),
            "aggregate_fps_s32_gmc_flowtpu": round(fps_flow_b32, 2),
            "single_stream_strongsort_fps": round(fps_ss, 2),
            "aggregate_fps_s16_strongsort": round(fps_ss_b, 2),
            "aggregate_fps_s32_strongsort": round(fps_ss_b32, 2),
            "aggregate_fps_s64_strongsort": round(fps_ss_b64s, 2),
            "aggregate_fps_s16_strongsort_reid64": round(fps_ss_b64, 2),
            "aggregate_fps_s16_strongsort_auto": round(fps_ss_auto16, 2),
            "aggregate_fps_s32_strongsort_auto": round(fps_ss_auto32, 2),
            "aggregate_fps_s64_strongsort_auto": round(fps_ss_auto64, 2),
            # exact-replay cost diagnostic on the bench load (steady
            # ~45-det scenes: replays should be the warmup overflow
            # jumps only)
            "strongsort_auto_n_replays_s16_s32_s64": [rep16, rep32, rep64],
            # cadence 2: appearance every 2nd tick per stream, skip
            # frames motion-only — NOT exact (quality table in
            # BASELINE.md round-5)
            "aggregate_fps_s32_strongsort_cadence2": round(fps_ss_c2_32, 2),
            "aggregate_fps_s64_strongsort_cadence2": round(fps_ss_c2_64, 2),
            "strongsort_cadence2_n_replays_s32_s64": [repc32, repc64],
            "aggregate_fps_s8": round(fps8, 2),
            "aggregate_fps_s16": round(fps16, 2),
            "aggregate_fps_s32": round(fps32, 2),
            "aggregate_fps_s48": round(fps48, 2),
            "aggregate_fps_s64": round(fps64, 2),
            "aggregate_mfu": round(mfu_agg, 4),
            "single_stream_int8_fps": round(fps_int8, 2),
            "aggregate_fps_s64_int8": round(fps_int8_b64, 2),
            "aggregate_mfu_int8_vs_bf16_peak": round(
                fps_int8_b64 * flops_frame / V5E_BF16_PEAK, 4
            ),
            **matrix,
            "gflop_per_frame": round(flops_frame / 1e9, 2),
            "max_det": det_cfg.max_det,
            "streams": S,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
