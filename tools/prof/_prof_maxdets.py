"""Scratch: tracker_max_dets cost curve (VERDICT r2 #5).

Measures the e2e track path (single-stream chunked + S=16 batched) at
tracker_max_dets in {64, 128, 256, 512} with a dense calibrated load,
so the default (128) is a *documented* throughput/crowding tradeoff
rather than a guess. Reference behavior: every det >= track_low_thresh
reaches the tracker (max_det=1000, yolo_multi_model.py:21).

Usage: python tools/prof/_prof_maxdets.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import TARGET_DETS, calibrate_candidates, make_frames  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline

    h, w = 1080, 1920
    det_cfg = DetectorConfig(weights="yolov8n", half=True, max_det=1000)
    pool = make_frames(h, w)
    chunk = 10
    dev_frames = jnp.asarray(np.stack(pool + pool[:2]))
    warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))
    warps = jnp.tile(warp[None], (chunk, 1, 1))
    sb = 16
    frames_sb = jnp.asarray(np.stack([pool[i % len(pool)] for i in range(sb)]))
    warps_sb = jnp.tile(warp[None], (sb, 1, 1))

    print("backend:", jax.default_backend(), flush=True)
    base_params = None
    for tmd in (64, 128, 256, 512):
        pipe = Pipeline(
            det_cfg,
            tracker="botsort.yaml",
            track_slots=max(256, tmd),
            tracker_max_dets=tmd,
        )
        if base_params is None:
            calibrate_candidates(pipe, pool[0], det_cfg.conf, TARGET_DETS)
            base_params = pipe.params
        else:
            pipe.params = base_params
        steps = pipe._get_step((h, w))
        state = pipe.track_state
        state, outs, _ = steps.track_chunk(pipe.params, state, dev_frames, warps)
        jax.block_until_ready(outs)
        n = 100
        t0 = time.perf_counter()
        for _ in range(n // chunk):
            state, outs, _ = steps.track_chunk(
                pipe.params, state, dev_frames, warps
            )
        jax.block_until_ready((state, outs))
        fps1 = n / (time.perf_counter() - t0)

        bp = pipe.track_batch_prepare(sb, (h, w))
        for _ in range(3):
            bp.states, dets, touts, _ = bp._steps.batch_step(
                pipe.params, bp.states, frames_sb, warps_sb
            )
        jax.block_until_ready(bp.states)
        t0 = time.perf_counter()
        for _ in range(20):
            bp.states, dets, touts, _ = bp._steps.batch_step(
                pipe.params, bp.states, frames_sb, warps_sb
            )
        jax.block_until_ready(bp.states)
        fpsb = sb * 20 / (time.perf_counter() - t0)
        print(
            f"tracker_max_dets={tmd:>3}: single {fps1:7.1f} fps   "
            f"S={sb} {fpsb:7.1f} fps/chip   "
            f"(dets {int(np.asarray(dets.count)[0])})",
            flush=True,
        )


if __name__ == "__main__":
    main()
