"""Component-level TPU profiling harness for the track pipeline.

Times the pieces of the per-frame device program (SURVEY.md §5.1) at
the bench configuration: 1080p, yolov8n bf16, reference-parity NMS
(max_det=1000), 256 track slots, calibrated ~120-candidate load.
Serialized (state-chained) scans measure what the app actually pays;
independent repeated calls overstate throughput by pipelining host
dispatch, so everything here chains state.

Usage:
    python -m strongsort_yolo_tpu.tools.profile_tpu [--streams 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--hw", type=int, nargs=2, default=(1080, 1920))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import bench as B
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    h, w = args.hw
    tcfg = ByteTrackConfig(tracker_type="botsort", gmc_method="none")
    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=args.imgsz, half=True,
                       max_det=1000),
        tracker=tcfg, track_slots=256,
    )
    pool = B.make_frames(h, w)
    B.calibrate_candidates(pipe, pool[0], 0.3, 120)
    steps = pipe._get_step((h, w))
    T = args.chunk
    frames = jnp.asarray(np.stack([pool[i % 8] for i in range(T)]))
    warps = jnp.tile(
        jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (T, 1, 1)
    )

    def chained(name, fn, st, n=15):
        st2 = fn(st)
        jax.block_until_ready(st2)
        t0 = time.perf_counter()
        for _ in range(n):
            st2 = fn(st2)
        jax.block_until_ready(st2)
        ms = (time.perf_counter() - t0) / n / T * 1e3
        print(f"{name:44s} {ms:7.3f} ms/frame ({1e3/ms:7.1f} fps)", flush=True)

    chained(
        f"track_chunk T={T} (detect+track, chained)",
        lambda st: steps.track_chunk(pipe.params, st, frames, warps)[0],
        pipe.track_state,
    )

    # batched multi-stream
    S = args.streams
    bp = pipe.track_batch_prepare(S, (h, w))
    frames_s = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
    warps_s = jnp.tile(warps[:1], (S, 1, 1))

    def batch_once(states):
        states, _, out, _ = bp._steps.batch_step(
            pipe.params, states, frames_s, warps_s
        )
        return states

    st = batch_once(bp.states)
    jax.block_until_ready(st)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        st = batch_once(st)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / n
    print(
        f"{'batch_step S=%d' % S:44s} {dt*1e3:7.3f} ms/tick "
        f"({S*n/(dt*n):7.1f} agg fps)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
