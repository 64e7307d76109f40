"""MOT evaluation CLI — the benchmark harness BASELINE.md calls for.

Two protocols:
- ``--public``: feed the sequence's det/det.txt through the tracker
  (detector-independent comparison, the standard MOTChallenge custom);
- default: run the full detect+track pipeline on the frames.

Usage:
    python -m strongsort_yolo_tpu.tools.eval_mot SEQ_DIR [SEQ_DIR...]
        [--tracker botsort.yaml] [--weights yolov8n] [--public]
        [--strongsort-pp] [--aflink] [--out results_dir]
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sequences", nargs="+", help="MOT sequence dirs")
    ap.add_argument("--tracker", default="botsort.yaml")
    ap.add_argument("--weights", default="yolov8n")
    ap.add_argument("--public", action="store_true",
                    help="use det/det.txt instead of the detector")
    ap.add_argument("--conf", type=float, default=0.1)
    ap.add_argument("--strongsort-pp", action="store_true",
                    help="offline GSI + tracklet linking pass")
    ap.add_argument("--aflink", action="store_true",
                    help="learned AFLink tracklet linker (shipped "
                    "assets/aflink_synth.npz) instead of the motion "
                    "heuristic; implies nothing without --strongsort-pp")
    ap.add_argument("--out", default=None, help="write MOT results txts")
    args = ap.parse_args(argv)

    from strongsort_yolo_tpu.config import load_tracker_config
    from strongsort_yolo_tpu.data.mot import (
        MotSequence, evaluate_sequence, save_mot_results,
        track_sequence_public,
    )
    from strongsort_yolo_tpu.track.state import init_track_state

    totals = []
    for seq_dir in args.sequences:
        seq = MotSequence(seq_dir)
        if args.public:
            tcfg = load_tracker_config(args.tracker)
            from strongsort_yolo_tpu.track.strongsort import (
                StrongSortConfig, strongsort_step,
            )

            if isinstance(tcfg, StrongSortConfig):
                # public-det protocol has no frames, so no appearance:
                # motion-only StrongSORT (NSA KF + chi2-gated global
                # assignment, no cascade) — λ=0 and the cosine gate
                # open, mirroring test_reid_quality's "without" arm
                import dataclasses

                import jax.numpy as jnp

                tcfg = dataclasses.replace(
                    tcfg, lambda_appearance=0.0, max_cosine_distance=1.0
                )
                fd = 512

                def step_fn(st, b, s, c, v, _cfg=tcfg):
                    feats = jnp.zeros((b.shape[0], fd), jnp.float32)
                    st, out = strongsort_step(st, b, s, c, v, feats, _cfg)
                    return st, out

                step = jax.jit(step_fn)
                state0 = init_track_state(128, feat_dim=fd)
            else:
                from strongsort_yolo_tpu.track.bytetrack import bytetrack_step

                step = jax.jit(
                    lambda st, b, s, c, v: bytetrack_step(st, b, s, c, v, tcfg)
                )
                state0 = init_track_state(128)
            hyp = track_sequence_public(
                seq, step, state0, conf_thresh=args.conf
            )
        else:
            from strongsort_yolo_tpu.config import DetectorConfig
            from strongsort_yolo_tpu.pipeline import Pipeline

            pipe = Pipeline(
                DetectorConfig(weights=args.weights, conf=args.conf),
                tracker=args.tracker,
            )
            hyp = []
            for frame in seq.frames():
                r = pipe.track(frame)
                hyp.append(
                    [
                        (int(r.boxes.id[i]), *r.boxes.xyxy[i])
                        for i in range(len(r.boxes))
                    ]
                )
        if args.strongsort_pp:
            from strongsort_yolo_tpu.track.postprocess import strongsort_pp

            recs = [
                (f, tid, x1, y1, x2, y2)
                for f, rows in enumerate(hyp)
                for tid, x1, y1, x2, y2 in rows
            ]
            out = strongsort_pp(recs, aflink=args.aflink)
            hyp = [[] for _ in range(len(hyp))]
            for f, tid, x1, y1, x2, y2 in out:
                if 0 <= f < len(hyp):
                    hyp[f].append((tid, x1, y1, x2, y2))
        if args.out:
            save_mot_results(f"{args.out}/{seq.name}.txt", hyp)
        m = evaluate_sequence(seq, hyp)
        m["seq"] = seq.name
        totals.append(m)
        print(json.dumps(m))
    if len(totals) > 1:
        gt = sum(m["gt"] for m in totals)
        mota = 1.0 - sum(m["fp"] + m["fn"] + m["idsw"] for m in totals) / max(gt, 1)
        print(json.dumps({"seq": "OVERALL", "mota": mota,
                          "idf1_mean": float(np.mean([m["idf1"] for m in totals]))}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
