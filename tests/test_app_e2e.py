"""End-to-end tests: tracker metrics on synthetic streams + the full
app loop (decode→infer→track→count→overlay→write) with output-format
golden checks (SURVEY.md §4 test plan)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strongsort_yolo_tpu.media.video import SyntheticSource
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.state import init_track_state
from strongsort_yolo_tpu.utils.metrics import evaluate_mot, load_mot_labels

N_DET = 16


def oracle_detections(truth, rng, jitter=2.0, drop_prob=0.0):
    boxes = np.zeros((N_DET, 4), np.float32)
    scores = np.zeros((N_DET,), np.float32)
    cls = np.zeros((N_DET,), np.int32)
    valid = np.zeros((N_DET,), bool)
    j = 0
    for tid, x1, y1, x2, y2 in truth:
        if rng.uniform() < drop_prob:
            continue
        boxes[j] = (
            x1 + rng.normal(0, jitter),
            y1 + rng.normal(0, jitter),
            x2 + rng.normal(0, jitter),
            y2 + rng.normal(0, jitter),
        )
        scores[j] = rng.uniform(0.6, 0.95)
        cls[j] = 0
        valid[j] = True
        j += 1
    return boxes, scores, cls, valid


def run_tracker_on_synthetic(num_frames=40, drop_prob=0.0, seed=0):
    src = SyntheticSource(num_frames=num_frames, num_objects=4, seed=seed)
    rng = np.random.default_rng(seed + 1)
    cfg = ByteTrackConfig()
    step = jax.jit(bytetrack_step, static_argnums=(5,))
    state = init_track_state(32)
    gt_frames, hyp_frames = [], []
    for t in range(num_frames):
        truth = src.truth(t)
        gt_frames.append([tuple(g) for g in truth])
        b, s, c, v = oracle_detections(truth, rng, drop_prob=drop_prob)
        state, out = step(
            state, jnp.asarray(b), jnp.asarray(s), jnp.asarray(c),
            jnp.asarray(v), cfg,
        )
        out = jax.tree.map(np.asarray, out)
        hyps = [
            (int(out.track_id[i]), *out.boxes[i])
            for i in range(len(out.active))
            if out.active[i]
        ]
        hyp_frames.append(hyps)
    return evaluate_mot(gt_frames, hyp_frames)


def test_tracker_mota_idf1_clean_detections():
    m = run_tracker_on_synthetic()
    assert m["mota"] > 0.95, m
    assert m["idf1"] > 0.95, m
    assert m["idsw"] == 0, m


def test_tracker_robust_to_dropped_detections():
    m = run_tracker_on_synthetic(drop_prob=0.15, num_frames=40)
    # drops cost recall but ids must stay glued
    assert m["idf1"] > 0.85, m
    assert m["idsw"] <= 1, m


def test_metrics_self_check():
    gt = [[(1, 0, 0, 10, 10), (2, 50, 50, 60, 60)]] * 5
    assert evaluate_mot(gt, gt) == pytest.approx(
        {"mota": 1.0, "idf1": 1.0, "fp": 0, "fn": 0, "idsw": 0, "gt": 10,
         "precision": 1.0, "recall": 1.0}
    )
    # id switch halfway
    hyp = [[(7, 0, 0, 10, 10)]] * 3 + [[(8, 0, 0, 10, 10)]] * 2
    gt1 = [[(1, 0, 0, 10, 10)]] * 5
    m = evaluate_mot(gt1, hyp)
    assert m["idsw"] == 1
    assert m["idf1"] == pytest.approx(0.6)


class TestAppLoop:
    @pytest.fixture(scope="class")
    def app_run(self, tmp_path_factory):
        from strongsort_yolo_tpu.app import AppConfig, run

        out = str(tmp_path_factory.mktemp("out"))
        cfg = AppConfig(
            track=True,
            count=True,
            weights="yolov8n",
            imgsz=160,
            max_det=16,
            out_fps=15.0,
            output_dir=out,
            half=False,
            max_frames=6,
        )
        src = SyntheticSource(num_frames=6, size=(240, 320), num_objects=2)
        stats = run(cfg, sources=[src])
        return cfg, stats, out

    def test_runs_and_counts_frames(self, app_run):
        _, stats, _ = app_run
        assert stats[0].frames == 6

    def test_writes_video(self, app_run):
        _, stats, _ = app_run
        assert os.path.exists(stats[0].output_video)
        assert os.path.getsize(stats[0].output_video) > 0

    def test_label_format(self, app_run):
        _, stats, _ = app_run
        with open(stats[0].labels_file) as f:
            for line in f:
                parts = line.split()
                assert len(parts) == 12
                assert parts[8:] == ["-1", "-1", "-1", "-1"]
                int(parts[0]); int(parts[1]); int(parts[2]); float(parts[3])

    def test_labels_loadable_as_mot(self, app_run):
        _, stats, _ = app_run
        load_mot_labels(stats[0].labels_file)  # no crash; may be empty


def test_count_without_track_prints_hint(capsys):
    from strongsort_yolo_tpu.app import AppConfig, process_video
    from strongsort_yolo_tpu.pipeline import Pipeline
    from strongsort_yolo_tpu.config import DetectorConfig

    cfg = AppConfig(track=False, count=True, imgsz=160, half=False, save=False)
    pipe = Pipeline(DetectorConfig(weights="yolov8n", imgsz=160, half=False, max_det=16))
    src = SyntheticSource(num_frames=2, size=(240, 320))
    stats = process_video(cfg, src, "s", pipe)
    assert stats.frames == 0
    assert "count works only when objects are tracking" in capsys.readouterr().out


class TestResumeAndEvents:
    """SURVEY.md §5.4/§5.5 app integration: kill a stream mid-video,
    resume from the checkpoint, track ids must continue; event log
    records the lifecycle."""

    BASE = dict(
        track=True, weights="yolov8n", imgsz=160, max_det=16, half=False,
        tracker="bytetrack.yaml",  # no GMC: resumed warps are bit-equal
    )

    def _labels(self, stats):
        with open(stats.labels_file) as f:
            return f.read()

    def test_sequential_resume_keeps_ids(self, tmp_path):
        from strongsort_yolo_tpu.app import AppConfig, run

        def src():
            return SyntheticSource(num_frames=6, size=(240, 320), num_objects=2)

        # uninterrupted oracle
        cfg_full = AppConfig(
            output_dir=str(tmp_path / "full"), multi_mode="sequential",
            **self.BASE,
        )
        full = run(cfg_full, sources=[src()])[0]

        # "crash" after frame 3 (checkpoint every frame), then resume
        out = str(tmp_path / "resumed")
        cfg_a = AppConfig(
            output_dir=out, multi_mode="sequential", max_frames=3,
            checkpoint_every=1, **self.BASE,
        )
        a = run(cfg_a, sources=[src()])[0]
        assert a.frames == 3
        cfg_b = AppConfig(
            output_dir=out, multi_mode="sequential", resume=True,
            log_events=str(tmp_path / "events.jsonl"), **self.BASE,
        )
        b = run(cfg_b, sources=[src()])[0]
        assert b.frames == 6  # absolute position, frames 4-6 processed
        assert self._labels(b) == self._labels(full)

        import json

        events = [
            json.loads(line)
            for line in open(str(tmp_path / "events.jsonl"))
        ]
        kinds = [e["event"] for e in events]
        assert "resume" in kinds and "stream_start" in kinds
        assert kinds[-1] == "stream_end"
        resume_ev = next(e for e in events if e["event"] == "resume")
        assert resume_ev["frame_id"] == 3

    def test_batched_resume_keeps_ids(self, tmp_path):
        from strongsort_yolo_tpu.app import AppConfig, run

        def srcs():
            return [
                SyntheticSource(num_frames=6, size=(240, 320), num_objects=2, seed=s)
                for s in range(2)
            ]

        cfg_full = AppConfig(output_dir=str(tmp_path / "full"), **self.BASE)
        full = run(cfg_full, sources=srcs())

        out = str(tmp_path / "resumed")
        cfg_a = AppConfig(
            output_dir=out, max_frames=3, checkpoint_every=1, **self.BASE
        )
        run(cfg_a, sources=srcs())
        cfg_b = AppConfig(output_dir=out, resume=True, **self.BASE)
        resumed = run(cfg_b, sources=srcs())
        for f, r in zip(full, resumed):
            assert r.frames == 6
            assert self._labels(r) == self._labels(f)
