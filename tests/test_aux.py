"""Aux subsystems: checkpoint/resume, profiling, counting, labels,
trajectories, stream supervision (SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.state import init_track_state


def test_track_state_checkpoint_resume(tmp_path):
    """Tracker state round-trips through orbax and the stream resumes
    with identical ids (SURVEY.md §5.4)."""
    from strongsort_yolo_tpu.utils.checkpoint import restore_state, save_state

    cfg = ByteTrackConfig()
    step = jax.jit(bytetrack_step, static_argnums=(5,))

    def det(t):
        boxes = np.zeros((4, 4), np.float32)
        boxes[0] = [100 + 5 * t, 100, 140 + 5 * t, 180]
        scores = np.zeros((4,), np.float32)
        scores[0] = 0.9
        return (jnp.asarray(boxes), jnp.asarray(scores),
                jnp.zeros((4,), jnp.int32), jnp.asarray(scores > 0))

    state = init_track_state(8)
    for t in range(4):
        state, out = step(state, *det(t), cfg)
    save_state(str(tmp_path / "ckpt"), state)
    restored = restore_state(str(tmp_path / "ckpt"), init_track_state(8))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state2, out2 = step(restored, *det(4), cfg)
    out2 = jax.tree.map(np.asarray, out2)
    ids = [int(out2.track_id[i]) for i in range(8) if out2.active[i]]
    assert ids == [1]


def test_stage_timers():
    from strongsort_yolo_tpu.utils.profiling import StageTimers

    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert "a" in t.report()


def test_event_logger(tmp_path):
    import json

    from strongsort_yolo_tpu.utils.logging import EventLogger

    path = str(tmp_path / "events.jsonl")
    log = EventLogger(path)
    log.log("frame_done", stream="a", frame=3, dets=7)
    log.close()
    rec = json.loads(open(path).read().strip())
    assert rec["event"] == "frame_done" and rec["dets"] == 7


def test_streaming_counter_majority():
    from strongsort_yolo_tpu.pipeline import Boxes
    from strongsort_yolo_tpu.utils.counting import StreamingCounter

    names = {0: "person", 2: "car"}
    c = StreamingCounter(names)
    # track 1: mostly person; track 2: car
    for cls_seq in ([0, 0, 2, 0], [2, 2]):
        pass
    c.update(Boxes([[0, 0, 1, 1]], [0.9], [0], id=[1]))
    c.update(Boxes([[0, 0, 1, 1]], [0.9], [0], id=[1]))
    c.update(Boxes([[0, 0, 1, 1]], [0.9], [2], id=[1]))
    c.update(Boxes([[0, 0, 1, 1]], [0.9], [2], id=[2]))
    assert c.counts() == {"car": 1, "person": 1}


def test_label_writer_compat_mode(tmp_path):
    from strongsort_yolo_tpu.pipeline import Boxes
    from strongsort_yolo_tpu.utils.labels import LabelWriter

    path = str(tmp_path / "x_labels.txt")
    boxes = Boxes([[10, 20, 30, 40]], [0.5], [2], id=[7])
    with LabelWriter(path, compat=True) as w:
        w.write_frame(5, boxes)
    line = open(path).read().split()
    assert line[0] == "0"  # reference quirk: frame id always 0 (F9)
    # append across runs (reference :39)
    with LabelWriter(path, compat=True) as w:
        w.write_frame(6, boxes)
    assert len(open(path).readlines()) == 2
    # non-compat: real frame ids, truncated per run
    with LabelWriter(path, compat=False) as w:
        w.write_frame(6, boxes)
    lines = open(path).readlines()
    assert len(lines) == 1 and lines[0].split()[0] == "6"


def test_trajectory_memory_prunes():
    from strongsort_yolo_tpu.pipeline import Boxes
    from strongsort_yolo_tpu.utils.trajectories import TrajectoryMemory

    t = TrajectoryMemory(maxlen=5)
    for i in range(8):
        t.update(Boxes([[i, 0, i + 10, 10]], [0.9], [0], id=[1]))
    assert len(t.trails[1]) == 5  # deque cap (reference :102)
    t.update(Boxes([[0, 0, 10, 10]], [0.9], [0], id=[2]))
    assert 1 not in t.trails  # pruned when id leaves (reference :45-47)


def test_stream_failure_isolation():
    from strongsort_yolo_tpu.app import AppConfig, run

    cfg = AppConfig(
        weights="yolov8n", imgsz=160, half=False, max_det=16,
        save=False, max_frames=2,
    )
    from strongsort_yolo_tpu.media.video import SyntheticSource

    good = SyntheticSource(num_frames=2, size=(240, 320))
    stats = run(cfg, sources=["/nonexistent/file.mp4", good])
    assert stats[0].frames == 0
    assert stats[1].frames == 2  # second stream unaffected
