"""ByteTrack/BoT-SORT step behavior on synthetic detection streams.

Scenario tests assert the ByteTrack state machine semantics the
reference relies on (SURVEY.md D9): activation on frame 1, 2-hit
confirmation later, low-confidence rescue, lost-buffer recovery with
stable IDs, pruning, and slot reuse.
"""

import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.state import init_track_state

N_DET = 8  # fixed det slots per frame
CFG = ByteTrackConfig()


def frame(dets):
    """dets: list of (x1,y1,x2,y2,score,cls) -> fixed-shape arrays."""
    boxes = np.zeros((N_DET, 4), np.float32)
    scores = np.zeros((N_DET,), np.float32)
    cls = np.zeros((N_DET,), np.int32)
    valid = np.zeros((N_DET,), bool)
    for i, d in enumerate(dets):
        boxes[i] = d[:4]
        scores[i] = d[4]
        cls[i] = d[5]
        valid[i] = True
    return (
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(cls),
        jnp.asarray(valid),
    )


step = jax.jit(bytetrack_step, static_argnums=(5,))


def run(frames, cfg=CFG, slots=32):
    state = init_track_state(slots)
    outs = []
    for dets in frames:
        state, out = step(state, *frame(dets), cfg)
        outs.append(jax.tree.map(np.asarray, out))
    return state, outs


def active_ids(out):
    return {
        int(out.track_id[i])
        for i in range(len(out.active))
        if out.active[i]
    }


def box_of(out, tid):
    for i in range(len(out.active)):
        if out.active[i] and int(out.track_id[i]) == tid:
            return out.boxes[i]
    raise KeyError(tid)


def moving_box(t, x0=100.0, y0=100.0, vx=5.0, vy=3.0, w=40.0, h=60.0):
    x = x0 + vx * t
    y = y0 + vy * t
    return (x, y, x + w, y + h)


def test_first_frame_activates_immediately():
    _, outs = run([[(*moving_box(0), 0.9, 1)]])
    assert active_ids(outs[0]) == {1}


def test_two_objects_stable_ids():
    frames = []
    for t in range(10):
        frames.append(
            [
                (*moving_box(t), 0.9, 0),
                (*moving_box(t, x0=400, y0=300, vx=-4, vy=2), 0.85, 2),
            ]
        )
    _, outs = run(frames)
    for out in outs:
        assert active_ids(out) == {1, 2}
    # class is carried through
    last = outs[-1]
    cls_by_id = {
        int(last.track_id[i]): int(last.cls[i])
        for i in range(len(last.active))
        if last.active[i]
    }
    assert cls_by_id == {1: 0, 2: 2}


def test_midstream_birth_needs_two_hits():
    frames = [[(*moving_box(t), 0.9, 0)] for t in range(3)]
    # new object appears at frame 3
    for t in range(3, 6):
        frames.append(
            [
                (*moving_box(t), 0.9, 0),
                (*moving_box(t - 3, x0=500, y0=50), 0.8, 1),
            ]
        )
    _, outs = run(frames)
    assert active_ids(outs[2]) == {1}
    # frame 3: new track is unconfirmed -> not yet emitted
    assert active_ids(outs[3]) == {1}
    # frame 4: second hit confirms it
    assert active_ids(outs[4]) == {1, 2}
    assert active_ids(outs[5]) == {1, 2}


def test_low_conf_rescue_keeps_track():
    frames = [[(*moving_box(t), 0.9, 0)] for t in range(4)]
    # dips below high thresh but above low thresh -> stage-2 rescue
    frames.append([(*moving_box(4), 0.15, 0)])
    frames.append([(*moving_box(5), 0.9, 0)])
    _, outs = run(frames)
    assert active_ids(outs[4]) == {1}
    assert active_ids(outs[5]) == {1}


def test_occlusion_recovers_same_id():
    frames = [[(*moving_box(t), 0.9, 0)] for t in range(4)]
    for t in range(4, 9):  # 5 frames fully occluded
        frames.append([])
    frames.append([(*moving_box(9), 0.9, 0)])  # reappears on its path
    _, outs = run(frames)
    assert active_ids(outs[8]) == set()  # lost -> not emitted
    assert active_ids(outs[9]) == {1}  # recovered with the same id


def test_lost_track_pruned_after_buffer():
    cfg = ByteTrackConfig(track_buffer=3)
    frames = [[(*moving_box(t), 0.9, 0)] for t in range(3)]
    frames += [[] for _ in range(5)]
    # reappears long after the buffer: must get a NEW id
    frames.append([(*moving_box(8), 0.9, 0)])
    frames.append([(*moving_box(9), 0.9, 0)])
    _, outs = run(frames, cfg)
    assert active_ids(outs[-1]) == {2}


def test_unconfirmed_track_dropped_without_second_hit():
    frames = [
        [(*moving_box(0), 0.9, 0)],
        [(*moving_box(1), 0.9, 0), (500.0, 500.0, 540.0, 560.0, 0.9, 1)],
        [(*moving_box(2), 0.9, 0)],  # blip never comes back
        [(*moving_box(3), 0.9, 0), (500.0, 500.0, 540.0, 560.0, 0.9, 1)],
    ]
    state, outs = run(frames)
    # the one-frame blip never surfaces in outputs
    for out in outs:
        assert 2 not in active_ids(out)
    # its reappearance at frame 4 starts a fresh (still unconfirmed) id
    assert active_ids(outs[3]) == {1}


def test_boxes_track_motion():
    frames = [[(*moving_box(t), 0.9, 0)] for t in range(12)]
    _, outs = run(frames)
    b = box_of(outs[-1], 1)
    want = np.array(moving_box(11))
    np.testing.assert_allclose(b, want, atol=4.0)


def test_no_detections_stream():
    _, outs = run([[], [], []])
    for out in outs:
        assert active_ids(out) == set()


def test_slot_reuse_after_prune():
    cfg = ByteTrackConfig(track_buffer=2)
    frames = []
    for t in range(3):
        frames.append([(*moving_box(t), 0.9, 0)])
    frames += [[]] * 4  # lose + prune
    for t in range(7, 10):
        frames.append([(*moving_box(t, x0=300, y0=200), 0.9, 0)])
    state, outs = run(frames, cfg, slots=4)
    assert active_ids(outs[-1]) == {2}
    assert int(state.dropped_births) == 0


def test_crowded_scene_unique_ids(rng):
    # 6 well-separated objects moving independently; ids must stay
    # unique and stable
    starts = [(50 + 150 * i, 50 + 97 * (i % 3)) for i in range(6)]
    vels = [(3, 1), (-2, 2), (0, -3), (4, 0), (-1, -1), (2, 3)]
    frames = []
    for t in range(8):
        dets = []
        for (x0, y0), (vx, vy) in zip(starts, vels):
            dets.append(
                (*moving_box(t, x0=x0, y0=y0, vx=vx, vy=vy), 0.8, 0)
            )
        frames.append(dets)
    _, outs = run(frames)
    assert active_ids(outs[0]) == {1, 2, 3, 4, 5, 6}
    for out in outs:
        ids = [
            int(out.track_id[i])
            for i in range(len(out.active))
            if out.active[i]
        ]
        assert len(ids) == len(set(ids)) == 6
