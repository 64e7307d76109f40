"""Multi-stream batching + sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strongsort_yolo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_param_shardings,
)


def test_mesh_axes():
    mesh = make_mesh(8, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}


def test_param_shardings_tp():
    from strongsort_yolo_tpu.models.yolo import YoloConfig, init_model

    mesh = make_mesh(8, tp=2)
    cfg = YoloConfig(family="v8", scale="n")
    params = init_model(jax.random.PRNGKey(0), cfg)
    sh = make_param_shardings(params, mesh)
    placed = jax.device_put(params, sh)
    # wide conv kernels actually split over tp (half the channels per shard)
    w = placed["backbone"]["down4"]["w"]  # cout = 256
    assert w.sharding.shard_shape(w.shape)[-1] == w.shape[-1] // 2
    # narrow ones fully replicated
    stem = placed["backbone"]["stem"]["w"]  # cout = 16
    assert stem.sharding.shard_shape(stem.shape) == stem.shape


def test_stream_batch_sharded_end_to_end():
    """4 streams sharded over dp=4: full detect+track step executes on
    the virtual mesh with per-stream tracker state."""
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.models.yolo import YoloConfig, init_model
    from strongsort_yolo_tpu.parallel.streams import StreamBatch
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    mesh = make_mesh(4, tp=1)
    model_cfg = YoloConfig(family="v8", scale="n")
    params = init_model(jax.random.PRNGKey(0), model_cfg)
    det_cfg = DetectorConfig(imgsz=160, half=False, max_det=16)
    sb = StreamBatch(
        params, model_cfg, det_cfg,
        ByteTrackConfig(gmc_method="none"),
        num_streams=4, src_hw=(240, 320), track_slots=16, mesh=mesh,
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 240, 320, 3), dtype=np.uint8)
    dets, touts = sb.step(frames)
    assert dets.boxes.shape == (4, 16, 4)
    assert touts.active.shape == (4, 16)
    # second step advances all stream frame counters independently
    sb.step(frames)
    assert np.all(np.asarray(sb.states.frame_id) == 2)


def test_stream_states_independent():
    """Detections in stream 0 must not leak tracks into stream 1."""
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
    from strongsort_yolo_tpu.track.state import init_track_state

    cfg = ByteTrackConfig()
    states = jax.vmap(lambda _: init_track_state(8))(jnp.arange(2))
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[0, 0] = [10, 10, 50, 50]
    scores = np.zeros((2, 4), np.float32)
    scores[0, 0] = 0.9
    valid = scores > 0
    step = jax.jit(
        jax.vmap(lambda st, b, s, c, v: bytetrack_step(st, b, s, c, v, cfg)),
    )
    for _ in range(3):
        states, outs = step(
            states, jnp.asarray(boxes), jnp.asarray(scores),
            jnp.zeros((2, 4), jnp.int32), jnp.asarray(valid),
        )
    outs = jax.tree.map(np.asarray, outs)
    assert outs.active[0].sum() == 1
    assert outs.active[1].sum() == 0


def test_batched_pipeline_on_mesh_equals_unsharded():
    """The app's real multi-source path (pipeline.BatchedPipeline)
    sharded over a 4-device dp mesh: identical outputs to the
    unsharded batch, streams split across devices."""
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline

    rng = np.random.default_rng(0)
    S, T = 4, 3
    frames = rng.integers(0, 255, (S, T, 240, 320, 3), dtype=np.uint8)
    for s in range(S):
        frames[s, :, 40 + 20 * s : 120 + 20 * s, 60:180] = (40, 180, 220)

    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=160, half=False, max_det=16),
        tracker="bytetrack.yaml", track_slots=16, tracker_max_dets=16,
    )
    plain = pipe.track_batch_prepare(S, (240, 320))
    ref = [plain.step(frames[:, t]) for t in range(T)]

    mesh = make_mesh(4, tp=1)
    sharded = pipe.track_batch_prepare(S, (240, 320), mesh=mesh)
    # streams really split over dp
    shard_shape = sharded.states.mean.sharding.shard_shape(
        sharded.states.mean.shape
    )
    assert shard_shape[0] == S // 4
    got = [sharded.step(frames[:, t]) for t in range(T)]

    for t in range(T):
        for s in range(S):
            a, b = ref[t][s].boxes, got[t][s].boxes
            assert len(a) == len(b)
            np.testing.assert_allclose(a.xyxy, b.xyxy, atol=1e-3)
            if a.id is not None:
                np.testing.assert_array_equal(a.id, b.id)
