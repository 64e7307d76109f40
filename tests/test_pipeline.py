"""Pipeline-level coverage: task variants, chunked-mode equivalence,
GMC warp estimation."""

import numpy as np
import jax
import pytest

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.pipeline import Pipeline


def mkpipe(weights, **kw):
    return Pipeline(
        DetectorConfig(weights=weights, imgsz=160, half=False, max_det=16),
        track_slots=16,
        **kw,
    )


@pytest.fixture(scope="module")
def frame(tmp_path_factory):
    rng = np.random.default_rng(0)
    f = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    f[60:140, 80:180] = (40, 180, 220)
    return f


def test_segment_pipeline_surfaces(frame):
    p = mkpipe("yolov8n-seg")
    r = p.predict(frame)
    assert r.masks is not None
    assert len(r.masks.xy) == len(r.boxes)
    r2 = p.track(frame)
    assert r2.masks is not None


def test_pose_pipeline_surfaces(frame):
    p = mkpipe("yolov8n-pose")
    r = p.predict(frame)
    assert r.keypoints is not None
    assert r.keypoints.xy.shape[1:] == (17, 2)
    # masked view reproduces the reference's (0,0)-for-invisible
    masked = r.keypoints.xy_masked
    invis = r.keypoints.conf < 0.5
    assert np.all(masked[invis] == 0.0)


def test_v5_and_v11_pipelines(frame):
    for w in ("yolov5n", "yolo11n", "yolov7"):
        p = mkpipe(w)
        r = p.track(frame)
        assert r.boxes is not None


def test_track_chunk_equals_sequential(frame):
    """Chunked (lax.scan) mode must produce the exact same tracks as
    frame-by-frame calls."""
    rng = np.random.default_rng(1)
    frames = np.stack(
        [np.roll(frame, 3 * t, axis=1) for t in range(4)]
    )
    pa = mkpipe("yolov8n", seed=3)
    pb = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=160, half=False, max_det=16),
        track_slots=16, seed=3, params=pa.params,
    )
    seq = [pa.track(f) for f in frames]
    chk = pb.track_chunk(frames)
    assert int(pa.track_state.frame_id) == int(pb.track_state.frame_id) == 4
    for a, b in zip(seq, chk):
        ids_a = sorted(a.boxes.id.tolist()) if a.boxes.id is not None else []
        ids_b = sorted(b.boxes.id.tolist()) if b.boxes.id is not None else []
        assert ids_a == ids_b
    np.testing.assert_allclose(
        np.asarray(pa.track_state.mean),
        np.asarray(pb.track_state.mean),
        atol=1e-4,
    )


def test_track_chunk_carries_pose_extras(frame):
    """Chunked mode must keep seg/pose parity: keypoints per frame
    identical to sequential track() calls."""
    frames = np.stack([np.roll(frame, 3 * t, axis=1) for t in range(3)])
    pa = mkpipe("yolov8n-pose", seed=5)
    pb = Pipeline(
        DetectorConfig(
            weights="yolov8n-pose", imgsz=160, half=False, max_det=16
        ),
        track_slots=16, seed=5, params=pa.params,
    )
    seq = [pa.track(f) for f in frames]
    chk = pb.track_chunk(frames)
    for a, b in zip(seq, chk):
        assert (a.keypoints is None) == (b.keypoints is None)
        if a.keypoints is not None and len(a.keypoints):
            np.testing.assert_allclose(
                a.keypoints.data, b.keypoints.data, atol=1e-4
            )


def test_track_chunk_carries_seg_extras(frame):
    """Chunked mode returns masks identical to sequential track()."""
    frames = np.stack([np.roll(frame, 3 * t, axis=1) for t in range(3)])
    pa = mkpipe("yolov8n-seg", seed=6)
    pb = Pipeline(
        DetectorConfig(
            weights="yolov8n-seg", imgsz=160, half=False, max_det=16
        ),
        track_slots=16, seed=6, params=pa.params,
    )
    seq = [pa.track(f) for f in frames]
    chk = pb.track_chunk(frames)
    for a, b in zip(seq, chk):
        assert (a.masks is None) == (b.masks is None)
        if a.masks is not None and len(a.masks):
            np.testing.assert_allclose(a.masks.data, b.masks.data, atol=1e-4)
            assert len(a.masks.xy) == len(b.masks.xy)


def test_gmc_estimates_translation():
    """Sparse-optflow GMC recovers a synthetic camera shift."""
    from strongsort_yolo_tpu.track.gmc import SparseOptFlowGMC

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    # textured scene: blocks
    for i in range(20):
        x, y = rng.integers(0, 280), rng.integers(0, 200)
        base[y : y + 20, x : x + 20] = rng.integers(0, 255, 3)
    shifted = np.roll(np.roll(base, 6, axis=1), 4, axis=0)
    gmc = SparseOptFlowGMC(downscale=1)
    w0 = gmc.apply(base)
    np.testing.assert_array_equal(w0, np.eye(2, 3, dtype=np.float32))
    w1 = gmc.apply(shifted)
    assert abs(w1[0, 2] - 6) < 1.5  # dx
    assert abs(w1[1, 2] - 4) < 1.5  # dy
    assert abs(w1[0, 0] - 1) < 0.05  # no scale/rotation


def test_warp_applied_to_tracks():
    """A GMC warp shifts track means inside the jitted step."""
    import jax.numpy as jnp

    from strongsort_yolo_tpu.track.bytetrack import apply_warp
    from strongsort_yolo_tpu.track.state import init_track_state, STATUS_TRACKED

    st = init_track_state(4)
    st = st._replace(
        mean=st.mean.at[0, :4].set(jnp.asarray([100.0, 50.0, 30.0, 60.0])),
        status=st.status.at[0].set(STATUS_TRACKED),
    )
    warp = jnp.asarray([[1.0, 0.0, 10.0], [0.0, 1.0, -5.0]])
    out = apply_warp(st, warp, "xywh")
    np.testing.assert_allclose(
        np.asarray(out.mean[0, :2]), [110.0, 45.0], atol=1e-5
    )
    # empty slots untouched
    np.testing.assert_allclose(np.asarray(out.mean[1]), 0.0)


def test_apply_warp_matches_ultralytics_multi_gmc():
    """XYWH warp application reproduces STrack.multi_gmc's math:
    R8x8 = kron(I4, R) on mean and covariance, translation on
    position — verified against a NumPy oracle."""
    import jax.numpy as jnp

    from strongsort_yolo_tpu.track.bytetrack import apply_warp
    from strongsort_yolo_tpu.track.state import init_track_state, STATUS_TRACKED

    rng = np.random.default_rng(3)
    k = 5
    st = init_track_state(k)
    mean = rng.normal(0, 50, (k, 8)).astype(np.float32)
    cov = rng.normal(0, 1, (k, 8, 8)).astype(np.float32)
    cov = cov @ cov.transpose(0, 2, 1)  # SPD-ish
    st = st._replace(
        mean=jnp.asarray(mean), cov=jnp.asarray(cov),
        status=st.status.at[:].set(STATUS_TRACKED),
    )
    theta = 0.03
    warp = np.array(
        [[np.cos(theta), -np.sin(theta), 12.0],
         [np.sin(theta), np.cos(theta), -7.0]], np.float32,
    )
    out = apply_warp(st, jnp.asarray(warp), "xywh")

    # NumPy oracle: ultralytics STrack.multi_gmc
    r = warp[:2, :2]
    r8 = np.kron(np.eye(4, dtype=np.float32), r)
    t = warp[:2, 2]
    for i in range(k):
        m = r8 @ mean[i]
        m[:2] += t
        c = r8 @ cov[i] @ r8.T
        np.testing.assert_allclose(np.asarray(out.mean[i]), m, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.cov[i]), c, rtol=1e-4, atol=1e-3)


def test_overlapped_gmc_equals_serial(frame):
    """One-tick overlapped dispatch with sparseOptFlow GMC produces
    the same results as the serial path (warps are computed in frame
    order either way)."""
    frames = [np.roll(frame, 5 * t, axis=1) for t in range(4)]
    pa = mkpipe("yolov8n", seed=9, tracker="botsort.yaml")
    pb = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=160, half=False, max_det=16),
        tracker="botsort.yaml", track_slots=16, seed=9, params=pa.params,
    )
    serial = [pa.track(f) for f in frames]
    handles, overlapped = [], []
    for f in frames:
        h = pb.track_async(f)
        if handles:
            overlapped.append(pb.materialize(handles.pop()))
        handles.append(h)
    overlapped.append(pb.materialize(handles.pop()))
    for a, b in zip(serial, overlapped):
        np.testing.assert_allclose(a.boxes.xyxy, b.boxes.xyxy, atol=1e-4)
        if a.boxes.id is not None:
            np.testing.assert_array_equal(a.boxes.id, b.boxes.id)


def test_reid_packed_pipeline_matches_plain(frame):
    """The packed ReID crop/stem path (reid_packed=True:
    crop_and_resize_packed + the 7x7 stem in transition form) yields
    the same tracking decisions as the plain path — exact re-indexing,
    wired through the full StrongSORT step."""
    outs = []
    for packed in (False, True):
        p = mkpipe(
            "yolov8n", tracker="strongsort.yaml", tracker_max_dets=16,
            reid_packed=packed, seed=5,
        )
        rows = []
        for t in range(4):
            f = np.roll(frame, t * 3, axis=1)
            r = p.track(f)
            rows.append(
                (np.asarray(r.boxes.xyxy), np.asarray(r.boxes.id)
                 if r.boxes.id is not None else np.zeros(0))
            )
        outs.append(rows)
    for (b0, i0), (b1, i1) in zip(*outs):
        np.testing.assert_allclose(b0, b1, rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(i0, i1)
