"""Device-side GMC (track/gmc_tpu.py): dense pyramidal LK affine.

Synthetic-motion oracles: smooth periodic images so integer shifts
are exact, and a sampling-generated affine case. All CPU f32.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from strongsort_yolo_tpu.track.gmc_tpu import (
    BASE_H, BASE_W, FlowTpuGMC, batched_warps, estimate_warp,
    frame_to_gray, _sample,
)


def _smooth_image(seed=0, h=BASE_H, w=BASE_W):
    """Periodic sum-of-sinusoids: jnp.roll is an EXACT translation."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(12):
        fy = rng.integers(1, 6) / h
        fx = rng.integers(1, 6) / w
        ph = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(10, 40) * np.sin(
            2 * np.pi * (fx * x + fy * y) + ph
        )
    return jnp.asarray(img + 128.0)


def test_identity_on_static_frame():
    img = _smooth_image(1)
    w = np.asarray(estimate_warp(img, img))
    np.testing.assert_allclose(w[:, :2], np.eye(2), atol=2e-3)
    assert np.abs(w[:, 2]).max() < 0.1


def test_recovers_pure_translation():
    prev = _smooth_image(2)
    # camera pans: scene content moves by (dx, dy) = prev point p
    # appears at p + d in the current frame
    dx, dy = 5, -3
    cur = jnp.roll(prev, (dy, dx), axis=(0, 1))
    w = np.asarray(estimate_warp(prev, cur))
    np.testing.assert_allclose(w[:, :2], np.eye(2), atol=5e-3)
    np.testing.assert_allclose(w[0, 2], dx, atol=0.35)
    np.testing.assert_allclose(w[1, 2], dy, atol=0.35)


def test_recovers_small_affine():
    prev = _smooth_image(3)
    # true warp W (prev->cur): small rotation + translation. Build cur
    # by sampling prev at W^{-1}(q).
    th = 0.02
    a = np.array(
        [[np.cos(th), -np.sin(th), 3.0], [np.sin(th), np.cos(th), -2.0]],
        np.float32,
    )
    inv = np.linalg.inv(np.vstack([a, [0, 0, 1]]))[:2]
    gy, gx = np.mgrid[0:BASE_H, 0:BASE_W].astype(np.float32)
    xs = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    ys = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]
    cur, _ = _sample(prev, jnp.asarray(xs), jnp.asarray(ys))
    w = np.asarray(estimate_warp(prev, jnp.asarray(cur)))
    np.testing.assert_allclose(w[:, :2], a[:, :2], atol=8e-3)
    np.testing.assert_allclose(w[:, 2], a[:, 2], atol=0.6)


def test_pallas_kernel_recovers_translation():
    """The VMEM-resident LK kernel (interpret mode on CPU) recovers
    the same motion as the XLA path."""
    prev = _smooth_image(7)
    cur = jnp.roll(prev, (-2, 4), axis=(0, 1))
    w = np.asarray(
        estimate_warp(prev, cur, method="pallas_interpret")
    )
    np.testing.assert_allclose(w[:, :2], np.eye(2), atol=6e-3)
    np.testing.assert_allclose(w[0, 2], 4, atol=0.4)
    np.testing.assert_allclose(w[1, 2], -2, atol=0.4)
    w_xla = np.asarray(estimate_warp(prev, cur, method="xla"))
    np.testing.assert_allclose(w, w_xla, atol=0.15)


def test_scale_back_to_original_coords():
    prev = _smooth_image(4)
    cur = jnp.roll(prev, (0, 4), axis=(0, 1))
    # pretend the original frame is 3x the base resolution
    w = np.asarray(estimate_warp(prev, cur, scale_x=3.0, scale_y=3.0))
    np.testing.assert_allclose(w[0, 2], 12.0, atol=1.0)


def test_flow_gmc_protocol(rng):
    g = FlowTpuGMC()
    frame = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
    w0 = np.asarray(g.apply(frame))
    np.testing.assert_array_equal(w0, np.eye(2, 3, dtype=np.float32))
    w1 = g.apply(frame)  # static scene -> ~identity
    np.testing.assert_allclose(w1[:, :2], np.eye(2), atol=5e-3)
    g.reset()
    w2 = np.asarray(g.apply(frame))
    np.testing.assert_array_equal(w2, np.eye(2, 3, dtype=np.float32))


def test_batched_warps_has_prev_mask():
    prev = jnp.stack([_smooth_image(5), _smooth_image(6)])
    cur = jnp.stack(
        [jnp.roll(prev[0], 3, axis=1), jnp.roll(prev[1], 3, axis=1)]
    )
    warps = np.asarray(
        batched_warps(
            prev, cur, (BASE_H, BASE_W),
            has_prev=jnp.asarray([True, False]),
        )
    )
    np.testing.assert_allclose(warps[0, 0, 2], 3.0, atol=0.35)
    np.testing.assert_array_equal(warps[1], np.eye(2, 3, dtype=np.float32))


def test_frame_to_gray_shape(rng):
    frames = rng.integers(0, 255, (2, 108, 192, 3), dtype=np.uint8)
    g = frame_to_gray(jnp.asarray(frames))
    assert g.shape == (2, BASE_H, BASE_W)
    assert float(g.min()) >= 0.0 and float(g.max()) <= 255.0


def test_gray_from_resized_matches_frame_to_gray(rng):
    """The shared-luma path (pyramid base derived from the detector's
    letterbox-scale resize — pipeline._flow_body packed branch) must
    agree with the direct full-resolution path up to the two-stage
    resampling difference: warp estimation tolerates far more than a
    few gray levels (the LK prefilter blurs the base anyway)."""
    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul
    from strongsort_yolo_tpu.track.gmc_tpu import gray_from_resized

    # smooth synthetic scene — resampling-order differences show up as
    # sub-lsb noise, not structure (random noise would alias in BOTH
    # paths differently and measure nothing)
    yy, xx = np.mgrid[0:1080, 0:1920].astype(np.float32)
    base = 127 + 80 * np.sin(xx / 97.0) * np.cos(yy / 61.0)
    frame = np.repeat(base[..., None], 3, axis=2).astype(np.uint8)
    frame = jnp.asarray(frame)

    direct = frame_to_gray(frame)
    resized = resize_bilinear_matmul(
        frame.astype(jnp.bfloat16), 360, 640
    )
    shared = gray_from_resized(resized)
    assert shared.shape == direct.shape == (BASE_H, BASE_W)
    np.testing.assert_allclose(
        np.asarray(shared), np.asarray(direct), atol=3.0
    )
    # exact-size input: luma only, no second resize
    same = gray_from_resized(
        jnp.zeros((BASE_H, BASE_W, 3), jnp.bfloat16) + 100.0
    )
    np.testing.assert_allclose(np.asarray(same), 100.0, atol=0.5)


@pytest.mark.parametrize("method", ["flow_tpu"])
def test_make_gmc_factory(method):
    from strongsort_yolo_tpu.track.gmc import make_gmc

    g = make_gmc(method)
    assert g.method == "flow_tpu"


def test_batched_flow_tpu_on_mesh(rng):
    """flow_tpu BatchedPipeline over a dp mesh: the gray-state tensor
    shards with the streams and the in-step warps compile/execute."""
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.parallel.mesh import make_mesh
    from strongsort_yolo_tpu.pipeline import Pipeline
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=160, half=False, max_det=16),
        tracker=ByteTrackConfig(
            tracker_type="botsort", gmc_method="flow_tpu"
        ),
        track_slots=16, tracker_max_dets=16,
    )
    S = 4
    frames = rng.integers(0, 255, (S, 240, 320, 3), dtype=np.uint8)
    bp = pipe.track_batch_prepare(S, (240, 320), mesh=make_mesh(4, tp=1))
    bp.step(np.asarray(frames))
    bp.step(np.asarray(frames))
    assert bp._prev_grays.shape == (S, BASE_H, BASE_W)
    # per-stream gray state sharded over dp like the tracker state
    assert bp._prev_grays.sharding.shard_shape(
        bp._prev_grays.shape
    )[0] == 1


def test_pipeline_flow_tpu_end_to_end(rng):
    """flow_tpu through BOTH pipeline paths: sequential track (device
    warp handle, no sync) and BatchedPipeline (vmapped warps off the
    staged frames + per-stream reset semantics)."""
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.pipeline import Pipeline
    from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig

    pipe = Pipeline(
        DetectorConfig(weights="yolov8n", imgsz=160, half=False, max_det=16),
        tracker=ByteTrackConfig(
            tracker_type="botsort", gmc_method="flow_tpu"
        ),
        track_slots=16,
    )
    frames = rng.integers(0, 255, (2, 240, 320, 3), dtype=np.uint8)
    r0 = pipe.track(frames[0])
    r1 = pipe.track(frames[1])
    assert r0.boxes is not None and r1.boxes is not None
    # in-step flow state advanced (warp computed inside the program)
    assert pipe._flow_gray is not None and pipe._flow_has
    assert pipe._get_step((240, 320)).track_step_flow is not None

    bp = pipe.track_batch_prepare(2, (240, 320))
    sframes = np.stack([frames[0], frames[0]])
    bp.step(sframes)
    assert bp._has_prev.all()
    bp.reset_stream(1)
    assert not bp._has_prev[1] and bp._has_prev[0]
    bp.step(sframes)
    assert bp._has_prev.all()
