"""Letterbox preprocessing vs a cv2-based oracle (ultralytics semantics)."""

import numpy as np
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params


def test_params_1080p():
    p = letterbox_params(1080, 1920, 640)
    assert p.new_w == 640 and p.new_h == 360
    assert p.pad_x == 0.0 and p.pad_y == 140.0
    assert abs(p.gain - 1 / 3) < 1e-9


def test_output_shape_and_range(rng):
    frame = rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
    p = letterbox_params(720, 1280, 640)
    out = np.asarray(letterbox(jnp.asarray(frame), p))
    assert out.shape == (640, 640, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # pad rows are gray 114/255
    np.testing.assert_allclose(out[0, :, :], 114 / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[-1, :, :], 114 / 255.0, atol=1e-6)


def test_batched(rng):
    frames = rng.integers(0, 255, (4, 480, 640, 3), dtype=np.uint8)
    p = letterbox_params(480, 640, 640)
    out = np.asarray(letterbox(jnp.asarray(frames), p))
    assert out.shape == (4, 640, 640, 3)


def test_bgr_to_rgb(rng):
    frame = np.zeros((64, 64, 3), np.uint8)
    frame[:, :, 0] = 255  # blue channel in BGR
    p = letterbox_params(64, 64, 64)
    out = np.asarray(letterbox(jnp.asarray(frame), p))
    # after BGR->RGB, channel 2 (R position holds blue) is the hot one
    np.testing.assert_allclose(out[32, 32], [0.0, 0.0, 1.0], atol=1e-3)


def test_decimation_fast_path_matches_cv2_exactly(rng):
    """1080p -> 640 letterbox is an exact 3x decimation under
    cv2.INTER_LINEAR sampling (src = 3*dst + 1, zero fractional
    weight): the strided-slice fast path must agree with cv2 EXACTLY
    (pixel picks, no interpolation error)."""
    import cv2

    from strongsort_yolo_tpu.ops.letterbox import _decimation_stride

    assert _decimation_stride(360, 1080) == (1, 3)
    assert _decimation_stride(640, 1920) == (1, 3)
    assert _decimation_stride(640, 960) is None  # 2/3 upscale: blend

    frame = rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8)
    p = letterbox_params(1080, 1920, 640)
    ours = np.asarray(letterbox(jnp.asarray(frame), p, bgr_to_rgb=False))
    ref = cv2.resize(frame, (640, 360), interpolation=cv2.INTER_LINEAR)
    top = int(round(p.pad_y - 0.1))
    crop = np.round(ours[top : top + 360, :] * 255.0)
    np.testing.assert_array_equal(crop.astype(np.uint8), ref)


def test_block_sel_720p_matches_cv2(rng):
    """720p -> 640x360 is an exact 2x downscale: the block-selection
    path blends each 2x2 with weights 0.5 — matches cv2 to rounding."""
    import cv2

    from strongsort_yolo_tpu.ops.letterbox import _block_sel

    np.testing.assert_allclose(_block_sel(360, 720), [0.5, 0.5])
    np.testing.assert_allclose(_block_sel(360, 1080), [0.0, 1.0, 0.0])
    assert _block_sel(640, 960) is None  # not an integer factor

    frame = rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
    p = letterbox_params(720, 1280, 640)
    ours = np.asarray(letterbox(jnp.asarray(frame), p, bgr_to_rgb=False))
    ref = cv2.resize(frame, (640, 360), interpolation=cv2.INTER_LINEAR)
    top = int(round(p.pad_y - 0.1))
    crop = ours[top : top + 360, :] * 255.0
    assert np.abs(crop - ref.astype(np.float32)).max() <= 1.0


def test_matches_cv2_resize_close(rng):
    import cv2

    frame = rng.integers(0, 255, (540, 960, 3), dtype=np.uint8)
    p = letterbox_params(540, 960, 640)
    ours = np.asarray(letterbox(jnp.asarray(frame), p, bgr_to_rgb=False))
    ref = cv2.resize(frame, (p.new_w, p.new_h), interpolation=cv2.INTER_LINEAR)
    top = int(round(p.pad_y - 0.1))
    crop = ours[top : top + p.new_h, : p.new_w] * 255.0
    # bilinear implementations differ slightly at edges; compare loosely
    assert np.mean(np.abs(crop - ref.astype(np.float32))) < 2.0


def test_decimate_resize_kernel_bitexact():
    """Pallas pure-decimation resize == the dense matmul resize,
    bit-exact (both sample the same single-tap pixels; uint8 is exact
    in bfloat16). 1080p -> 640x360 is the packed detect path's case."""
    import jax.numpy as jnp

    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul
    from strongsort_yolo_tpu.ops.pallas.resize_kernel import (
        decimate_resize,
        decimation_plan,
    )

    rng = np.random.default_rng(3)
    f = rng.integers(0, 255, (2, 1080, 1920, 3), dtype=np.uint8)
    assert decimation_plan(1080, 1920, 360, 640) == (1, 3, 1, 3)
    a = np.asarray(
        decimate_resize(jnp.asarray(f), 360, 640, interpret=True)
    ).astype(np.float32)
    b = np.asarray(
        resize_bilinear_matmul(jnp.asarray(f).astype(jnp.bfloat16), 360, 640)
    ).astype(np.float32)
    np.testing.assert_array_equal(a, b)
    # non-decimation geometries are rejected (fallback stays matmul)
    assert decimation_plan(720, 1280, 360, 640) is None  # 2x: 2-tap
    assert decimation_plan(1080, 1920, 368, 640) is None


def test_resize_planar_matches_dense_bitexact():
    """Round-5 channel-planar route (the TPU serving default): SAME
    interpolation matrices contracted per channel plane instead of with
    a c-minor dim — must be bit-exact vs the dense NHWC contraction in
    both bf16 and f32, batched and single-frame."""
    import jax.numpy as jnp

    from strongsort_yolo_tpu.ops.letterbox import (
        resize_bilinear_matmul,
        resize_bilinear_matmul_planar,
    )

    rng = np.random.default_rng(7)
    f = rng.integers(0, 255, (2, 1080, 1920, 3), dtype=np.uint8)
    for dt in (jnp.bfloat16, jnp.float32):
        a = np.asarray(
            resize_bilinear_matmul_planar(jnp.asarray(f), 360, 640, dtype=dt)
        ).astype(np.float32)
        b = np.asarray(
            resize_bilinear_matmul(jnp.asarray(f).astype(dt), 360, 640)
        ).astype(np.float32)
        np.testing.assert_array_equal(a, b)
    # single frame (3D) path, non-decimation geometry (true 2-tap blend)
    g = rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
    a = np.asarray(
        resize_bilinear_matmul_planar(
            jnp.asarray(g), 360, 640, dtype=jnp.float32
        )
    )
    b = np.asarray(
        resize_bilinear_matmul(
            jnp.asarray(g).astype(jnp.float32), 360, 640
        )
    )
    np.testing.assert_array_equal(a, b)


def test_decimate_resize_planar_bitexact():
    """Round-5 planar-input Pallas decimation kernel (operand layout
    (0,3,1,2) — no relayout copy on TPU) must be bit-exact vs the dense
    matmul resize too."""
    import jax.numpy as jnp

    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul
    from strongsort_yolo_tpu.ops.pallas.resize_kernel import (
        decimate_resize_planar,
    )

    rng = np.random.default_rng(6)
    f = rng.integers(0, 255, (2, 1080, 1920, 3), dtype=np.uint8)
    a = np.asarray(
        decimate_resize_planar(jnp.asarray(f), 360, 640, interpret=True)
    ).astype(np.float32)
    b = np.asarray(
        resize_bilinear_matmul(jnp.asarray(f).astype(jnp.bfloat16), 360, 640)
    ).astype(np.float32)
    np.testing.assert_array_equal(a, b)


def test_decimate_resize_contig_bitexact():
    """Round-5 contiguous-read variant (full-frame DMA + in-VMEM row
    selection — the fix the round-3 kernel's postmortem prescribed)
    must be bit-exact vs the dense matmul resize too."""
    import jax.numpy as jnp

    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul
    from strongsort_yolo_tpu.ops.pallas.resize_kernel import (
        decimate_resize_contig,
    )

    rng = np.random.default_rng(5)
    f = rng.integers(0, 255, (2, 1080, 1920, 3), dtype=np.uint8)
    a = np.asarray(
        decimate_resize_contig(jnp.asarray(f), 360, 640, interpret=True)
    ).astype(np.float32)
    b = np.asarray(
        resize_bilinear_matmul(jnp.asarray(f).astype(jnp.bfloat16), 360, 640)
    ).astype(np.float32)
    np.testing.assert_array_equal(a, b)
