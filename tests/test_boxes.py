"""Box geometry ops vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from strongsort_yolo_tpu.ops import boxes as B


def rand_xyxy(rng, n):
    x1 = rng.uniform(0, 500, (n, 1))
    y1 = rng.uniform(0, 500, (n, 1))
    w = rng.uniform(1, 200, (n, 1))
    h = rng.uniform(1, 200, (n, 1))
    return np.concatenate([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def iou_oracle(a, b):
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            lt = np.maximum(a[i, :2], b[j, :2])
            rb = np.minimum(a[i, 2:], b[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ua = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            ub = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            out[i, j] = inter / (ua + ub - inter + 1e-7)
    return out


def test_xywh_roundtrip(rng):
    b = rand_xyxy(rng, 64)
    back = np.asarray(B.xywh2xyxy(B.xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-3)


def test_xyah_roundtrip(rng):
    b = rand_xyxy(rng, 64)
    back = np.asarray(B.xyah2xyxy(B.xyxy2xyah(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-2)


def test_box_iou_vs_oracle(rng):
    a, b = rand_xyxy(rng, 32), rand_xyxy(rng, 48)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, iou_oracle(a, b), atol=1e-4)


def test_box_iou_batched(rng):
    a = np.stack([rand_xyxy(rng, 8) for _ in range(3)])
    b = np.stack([rand_xyxy(rng, 5) for _ in range(3)])
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (3, 8, 5)
    for k in range(3):
        np.testing.assert_allclose(got[k], iou_oracle(a[k], b[k]), atol=1e-4)


def test_scale_boxes_inverts_letterbox():
    # 1080p frame letterboxed into 640: box mapped there must come back.
    from strongsort_yolo_tpu.ops.letterbox import letterbox_params

    p = letterbox_params(1080, 1920, 640)
    orig = np.array([[100.0, 200.0, 700.0, 800.0]], np.float32)
    in_model = orig * p.gain + np.array(
        [p.pad_x, p.pad_y, p.pad_x, p.pad_y], np.float32
    )
    back = np.asarray(
        B.scale_boxes(
            jnp.asarray(in_model),
            jnp.float32(p.gain),
            jnp.asarray([p.pad_x, p.pad_y], jnp.float32),
            jnp.asarray([1080.0, 1920.0], jnp.float32),
        )
    )
    np.testing.assert_allclose(back, orig, atol=0.5)


def test_ciou_identical_is_one(rng):
    b = rand_xyxy(rng, 16)
    got = np.asarray(B.ciou(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(got, 1.0, atol=1e-4)
