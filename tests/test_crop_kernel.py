"""Banded-pyramid crop sampler: the Pallas kernel (interpret mode),
the stacked-einsum oracle, and the classic dense ds2 path must agree
(VERDICT r3 ask #1 — 'equality test vs the dense path').

Semantics: identical to ops/crops.crop_and_resize for every box whose
ds2 span fits a (256, 512) band (persons always do); larger boxes
sample a 2x-coarser pyramid level (strictly better antialiasing than
2-tapping ds2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strongsort_yolo_tpu.ops.crops import (
    BAND_H,
    BAND_W,
    banded_prep,
    crop_and_resize,
    crop_and_resize_pyramid,
    pyramid_dims,
    _pad_dims,
)
from strongsort_yolo_tpu.ops.pallas.crop_kernel import banded_crop


def _boxes(rng, n, w, h, max_frac=0.4):
    out = np.zeros((n, 4), np.float32)
    for i in range(n):
        x1 = rng.uniform(-10, w - 20)
        y1 = rng.uniform(-10, h - 20)
        out[i] = (x1, y1, x1 + rng.uniform(8, max_frac * w),
                  y1 + rng.uniform(12, max_frac * h))
    return out


def test_single_level_matches_classic_dense():
    """Small frames -> one pyramid level == the ds2 image: all three
    implementations are the SAME function."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (240, 320, 3)), jnp.float32)
    boxes = jnp.asarray(_boxes(rng, 12, 320, 240, max_frac=0.9))
    dense = crop_and_resize(img, boxes)
    oracle = crop_and_resize_pyramid(img, boxes)
    kern = banded_crop(img[None], boxes[None], interpret=True)[0]
    np.testing.assert_allclose(np.asarray(oracle), np.asarray(dense),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(dense),
                               atol=1e-4)


def test_multilevel_kernel_matches_oracle():
    """1080p geometry: boxes spanning all three levels, including
    full-frame and out-of-frame boxes."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1080, 1920, 3)), jnp.float32)
    boxes = np.concatenate([
        _boxes(rng, 10, 1920, 1080, max_frac=0.3),   # level 0
        _boxes(rng, 4, 1920, 1080, max_frac=0.95),   # levels 1-2
        np.asarray([[5, 5, 1900, 1070],               # full frame
                    [-50, -50, 400, 600],             # out of frame
                    [1800, 900, 2000, 1200]], np.float32),
    ])[None]
    boxes = jnp.asarray(boxes)
    kern = banded_crop(img[None], boxes, interpret=True)[0]
    oracle = crop_and_resize_pyramid(img, boxes[0])
    np.testing.assert_allclose(np.asarray(kern), np.asarray(oracle),
                               atol=1e-4)
    # levels really were exercised
    dims = pyramid_dims(1080, 1920)
    _, ints = banded_prep(boxes[0], (1080, 1920), dims, (128, 64))
    assert len(dims) == 3
    assert set(np.unique(np.asarray(ints[:, 2]))) >= {0, 2}


def test_level0_boxes_match_classic_dense_at_1080p():
    """Boxes fitting a band must be BIT-COMPARABLE to the classic ds2
    dense path (same taps, same staging) — persons always fit."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1080, 1920, 3)), jnp.float32)
    boxes = np.zeros((8, 4), np.float32)
    for i in range(8):
        x1 = rng.uniform(0, 1500)
        y1 = rng.uniform(0, 600)
        boxes[i] = (x1, y1, x1 + rng.uniform(40, 300),
                    y1 + rng.uniform(60, 460))
    boxes = jnp.asarray(boxes)
    dims = pyramid_dims(1080, 1920)
    _, ints = banded_prep(boxes, (1080, 1920), dims, (128, 64))
    assert (np.asarray(ints[:, 2]) == 0).all()
    dense = crop_and_resize(img, boxes)
    kern = banded_crop(img[None], boxes[None], interpret=True)[0]
    np.testing.assert_allclose(np.asarray(kern), np.asarray(dense),
                               atol=1e-4)


def test_prep_alignment_and_cover_invariants():
    """y0 8-aligned, x0 128-aligned, and every tap index must land
    inside the band for random boxes incl. degenerate/out-of-frame."""
    rng = np.random.default_rng(3)
    h, w = 1080, 1920
    boxes = np.concatenate([
        _boxes(rng, 200, w, h, max_frac=0.99),
        np.asarray([[0, 0, 0, 0], [-5, -5, -1, -1],
                    [w, h, w + 10, h + 10]], np.float32),
    ])
    dims = pyramid_dims(h, w)
    pads = _pad_dims(dims)
    scal, ints = banded_prep(jnp.asarray(boxes), (h, w), dims, (128, 64))
    scal, ints = np.asarray(scal), np.asarray(ints)
    assert (ints[:, 0] % 8 == 0).all()
    assert (ints[:, 1] % 128 == 0).all()
    assert (ints[:, 0] >= 0).all() and (ints[:, 1] >= 0).all()
    for i in range(len(boxes)):
        yb, ys, xb, xs, hl, wl = scal[i]
        y0, x0, lvl = ints[i]
        hp, wp = pads[lvl]
        assert y0 + BAND_H <= hp and x0 + BAND_W <= wp
        for r in (0, 127):
            lo = np.clip(np.floor(yb + r * ys), 0, hl - 1)
            assert 0 <= lo - y0 < BAND_H, (i, r, lo, y0)
            assert 0 <= np.clip(lo + 1, 0, hl - 1) - y0 < BAND_H
        for o in (0, 63):
            lo = np.clip(np.floor(xb + o * xs), 0, wl - 1)
            assert 0 <= lo - x0 < BAND_W, (i, o, lo, x0)


def test_bf16_matches_oracle_loosely():
    """Compute-dtype parity: bf16 kernel vs bf16 oracle (same rounding
    points by construction) stays within ~1 bf16 ulp."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (480, 640, 3)), jnp.bfloat16)
    boxes = jnp.asarray(_boxes(rng, 8, 640, 480))
    kern = banded_crop(img[None], boxes[None], interpret=True)[0]
    oracle = crop_and_resize_pyramid(img, boxes)
    np.testing.assert_allclose(
        np.asarray(kern, np.float32), np.asarray(oracle, np.float32),
        atol=2e-2,
    )


def test_pipeline_banded_matches_legacy_on_small_frames():
    """End-to-end: the StrongSORT pipeline with reid_banded (oracle on
    CPU) must produce the same tracks as the legacy dense embed on
    small frames (single level => identical embeddings)."""
    from strongsort_yolo_tpu.config import DetectorConfig
    from strongsort_yolo_tpu.media.video import SyntheticDetSource
    from strongsort_yolo_tpu.pipeline import Pipeline

    def run(banded):
        pipe = Pipeline(
            DetectorConfig(weights="yolov8n", imgsz=160, half=False,
                           max_det=16),
            tracker="strongsort.yaml", track_slots=16,
            tracker_max_dets=16, reid_topk=16, reid_banded=banded,
        )
        src = SyntheticDetSource(num_frames=6, size=(240, 320),
                                 num_objects=2, seed=2)
        out = []
        for frame in src:
            r = pipe.track(frame)
            out.append((np.asarray(r.boxes.xyxy),
                        None if r.boxes.id is None else np.asarray(r.boxes.id)))
        return out

    a, b = run(True), run(False)
    for (xa, ia), (xb, ib) in zip(a, b):
        np.testing.assert_allclose(xa, xb, atol=1e-3)
        if ia is not None or ib is not None:
            np.testing.assert_array_equal(ia, ib)


def test_packed_cross_stream_matches_per_frame_kernel():
    """banded_crop_packed (one flat kernel over G slots spanning many
    frames, per-block frame select via scalar prefetch) must reproduce
    the per-frame kernel exactly for every REAL slot — ragged counts,
    per-stream g-padding, and full-dummy tail blocks included."""
    from strongsort_yolo_tpu.ops.pallas.crop_kernel import (
        banded_crop_packed,
    )

    rng = np.random.default_rng(7)
    S, H, W, g = 3, 240, 320, 8
    imgs = jnp.asarray(rng.uniform(0, 1, (S, H, W, 3)), jnp.float32)
    per = [_boxes(rng, n, W, H) for n in (3, 9, 1)]  # ragged, one >g

    slots, streams, offs = [], [], []
    for s, b in enumerate(per):
        offs.append(sum(len(x) for x in slots))
        pad = -(-len(b) // g) * g
        slots.append(np.concatenate(
            [b, np.tile([[0, 0, 16, 32]], (pad - len(b), 1))]
        ).astype(np.float32))
        streams += [s] * pad
    packed = np.concatenate(slots)
    G = len(packed) + g  # one full dummy tail block
    packed = np.concatenate(
        [packed, np.tile([[0, 0, 16, 32]], (G - len(packed), 1))]
    ).astype(np.float32)
    streams = np.asarray(streams + [0] * g, np.int32)

    out = banded_crop_packed(
        imgs, jnp.asarray(packed), jnp.asarray(streams), (128, 64),
        interpret=True,
    )
    assert out.shape == (G, 128, 64, 3)
    for s, b in enumerate(per):
        ref = banded_crop(
            imgs[s][None], jnp.asarray(b)[None], (128, 64), interpret=True
        )[0]
        got = out[offs[s]:offs[s] + len(b)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
