"""Pallas NMS kernel (interpret mode on CPU) vs the XLA fixpoint."""

import numpy as np
import jax.numpy as jnp
import pytest

from strongsort_yolo_tpu.ops.nms import _greedy_keep_fixpoint
from strongsort_yolo_tpu.ops.boxes import box_iou
from strongsort_yolo_tpu.ops.pallas.nms_kernel import pallas_nms_keep


def cands(rng, k=128, clusters=True):
    if clusters:
        centers = rng.uniform(50, 600, (8, 2))
        idx = rng.integers(0, 8, k)
        cx = centers[idx, 0] + rng.normal(0, 15, k)
        cy = centers[idx, 1] + rng.normal(0, 15, k)
    else:
        cx = rng.uniform(0, 640, k)
        cy = rng.uniform(0, 640, k)
    w = rng.uniform(20, 100, k)
    h = rng.uniform(20, 100, k)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
    conf = np.sort(rng.uniform(0, 1, k))[::-1].copy()  # score-desc
    return boxes.astype(np.float32), conf.astype(np.float32)


@pytest.mark.parametrize("clusters", [True, False])
def test_kernel_matches_xla_fixpoint(rng, clusters):
    boxes, conf = cands(rng, 128, clusters)
    got = np.asarray(
        pallas_nms_keep(
            jnp.asarray(boxes), jnp.asarray(conf),
            iou_thres=0.4, conf_thres=0.3, interpret=True,
        )
    )
    valid = jnp.asarray(conf >= 0.3)
    iou = box_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    want = np.asarray(_greedy_keep_fixpoint(iou, valid, 0.4))
    np.testing.assert_array_equal(got, want)


def test_kernel_dense_cluster(rng):
    k = 128
    base = np.array([100.0, 100.0, 200.0, 200.0])
    boxes = (base[None] + rng.uniform(-8, 8, (k, 4))).astype(np.float32)
    conf = np.linspace(0.95, 0.31, k).astype(np.float32)
    got = np.asarray(
        pallas_nms_keep(
            jnp.asarray(boxes), jnp.asarray(conf),
            iou_thres=0.4, conf_thres=0.3, interpret=True,
        )
    )
    valid = jnp.asarray(conf >= 0.3)
    iou = box_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    want = np.asarray(_greedy_keep_fixpoint(iou, valid, 0.4))
    np.testing.assert_array_equal(got, want)
    assert got[0]  # highest-scored always kept


def test_kernel_all_below_conf(rng):
    boxes, conf = cands(rng, 128)
    conf = conf * 0.1
    got = np.asarray(
        pallas_nms_keep(
            jnp.asarray(boxes), jnp.asarray(conf),
            iou_thres=0.4, conf_thres=0.3, interpret=True,
        )
    )
    assert not got.any()


def test_nms_backend_flag(rng):
    from strongsort_yolo_tpu.ops.nms import non_max_suppression

    boxes, conf = cands(rng, 128)
    scores = np.zeros((128, 3), np.float32)
    scores[:, 1] = conf
    det = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores),
        conf_thres=0.3, iou_thres=0.4, pre_nms_topk=128, backend="xla",
    )
    assert int(det.count) > 0


@pytest.mark.parametrize("k", [256, 512])
def test_blockseq_kernel_matches_whole_k(rng, k):
    """Block-sequential fixpoint == whole-K fixpoint == XLA oracle,
    including an adversarial overlapping-chain scene (the dense case
    whose iteration count the block form bounds)."""
    scenes = []
    boxes, conf = cands(rng, k, clusters=True)
    scenes.append((boxes, conf))
    # chain: each box overlaps its neighbors -> alternating keep/kill
    t = np.arange(k, dtype=np.float32)
    chain = np.stack(
        [10 + 18 * t, np.full(k, 50.0), 10 + 18 * t + 40, np.full(k, 120.0)],
        axis=1,
    )
    scenes.append(
        (chain.astype(np.float32), np.linspace(0.99, 0.31, k).astype(np.float32))
    )
    for boxes, conf in scenes:
        got = np.asarray(
            pallas_nms_keep(
                jnp.asarray(boxes), jnp.asarray(conf),
                iou_thres=0.4, conf_thres=0.3, interpret=True,
                block_seq=True,
            )
        )
        valid = jnp.asarray(conf >= 0.3)
        iou = box_iou(jnp.asarray(boxes), jnp.asarray(boxes))
        want = np.asarray(_greedy_keep_fixpoint(iou, valid, 0.4))
        np.testing.assert_array_equal(got, want)
