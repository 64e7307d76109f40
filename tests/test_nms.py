"""NMS vs a sequential greedy NumPy oracle (torchvision semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.nms import non_max_suppression


def greedy_nms_oracle(boxes, scores, iou_thres):
    """Sequential greedy NMS over score-desc candidates (single class)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (ai + aj - inter + 1e-7) > iou_thres:
                suppressed[j] = True
    return keep


def nms_oracle(boxes, scores_mat, conf, iou, agnostic=False):
    """Class-aware NMS oracle returning the set of kept (box, cls)."""
    best = scores_mat.max(1)
    cls = scores_mat.argmax(1)
    cand = best >= conf
    idx = np.where(cand)[0]
    if len(idx) == 0:
        return set()
    off = np.zeros_like(best) if agnostic else cls * 7680.0
    shifted = boxes + off[:, None]
    kept_local = greedy_nms_oracle(shifted[idx], best[idx], iou)
    kept = idx[kept_local]
    return {(i, int(cls[i])) for i in kept}


def make_preds(rng, n=200, nc=5, size=640):
    cx = rng.uniform(0, size, n)
    cy = rng.uniform(0, size, n)
    w = rng.uniform(10, 120, n)
    h = rng.uniform(10, 120, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
    scores = rng.uniform(0, 1, (n, nc)) ** 3  # mostly low conf
    return boxes.astype(np.float32), scores.astype(np.float32)


def run_ours(boxes, scores, **kw):
    det = non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), **kw)
    n = int(det.count)
    got = set()
    for k in range(n):
        # recover original index by matching box coords
        got.add(
            (
                tuple(np.round(np.asarray(det.boxes[k]), 2)),
                int(det.classes[k]),
            )
        )
    return det, got


def to_keyset(boxes, kept):
    return {(tuple(np.round(boxes[i], 2)), c) for i, c in kept}


def test_nms_matches_oracle_classaware(rng):
    for trial in range(5):
        boxes, scores = make_preds(rng)
        want = to_keyset(boxes, nms_oracle(boxes, scores, 0.3, 0.4))
        _, got = run_ours(boxes, scores, conf_thres=0.3, iou_thres=0.4)
        assert got == want


def test_nms_matches_oracle_agnostic(rng):
    boxes, scores = make_preds(rng, n=150)
    want = to_keyset(boxes, nms_oracle(boxes, scores, 0.25, 0.5, agnostic=True))
    _, got = run_ours(
        boxes, scores, conf_thres=0.25, iou_thres=0.5, agnostic=True
    )
    assert got == want


def test_nms_dense_cluster(rng):
    # Many heavily-overlapping boxes of one class — stresses long
    # suppression chains in the fixpoint iteration.
    n = 100
    base = np.array([100.0, 100.0, 200.0, 200.0])
    jit = rng.uniform(-8, 8, (n, 4))
    boxes = (base[None] + jit).astype(np.float32)
    scores = np.zeros((n, 3), np.float32)
    scores[:, 1] = np.linspace(0.9, 0.35, n)
    want = to_keyset(boxes, nms_oracle(boxes, scores, 0.3, 0.4))
    _, got = run_ours(boxes, scores, conf_thres=0.3, iou_thres=0.4)
    assert got == want


def test_nms_empty():
    boxes = np.zeros((50, 4), np.float32)
    scores = np.full((50, 3), 0.01, np.float32)
    det, _ = run_ours(boxes, scores, conf_thres=0.3, iou_thres=0.4)
    assert int(det.count) == 0
    assert not bool(np.any(np.asarray(det.valid)))


def test_nms_max_det_truncates(rng):
    boxes, scores = make_preds(rng, n=300)
    scores[:] = 0.9  # everything survives conf
    det = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), conf_thres=0.3,
        iou_thres=0.99, max_det=10,
    )
    assert int(det.count) <= 10
    assert det.boxes.shape == (10, 4)


def test_nms_class_filter(rng):
    boxes, scores = make_preds(rng, n=100, nc=4)
    allowed = jnp.asarray([False, True, False, False])
    det = non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores), conf_thres=0.1,
        iou_thres=0.5, class_filter=allowed,
    )
    n = int(det.count)
    assert n > 0
    assert all(int(det.classes[k]) == 1 for k in range(n))


def test_nms_jits_once(rng):
    boxes, scores = make_preds(rng)
    fn = jax.jit(
        lambda b, s: non_max_suppression(b, s, conf_thres=0.3, iou_thres=0.4)
    )
    d1 = fn(jnp.asarray(boxes), jnp.asarray(scores))
    boxes2, scores2 = make_preds(rng)
    d2 = fn(jnp.asarray(boxes2), jnp.asarray(scores2))
    assert d1.boxes.shape == d2.boxes.shape


def test_nms_from_logits_matches_decode_then_nms(rng):
    """The fused path (select candidates -> decode) must agree with
    decode-everything -> NMS on the same raw head outputs."""
    from strongsort_yolo_tpu.ops.decode import decode_boxes, make_anchors
    from strongsort_yolo_tpu.ops.nms import nms_from_logits

    a = 8400
    anchors, strides = make_anchors([(80, 80), (40, 40), (20, 20)], (8, 16, 32))
    box_logits = jnp.asarray(rng.normal(0, 1, (a, 64)), jnp.float32)
    cls_logits = jnp.asarray(rng.normal(-6, 2, (a, 80)), jnp.float32)
    boxes = decode_boxes(box_logits, anchors, strides)
    scores = jax.nn.sigmoid(cls_logits)
    want = non_max_suppression(
        boxes, scores, conf_thres=0.3, iou_thres=0.4, max_det=64,
    )
    got = nms_from_logits(
        box_logits, cls_logits, anchors, strides,
        conf_thres=0.3, iou_thres=0.4, max_det=64, approx_topk=False,
    )
    assert int(got.count) == int(want.count)
    n = int(got.count)
    np.testing.assert_allclose(
        np.asarray(got.boxes[:n]), np.asarray(want.boxes[:n]), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(got.index[:n]), np.asarray(want.index[:n])
    )


def test_anchors_from_indices_matches_table():
    """Arithmetic anchors must equal make_anchors rows for every index,
    and nms_from_logits must be identical with/without the gather-free
    path (VERDICT r4 #3: the constant-table gathers ran 1461x off their
    bytes bound in the batched step)."""
    from strongsort_yolo_tpu.ops.decode import (
        anchors_from_indices,
        make_anchors,
    )
    from strongsort_yolo_tpu.ops.nms import nms_from_logits

    fhw = [(80, 80), (40, 40), (20, 20)]
    strides = (8, 16, 32)
    anchors, stride_t = make_anchors(fhw, strides)
    idx = jnp.arange(8400, dtype=jnp.int32)
    a2, s2 = anchors_from_indices(idx, fhw, strides)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(anchors))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(stride_t))

    r = np.random.default_rng(11)
    box_logits = jnp.asarray(r.normal(0, 1, (8400, 64)), jnp.float32)
    cls_logits = jnp.asarray(r.normal(-6, 2, (8400, 80)), jnp.float32)
    kw = dict(conf_thres=0.3, iou_thres=0.4, max_det=64)
    want = nms_from_logits(box_logits, cls_logits, anchors, stride_t, **kw)
    got = nms_from_logits(
        box_logits, cls_logits, anchors, stride_t,
        feat_dims=fhw, level_strides=strides, **kw,
    )
    assert int(got.count) == int(want.count)
    for f in ("boxes", "scores", "classes", "index", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)), f
        )


def test_topk_packed_bf16_matches_lax_topk():
    """The single-key packed sort (ops/nms._topk_packed_bf16) must
    reproduce jax.lax.top_k exactly on bf16 inputs — values AND the
    lower-index-first tie-break (it replaces the variadic f32+s32
    top_k sort in the TPU select path)."""
    from strongsort_yolo_tpu.ops.nms import _topk_packed_bf16

    rng = np.random.default_rng(11)
    for a, k in ((8400, 512), (8400, 32), (1000, 1000), (256, 64)):
        # coarse grid forces MANY exact bf16 ties; include +-inf-ish
        # extremes and long negative tails (masked-class logits)
        vals = rng.choice(
            np.asarray([-1e9, -5.0, -1.25, -0.5, 0.0, 0.5, 1.25, 7.0]),
            size=a,
        ).astype(np.float32)
        vals[rng.integers(0, a, 5)] = 88.0  # unique spikes
        x = jnp.asarray(vals, jnp.bfloat16)
        want_v, want_i = jax.lax.top_k(x.astype(jnp.float32), k)
        got_v, got_i = _topk_packed_bf16(x, k)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(
            np.asarray(got_v), np.asarray(want_v)
        )

    # dense continuous values (few ties) + batched via vmap
    x = jnp.asarray(rng.normal(0, 4, (8, 8400)), jnp.bfloat16)
    want_v, want_i = jax.lax.top_k(x.astype(jnp.float32), 512)
    got_v, got_i = jax.vmap(
        lambda r: _topk_packed_bf16(r, 512)
    )(x)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
