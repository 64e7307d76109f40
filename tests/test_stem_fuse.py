"""Letterbox-into-stem fold (ops/stem_fuse.py) — exactness tests.

The fold must compute the SAME function as letterbox -> packed stem:
it is a trace-time algebraic rewrite, not an approximation. f32 CPU
against the plain path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from strongsort_yolo_tpu.models import common as C
from strongsort_yolo_tpu.models.yolo import (
    YoloConfig, fuse_model, init_model, model_apply,
)
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.pack import fuse_stem_s2d, pack_backbone_prefix
from strongsort_yolo_tpu.ops.stem_fuse import (
    fused_stem_apply, stem_fuse_plan,
)

# 192x108 is 1920x1080 at 1/10 scale: same 16:9 exact-3x-decimation
# letterbox geometry (size 64 -> new 64x36, bars 14 rows)
SRC_H, SRC_W, SIZE = 108, 192, 64


def _stem6(rng, co=16):
    p = C.init_conv(jax.random.PRNGKey(11), 3, co, 3)
    p["bn_mean"] = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    p["bn_var"] = jnp.asarray(rng.uniform(0.5, 2.0, (co,)), jnp.float32)
    return fuse_stem_s2d(p)


def test_plan_1080p_geometry():
    lp = letterbox_params(1080, 1920, 640)
    plan = stem_fuse_plan(lp, 1080, 1920)
    assert plan is not None
    assert (plan.sy, plan.sx) == (3, 3)
    assert (plan.i_lo, plan.i_hi) == (35, 125)
    assert (plan.h_out, plan.w_out) == (160, 160)
    # every band tap stays inside the padded frame
    assert plan.pad_top == 5 and plan.pad_left == 5


def test_plan_rejects_non_decimation_geometries():
    # 720p -> 640: 0.5x on one axis but 720/1280 gives new 640x360...
    # actually gain=0.5 IS even decimation -> blended taps -> None
    assert stem_fuse_plan(letterbox_params(720, 1280, 640), 720, 1280) is None
    # square source: no vertical bars (top=0 < 4)
    assert stem_fuse_plan(letterbox_params(64, 64, 64), 64, 64) is None
    # portrait: horizontal bars not supported
    assert stem_fuse_plan(letterbox_params(192, 108, 64), 192, 108) is None


def test_fused_stem_matches_letterbox_then_stem(rng):
    frame = jnp.asarray(
        rng.integers(0, 255, (SRC_H, SRC_W, 3), dtype=np.uint8)
    )
    lp = letterbox_params(SRC_H, SRC_W, SIZE)
    plan = stem_fuse_plan(lp, SRC_H, SRC_W)
    assert plan is not None and (plan.sy, plan.sx) == (3, 3)

    stem6 = _stem6(rng)
    img = letterbox(frame, lp, dtype=jnp.float32)  # 64x64 RGB [0,1]
    ref = C.conv_apply(stem6, img[None], stride=4, pad=2)[0]
    fused = fused_stem_apply(stem6, frame, plan, dtype=jnp.float32)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_fused_stem_batched(rng):
    frames = jnp.asarray(
        rng.integers(0, 255, (3, SRC_H, SRC_W, 3), dtype=np.uint8)
    )
    lp = letterbox_params(SRC_H, SRC_W, SIZE)
    plan = stem_fuse_plan(lp, SRC_H, SRC_W)
    stem6 = _stem6(rng)
    imgs = letterbox(frames, lp, dtype=jnp.float32)
    ref = C.conv_apply(stem6, imgs, stride=4, pad=2)
    fused = fused_stem_apply(stem6, frames, plan, dtype=jnp.float32)
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_identity_plan_on_pre_resized_input(rng):
    """The pipeline's actual path: MXU resize first, then the fused
    stem on the resized bars-free image (sy=sx=1 plan)."""
    from strongsort_yolo_tpu.ops.letterbox import resize_bilinear_matmul

    frame = jnp.asarray(
        rng.integers(0, 255, (SRC_H, SRC_W, 3), dtype=np.uint8)
    )
    lp = letterbox_params(SRC_H, SRC_W, SIZE)
    plan = stem_fuse_plan(lp, lp.new_h, lp.new_w)
    assert plan is not None and (plan.sy, plan.sx) == (1, 1)

    stem6 = _stem6(rng)
    ref = C.conv_apply(
        stem6, letterbox(frame, lp, dtype=jnp.float32)[None],
        stride=4, pad=2,
    )[0]
    resized = resize_bilinear_matmul(
        frame.astype(jnp.float32), lp.new_h, lp.new_w
    )
    fused = fused_stem_apply(stem6, resized, plan, dtype=jnp.float32)
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_model_apply_with_stem_out_matches_packed(rng):
    """Full forward from stem_out == packed forward on the letterboxed
    image (the pipeline wiring contract)."""
    cfg = YoloConfig(family="v8", scale="n", task="detect")
    params = fuse_model(init_model(jax.random.PRNGKey(0), cfg))
    frame = jnp.asarray(
        rng.integers(0, 255, (SRC_H, SRC_W, 3), dtype=np.uint8)
    )
    lp = letterbox_params(SRC_H, SRC_W, SIZE)
    plan = stem_fuse_plan(lp, SRC_H, SRC_W)
    pp = pack_backbone_prefix(params["backbone"])

    img = letterbox(frame, lp, dtype=jnp.float32)
    ref = model_apply(params, img[None], cfg, packed_prefix=pp)
    stem_out = fused_stem_apply(pp["stem6"], frame, plan, dtype=jnp.float32)
    out = model_apply(
        params, None, cfg, packed_prefix=pp, stem_out=stem_out[None]
    )
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=1e-4, atol=1e-4, err_msg=k
        )
