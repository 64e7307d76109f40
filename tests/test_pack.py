"""Space-to-depth packed execution (ops/pack.py) — exactness tests.

The packed prefix must compute the SAME function as the unpacked
model: packing is a TPU layout optimization, not an approximation.
All tests run f32 on CPU against the plain implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strongsort_yolo_tpu.models import common as C
from strongsort_yolo_tpu.models.yolo import (
    YoloConfig, fuse_model, init_model, model_apply,
)
from strongsort_yolo_tpu.ops.pack import (
    depth_to_space,
    fuse_stem_s2d,
    pack_backbone_prefix,
    pack_conv3_weight,
    pack_conv_params,
    pack_pointwise_weight,
    space_to_depth,
)


def _conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_s2d_layout_channel_major(rng):
    """out[..., I, J, c*4 + oy*2 + ox] == x[..., 2I+oy, 2J+ox, c]."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)), jnp.float32)
    y = space_to_depth(x)
    for c in range(3):
        for oy in range(2):
            for ox in range(2):
                np.testing.assert_array_equal(
                    y[0, :, :, c * 4 + oy * 2 + ox],
                    x[0, oy::2, ox::2, c],
                )


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("ci,co", [(3, 16), (16, 32), (32, 32)])
def test_pack_conv3_exact(rng, stride, ci, co):
    h = w = 16
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.1, jnp.float32)
    ref = _conv(x, wgt, stride=stride)
    packed = _conv(space_to_depth(x), pack_conv3_weight(wgt, stride),
                   stride=stride)
    np.testing.assert_allclose(
        depth_to_space(packed), ref, rtol=1e-5, atol=1e-5
    )


def test_pack_pointwise_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(1, 1, 16, 24)) * 0.1, jnp.float32)
    ref = _conv(x, wgt, pad=0)
    packed = _conv(space_to_depth(x), pack_pointwise_weight(wgt), pad=0)
    np.testing.assert_allclose(
        depth_to_space(packed), ref, rtol=1e-5, atol=1e-5
    )


def test_pack_conv_params_bn_form(rng):
    """Unfused conv+BN dicts pack too (BN vectors repeat per position)."""
    p = C.init_conv(jax.random.PRNGKey(3), 8, 16, 3)
    # make BN non-trivial
    p["bn_mean"] = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    p["bn_var"] = jnp.asarray(rng.uniform(0.5, 2.0, (16,)), jnp.float32)
    p["bn_scale"] = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 8)), jnp.float32)
    ref = C.conv_apply(p, x)
    packed = C.conv_apply(pack_conv_params(p, stride=1), space_to_depth(x))
    np.testing.assert_allclose(
        depth_to_space(packed), ref, rtol=1e-4, atol=1e-5
    )


def test_pack_transition_exact(rng):
    """2x2 transition conv on the packed tensor == 3x3/s2 conv on the
    unpacked tensor (the packed->unpacked downsample hand-off)."""
    from strongsort_yolo_tpu.ops.pack import pack_transition_params

    ci, co = 8, 12
    x = jnp.asarray(rng.normal(size=(2, 16, 20, ci)), jnp.float32)
    p = C.init_conv(jax.random.PRNGKey(7), ci, co, 3)
    p["bn_mean"] = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    p["bn_var"] = jnp.asarray(rng.uniform(0.5, 2.0, (co,)), jnp.float32)
    ref = C.conv_apply(p, x, stride=2)  # (2, 8, 10, co)
    got = C.conv_apply(
        pack_transition_params(p), space_to_depth(x), pad=(1, 0)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_p3_path_model_equivalence(rng):
    """Full packed-P3 model == unpacked — covers down3 transition,
    packed td2, repeat4 upsample, bu1 transition, packed head towers
    + output d2s. (Opt-in path: measured net-negative on v5e, see
    pack_p3_path docstring — exactness still guaranteed.)"""
    from strongsort_yolo_tpu.ops.pack import pack_p3_path

    cfg = YoloConfig(family="v8", scale="n", task="detect")
    params = fuse_model(init_model(jax.random.PRNGKey(2), cfg))
    pp3 = pack_p3_path(params, cfg)
    assert pp3 is not None
    x = jnp.asarray(rng.uniform(0, 1, (1, 96, 64, 3)), jnp.float32)
    ref = model_apply(params, x, cfg, pack=False)
    out = model_apply(params, x, cfg, pack=True, packed_p3=pp3)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=1e-4, atol=1e-4, err_msg=k
        )


def test_fuse_stem_s2d_exact(rng):
    """conv6x6/s4/p2(x, W'') == packed-stem(s2d(x)) == plain stem(x)."""
    ci, co = 3, 16
    x = jnp.asarray(rng.normal(size=(2, 24, 32, ci)), jnp.float32)
    p = C.init_conv(jax.random.PRNGKey(5), ci, co, 3)
    p["bn_mean"] = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    p["bn_var"] = jnp.asarray(rng.uniform(0.5, 2.0, (co,)), jnp.float32)

    ref = C.conv_apply(p, x, stride=2)                       # (2,12,16,co)
    packed = C.conv_apply(
        pack_conv_params(p, stride=2), space_to_depth(x), stride=2
    )
    fused = C.conv_apply(fuse_stem_s2d(p), x, stride=4, pad=2)
    np.testing.assert_allclose(fused, packed, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        depth_to_space(fused), ref, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("family", ["v8", "v11"])
@pytest.mark.parametrize("fused", [True, False])
def test_packed_model_apply_equals_unpacked(rng, family, fused):
    cfg = YoloConfig(family=family, scale="n", task="detect")
    params = init_model(jax.random.PRNGKey(0), cfg)
    if fused:
        params = fuse_model(params)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    ref = model_apply(params, x, cfg, pack=False)
    out = model_apply(params, x, cfg, pack=True)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=1e-4, atol=1e-4, err_msg=k
        )


def test_packed_prefix_params_cover_all_convs():
    """pack_backbone_prefix transforms every conv dict it receives
    (guards against silently passing through unpacked weights)."""
    cfg = YoloConfig(family="v8", scale="n", task="detect")
    bb = fuse_model(init_model(jax.random.PRNGKey(0), cfg))["backbone"]
    packed = pack_backbone_prefix(bb)

    def check(node, orig):
        if isinstance(node, dict):
            if "w" in node and node["w"].ndim == 4:
                assert node["w"].shape[2] == 4 * orig["w"].shape[2]
                assert node["w"].shape[3] == 4 * orig["w"].shape[3]
            else:
                for k in node:
                    check(node[k], orig[k])
        elif isinstance(node, list):
            for a, b in zip(node, orig):
                check(a, b)

    for key in packed:
        if key == "stem6":  # s2d-fused: (6,6,ci,4co) on the RAW frame
            assert packed[key]["w"].shape == (
                6, 6, bb["stem"]["w"].shape[2], 4 * bb["stem"]["w"].shape[3]
            )
            continue
        check(packed[key], bb[key])


@pytest.mark.parametrize("fused", [True, False])
def test_packed_v7_prefix_equals_plain(rng, fused):
    """yolov7_apply(packed_prefix=pack_v7_prefix(p)) == plain forward:
    the s2d-fused 6x6/s2 stem0, packed stem1/stem2, and the down2
    transition re-index the exact same math (ops/pack.pack_v7_prefix)."""
    from strongsort_yolo_tpu.models.yolov7 import (
        Yolov7Config, fuse_yolov7, init_yolov7, yolov7_apply,
    )
    from strongsort_yolo_tpu.ops.pack import pack_v7_prefix

    cfg = Yolov7Config()
    params = init_yolov7(jax.random.PRNGKey(2), cfg)
    if fused:
        params = fuse_yolov7(params)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 160, 3)), jnp.float32)
    ref = yolov7_apply(params, x, cfg)
    out = yolov7_apply(params, x, cfg, packed_prefix=pack_v7_prefix(params))
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=1e-4, atol=1e-4, err_msg=k
        )


def test_pack_stem7_transition_exact(rng):
    """4x4 transition conv on the packed tensor == 7x7/s2 'same' conv
    on the unpacked tensor (the OSNet-stem fold,
    ops/pack.pack_stem7_weight)."""
    from strongsort_yolo_tpu.ops.pack import pack_stem7_weight

    ci, co = 3, 16
    x = jnp.asarray(rng.normal(size=(2, 128, 64, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, ci, co)), jnp.float32) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (2, 64, 32, co)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x), pack_stem7_weight(w), (1, 1),
        [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_crop_and_resize_packed_is_s2d_of_plain(rng):
    """crop_and_resize_packed == space_to_depth(crop_and_resize):
    identical samples, packed layout, no unpacked intermediate."""
    from strongsort_yolo_tpu.ops.crops import (
        crop_and_resize, crop_and_resize_packed,
    )

    img = jnp.asarray(rng.uniform(0, 1, (96, 120, 3)), jnp.float32)
    boxes = jnp.asarray(
        [[10.0, 5.0, 60.0, 90.0], [30.5, 22.25, 48.0, 41.5],
         [0.0, 0.0, 120.0, 96.0], [80.0, 60.0, 81.0, 61.0]],
        jnp.float32,
    )
    for ds in (1, 2):
        ref = space_to_depth(
            crop_and_resize(img, boxes, (32, 16), downscale=ds)
        )
        got = crop_and_resize_packed(img, boxes, (32, 16), downscale=ds)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_osnet_packed_input_equals_plain(rng):
    """osnet_apply(packed crops, packed_input=True) == the plain path:
    the packed crop layout + transition stem is exact end-to-end."""
    from strongsort_yolo_tpu.models.osnet import (
        OsnetConfig, init_osnet, osnet_apply,
    )
    from strongsort_yolo_tpu.ops.crops import (
        crop_and_resize, crop_and_resize_packed,
    )

    cfg = OsnetConfig(variant="osnet_x0_25")
    params = init_osnet(jax.random.PRNGKey(3), cfg)
    img = jnp.asarray(rng.uniform(0, 1, (128, 160, 3)), jnp.float32)
    boxes = jnp.asarray(
        [[12.0, 8.0, 70.0, 120.0], [40.0, 30.0, 90.0, 100.0]], jnp.float32
    )
    ref = osnet_apply(params, crop_and_resize(img, boxes, (128, 64)))
    got = osnet_apply(
        params, crop_and_resize_packed(img, boxes, (128, 64)),
        packed_input=True,
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
