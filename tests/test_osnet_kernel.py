"""Fused OSNet stage kernel vs the XLA oracle (models/osnet).

The kernel (ops/pallas/osnet_kernel) must compute the SAME function as
the _os_block_apply / transition / conv5+GAP chain — BN folded, streams
lane-packed, gates stacked, stream-sum folded into conv3. f32 is tested
tight; the bf16 serving dtype via embedding cosine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strongsort_yolo_tpu.models import osnet as O
from strongsort_yolo_tpu.ops.pallas.osnet_kernel import (
    StageSpec,
    fold_stage,
    os_stage,
)


@pytest.fixture(scope="module")
def params():
    return O.init_osnet(jax.random.PRNGKey(7))  # x0_25: (16, 64, 96, 128)


def _oracle_stage(params, blk, ep, x, gap=False):
    x = O._os_block_apply(params[blk + "a"], x)
    x = O._os_block_apply(params[blk + "b"], x)
    if gap:
        x = O._relu_conv(params[ep], x)
        return jnp.mean(x, axis=(1, 2))
    return O._avgpool2(O._relu_conv(params[ep], x))


@pytest.mark.parametrize(
    "blk,ep,spec",
    [
        ("b2", "t2", StageSpec(32, 16, 16, 64, 16, "pool")),
        ("b3", "t3", StageSpec(16, 8, 64, 96, 24, "pool")),
        ("b4", "conv5", StageSpec(8, 4, 96, 128, 32, "gap")),
    ],
    ids=["stage2", "stage3", "stage4-gap"],
)
def test_stage_matches_oracle_f32(params, blk, ep, spec):
    rng = np.random.default_rng(hash(blk) % 2**31)
    x = jnp.asarray(
        rng.normal(0, 1, (64, spec.h, spec.w, spec.c_in)), jnp.float32
    )
    want = _oracle_stage(params, blk, ep, x, gap=spec.epilogue == "gap")
    folded = fold_stage(params[blk + "a"], params[blk + "b"], params[ep],
                        spec, wdtype=jnp.float32, tm=8)
    got = os_stage(x.transpose(0, 3, 1, 2), folded, spec=spec, tm=8,
                   interpret=True)
    if spec.epilogue != "gap":
        got = got.transpose(0, 2, 3, 1)  # kernels chain channel-major
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_full_embed_fused_matches_oracle(params):
    """osnet_apply(fused=True) == osnet_apply on real crop inputs,
    both dtypes; bf16 judged by embedding cosine (the quantity the
    tracker consumes)."""
    rng = np.random.default_rng(3)
    crops = jnp.asarray(rng.uniform(0, 1, (32, 128, 64, 3)), jnp.float32)
    ref = O.osnet_apply(params, crops)
    fus = O.osnet_apply(params, crops, fused=True, interpret=True)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                               atol=5e-4)

    ref16 = O.osnet_apply(params, crops, compute_dtype=jnp.bfloat16)
    fus16 = O.osnet_apply(params, crops, compute_dtype=jnp.bfloat16,
                          fused=True, interpret=True)
    cos = np.sum(np.asarray(ref16) * np.asarray(fus16), axis=-1)
    assert cos.min() > 0.995, cos.min()
    # and both bf16 routes stay close to the f32 truth
    cos_f = np.sum(np.asarray(ref) * np.asarray(fus16), axis=-1)
    assert cos_f.min() > 0.99, cos_f.min()


def test_fused_packed_stem_route(params):
    """The serving combination: packed s2d crops + fused stages."""
    from strongsort_yolo_tpu.ops.pack import space_to_depth

    rng = np.random.default_rng(5)
    crops = jnp.asarray(rng.uniform(0, 1, (16, 128, 64, 3)), jnp.float32)
    packed = space_to_depth(crops)
    ref = O.osnet_apply(params, crops, channel_order="bgr")
    fus = O.osnet_apply(params, packed, packed_input=True,
                        channel_order="bgr", fused=True, interpret=True)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                               atol=5e-4)


def test_stem_norm_fold_exact(params):
    """stem(normalize(x)) == the folded form (weights/std + the
    border-corrected constant map) — both crop geometries, f32."""
    from strongsort_yolo_tpu.models.common import bn_act
    from strongsort_yolo_tpu.models.osnet import (
        BN_EPS,
        _stem_norm_folded,
    )
    from strongsort_yolo_tpu.ops.pack import (
        pack_stem7_weight,
        space_to_depth,
    )

    rng = np.random.default_rng(9)
    crops = jnp.asarray(rng.uniform(0, 1, (6, 128, 64, 3)), jnp.float32)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    stem = dict(params["stem"])

    # unpacked: normalize -> 7x7/2 conv -> BN -> relu
    xn = (crops - mean) / std
    want = jax.nn.relu(
        bn_act(
            stem,
            jax.lax.conv_general_dilated(
                xn, stem["w"], (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            eps=BN_EPS, act=False,
        )
    )
    got = _stem_norm_folded(stem, crops, mean, std, packed_input=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)

    # packed: s2d crops -> transition-form stem
    packed = space_to_depth(crops)
    xnp = (packed - jnp.repeat(mean, 4)) / jnp.repeat(std, 4)
    want_p = jax.nn.relu(
        bn_act(
            stem,
            jax.lax.conv_general_dilated(
                xnp, pack_stem7_weight(stem["w"]), (1, 1),
                [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            eps=BN_EPS, act=False,
        )
    )
    got_p = _stem_norm_folded(stem, packed, mean, std, packed_input=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=3e-5, rtol=1e-5)
    # and the two geometries agree with each other (exact repack)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(got),
                               atol=3e-5, rtol=1e-5)
