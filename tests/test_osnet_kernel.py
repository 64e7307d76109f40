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
