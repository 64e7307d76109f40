"""Numerics tests for the archived Pallas conv kernel
(tools/prof/conv_kernel.py — a documented MEASURED-NEGATIVE result:
XLA's conv emitter wins on every eligible shape, NOTES.md round-3
lessons; the product path is XLA-only, models/common.py). The kernel
is kept as runnable measurement collateral, so its numerics stay
tested: interpret mode on CPU vs `conv_apply`'s XLA path, plus
gradient correctness through the custom-VJP wrapper."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.prof import conv_kernel  # noqa: E402

from strongsort_yolo_tpu.models.common import (  # noqa: E402
    conv_apply,
    fuse_conv_bn,
    init_conv,
    init_conv2d_bias,
)


def _fused_params(key, c_in, c_out, k):
    p = init_conv(key, c_in, c_out, k)
    # Non-trivial BN stats so the folded bias/scale actually matter.
    kb, km, kv = jax.random.split(jax.random.fold_in(key, 1), 3)
    p["bn_bias"] = jax.random.normal(kb, (c_out,)) * 0.3
    p["bn_mean"] = jax.random.normal(km, (c_out,)) * 0.1
    p["bn_var"] = jnp.abs(jax.random.normal(kv, (c_out,))) + 0.5
    return fuse_conv_bn(p)


def _kernel(p, x, k, act):
    w = p["w"].astype(x.dtype)
    return conv_kernel.conv_act(
        x, w.reshape(k * k * w.shape[2], w.shape[3]), p["b"],
        k=k, act=act, interpret=True,
    )


# Shape classes the (archived) router targeted: (h, w, c_in, c_out, k)
CASES = [
    (40, 40, 32, 32, 3),   # C2f bottleneck convs
    (40, 40, 64, 80, 3),   # cls-tower entry
    (40, 40, 80, 80, 3),   # cls tower
    (40, 40, 96, 64, 1),   # C2f cv2
    (40, 40, 192, 64, 1),  # neck cv1 after concat
    (8, 200, 64, 64, 3),   # non-square plane, rows % 8 == 0
]


@pytest.mark.parametrize("h,w,c_in,c_out,k", CASES)
@pytest.mark.parametrize("act", [True, False])
def test_matches_xla_conv(h, w, c_in, c_out, k, act):
    key = jax.random.PRNGKey(h * 1000 + c_in * 10 + k)
    p = _fused_params(key, c_in, c_out, k)
    x = jax.random.normal(jax.random.fold_in(key, 7), (2, h, w, c_in))

    ref = conv_apply(p, x, act=act)
    got = _kernel(p, x, k, act)

    assert got.shape == ref.shape == (2, h, w, c_out)
    # f32 end to end: only summation order differs (9 partial MXU dots
    # vs XLA's conv reduction; epilogue in f32 vs input dtype).
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_matches_xla_conv_bf16():
    key = jax.random.PRNGKey(0)
    p = _fused_params(key, 64, 64, 3)
    x = jax.random.normal(key, (2, 40, 40, 64)).astype(jnp.bfloat16)

    ref = np.asarray(conv_apply(p, x)).astype(np.float32)
    got = np.asarray(_kernel(p, x, 3, True)).astype(np.float32)

    # bf16 storage: the kernel rounds once (f32 epilogue), the XLA path
    # rounds between conv and epilogue — allow ~1 bf16 ulp of slack.
    scale = np.maximum(np.abs(ref), 1.0)
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)


def test_multi_image_blocks_match_single():
    """n divisible by the block size: rolls wrap across image boundaries
    and must be masked exactly like same-padding."""
    key = jax.random.PRNGKey(11)
    p = _fused_params(key, 32, 32, 3)
    x = jax.random.normal(key, (8, 40, 40, 32))
    batched = _kernel(p, x, 3, True)
    singles = jnp.concatenate(
        [_kernel(p, x[i : i + 1], 3, True) for i in range(8)], axis=0
    )
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(singles), rtol=2e-5, atol=2e-5
    )


def test_grad_matches_xla():
    """custom-VJP backward == differentiating the XLA formulation."""
    key = jax.random.PRNGKey(5)
    p = init_conv2d_bias(key, 32, 16, 3)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 40, 40, 32))

    def loss_pallas(w, b):
        return jnp.sum(
            conv_kernel.conv_act(
                x, w.reshape(9 * 32, 16), b, k=3, act=True, interpret=True
            )
            ** 2
        )

    def loss_ref(w, b):
        return jnp.sum(
            conv_kernel._conv_ref(
                x, w.reshape(9 * 32, 16), b, 3, True
            )
            ** 2
        )

    gw, gb = jax.grad(loss_pallas, argnums=(0, 1))(p["w"], p["b"])
    gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(p["w"], p["b"])
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), rtol=1e-4, atol=1e-4)


def test_eligibility_rules():
    ok = conv_kernel.eligible
    assert ok((2, 80, 80, 64), 3, 1, 1, 1)
    assert ok((2, 40, 40, 192), 1, 1, 1, 1)
    assert not ok((2, 80, 80, 64), 3, 2, 1, 1)  # stride
    assert not ok((2, 80, 80, 64), 5, 1, 1, 1)  # kernel size
    assert not ok((2, 80, 80, 64), 3, 1, 2, 1)  # groups
    assert not ok((2, 20, 20, 64), 3, 1, 1, 1)  # small plane
    assert not ok((2, 80, 80, 256), 3, 1, 1, 1)  # wide channels
    assert not ok((2, 79, 79, 64), 3, 1, 1, 1)  # rows % 8
