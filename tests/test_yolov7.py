"""YOLOv7 backend: shapes, RepConv reparameterization, pipeline-ready
output contract (SURVEY.md H8)."""

import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.models.yolov7 import (
    Yolov7Config,
    fuse_repconv,
    fuse_yolov7,
    init_repconv,
    init_yolov7,
    repconv_apply,
    yolov7_apply,
)


def test_repconv_fuse_exact(rng):
    p = init_repconv(jax.random.PRNGKey(0), 8, 16)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)), jnp.float32)
    want = repconv_apply(p, x)
    got = repconv_apply(fuse_repconv(p), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_yolov7_forward_and_fuse(rng):
    cfg = Yolov7Config()
    p = init_yolov7(jax.random.PRNGKey(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(p))
    assert 35e6 < n_params < 40e6  # published yolov7 ~36.9M
    x = jnp.asarray(rng.uniform(0, 1, (1, 160, 160, 3)), jnp.float32)
    out = yolov7_apply(p, x, cfg)
    a = 3 * (20 * 20 + 10 * 10 + 5 * 5)
    assert out["boxes"].shape == (1, a, 4)
    assert out["scores"].shape == (1, a, 80)
    s = np.asarray(out["scores"])
    assert s.min() >= 0.0 and s.max() <= 1.0
    fused = fuse_yolov7(p)
    out2 = yolov7_apply(fused, x, cfg)
    np.testing.assert_allclose(
        np.asarray(out2["boxes"]), np.asarray(out["boxes"]),
        rtol=1e-3, atol=2e-2,
    )
