"""Scratch: NMS kernel shootout — whole-K fixpoint vs block-sequential
(ops/pallas/nms_kernel.py block_seq) at K in {128, 256, 512} on sparse
(clustered) and adversarial dense-chain scenes.

Usage: python tools/prof/_prof_nms.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from strongsort_yolo_tpu.ops.pallas.nms_kernel import pallas_nms_keep  # noqa: E402

R = 50  # chained iterations per timing dispatch


def scenes(k):
    rng = np.random.default_rng(0)
    centers = rng.uniform(50, 1800, (12, 2))
    idx = rng.integers(0, 12, k)
    cx = centers[idx, 0] + rng.normal(0, 20, k)
    cy = centers[idx, 1] + rng.normal(0, 20, k)
    w = rng.uniform(20, 120, k)
    h = rng.uniform(20, 120, k)
    sparse = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
    t = np.arange(k, dtype=np.float32)
    chain = np.stack(
        [10 + 18 * t, np.full(k, 50.0), 10 + 18 * t + 40, np.full(k, 120.0)], 1
    )
    conf = np.linspace(0.99, 0.31, k).astype(np.float32)
    return {
        "sparse": (sparse.astype(np.float32), conf),
        "chain": (chain.astype(np.float32), conf),
    }


def bench(name, boxes, conf, block_seq):
    b = jnp.asarray(boxes)
    c = jnp.asarray(conf)

    @jax.jit
    def chainrun(b, c):
        def body(carry, _):
            keep = pallas_nms_keep(
                b + carry, c, iou_thres=0.4, conf_thres=0.3,
                block_seq=block_seq,
            )
            s = keep.astype(jnp.float32).sum()
            return carry + s * 1e-20, None

        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=R)
        return out

    out = chainrun(b, c)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = chainrun(b, c)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (3 * R)
    nkeep = int(
        pallas_nms_keep(b, c, iou_thres=0.4, conf_thres=0.3,
                        block_seq=block_seq).sum()
    )
    print(f"{name:>28}: {dt*1e6:8.1f} us/call  keep={nkeep}", flush=True)


for k in (128, 256, 512):
    for sname, (boxes, conf) in scenes(k).items():
        for bs in (False, True):
            if bs and k == 128:
                continue
            bench(f"K={k} {sname} block_seq={bs}", boxes, conf, bs)
