"""Fused greedy-NMS Pallas kernel (SURVEY.md N5 / §7 step 3).

Replaces the reference stack's torchvision C++/CUDA NMS (invoked via
ultralytics postprocess, /root/reference/yolo_multi_model.py:18-21)
with one TPU kernel that keeps the entire suppression problem in VMEM:

- the (K, K) IoU matrix of the score-sorted candidates is built with
  VPU broadcasts straight from a (4, K) box layout (lane-major — K on
  the 128-wide lane axis);
- greedy suppression runs as the same fixpoint as ops/nms.py
  (`keep[i] = valid[i] & !any_{j<i}(keep[j] & iou[j,i] > t)`), but the
  per-iteration (1, K) x (K, K) contraction is an MXU matvec against a
  suppression matrix that never leaves VMEM — no HBM round trips
  between iterations, unlike the XLA while_loop version.

K is static (<= 512 so all intermediates fit comfortably in ~16 MB
VMEM). Interpret mode makes the kernel testable on CPU; results are
bit-identical to ops/nms.py's keep mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_keep_kernel(boxes_ref, conf_ref, out_ref, *, iou_thres, conf_thres, k):
    # boxes_ref: (4, K) f32 [x1, y1, x2, y2]; conf_ref: (1, K) f32
    x1r = boxes_ref[0:1, :]
    y1r = boxes_ref[1:2, :]
    x2r = boxes_ref[2:3, :]
    y2r = boxes_ref[3:4, :]
    x1c = jnp.transpose(x1r)
    y1c = jnp.transpose(y1r)
    x2c = jnp.transpose(x2r)
    y2c = jnp.transpose(y2r)

    inter_w = jnp.maximum(
        jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0
    )
    inter_h = jnp.maximum(
        jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0
    )
    inter = inter_w * inter_h  # (K, K)
    area_r = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)
    area_c = jnp.transpose(area_r)
    iou = inter / (area_c + area_r - inter + 1e-7)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    upper = row_ids < col_ids  # j (row of sup) earlier than i (col)
    sup = jnp.where(
        jnp.logical_and(iou > iou_thres, upper), 1.0, 0.0
    )  # sup[j, i]: earlier kept j kills i

    valid = conf_ref[0:1, :] >= conf_thres  # (1, K)
    keep0 = valid.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        killed = (
            jax.lax.dot_general(
                keep, sup,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            > 0.5
        )
        new_keep = jnp.where(
            jnp.logical_and(valid, jnp.logical_not(killed)), 1.0, 0.0
        )
        return new_keep, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
    )
    out_ref[0:1, :] = (keep > 0.5).astype(jnp.int32)


def _nms_keep_kernel_blockseq(
    boxes_ref, conf_ref, out_ref, *, iou_thres, conf_thres, k, block
):
    """Block-sequential form of the same greedy fixpoint (perf backlog:
    bound fixpoint cost on dense scenes).

    Greedy NMS is causal in score order — keep[i] depends only on kept
    j < i — so candidates can be decided 128 at a time: one cross
    matvec kills the block's candidates already suppressed by earlier
    kept blocks, then an intra-block fixpoint on the (B, B) diagonal
    of the suppression matrix resolves the block itself. Iteration
    cost drops from (1,K)x(K,K) per round to (1,B)x(B,B) (16x at
    K=512), and cross-block suppression is a single pass instead of
    re-converging globally. Bit-identical keep mask by construction.
    """
    x1r = boxes_ref[0:1, :]
    y1r = boxes_ref[1:2, :]
    x2r = boxes_ref[2:3, :]
    y2r = boxes_ref[3:4, :]
    x1c = jnp.transpose(x1r)
    y1c = jnp.transpose(y1r)
    x2c = jnp.transpose(x2r)
    y2c = jnp.transpose(y2r)
    inter = jnp.maximum(
        jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0
    ) * jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    area_r = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)
    area_c = jnp.transpose(area_r)
    iou = inter / (area_c + area_r - inter + 1e-7)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    sup = jnp.where(
        jnp.logical_and(iou > iou_thres, row_ids < col_ids), 1.0, 0.0
    )  # sup[j, i]: earlier kept j kills i

    valid = conf_ref[0:1, :] >= conf_thres  # (1, K)
    out_ref[0:1, :] = jnp.zeros((1, k), jnp.int32)

    for b in range(k // block):
        lo = b * block
        sup_cols = sup[:, lo:lo + block]  # (K, B) static slice
        valid_b = valid[:, lo:lo + block]
        kept = out_ref[0:1, :].astype(jnp.float32)  # decided so far
        killed_prev = (
            jax.lax.dot_general(
                kept, sup_cols,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            > 0.5
        )
        alive = jnp.logical_and(valid_b, jnp.logical_not(killed_prev))
        sup_bb = sup[lo:lo + block, lo:lo + block]  # (B, B)
        kb0 = alive.astype(jnp.float32)

        def cond(state):
            kb, prev, it = state
            return jnp.logical_and(jnp.any(kb != prev), it < block)

        def body(state):
            kb, _, it = state
            killed = (
                jax.lax.dot_general(
                    kb, sup_bb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                > 0.5
            )
            nk = jnp.where(
                jnp.logical_and(alive, jnp.logical_not(killed)), 1.0, 0.0
            )
            return nk, kb, it + 1

        kb, _, _ = jax.lax.while_loop(
            cond, body, (kb0, jnp.zeros_like(kb0), jnp.int32(0))
        )
        out_ref[0:1, lo:lo + block] = (kb > 0.5).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("iou_thres", "conf_thres", "interpret", "block_seq"),
)
def pallas_nms_keep(
    boxes: jnp.ndarray,  # (K, 4) score-desc-sorted candidate boxes
    conf: jnp.ndarray,  # (K,)
    *,
    iou_thres: float = 0.4,
    conf_thres: float = 0.3,
    interpret: bool = False,
    block_seq: bool = False,  # 128-wide block-sequential fixpoint
) -> jnp.ndarray:
    """-> (K,) bool keep mask, identical to ops/nms.py's fixpoint."""
    k = boxes.shape[0]
    assert k % 128 == 0 and k <= 512, (
        f"pallas NMS wants K in {{128, 256, 384, 512}}, got {k}"
    )
    boxes_t = jnp.transpose(boxes).astype(jnp.float32)  # (4, K)
    conf_2d = conf.reshape(1, k).astype(jnp.float32)
    if block_seq and k > 128:
        kernel = functools.partial(
            _nms_keep_kernel_blockseq,
            iou_thres=iou_thres, conf_thres=conf_thres, k=k, block=128,
        )
    else:
        kernel = functools.partial(
            _nms_keep_kernel, iou_thres=iou_thres, conf_thres=conf_thres, k=k
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=6 * k * k + 2 * k * k * 8,  # iou build + ~8 matvec rounds
            bytes_accessed=(4 * k + k + k) * 4 + k * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(boxes_t, conf_2d)
    return out[0] > 0
