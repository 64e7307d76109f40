"""Batched multi-stream execution: S video sources, one device program.

The reference fans out one OS process per source, each with its own
model copy (/root/reference/yolo_multi_model.py:353-354; SURVEY.md
§2.5 — "the ONLY first-party parallelism"). The TPU-native equivalent
batches streams into the leading axis of a single jitted step:

    frames (S, H, W, 3) -> vmapped [letterbox -> model -> NMS ->
    tracker-with-per-stream-state] -> per-stream outputs

One weight set, one compile; tracker state is a vmapped TrackState
pytree (leading axis S). On a multi-chip mesh the S axis is sharded
over 'dp' so each chip owns a contiguous block of streams and no
cross-chip communication happens at all (streams are independent —
the collective-free ideal layout; SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from strongsort_yolo_tpu.config import DetectorConfig
from strongsort_yolo_tpu.models.yolo import (
    YoloConfig, feat_hw, model_apply,
)
from strongsort_yolo_tpu.ops.boxes import scale_boxes
from strongsort_yolo_tpu.ops.decode import decode_boxes, make_anchors
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.nms import non_max_suppression
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.state import TrackState, init_track_state


class StreamBatch:
    """S synchronized streams at one resolution, stepped together."""

    def __init__(
        self,
        params: Any,
        model_cfg: YoloConfig,
        det_cfg: DetectorConfig,
        tracker_cfg: ByteTrackConfig,
        num_streams: int,
        src_hw: tuple[int, int],
        *,
        track_slots: int = 128,
        mesh=None,
    ):
        self.params = params
        self.num_streams = num_streams
        self.states = jax.vmap(lambda _: init_track_state(track_slots))(
            jnp.arange(num_streams)
        )
        size = det_cfg.imgsz
        lp = letterbox_params(*src_hw, size)
        anchors, strides = make_anchors(
            feat_hw((size, size), model_cfg.strides), model_cfg.strides
        )
        gain = jnp.float32(lp.gain)
        pad = jnp.asarray([lp.pad_x, lp.pad_y], jnp.float32)
        orig_hw = jnp.asarray(src_hw, jnp.float32)
        compute_dtype = jnp.bfloat16 if det_cfg.half else jnp.float32

        def one_stream_post(box_logits, cls_logits):
            boxes = decode_boxes(box_logits, anchors, strides, model_cfg.reg_max)
            scores = jax.nn.sigmoid(cls_logits)
            det = non_max_suppression(
                boxes, scores,
                conf_thres=det_cfg.conf, iou_thres=det_cfg.iou,
                max_det=det_cfg.max_det, agnostic=det_cfg.agnostic_nms,
            )
            return det._replace(
                boxes=jnp.where(
                    det.valid[:, None],
                    scale_boxes(det.boxes, gain, pad, orig_hw),
                    0.0,
                )
            )

        def step(params, states: TrackState, frames_u8):
            imgs = letterbox(frames_u8, lp, dtype=compute_dtype)  # (S,sz,sz,3)
            out = model_apply(params, imgs, model_cfg, compute_dtype=compute_dtype)
            dets = jax.vmap(one_stream_post)(
                out["box_logits"], out["cls_logits"]
            )
            states, touts = jax.vmap(
                lambda st, b, s, c, v: bytetrack_step(
                    st, b, s, c, v, tracker_cfg
                )
            )(states, dets.boxes, dets.scores, dets.classes, dets.valid)
            return states, dets, touts

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            stream_sh = NamedSharding(mesh, P("dp"))
            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(params, rep)
            self.states = jax.device_put(self.states, stream_sh)
            self._step = jax.jit(
                step,
                in_shardings=(rep, stream_sh, stream_sh),
                out_shardings=(stream_sh, stream_sh, stream_sh),
            )
        else:
            self._step = jax.jit(step)

    def step(self, frames: np.ndarray):
        """frames: (S, H, W, 3) uint8 -> (dets, track outputs), both
        with leading stream axis."""
        self.states, dets, touts = self._step(
            self.params, self.states, jnp.asarray(frames)
        )
        return dets, touts
