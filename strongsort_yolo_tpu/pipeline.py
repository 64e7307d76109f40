"""End-to-end per-frame pipeline: one jitted step per stream.

This is the TPU-native inversion of the reference's
``process(image, track)`` (/root/reference/yolo_multi_model.py:29-240,
SURVEY.md §3.3): instead of a Python walk over result objects with a
host sync per field, the entire critical path —

    letterbox → backbone/neck/head → DFL decode → NMS →
    coordinate rescale → (masks / keypoints) → tracker update

— is ONE fixed-shape XLA program (`Pipeline._make_step`). The host
only: feeds raw frames, computes the optional GMC warp, and receives
one padded result bundle per frame (a single device→host transfer).

``Results``/``Boxes``/``Masks``/``Keypoints`` mirror the ultralytics
result surface the reference consumes (SURVEY.md D7:
``.boxes{.conf,.cls,.xyxy,.id}``, ``.masks.xy``, ``.keypoints.xy``,
``.names``) so reference users can port their walking code unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from strongsort_yolo_tpu.config import DetectorConfig, load_tracker_config
from strongsort_yolo_tpu.models.yolo import (
    YoloConfig,
    build_model,
    feat_hw,
    fuse_model,
    init_model,
    model_apply,
)
from strongsort_yolo_tpu.ops.decode import make_anchors
from strongsort_yolo_tpu.ops.keypoints import decode_keypoints, scale_keypoints
from strongsort_yolo_tpu.ops.letterbox import letterbox, letterbox_params
from strongsort_yolo_tpu.ops.masks import masks_to_polygons, process_masks
from strongsort_yolo_tpu.ops.nms import nms_from_logits, non_max_suppression
from strongsort_yolo_tpu.ops.boxes import scale_boxes
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig, bytetrack_step
from strongsort_yolo_tpu.track.strongsort import StrongSortConfig, strongsort_step
from strongsort_yolo_tpu.track.gmc import make_gmc
from strongsort_yolo_tpu.track.state import init_track_state
from strongsort_yolo_tpu.utils.coco_names import COCO_NAMES


# ---------------------------------------------------------------------------
# Results API (ultralytics-surface parity, SURVEY.md D7)
# ---------------------------------------------------------------------------


class Boxes:
    """Rows of detections/tracks: .xyxy (n,4), .conf (n,), .cls (n,),
    .id (n,) or None. Iterating yields single-row Boxes (the reference
    iterates ``predictions.boxes`` then zips fields —
    yolo_multi_model.py:125-126)."""

    def __init__(self, xyxy, conf, cls, id=None):
        self.xyxy = np.asarray(xyxy, np.float32).reshape(-1, 4)
        self.conf = np.asarray(conf, np.float32).reshape(-1)
        self.cls = np.asarray(cls, np.float32).reshape(-1)
        self.id = None if id is None else np.asarray(id, np.float32).reshape(-1)

    def __len__(self):
        return len(self.conf)

    def __iter__(self):
        for i in range(len(self)):
            yield Boxes(
                self.xyxy[i : i + 1],
                self.conf[i : i + 1],
                self.cls[i : i + 1],
                None if self.id is None else self.id[i : i + 1],
            )


class Masks:
    """.xy — list of (P, 2) polygons in original frame coords; .data —
    (n, Hm, Wm) float mask array."""

    def __init__(self, xy, data=None):
        self.xy = xy
        self.data = data

    def __len__(self):
        return len(self.xy)


class Keypoints:
    """.xy (n, K, 2) and .conf (n, K) — invisible keypoints are the
    rows with conf < 0.5 (the reference sees them as (0, 0);
    ``xy_masked`` reproduces exactly that)."""

    def __init__(self, data):
        self.data = np.asarray(data, np.float32)  # (n, K, 3)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def conf(self):
        return self.data[..., 2]

    @property
    def xy_masked(self):
        vis = self.data[..., 2:3] >= 0.5
        return np.where(vis, self.data[..., :2], 0.0)

    def __len__(self):
        return len(self.data)

    def __iter__(self):
        for i in range(len(self.data)):
            yield Keypoints(self.data[i : i + 1])


class Results:
    """One frame's results: .boxes, .masks, .keypoints, .names."""

    def __init__(self, boxes, names, masks=None, keypoints=None, orig_img=None):
        self.boxes = boxes
        self.masks = masks
        self.keypoints = keypoints
        self.names = names
        self.orig_img = orig_img

    def __len__(self):
        return 0 if self.boxes is None else len(self.boxes)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


class _StepSet:
    """Compiled step functions for one source resolution.

    The ``*_flow`` variants exist when gmc_method == "flow_tpu": they
    carry the previous grayscale frame through the SAME jitted program
    and estimate the GMC warp in-jit (track/gmc_tpu.py). One program
    matters beyond dispatch count: alternating two large executables
    through the axon tunnel measured ~100ms/switch, annihilating the
    1.5ms warp kernel."""

    __slots__ = (
        "detect_step", "track_step", "track_chunk", "batch_step", "lp",
        "track_step_flow", "track_chunk_flow", "batch_step_flow",
    )

    def __init__(self, detect_step, track_step, track_chunk, batch_step, lp,
                 track_step_flow=None, track_chunk_flow=None,
                 batch_step_flow=None):
        self.detect_step = detect_step
        self.track_step = track_step
        self.track_chunk = track_chunk
        self.batch_step = batch_step
        self.lp = lp
        self.track_step_flow = track_step_flow
        self.track_chunk_flow = track_chunk_flow
        self.batch_step_flow = batch_step_flow


class Pipeline:
    """Per-stream detect/track pipeline with a jit cache per source
    resolution (static shapes — SURVEY.md §7 hard part #1)."""

    def __init__(
        self,
        det_cfg: DetectorConfig = DetectorConfig(),
        tracker: str | ByteTrackConfig | StrongSortConfig = "botsort.yaml",
        *,
        params: Any | None = None,
        model_cfg: YoloConfig | None = None,
        track_slots: int = 256,
        seed: int = 0,
        names: dict[int, str] | None = None,
        reid_weights: str | None = None,  # OSNet variant name or ckpt
        reid_params: Any | None = None,
        reid_topk: int = 128,  # dets embedded per frame (fixed shape)
        reid_banded: bool | None = None,  # banded-pyramid crop sampling
        # (round 4): each crop contracts against a fixed (256, 512)
        # band of a per-crop pyramid level instead of the FULL ds2
        # frame (ops/crops.py banded section). None = auto: the Pallas
        # kernel (ops/pallas/crop_kernel.py) on TPU, the jit-able
        # stacked-pyramid einsum elsewhere — identical semantics, and
        # identical to the classic dense path for every box whose ds2
        # span fits a band (persons always do). False = legacy dense.
        reid_packed: bool | None = None,  # space-to-depth crop/stem path
        # (ops/crops.crop_and_resize_packed + the OSNet stem in
        # transition form). None = auto-enable on TPU, where the
        # unpacked (M, 128, 64, 3) crop tensor costs a measured
        # ~460us/dispatch layout copy at S=16 (NOTES.md); exact math
        # either way.
        reid_cadence: int = 1,  # appearance refresh cadence (round 5):
        # in the batched packed-embed path, stream s contributes crops
        # only on ticks where (s + tick) % cadence == 0 — the EMA bank
        # tolerates stale features (alpha=0.9), and skip frames
        # associate motion-only (strongsort_step has_app). 1 = every
        # frame (exact StrongSORT). >1 trades appearance freshness for
        # ~cadence-fold less OSNet work; quality deltas measured on the
        # occlusion-relay clip (BASELINE.md round-5). StrongSORT only.
        tracker_max_dets: int = 128,  # dets fed to association (the NMS
        # output is confidence-sorted, so the top rows are exact; this
        # bounds the auction problem size independently of max_det).
        # Measured cost of raising it (v5e, 1080p, ~45-det load,
        # tools/prof/_prof_maxdets.py): 256 is ~free batched (+1% S=16)
        # and -9% single-stream; 512 costs ~10-13%. Scenes denser than
        # the limit trip the truncated_dets counter + app WARN — raise
        # the limit there (the reference feeds every det above
        # track_low_thresh to the tracker, max_det=1000).
    ):
        self.det_cfg = det_cfg
        import os

        if model_cfg is not None:
            self.model_cfg = model_cfg
        elif not os.path.exists(det_cfg.weights) and det_cfg.weights.lower().startswith("yolov5"):
            from strongsort_yolo_tpu.models.yolov5 import build_v5

            self.model_cfg = build_v5(det_cfg.weights)
        elif not os.path.exists(det_cfg.weights) and det_cfg.weights.lower().startswith("yolov7"):
            from strongsort_yolo_tpu.models.yolov7 import Yolov7Config

            self.model_cfg = Yolov7Config()
        else:
            self.model_cfg = (
                None if os.path.exists(det_cfg.weights) else build_model(det_cfg.weights)
            )
        if params is None:
            if os.path.exists(det_cfg.weights):
                from strongsort_yolo_tpu.models.porting import load_checkpoint

                params, cfg_loaded, names_loaded = load_checkpoint(det_cfg.weights)
                self.model_cfg = cfg_loaded
                names = names or names_loaded
            elif self._is_v5:
                from strongsort_yolo_tpu.models.yolov5 import init_yolov5

                params = init_yolov5(jax.random.PRNGKey(seed), self.model_cfg)
            elif self._is_v7:
                from strongsort_yolo_tpu.models.yolov7 import init_yolov7

                params = init_yolov7(jax.random.PRNGKey(seed), self.model_cfg)
            else:
                params = init_model(jax.random.PRNGKey(seed), self.model_cfg)
        if det_cfg.fuse:
            if self._is_v7:
                from strongsort_yolo_tpu.models.yolov7 import fuse_yolov7

                params = fuse_yolov7(params)  # RepConv reparam + BN fold
            else:
                params = fuse_model(params)
        if det_cfg.quant == "int8":
            from strongsort_yolo_tpu.ops.quant import quantize_model

            if not det_cfg.fuse:
                raise ValueError("quant='int8' requires fuse=True")
            params, n_q = quantize_model(params)
            if n_q == 0:
                raise ValueError(
                    "quant='int8' found no fused convs to quantize"
                )
        elif det_cfg.quant is not None:
            raise ValueError(f"unknown quant mode {det_cfg.quant!r}")
        self.params = params
        self.names = names or dict(COCO_NAMES)
        self.tracker_cfg = (
            tracker
            if isinstance(tracker, (ByteTrackConfig, StrongSortConfig))
            else load_tracker_config(tracker)
        )
        self.is_strongsort = isinstance(self.tracker_cfg, StrongSortConfig)
        needs_reid = self.is_strongsort or self.tracker_cfg.with_reid
        self.reid_cfg = None
        self.reid_params = None
        self.reid_topk = reid_topk
        self.reid_banded = reid_banded
        from strongsort_yolo_tpu.ops.runtime import target_platform

        self.reid_packed = (
            target_platform() == "tpu"
            if reid_packed is None
            else reid_packed
        )
        if reid_cadence < 1:
            raise ValueError("reid_cadence must be >= 1")
        self.reid_cadence = int(reid_cadence)
        feat_dim = 1
        if needs_reid:
            from strongsort_yolo_tpu.models.osnet import (
                OsnetConfig, init_osnet,
            )

            if reid_params is not None:
                self.reid_cfg = OsnetConfig(
                    variant=reid_weights or "osnet_x0_25"
                )
                self.reid_params = reid_params
            elif reid_weights and os.path.exists(reid_weights):
                if reid_weights.endswith(".npz"):
                    # framework-native checkpoint (tools/train_osnet.py)
                    from strongsort_yolo_tpu.models.osnet import (
                        load_osnet_npz,
                    )

                    self.reid_params, self.reid_cfg = load_osnet_npz(
                        reid_weights
                    )
                else:
                    # torchreid .pt/.pth checkpoint (SURVEY.md H1)
                    from strongsort_yolo_tpu.models.porting import (
                        load_reid_checkpoint,
                    )

                    self.reid_params, self.reid_cfg = load_reid_checkpoint(
                        reid_weights
                    )
            else:
                self.reid_cfg = OsnetConfig(
                    variant=reid_weights or "osnet_x0_25"
                )
                self.reid_params = init_osnet(
                    jax.random.PRNGKey(seed + 1), self.reid_cfg
                )
            feat_dim = self.reid_cfg.feat_dim
        self.track_slots = track_slots
        self.tracker_max_dets = tracker_max_dets
        self.feat_dim = feat_dim
        self.track_state = init_track_state(track_slots, feat_dim=feat_dim)
        if self.is_strongsort:
            gmc_method = self.tracker_cfg.gmc_method
        elif self.tracker_cfg.tracker_type == "botsort":
            gmc_method = self.tracker_cfg.gmc_method
        else:
            gmc_method = "none"
        self.gmc = make_gmc(gmc_method)
        # flow_tpu threaded state (previous gray frame, device)
        self._flow_gray = None
        self._flow_has = False
        self.compute_dtype = jnp.bfloat16 if det_cfg.half else jnp.float32
        self._steps: dict[tuple[int, int], Any] = {}

    @property
    def _is_v5(self):
        from strongsort_yolo_tpu.models.yolov5 import Yolov5Config

        return isinstance(self.model_cfg, Yolov5Config)

    @property
    def _is_v7(self):
        from strongsort_yolo_tpu.models.yolov7 import Yolov7Config

        return isinstance(self.model_cfg, Yolov7Config)

    # -- jitted step construction --------------------------------------

    def _class_filter(self):
        if self.det_cfg.classes is None:
            return None
        mask = np.zeros((self.model_cfg.nc,), bool)
        mask[list(self.det_cfg.classes)] = True
        return jnp.asarray(mask)

    def _make_step(self, src_hw: tuple[int, int], reid_topk=None,
                   reid_pack_slots=None):
        cfg = self.model_cfg
        det_cfg = self.det_cfg
        size = det_cfg.imgsz
        lp = letterbox_params(*src_hw, size)
        anchors, strides = make_anchors(feat_hw((size, size), cfg.strides), cfg.strides)
        gain = jnp.float32(lp.gain)
        pad = jnp.asarray([lp.pad_x, lp.pad_y], jnp.float32)
        orig_hw = jnp.asarray(src_hw, jnp.float32)
        class_filter = self._class_filter()
        tracker_cfg = self.tracker_cfg
        compute_dtype = self.compute_dtype

        if self._is_v5:
            from strongsort_yolo_tpu.models.yolov5 import yolov5_apply as model_fn
        elif self._is_v7:
            from strongsort_yolo_tpu.models.yolov7 import yolov7_apply as model_fn
        else:
            model_fn = model_apply

        # space-to-depth packed prefix (ops/pack.py): exact weight
        # re-indexing that runs the small-channel high-res stages at
        # half spatial / 4x channels — MXU-shaped. Measured on the v5e:
        # +24% throughput on the S-stream batched step, but a net LOSS
        # at batch 1 (40x40 single-frame stages underfill the chip and
        # the 3x3 taps cost 4x the FLOPs) — so it is enabled for
        # batch_step only. The transform is computed once per dispatch,
        # hoisted out of the vmap body.
        from strongsort_yolo_tpu.ops.runtime import target_platform

        is_v8family = not self._is_v5 and not self._is_v7
        use_pack = (
            is_v8family and size % 4 == 0 and target_platform() != "cpu"
        )
        # v7 keeps two full-resolution stride-1 stem convs; packing
        # them (ops/pack.pack_v7_prefix) removes the 640x640x32 layout
        # copies the round-3 profile flagged. Measured (v5e, 1080p):
        # step device time 3340 -> 2410 us/frame; single-stream 275 ->
        # 355 fps, S=16 534 -> 580 fps/chip (NOTES.md).
        from strongsort_yolo_tpu.ops import runtime

        use_pack_v7 = (
            self._is_v7
            and size % 4 == 0
            and runtime.target_platform() == "tpu"
        )

        def _packed_prefix(params):
            """(prefix, p3-path) packed params — hoisted out of the
            vmap body so the weight transforms run once per dispatch.
            p3-path is None when cfg doesn't allow (ops/pack.pack_p3_path)."""
            if use_pack_v7:
                from strongsort_yolo_tpu.ops.pack import pack_v7_prefix

                return (pack_v7_prefix(params), None)
            if not use_pack:
                return None
            from strongsort_yolo_tpu.ops.pack import (
                pack_backbone_prefix, pack_p3_path,
            )

            # pack_p3_path measured net-negative on the v5e (see its
            # docstring) — prefix-only packing is the enabled config
            del pack_p3_path
            return (pack_backbone_prefix(params["backbone"]), None)

        # letterbox bars/normalize folded into the stem conv
        # (ops/stem_fuse.py): the packed path resizes on the MXU and
        # feeds the RAW-range BGR result straight to the stem — the
        # gray bars, /255, BGR->RGB and the 640x640 pad are never
        # materialized. None when geometry doesn't allow.
        from strongsort_yolo_tpu.ops.stem_fuse import stem_fuse_plan

        fuse_plan = (
            stem_fuse_plan(lp, lp.new_h, lp.new_w) if use_pack else None
        )

        # resize route (round 5, SSYT_RESIZE): "kernelp" — the planar
        # Pallas decimation kernel — is the TPU default. It reads the
        # staged u8 frame batch in the layout it already has on device
        # ((0,3,1,2): B-major, channel-planar — the transpose into the
        # kernel is a free bitcast), decimates rows as static sublane
        # reads and columns as one-hot MXU dots per channel plane.
        # Interleaved same-process A/B at S=64 ByteTrack (v5e,
        # tools/prof/_prof_resize_ab.py, 6 blocks each): kernelp
        # 22.66 ms/dispatch vs dense 23.59 (+4.1% fps). Falls back to
        # the dense matmul when the geometry is not pure decimation.
        # Measured losers kept for reference: "planar" (channel-planar
        # einsums, 23.62 ms — XLA re-interleaves anyway) and "kernel"
        # (the row-major contiguous-read kernel: 1.34 ms of kernel time
        # but ~3.5 ms of XLA layout copies to its operand).
        import os as _os

        resize_route = _os.environ.get(
            "SSYT_RESIZE",
            "kernelp" if target_platform() == "tpu" else "dense",
        )

        def _resize_frames(frames_u8):
            """(..., H, W, 3) uint8 -> (..., new_h, new_w, 3) compute
            dtype, raw 0..255 BGR (the packed stem consumes raw range).

            Dense-matmul baseline for non-TPU: every CHEAP decimation
            alternative was re-measured SLOWER at S=32 in round 3
            (index-mapped Pallas blocks 12 ms — strided-row DMA bound;
            conv1x1/s3 5.9 ms; strided slice 21 ms; matmul 1.28
            in-step)."""
            if (lp.new_h, lp.new_w) == tuple(src_hw):
                return frames_u8.astype(compute_dtype)
            from strongsort_yolo_tpu.ops.letterbox import (
                resize_bilinear_matmul,
                resize_bilinear_matmul_planar,
            )

            if resize_route == "planar" and frames_u8.ndim == 4:
                return resize_bilinear_matmul_planar(
                    frames_u8, lp.new_h, lp.new_w, dtype=compute_dtype
                )
            if (resize_route in ("kernel", "kernelp")
                    and frames_u8.dtype == jnp.uint8
                    and target_platform() == "tpu"):
                from strongsort_yolo_tpu.ops.pallas.resize_kernel import (
                    decimate_resize_contig,
                    decimate_resize_planar,
                    decimation_plan,
                )

                if decimation_plan(*src_hw, lp.new_h, lp.new_w) is not None:
                    fn = (decimate_resize_planar
                          if resize_route == "kernelp"
                          else decimate_resize_contig)
                    batch_shape = frames_u8.shape[:-3]
                    x = frames_u8.reshape((-1,) + frames_u8.shape[-3:])
                    out = fn(x, lp.new_h, lp.new_w, dtype=compute_dtype)
                    return out.reshape(batch_shape + out.shape[1:])
            return resize_bilinear_matmul(
                frames_u8.astype(compute_dtype), lp.new_h, lp.new_w
            )

        def model_forward(params, frames_u8, packed=None, resized=None):
            """Raw batched forward: (B, H, W, 3) uint8 BGR -> head
            outputs with a leading batch axis.

            Runs UNVMAPPED even in the multi-stream step so XLA sees a
            true batch-B convolution stack: a batch-1 conv inside a
            per-stream vmap gets [S,1,H,W,C] batch-in-sublane layouts
            that ran the conv+SiLU fusions 3-6x off roofline at S=32
            (round-3 device profile — 5.1 ms of an 11.6 ms step)."""
            if packed is not None and fuse_plan is not None:
                from strongsort_yolo_tpu.ops.stem_fuse import (
                    fused_stem_apply,
                )

                prefix, p3path = packed
                if resized is None:
                    x = _resize_frames(frames_u8)  # BGR, 0..255
                else:
                    x = resized  # flow_tpu already resized (shared luma)
                stem_out = fused_stem_apply(
                    prefix["stem6"], x, fuse_plan, dtype=compute_dtype,
                )
                return model_fn(
                    params, None, cfg, compute_dtype=compute_dtype,
                    packed_prefix=prefix, stem_out=stem_out,
                    packed_p3=p3path,
                    out_dtype=None,  # nms_from_logits casts candidates
                )
            img = letterbox(frames_u8, lp, dtype=compute_dtype)
            if is_v8family:
                kw = {"pack": False} if packed is None else {
                    "packed_prefix": packed[0],
                    "packed_p3": packed[1]}
                kw["out_dtype"] = None
            elif self._is_v7 and packed is not None:
                kw = {"packed_prefix": packed[0]}
            else:
                kw = {}
            return model_fn(
                params, img, cfg, compute_dtype=compute_dtype, **kw
            )

        def postprocess(out, extras_k: int | None = None):
            """One frame's head outputs (NO leading batch axis) ->
            (det, extras). extras_k caps how many detection rows get
            masks/keypoints computed: in track mode only the top
            ``tracker_max_dets`` rows can ever be referenced by a
            track (NMS output is confidence-sorted), so extras for
            rows beyond that are wasted HBM — (max_det, 160, 160)
            mask tensors dominate the step's memory otherwise."""
            if "boxes" in out:  # anchor-based v5/v7: already decoded
                det = non_max_suppression(
                    out["boxes"],
                    out["scores"],
                    conf_thres=det_cfg.conf,
                    iou_thres=det_cfg.iou,
                    max_det=det_cfg.max_det,
                    agnostic=det_cfg.agnostic_nms,
                    class_filter=class_filter,
                )
            else:
                # fused fast path: select candidates before DFL decode
                det = nms_from_logits(
                    out["box_logits"],
                    out["cls_logits"],
                    anchors,
                    strides,
                    reg_max=cfg.reg_max,
                    conf_thres=det_cfg.conf,
                    iou_thres=det_cfg.iou,
                    max_det=det_cfg.max_det,
                    agnostic=det_cfg.agnostic_nms,
                    class_filter=class_filter,
                    # arithmetic per-candidate anchors/strides instead
                    # of constant-table gathers (ops/decode.py)
                    feat_dims=feat_hw((size, size), cfg.strides),
                    level_strides=cfg.strides,
                )
            boxes_orig = scale_boxes(det.boxes, gain, pad, orig_hw)
            det = det._replace(boxes=jnp.where(det.valid[:, None], boxes_orig, 0.0))
            ek = det_cfg.max_det if extras_k is None else extras_k
            idx = det.index[:ek]
            valid = det.valid[:ek]
            extras = {}
            if cfg.task == "pose":
                kpt_rows = out["kpt_raw"][idx]
                kpts = decode_keypoints(
                    kpt_rows, anchors[idx], strides[idx], cfg.kpt[0]
                )
                extras["keypoints"] = scale_keypoints(kpts, gain, pad, orig_hw)
            elif cfg.task == "segment":
                coef_rows = out["mask_coef"][idx]
                extras["masks"] = process_masks(
                    coef_rows, out["proto"],
                    # crop in model-input coords
                    jnp.where(valid[:, None],
                              det.boxes[:ek] * gain + jnp.concatenate([pad, pad]),
                              0.0),
                    (size, size),
                )
            return det, extras

        def detect(params, frame_u8, extras_k: int | None = None,
                   packed=None, resized=None):
            """Single-frame detect: batched forward on [None] + the
            per-frame postprocess (identical program to the pre-split
            version — the model always saw a batch-1 input here)."""
            out = model_forward(
                params, frame_u8[None], packed=packed,
                resized=None if resized is None else resized[None],
            )
            out = jax.tree.map(lambda a: a[0], out)
            return postprocess(out, extras_k)

        @jax.jit
        def detect_step(params, frame_u8):
            return detect(params, frame_u8)

        reid_params = self.reid_params
        reid_cfg = self.reid_cfg
        reid_topk = min(
            self.reid_topk if reid_topk is None else reid_topk,
            det_cfg.max_det,
        )
        is_strongsort = self.is_strongsort
        t_max = min(self.tracker_max_dets, det_cfg.max_det)

        reid_packed = (
            self.reid_packed
            and reid_cfg is not None
            and reid_cfg.crop_hw[0] % 2 == 0
            and reid_cfg.crop_hw[1] % 2 == 0
        )

        # banded-pyramid crop routing (see Pipeline.__init__ docstring)
        reid_banded = self.reid_banded
        if reid_banded is None:
            reid_banded = True
        # target_platform (NOT jax.default_backend): the program may be
        # staged for a CPU mesh under an ambient TPU plugin (multichip
        # dryrun) — the Pallas kernel must follow the TARGET backend
        from strongsort_yolo_tpu.ops.runtime import target_platform

        banded_kernel = reid_banded and target_platform() == "tpu"

        # fused OSNet stage kernels (round 5): MEASURED NEGATIVE, OFF
        # by default. The VMEM-resident Pallas stage kernels
        # (ops/pallas/osnet_kernel) eliminate the ~30 HBM activation
        # traversals per OS block, but the in-step A/B
        # (tools/prof/_prof_osnet_step_ab.py, S=16/32 fixed128) runs
        # 0.51x: OSNet-x0_25's depthwise 3x3 stencils are a VPU
        # op-count floor (~4.5-5 ms at G=2048 crops) that XLA's conv
        # emitter already sits near — the embed was never actually
        # HBM-bound once the round-4/5 crop+pack work landed. Kernel +
        # exactness tests kept as the record (NOTES round-5);
        # SSYT_OSNET=fused re-enables for re-measurement.
        import os as _os2

        reid_fused = (
            _os2.environ.get("SSYT_OSNET", "xla") == "fused"
            and target_platform() == "tpu"
        )

        needs_reid = reid_cfg is not None and (
            is_strongsort or tracker_cfg.with_reid
        )
        # embed cadence (round 5): the batched packed step takes an
        # extra (S,) embed_mask input and skip streams associate
        # motion-only. StrongSORT only: its stage-1 cost has the
        # explicit has_app fallback; BoT-SORT's min(iou, emb) form has
        # no per-frame appearance gate to relax.
        masked_embed = (
            reid_pack_slots is not None
            and needs_reid
            and self.reid_cadence > 1
        )
        if masked_embed and not is_strongsort:
            raise ValueError(
                "reid_cadence > 1 is only supported with StrongSORT "
                "trackers (BoT-SORT keeps cadence 1)"
            )

        def embed_batch(frames_u8, dets):
            """Crop-gather + OSNet embed for the top-k dets of a BATCH
            of frames in one device pass (SURVEY.md H1 — no per-det
            loops, and since round 4 no per-FRAME loops either: the
            crop sampler and the embedder both see the full B*topk
            batch, outside any vmap/scan). frames (B, H, W, 3) uint8;
            dets fields (B, max_det, ...). -> (B, max_det, feat)."""
            from strongsort_yolo_tpu.models.osnet import osnet_apply
            from strongsort_yolo_tpu.ops.crops import (
                crop_and_resize,
                crop_and_resize_packed,
                crop_and_resize_pyramid,
            )
            from strongsort_yolo_tpu.ops.pack import space_to_depth

            b = frames_u8.shape[0]
            boxes = dets.boxes[:, :reid_topk]
            imgs = frames_u8.astype(compute_dtype) / 255.0
            if banded_kernel:
                from strongsort_yolo_tpu.ops.pallas.crop_kernel import (
                    banded_crop,
                )

                crops = banded_crop(imgs, boxes, reid_cfg.crop_hw)
                if reid_packed:
                    crops = space_to_depth(crops)
            elif reid_banded:
                crops = jax.vmap(
                    lambda im, bx: crop_and_resize_pyramid(
                        im, bx, reid_cfg.crop_hw
                    )
                )(imgs, boxes)
                if reid_packed:
                    crops = space_to_depth(crops)
            else:  # legacy dense ds2 form (reid_banded=False)
                crop_fn = (
                    crop_and_resize_packed if reid_packed else crop_and_resize
                )
                crops = jax.vmap(
                    lambda im, bx: crop_fn(im, bx, reid_cfg.crop_hw)
                )(imgs, boxes)
            # frames are BGR (cv2 convention); torchreid weights expect
            # RGB — reversed trace-time inside osnet_apply, free
            feats = osnet_apply(
                reid_params,
                crops.reshape(b * reid_topk, *crops.shape[2:]),
                compute_dtype=compute_dtype,
                packed_input=reid_packed,
                channel_order="bgr",
                fused=reid_fused,
            ).reshape(b, reid_topk, -1)
            feats = jnp.where(dets.valid[:, :reid_topk, None], feats, 0.0)
            if reid_topk < det_cfg.max_det:
                feats = jnp.pad(
                    feats,
                    ((0, 0), (0, det_cfg.max_det - reid_topk), (0, 0)),
                )
            return feats

        # packed cross-stream embed (VERDICT r4 #1): the fixed-width
        # form crops+embeds B*reid_topk slots regardless of load — at
        # S=64/topk=128 that is 8192 HBM-bound OSNet crop slots for
        # ~2900 real dets, which made the StrongSORT aggregate SHRINK
        # past S=16 (954→883→871 fps/chip). The packed form gathers the
        # REAL dets of all streams into ONE dense G-slot crop batch
        # (each stream's count padded to a PACK_G multiple so every
        # kernel block stays single-frame), embeds once, and scatters
        # features back per stream. G is a static total-count bucket;
        # BatchedPipeline's auto_topk ladder picks it with the same
        # exact replay-on-overflow guarantee as the width ladder.
        PACK_G = 8  # slot-group quantum == crop kernel g_crops

        def embed_batch_packed(frames_u8, dets, n_slots, embed_mask=None):
            """frames (S, H, W, 3) uint8; dets fields (S, max_det, ...);
            n_slots: static total crop-slot budget G (PACK_G multiple).
            -> (S, max_det, feat); rows beyond each stream's real count
            are zero, EXACTLY like embed_batch's invalid-row masking.
            Slot overflow (padded total > G) leaves the overflowed
            streams' tail rows zero — the caller (BatchedPipeline)
            detects it from det counts and replays at a bigger G, so
            committed results never see a truncated embed.

            embed_mask: optional (S,) bool — streams with False
            contribute ZERO crop slots this tick (embed-cadence skip;
            their feature rows come back all-zero and the tracker tail
            associates them motion-only via ``has_app``)."""
            from strongsort_yolo_tpu.models.osnet import osnet_apply
            from strongsort_yolo_tpu.ops.pack import space_to_depth
            from strongsort_yolo_tpu.ops.pallas.crop_kernel import (
                banded_crop_packed,
            )

            S = frames_u8.shape[0]
            G = int(n_slots)
            cap = min(reid_topk, t_max)
            i32 = jnp.int32
            valid = dets.valid[:, :cap]  # (S, cap) — prefix mask
            if embed_mask is not None:
                valid = jnp.logical_and(valid, embed_mask[:, None])
            n_s = jnp.sum(valid, axis=1).astype(i32)  # (S,)
            padded = ((n_s + PACK_G - 1) // PACK_G) * PACK_G
            off = jnp.concatenate(
                [jnp.zeros(1, i32), jnp.cumsum(padded)[:-1]]
            )  # (S,) start slot per stream
            p = jnp.arange(G, dtype=i32)
            # slot -> stream: count of offsets <= p, minus 1 (streams
            # with zero slots share an offset with their successor and
            # correctly own nothing)
            slot_stream = jnp.sum(
                (p[:, None] >= off[None, :]).astype(i32), axis=1
            ) - 1
            total = jnp.sum(padded)
            in_rng = p < total
            slot_stream = jnp.where(
                in_rng, jnp.clip(slot_stream, 0, S - 1), 0
            )
            # per-slot stream fields via a masked one-hot reduce (tiny
            # (G, S) mask; avoids (G,)-indexed gathers, which scalarize
            # inside big fused programs — NOTES.md round-2 lesson)
            oh_s = slot_stream[:, None] == jnp.arange(S, dtype=i32)[None, :]
            off_sel = jnp.sum(jnp.where(oh_s, off[None, :], 0), axis=1)
            n_sel = jnp.sum(jnp.where(oh_s, n_s[None, :], 0), axis=1)
            slot_row = jnp.where(in_rng, p - off_sel, 0)
            slot_real = in_rng & (slot_row < n_sel)

            # pack boxes by SCATTER (unique targets: one slot per
            # valid det; invalid dets land on the dropped G row)
            boxes_flat = dets.boxes[:, :cap].reshape(S * cap, 4).astype(
                jnp.float32
            )
            r = jnp.arange(cap, dtype=i32)
            tgt = jnp.where(valid, off[:, None] + r[None, :], G)
            boxes_g = (
                jnp.tile(jnp.asarray([[0.0, 0.0, 16.0, 32.0]]), (G + 1, 1))
                .at[tgt.reshape(-1)]
                .set(boxes_flat, mode="drop")[:G]
            )

            imgs = frames_u8.astype(compute_dtype) / 255.0
            crops = banded_crop_packed(
                imgs, boxes_g, slot_stream, reid_cfg.crop_hw,
                g_crops=PACK_G,
                interpret=target_platform() != "tpu",
            )  # (G, ch, cw, 3)
            if reid_packed:
                crops = space_to_depth(crops)
            feats_g = osnet_apply(
                reid_params,
                crops,
                compute_dtype=compute_dtype,
                packed_input=reid_packed,
                channel_order="bgr",
                fused=reid_fused,
            )  # (G, feat)
            feats_g = jnp.where(slot_real[:, None], feats_g, 0.0)
            # scatter features back to (S, cap, feat); dummy slots
            # target the dropped trailing row. Size the scatter buffer
            # by cap, NOT max_det: a dynamic scatter into an
            # (S*max_det, fd) buffer forces XLA to materialize the
            # full (S, 1000, 512) zeros every tick (~28 MB at S=16) —
            # the pad below is static, so the downstream [:t_max]
            # slice folds it away
            fd = feats_g.shape[1]
            flat_tgt = jnp.where(
                slot_real, slot_stream * cap + slot_row, S * cap
            )
            feats = (
                jnp.zeros((S * cap + 1, fd), feats_g.dtype)
                .at[flat_tgt]
                .set(feats_g, mode="drop")[: S * cap]
                .reshape(S, cap, fd)
            )
            if cap < det_cfg.max_det:
                feats = jnp.pad(
                    feats, ((0, 0), (0, det_cfg.max_det - cap), (0, 0))
                )
            return feats

        def feats_for(frames_u8, dets, embed_mask=None):
            """(B, max_det, feat) ReID features, or None when the
            tracker runs motion-only."""
            if not needs_reid:
                return None
            if reid_pack_slots is not None:
                return embed_batch_packed(
                    frames_u8, dets, reid_pack_slots, embed_mask
                )
            return embed_batch(frames_u8, dets)

        def _stack_det(det):
            return jax.tree.map(lambda a: a[None], det)

        def _scan_tail(params, track_state, frames_u8, dets, extras,
                       warps, feats):
            """lax.scan of _assoc_tail over the leading (time) axis;
            feats is None for motion-only trackers (static)."""
            if feats is None:
                def step(st, inp):
                    frame, det, ex, warp = inp
                    st, _d, tout, ex2 = _assoc_tail(
                        params, st, frame, det, ex, warp
                    )
                    return st, (tout, ex2)

                xs = (frames_u8, dets, extras, warps)
            else:
                def step(st, inp):
                    frame, det, ex, warp, ft = inp
                    st, _d, tout, ex2 = _assoc_tail(
                        params, st, frame, det, ex, warp, feats=ft
                    )
                    return st, (tout, ex2)

                xs = (frames_u8, dets, extras, warps, feats)
            return jax.lax.scan(step, track_state, xs)

        def _vmap_tail(params, track_states, frames_u8, dets, extras,
                       warps, feats, has_app=None):
            """vmap of _assoc_tail over the stream axis. has_app:
            optional (S,) bool — per-stream embed-cadence flag."""
            if feats is None:
                return jax.vmap(
                    lambda st, f, d, e, w: _assoc_tail(
                        params, st, f, d, e, w
                    )
                )(track_states, frames_u8, dets, extras, warps)
            if has_app is not None:
                return jax.vmap(
                    lambda st, f, d, e, w, ft, ha: _assoc_tail(
                        params, st, f, d, e, w, feats=ft, has_app=ha
                    )
                )(track_states, frames_u8, dets, extras, warps, feats,
                  has_app)
            return jax.vmap(
                lambda st, f, d, e, w, ft: _assoc_tail(
                    params, st, f, d, e, w, feats=ft
                )
            )(track_states, frames_u8, dets, extras, warps, feats)

        # GMC off => skip apply_warp at TRACE time: the warp input is
        # ignored and XLA never emits the per-slot covariance
        # transform (256 batched 8x8 matmuls/frame — measurable)
        use_warp = self.gmc.method != "none"

        def _assoc_tail(params, track_state, frame_u8, det, extras, warp,
                        feats=None, has_app=None):
            """Everything after embedding: associate → lifecycle.
            Shared by the single-stream body and the batched step; the
            crop+embed runs OUTSIDE (feats_for) as one true batch
            program — this tail is the only vmapped/scanned part."""
            warp = warp if use_warp else None
            # association sees the top tracker_max_dets rows (exact:
            # NMS output is confidence-sorted); dets that ranked below
            # the cut are counted so crowding is observable
            # (StreamStats.truncated_dets / the truncated_dets event)
            tb, ts = det.boxes[:t_max], det.scores[:t_max]
            tc, tv = det.classes[:t_max], det.valid[:t_max]
            n_trunc = jnp.sum(det.valid[t_max:]).astype(jnp.int32)
            if is_strongsort:
                track_state, out = strongsort_step(
                    track_state, tb, ts, tc, tv, feats[:t_max],
                    tracker_cfg, warp=warp, has_app=has_app,
                )
            else:
                track_state, out = bytetrack_step(
                    track_state, tb, ts, tc, tv, tracker_cfg,
                    det_feats=(
                        feats[:t_max] if feats is not None else None
                    ),
                    warp=warp,
                )
            track_state = track_state._replace(
                truncated_dets=track_state.truncated_dets + n_trunc
            )
            return track_state, det, out, extras

        def _track_body(params, track_state, frame_u8, warp, packed=None,
                        resized=None):
            """One frame's full track step: detect → (embed) →
            associate. Extras (masks/keypoints) are computed for the
            top ``tracker_max_dets`` rows — the only rows a track's
            ``det_index`` can reference."""
            det, extras = detect(params, frame_u8, extras_k=t_max,
                                 packed=packed, resized=resized)
            feats = feats_for(frame_u8[None], _stack_det(det))
            return _assoc_tail(params, track_state, frame_u8, det,
                               extras, warp,
                               feats=None if feats is None else feats[0])

        track_step = jax.jit(_track_body)

        @jax.jit
        def track_chunk(params, track_state, frames_u8, warps):
            """Offline/throughput mode: T frames in ONE dispatch —
            identical sequential semantics to T track_step calls, but
            host dispatch overhead is amortized T-fold AND detection
            is frame-independent, so the model forward runs as ONE
            batch-T program before the scan (batch-1 convs inside the
            scan body were the single-stream throughput ceiling);
            only the stateful tracker tail scans. frames_u8:
            (T, H, W, 3); warps: (T, 2, 3). Raw detections are not
            stacked out — only track outputs + extras leave the scan
            (the (T, max_det, ...) det tensors are dead weight)."""
            packed = _packed_prefix(params)
            out = model_forward(params, frames_u8, packed=packed)
            dets, extras = jax.vmap(lambda o: postprocess(o, t_max))(out)
            feats = feats_for(frames_u8, dets)  # batch-T, before the scan
            track_state, (outs, extras) = _scan_tail(
                params, track_state, frames_u8, dets, extras, warps, feats
            )
            return track_state, outs, extras

        # batched multi-stream step: ONE true batch-S model forward
        # (unvmapped — see model_forward), then vmap only the per-frame
        # postprocess and the tracker tail over the stream axis
        # (params broadcast) — per-stream GMC warps and seg/pose extras
        # ride along; the ReID crop+embed runs as ONE (S*topk)-batch
        # program before the vmap (SURVEY.md §2.5 DP: streams are
        # independent, so the batch is collective-free)
        if masked_embed:
            @jax.jit
            def batch_step(params, track_states, frames_u8, warps,
                           embed_mask):
                packed = _packed_prefix(params)
                out = model_forward(params, frames_u8, packed=packed)
                dets, extras = jax.vmap(
                    lambda o: postprocess(o, t_max)
                )(out)
                feats = feats_for(frames_u8, dets, embed_mask)
                return _vmap_tail(
                    params, track_states, frames_u8, dets, extras,
                    warps, feats, has_app=embed_mask,
                )
        else:
            @jax.jit
            def batch_step(params, track_states, frames_u8, warps):
                packed = _packed_prefix(params)  # hoisted out of the vmap
                out = model_forward(params, frames_u8, packed=packed)
                dets, extras = jax.vmap(lambda o: postprocess(o, t_max))(out)
                feats = feats_for(frames_u8, dets)
                return _vmap_tail(
                    params, track_states, frames_u8, dets, extras, warps,
                    feats
                )

        if self.gmc.method != "flow_tpu":
            return _StepSet(
                detect_step, track_step, track_chunk, batch_step, lp
            )

        # flow_tpu (track/gmc_tpu.py): estimate the warp IN the step —
        # the previous gray frame + a has-prev flag are threaded state
        from strongsort_yolo_tpu.track import gmc_tpu

        sx = src_hw[1] / gmc_tpu.BASE_W
        sy = src_hw[0] / gmc_tpu.BASE_H

        def _estimate(prev_gray, gray, has_prev):
            # optimization_barrier fences the LK subgraph off from the
            # surrounding program: without it XLA's layout assignment
            # for the big fused program scalarizes the bilinear-sample
            # gathers (measured 112ms per gather pass vs ~0.1ms when
            # the same HLO compiles standalone)
            prev_gray, gray = jax.lax.optimization_barrier(
                (prev_gray, gray)
            )
            ident = jnp.asarray(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32
            )
            est = gmc_tpu.estimate_warp(
                prev_gray, gray, scale_x=sx, scale_y=sy
            )
            warp = jnp.where(has_prev, est, ident)
            return jax.lax.optimization_barrier(warp)

        def _flow_body(params, track_state, frame_u8, prev_gray, has_prev,
                       packed=None):
            if packed is not None and fuse_plan is not None:
                # share the detector's letterbox-scale resize with the
                # gray pyramid: one full-resolution pass instead of two
                # (the second 1080p luma+resize cost ~0.9 ms/step at
                # S=16 — NOTES.md round-2 perf backlog)
                resized = _resize_frames(frame_u8)  # BGR, 0..255
                gray = gmc_tpu.gray_from_resized(resized)
            else:
                resized = None
                gray = gmc_tpu.frame_to_gray(frame_u8)
            warp = _estimate(prev_gray, gray, has_prev)
            st, det, out, extras = _track_body(
                params, track_state, frame_u8, warp, packed=packed,
                resized=resized,
            )
            return st, det, out, extras, gray

        track_step_flow = jax.jit(_flow_body)

        @jax.jit
        def track_chunk_flow(params, track_state, frames_u8, prev_gray,
                             has_prev):
            # warps depend only on consecutive frame PAIRS — all known
            # up front, so they are estimated VMAPPED before the scan.
            # (Running the LK inside the scan was measured ~7ms/frame:
            # 36 sequential Gauss-Newton steps of tiny ops are latency-
            # bound; vmapped across the chunk they amortize to ~1.5ms
            # total.) Like track_chunk, the model forward runs batch-T
            # before the scan, sharing its resize with the gray pyramid.
            packed = _packed_prefix(params)
            if packed is not None and fuse_plan is not None:
                resized = _resize_frames(frames_u8)
                grays = gmc_tpu.gray_from_resized(resized)
            else:
                resized = None
                grays = gmc_tpu.frame_to_gray(frames_u8)
            prevs = jnp.concatenate([prev_gray[None], grays[:-1]])
            hp = jnp.concatenate(
                [has_prev[None], jnp.ones((grays.shape[0] - 1,), bool)]
            )
            est = jax.vmap(_estimate)(prevs, grays, hp)
            out = model_forward(params, frames_u8, packed=packed,
                                resized=resized)
            dets, extras = jax.vmap(lambda o: postprocess(o, t_max))(out)
            feats = feats_for(frames_u8, dets)
            track_state, (outs, extras) = _scan_tail(
                params, track_state, frames_u8, dets, extras, est, feats
            )
            return track_state, outs, extras, grays[-1]

        def _batch_flow_body(params, track_states, frames_u8, prev_grays,
                             has_prev, embed_mask=None):
            """Batched flow_tpu step: the resize, gray pyramid, and
            model forward all run as true batch-S programs; only the
            LK estimate, postprocess, and tracker tail are vmapped."""
            packed = _packed_prefix(params)
            if packed is not None and fuse_plan is not None:
                resized = _resize_frames(frames_u8)
                grays = gmc_tpu.gray_from_resized(resized)
            else:
                resized = None
                grays = gmc_tpu.frame_to_gray(frames_u8)
            est = jax.vmap(_estimate)(prev_grays, grays, has_prev)
            out = model_forward(params, frames_u8, packed=packed,
                                resized=resized)
            dets, extras = jax.vmap(lambda o: postprocess(o, t_max))(out)
            feats = feats_for(frames_u8, dets, embed_mask)
            sts, dets, touts, ex = _vmap_tail(
                params, track_states, frames_u8, dets, extras, est,
                feats, has_app=embed_mask,
            )
            return sts, dets, touts, ex, grays

        if masked_embed:
            @jax.jit
            def batch_step_flow(params, track_states, frames_u8,
                                prev_grays, has_prev, embed_mask):
                return _batch_flow_body(params, track_states, frames_u8,
                                        prev_grays, has_prev, embed_mask)
        else:
            @jax.jit
            def batch_step_flow(params, track_states, frames_u8,
                                prev_grays, has_prev):
                return _batch_flow_body(params, track_states, frames_u8,
                                        prev_grays, has_prev)

        return _StepSet(
            detect_step, track_step, track_chunk, batch_step, lp,
            track_step_flow, track_chunk_flow, batch_step_flow,
        )

    def _get_step(self, src_hw, reid_topk=None, reid_pack_slots=None):
        key = (src_hw, reid_topk, reid_pack_slots)
        if key not in self._steps:
            self._steps[key] = self._make_step(
                src_hw, reid_topk=reid_topk, reid_pack_slots=reid_pack_slots
            )
        return self._steps[key]

    # -- host-facing API -------------------------------------------------

    def calibrate_int8(self, frames) -> int:
        """Static activation-scale calibration for the int8 path
        (quant='int8' / quantize_model'd params): run the detect step
        EAGERLY over the given BGR frames, record each quantized
        conv's input abs-max, and inject per-layer ``xscale`` leaves —
        after this the in-step quantize is a fused elementwise chain
        instead of a per-conv reduction pass (measured -19% step cost
        for the dynamic form). Returns the number of calibrated convs.
        """
        from strongsort_yolo_tpu.ops import quant
        from strongsort_yolo_tpu.ops.runtime import force_platform

        # run on the CPU backend regardless of the ambient platform:
        # eager calibration through the axon tunnel would round-trip
        # per op, and the TPU-built steps select Pallas kernels the
        # CPU can't execute. Params come over in ONE bulk transfer.
        cpu = jax.devices("cpu")[0]
        params_host = jax.device_get(self.params)
        src_hw = tuple(np.asarray(frames[0]).shape[:2])
        with jax.default_device(cpu), force_platform("cpu"):
            steps = self._make_step(src_hw)

            def apply_fn(frame):
                steps.detect_step(params_host, jnp.asarray(frame))

            stats = quant.calibrate_scales(apply_fn, frames)
        params_q, n = quant.inject_scales(params_host, stats)
        # put the tree back on the default (accelerator) backend in
        # ONE bulk transfer — leaving host arrays in self.params makes
        # every later dispatch re-upload the whole tree (measured
        # 167 ms/step through the tunnel)
        self.params = jax.device_put(params_q)
        self._steps.clear()  # scales are trace-time constants
        return n

    def reset(self):
        """New stream: clear tracker + GMC state (per-stream persistence
        parity with ``persist=True`` at yolo_multi_model.py:41)."""
        self.track_state = init_track_state(self.track_slots, feat_dim=self.feat_dim)
        self.gmc.reset()
        self._flow_gray = None
        self._flow_has = False

    def predict(self, frame_bgr: np.ndarray) -> Results:
        """Detect without tracking (reference ``model.predict``,
        yolo_multi_model.py:173)."""
        src_hw = frame_bgr.shape[:2]
        steps = self._get_step(src_hw)
        lp = steps.lp
        det, extras = steps.detect_step(self.params, jnp.asarray(frame_bgr))
        det = jax.tree.map(np.asarray, det)
        extras = {k: np.asarray(v) for k, v in extras.items()}
        n = int(det.count)
        boxes = Boxes(det.boxes[:n], det.scores[:n], det.classes[:n])
        return Results(
            boxes,
            self.names,
            masks=self._mk_masks(extras, np.arange(n), src_hw, lp),
            keypoints=self._mk_kpts(extras, np.arange(n)),
            orig_img=frame_bgr,
        )

    def _track_results(self, out, extras, src_hw, lp, orig_img=None) -> Results:
        """Host-side Results assembly from one frame's track outputs."""
        rows = np.where(out.active)[0]
        boxes = Boxes(
            out.boxes[rows], out.score[rows], out.cls[rows],
            id=out.track_id[rows],
        )
        det_rows = out.det_index[rows]
        return Results(
            boxes,
            self.names,
            masks=self._mk_masks(extras, det_rows, src_hw, lp),
            keypoints=self._mk_kpts(extras, det_rows),
            orig_img=orig_img,
        )

    def _flow_state(self):
        """(prev_gray, has_prev) device inputs for the flow_tpu step."""
        from strongsort_yolo_tpu.track import gmc_tpu

        if self._flow_gray is None:
            self._flow_gray = jnp.zeros(
                (gmc_tpu.BASE_H, gmc_tpu.BASE_W), jnp.float32
            )
            self._flow_has = False
        return self._flow_gray, jnp.asarray(self._flow_has)

    def track_async(self, frame_bgr: np.ndarray, warp=None):
        """Dispatch one track step WITHOUT materializing the outputs.

        JAX dispatch is asynchronous: the returned handle holds device
        arrays still being computed, so the host can decode the next
        frame / run its GMC sparse-flow (``self.gmc.apply``) while the
        device works — pass the result to :meth:`materialize` to get
        the Results. One-tick pipelining of this pair overlaps all
        host work with device compute (SURVEY.md §7 hard part #6).
        """
        src_hw = frame_bgr.shape[:2]
        steps = self._get_step(src_hw)
        frame_dev = jnp.asarray(frame_bgr)
        if warp is not None and steps.track_step_flow is not None:
            # flow_tpu threads the previous gray frame through the step;
            # taking an externally-estimated warp would leave that state
            # stale and make the NEXT in-step LK span 2+ frames.
            raise ValueError(
                "explicit warps are not supported with gmc_method="
                "'flow_tpu' (the warp is estimated inside the step); "
                "use gmc_method='sparseOptFlow'/'ecc' for host warps"
            )
        if warp is None and steps.track_step_flow is not None:
            # flow_tpu: warp estimated INSIDE the step (one program —
            # see _StepSet docstring); prev gray is threaded state
            pg, hp = self._flow_state()
            (self.track_state, det, out, extras,
             self._flow_gray) = steps.track_step_flow(
                self.params, self.track_state, frame_dev, pg, hp
            )
            self._flow_has = True
        else:
            if warp is None:
                warp = self.gmc.apply(frame_bgr)
            self.track_state, det, out, extras = steps.track_step(
                self.params, self.track_state, frame_dev,
                jnp.asarray(warp),
            )
        return (out, extras, src_hw, steps.lp, frame_bgr)

    def materialize(self, handle) -> Results:
        """Block on a :meth:`track_async` handle -> Results."""
        out, extras, src_hw, lp, frame_bgr = handle
        out = jax.tree.map(np.asarray, out)
        extras = {k: np.asarray(v) for k, v in extras.items()}
        return self._track_results(out, extras, src_hw, lp, frame_bgr)

    def track(self, frame_bgr: np.ndarray) -> Results:
        """Detect + track (reference ``model.track`` with persist=True,
        yolo_multi_model.py:41). Returns active tracks as rows."""
        return self.materialize(self.track_async(frame_bgr))

    def __call__(self, frame_bgr: np.ndarray, track: bool = True) -> Results:
        return self.track(frame_bgr) if track else self.predict(frame_bgr)

    def track_chunk(self, frames_bgr: np.ndarray) -> list[Results]:
        """Offline/throughput mode: (T, H, W, 3) frames in one device
        dispatch (lax.scan) — same sequential tracker semantics as T
        ``track`` calls with T-fold lower dispatch overhead. GMC warps
        are computed host-side per frame first. Seg/pose extras ride
        along (masks/keypoints per frame, same as ``track``)."""
        t = len(frames_bgr)
        src_hw = frames_bgr[0].shape[:2]
        steps = self._get_step(src_hw)
        if steps.track_chunk_flow is not None:
            pg, hp = self._flow_state()
            (self.track_state, outs, extras,
             self._flow_gray) = steps.track_chunk_flow(
                self.params, self.track_state,
                jnp.asarray(np.asarray(frames_bgr)), pg, hp,
            )
            self._flow_has = True
        else:
            warps = np.stack([self.gmc.apply(f) for f in frames_bgr])
            self.track_state, outs, extras = steps.track_chunk(
                self.params,
                self.track_state,
                jnp.asarray(np.asarray(frames_bgr)),
                jnp.asarray(warps),
            )
        outs = jax.tree.map(np.asarray, outs)
        extras = {k: np.asarray(v) for k, v in extras.items()}
        return [
            self._track_results(
                jax.tree.map(lambda a: a[k], outs),
                {key: v[k] for key, v in extras.items()},
                src_hw,
                steps.lp,
            )
            for k in range(t)
        ]

    def track_batch_prepare(
        self, num_streams: int, src_hw: tuple[int, int], *, mesh=None,
        auto_topk: bool = False,
    ):
        """-> BatchedPipeline stepping ``num_streams`` same-resolution
        streams through ONE device program (the reference forks one OS
        process per source instead — yolo_multi_model.py:353-354).
        Pass a ('dp', ...) Mesh to shard the stream axis over chips.
        auto_topk: adaptive exact-replay ReID embed width (see
        BatchedPipeline)."""
        return BatchedPipeline(
            self, num_streams, src_hw, mesh=mesh, auto_topk=auto_topk
        )

    def _mk_kpts(self, extras, det_rows):
        if "keypoints" not in extras:
            return None
        safe = np.clip(det_rows, 0, len(extras["keypoints"]) - 1)
        data = extras["keypoints"][safe]
        data[det_rows < 0] = 0.0
        return Keypoints(data)

    def _mk_masks(self, extras, det_rows, src_hw, lp):
        if "masks" not in extras:
            return None
        masks = extras["masks"]
        safe = np.clip(det_rows, 0, len(masks) - 1)
        data = masks[safe]
        data[det_rows < 0] = 0.0
        xy = masks_to_polygons(
            data,
            len(det_rows),
            lp.gain,
            (lp.pad_x, lp.pad_y),
            src_hw,
            (self.det_cfg.imgsz, self.det_cfg.imgsz),
        )
        return Masks(xy, data)


# ---------------------------------------------------------------------------
# Batched multi-stream pipeline
# ---------------------------------------------------------------------------


class _PendingTick:
    """Handle for one auto_topk tick whose exact-width validation is
    deferred (see :meth:`BatchedPipeline.step_async`). Mutable: an
    overflow replay of an earlier tick re-dispatches this one in place,
    so a handle held by the caller always materializes to committed
    (full-width-identical) results."""

    __slots__ = ("pre", "frames", "warps", "det", "out_extras", "bucket",
                 "validated", "embed_mask")

    def __init__(self, pre, frames, warps, det, out_extras, bucket,
                 embed_mask=None):
        self.pre = pre
        self.frames = frames
        self.warps = warps
        self.det = det
        self.out_extras = out_extras
        self.bucket = bucket
        self.embed_mask = embed_mask  # (S,) bool cadence mask or None
        self.validated = False


class BatchedPipeline:
    """S same-resolution streams stepped together in ONE jitted program.

    TPU-native replacement for the reference's one-OS-process-per-source
    fan-out (/root/reference/yolo_multi_model.py:353-354): the stream
    axis is the batch axis of a vmapped track body, so all S streams
    share one weight set, one compile, and one dispatch per frame tick.
    Per-stream GMC state lives on the host (one GMC instance per
    stream); per-stream tracker state is the leading axis of a stacked
    TrackState pytree. Semantics per stream are identical to S
    sequential ``Pipeline.track`` calls (tested in
    tests/test_parallel.py).
    """

    def __init__(self, pipeline: Pipeline, num_streams: int, src_hw, *,
                 mesh=None, auto_topk: bool = False):
        """mesh: optional jax.sharding.Mesh with a 'dp' axis — streams
        shard over it (each chip owns a contiguous block of streams;
        the batch is collective-free since streams are independent).
        ``num_streams`` must divide by the dp size.

        auto_topk: adapt the ReID embed width to the REAL detection
        load with an exact-behavior guarantee (VERDICT r3 ask #1: make
        the crop+OSNet cost track real dets). A ladder of step programs
        with reid_topk in {8,16,32,...,cap} is compiled lazily; each
        tick dispatches at the current bucket, then the device-reported
        det count validates it: if any stream's count exceeded the
        bucket, the tick — and any tick dispatched after it — is
        REPLAYED from the saved pre-tick state at a large-enough
        bucket, so every result handed out is bit-identical to running
        the full-width (reid_topk=cap) program. Bucket moves down only
        after a 30-tick window stays under 3/4 of the next rung
        (hysteresis; program alternation costs ~100ms through the axon
        tunnel, so switches must be rare). Validation is DEFERRED and
        BATCH-DRAINED: (S,) det counts are read only when
        ``_validate_lag`` ticks have piled up, then the whole queue
        commits at once (or at materialize()/sync()); any same-tick
        host read serializes the dispatch queue through the tunnel
        (round-4 A/Bs: 29.7 / 20.2 / 25.7 ms/tick for per-tick read /
        copy_to_host_async / worker-thread read, vs 13.1 raw), while
        one drain per batch amortizes to <1 ms/tick. External reads
        of ``.states`` must call :meth:`sync` first; ``.states`` is
        tentative while ticks are pending."""
        self.pipeline = pipeline
        self.num_streams = num_streams
        self.src_hw = tuple(src_hw)
        self._stream_sharding = None
        if mesh is not None:
            # placement must precede _get_step: the jitted body closes
            # over reid_params at trace time
            from jax.sharding import NamedSharding, PartitionSpec as P

            stream_sh = NamedSharding(mesh, P("dp"))
            rep = NamedSharding(mesh, P())
            pipeline.params = jax.device_put(pipeline.params, rep)
            if pipeline.reid_params is not None:
                pipeline.reid_params = jax.device_put(pipeline.reid_params, rep)
            self._stream_sharding = stream_sh
        self._auto = bool(auto_topk) and pipeline.reid_params is not None
        # packed cross-stream embed (VERDICT r4 #1): one dense G-slot
        # crop batch shared by all streams, G a TOTAL-count bucket —
        # the embed cost tracks the real det load instead of S*width
        # slots. Single-chip only: under a dp mesh the cross-stream
        # pack would turn the collective-free batch into an all-gather,
        # so meshed auto keeps the per-stream WIDTH ladder.
        self._pack = self._auto and mesh is None
        self._pack_g = 8  # slot quantum == crop kernel g_crops
        # embed cadence (Pipeline reid_cadence > 1): stream s embeds
        # on ticks where (s + tick) % cadence == 0 — staggered so every
        # tick embeds ~S/cadence streams and the packed bucket shrinks
        # accordingly. Requires the packed auto path (the mask feeds
        # the step program and the ladder demand).
        self._cadence = pipeline.reid_cadence if self._pack else 1
        if (pipeline.reid_cadence > 1 and not self._pack
                and pipeline.reid_params is not None):
            raise ValueError(
                "reid_cadence > 1 requires auto_topk=True without a "
                "mesh (the packed cross-stream embed path)"
            )
        self._tick = 0
        if self._auto:
            import collections

            self._row_cap = cap = min(
                pipeline.reid_topk,
                pipeline.tracker_max_dets,
                pipeline.det_cfg.max_det,
            )
            if self._pack:
                g = self._pack_g
                base = num_streams * g
                cap_total = num_streams * (-(-cap // g) * g)
                self._ladder = sorted(
                    {base * k for k in (1, 2, 3, 4, 6, 8, 12, 16, 24,
                                        32, 48, 64, 96, 128)
                     if base * k < cap_total}
                    | {cap_total}
                )
            else:
                self._ladder = sorted(
                    {b for b in (8, 16, 24, 32, 48, 64, 96, 128, 192,
                                 256, 384, 512) if b < cap}
                    | {cap}
                )
            # start at the LOWEST rung: the first tick's det count
            # overflows it and the exact replay jumps DIRECTLY to a
            # wide-enough bucket — one wasted dispatch instead of the
            # 30-ticks-per-rung hysteresis descent from cap (which
            # recompiled a program per rung; measured 2026-08-19: the
            # descent put a ~24s bucket-switch compile inside steady-
            # state serving). Committed results stay exact either way.
            self._bucket = self._ladder[0]
            self._cnt_hist = collections.deque(maxlen=30)
            self._stepsets = {}
            # dispatch width must match the recorded bucket from the
            # first tick: dispatching cap-width while _bucket said
            # rung 0 ran full-width forever under sparse load and
            # needlessly replayed already-correct ticks on the first
            # overflow (advisor r4)
            self._steps = self._steps_for(self._bucket)
        else:
            self._steps = pipeline._get_step(self.src_hw)
        self._pending: list[_PendingTick] = []
        # validation batch depth: each pending tick pins its input
        # frames on device (~S*6.2MB at 1080p), so cap the queue by a
        # ~1.6GB frame budget; 8 deep amortizes the drain to <1ms/tick
        self._validate_lag = max(2, min(8, 256 // max(1, num_streams)))
        self.n_replays = 0  # overflow-replay diagnostics counter
        self.gmcs = [make_gmc(pipeline.gmc.method) for _ in range(num_streams)]
        # device GMC (track/gmc_tpu.py): all S warps come from one
        # vmapped device dispatch off the already-staged frames
        self._flow_tpu = pipeline.gmc.method == "flow_tpu"
        self._prev_grays = None
        self._has_prev = np.zeros(num_streams, bool)
        self.states = jax.vmap(
            lambda _: init_track_state(
                pipeline.track_slots, feat_dim=pipeline.feat_dim
            )
        )(jnp.arange(num_streams))
        if self._stream_sharding is not None:
            self.states = jax.device_put(self.states, self._stream_sharding)

    def reset_stream(self, i: int) -> None:
        """Reinitialize one stream's tracker + GMC state in place."""
        self.sync()
        fresh = init_track_state(
            self.pipeline.track_slots, feat_dim=self.pipeline.feat_dim
        )
        self.states = jax.tree.map(
            lambda batched, f: batched.at[i].set(f), self.states, fresh
        )
        self.gmcs[i].reset()
        self._has_prev[i] = False

    def compute_warps(self, frames: np.ndarray) -> np.ndarray:
        """Per-stream GMC warps (host OpenCV work) — exposed separately
        so callers can overlap it with the previous device step."""
        return np.stack(
            [g.apply(f) for g, f in zip(self.gmcs, frames)]
        ).astype(np.float32)

    def step_async(self, frames: np.ndarray, warps: np.ndarray | None = None):
        """Dispatch one lockstep tick for all S streams without
        materializing (JAX async dispatch — see Pipeline.track_async).
        ``warps``: optional precomputed (S, 2, 3) GMC warps (from
        ``compute_warps``); computed inline when omitted."""
        p = self.pipeline
        if warps is not None and self._flow_tpu:
            raise ValueError(
                "explicit warps are not supported with gmc_method="
                "'flow_tpu' (warps are estimated inside the batched "
                "step; the previous-gray state would go stale)"
            )
        if warps is None and not self._flow_tpu:
            warps = self.compute_warps(frames)
        frames = jnp.asarray(frames)
        if self._stream_sharding is not None:
            frames = jax.device_put(frames, self._stream_sharding)
        if warps is None:
            # flow_tpu: prev grays threaded through the SAME program
            # (warp estimated in-jit — see _StepSet docstring)
            from strongsort_yolo_tpu.track import gmc_tpu

            if self._prev_grays is None:
                self._prev_grays = jnp.zeros(
                    (self.num_streams, gmc_tpu.BASE_H, gmc_tpu.BASE_W),
                    jnp.float32,
                )
                if self._stream_sharding is not None:
                    self._prev_grays = jax.device_put(
                        self._prev_grays, self._stream_sharding
                    )
        else:
            warps = jnp.asarray(warps)
            if self._stream_sharding is not None:
                warps = jax.device_put(warps, self._stream_sharding)

        if not self._auto:
            det, handle = self._dispatch(self._steps, frames, warps)
            return handle

        # auto_topk: deferred exact-width validation, BATCH-DRAINED.
        # Dispatch now; det counts are read only when _validate_lag
        # ticks have piled up, then the whole queue validates at once
        # (or at materialize()/sync()). ANY same-tick host read of the
        # count — np.asarray, copy_to_host_async, even from a worker
        # thread — serializes the dispatch queue through the axon
        # relay (measured 29.7 / 20.2 / 25.7 ms/tick vs 13.1 raw at
        # S=16); one drain per _validate_lag ticks amortizes the sync
        # the same way the bench's block-every-N loop does.
        if len(self._pending) >= self._validate_lag:
            self._drain_pending()
        mask = None
        if self._cadence > 1:
            mask = (
                (np.arange(self.num_streams) + self._tick)
                % self._cadence == 0
            )
        self._tick += 1
        rec = self._dispatch_tick(frames, warps, mask)
        self._pending.append(rec)
        return rec

    def _drain_pending(self) -> None:
        """Validate every pending tick. Counts for the whole queue are
        fetched in ONE jax.device_get — per-array reads each pay a
        full relay round-trip (measured ~2 ms/read at S=16, which at
        one read per tick ate the entire deferred-validation win)."""
        while self._pending:
            counts = jax.device_get([r.det.count for r in self._pending])
            for c in counts:
                n_before = self.n_replays
                self._validate_oldest(_counts=c)
                if self.n_replays != n_before:
                    # replay re-dispatched the rest of the queue; the
                    # prefetched counts are stale — re-fetch
                    break
            else:
                break

    def _drain_until(self, handle: "_PendingTick") -> None:
        """Validate pending ticks up to and INCLUDING ``handle`` only.
        Draining the whole queue here would block on the det counts of
        ticks dispatched after the handle — in app.py's overlap loop
        (step_async tick t, materialize tick t-1) that is a same-tick
        host sync, the exact serialization the deferred design exists
        to avoid (advisor r4)."""
        while not handle.validated:
            try:
                k = self._pending.index(handle)
            except ValueError:  # committed by a replay pass
                break
            counts = jax.device_get(
                [r.det.count for r in self._pending[: k + 1]]
            )
            for c in counts:
                n_before = self.n_replays
                self._validate_oldest(_counts=c)
                if self.n_replays != n_before:
                    break  # queue re-dispatched; prefetched counts stale

    def _dispatch_tick(self, frames, warps, embed_mask=None) -> "_PendingTick":
        pre = (self.states, self._prev_grays, self._has_prev.copy())
        det, handle = self._dispatch(self._steps, frames, warps, embed_mask)
        return _PendingTick(pre, frames, warps, det, handle, self._bucket,
                            embed_mask)

    def _demand(self, counts, embed_mask=None) -> tuple[int, int]:
        """Per-stream det counts -> (needed, guard) in BUCKET units.
        ``needed`` is the exact demand the tick's bucket must cover;
        ``guard`` is the demand with headroom, used by the hysteresis
        down-switch. Packed mode: needed = sum of per-stream counts
        padded to the slot quantum; guard adds ONE det per stream (the
        lower rung is safe only if every stream could gain a det
        without overflowing). Width mode: both are the max count (the
        lower-rung margin lives in the down-switch rule instead).
        ``embed_mask``: cadence mask — skipped streams demand zero
        slots (exactly mirroring embed_batch_packed's masking)."""
        c = np.minimum(np.asarray(counts, np.int64), self._row_cap)
        if embed_mask is not None:
            c = c * np.asarray(embed_mask)
        if self._pack:
            g = self._pack_g
            cg = np.minimum(c + 1, self._row_cap)
            if embed_mask is not None:
                cg = cg * np.asarray(embed_mask)
            need = int(np.sum(-(-c // g) * g))
            guard = int(np.sum(-(-cg // g) * g))
            return need, guard
        m = int(np.max(c)) if np.size(c) else 0
        return m, m

    def _validate_oldest(self, _counts=None) -> None:
        """Commit the oldest pending tick: read its det counts; on
        bucket overflow, roll back and replay it — and every pending
        tick dispatched after it — at a wide-enough bucket. Every
        committed tick is bit-identical to the full-width program."""
        rec = self._pending.pop(0)
        # counts come from NMS and are bucket-independent: the bucket
        # only sets how many dets get ReID embeddings
        counts = (np.asarray(rec.det.count)
                  if _counts is None else np.asarray(_counts))
        need, guard = self._demand(counts, rec.embed_mask)
        cap = self._ladder[-1]
        if need > rec.bucket and rec.bucket < cap:
            self.n_replays += 1
            self._bucket = next(
                b for b in self._ladder if b >= min(need, cap)
            )
            self._steps = self._steps_for(self._bucket)
            self._cnt_hist.clear()
            # rewind to before the overflowed tick, then re-dispatch it
            # and all newer pending ticks in order (their handles are
            # updated in place)
            self.states, self._prev_grays, has_prev = rec.pre
            self._has_prev[:] = has_prev
            redo = [rec] + self._pending
            self._pending = []
            for r in redo:
                r.pre = (self.states, self._prev_grays,
                         self._has_prev.copy())
                r.det, r.out_extras = self._dispatch(
                    self._steps, r.frames, r.warps, r.embed_mask
                )
                r.bucket = self._bucket
            self._pending = redo[1:]
        rec.validated = True
        self._cnt_hist.append(guard)
        idx = self._ladder.index(self._bucket)
        lower = self._ladder[idx - 1] if idx > 0 else None
        # down-switch: packed guards carry their own +1-det-per-stream
        # headroom (slot quantization makes a fractional margin on the
        # rung value meaningless — the minimum nonzero demand IS the
        # lowest rung); width mode keeps the 12.5%-of-rung margin
        down_at = (lower if self._pack
                   else lower - max(1, lower // 8)) if lower else None
        if (
            lower is not None
            and len(self._cnt_hist) == self._cnt_hist.maxlen
            and max(self._cnt_hist) <= down_at
        ):
            self._bucket = self._ladder[idx - 1]
            self._steps = self._steps_for(self._bucket)
            self._cnt_hist.clear()

    def sync(self) -> None:
        """Validate (commit) all pending auto_topk ticks. Call before
        reading ``.states`` externally (checkpointing, per-stream
        surgery); a no-op without auto_topk."""
        self._drain_pending()

    def refresh_steps(self) -> None:
        """Re-resolve step programs after the pipeline's params/steps
        changed out-of-band (e.g. calibrate_int8 cleared the cache)."""
        self.sync()
        if self._auto:
            self._stepsets = {}
            self._steps = self._steps_for(self._bucket)
        else:
            self._steps = self.pipeline._get_step(self.src_hw)

    def _steps_for(self, bucket: int):
        if bucket not in self._stepsets:
            if self._pack:
                self._stepsets[bucket] = self.pipeline._get_step(
                    self.src_hw, reid_pack_slots=bucket
                )
            else:
                self._stepsets[bucket] = self.pipeline._get_step(
                    self.src_hw, reid_topk=bucket
                )
        return self._stepsets[bucket]

    def _dispatch(self, steps, frames, warps, embed_mask=None):
        """Run one tick through the given step set; mutates state and
        returns (device det struct, results handle). ``embed_mask``:
        the (S,) cadence mask — required (non-None) exactly when the
        step set was built with reid_cadence > 1."""
        p = self.pipeline
        extra = () if embed_mask is None else (jnp.asarray(embed_mask),)
        if warps is None:
            (self.states, det, out, extras,
             self._prev_grays) = steps.batch_step_flow(
                p.params, self.states, frames, self._prev_grays,
                jnp.asarray(self._has_prev), *extra,
            )
            self._has_prev[:] = True
        else:
            self.states, det, out, extras = steps.batch_step(
                p.params, self.states, frames, warps, *extra
            )
        return det, (out, extras)

    def materialize(self, handle) -> list:
        """Block on a :meth:`step_async` handle -> list of S Results.
        An auto_topk handle is first validated (committing any earlier
        pending ticks), so results are always full-width-identical."""
        if isinstance(handle, _PendingTick):
            if not handle.validated:
                self._drain_until(handle)
            handle = handle.out_extras
        out, extras = handle
        p = self.pipeline
        out = jax.tree.map(np.asarray, out)
        extras = {k: np.asarray(v) for k, v in extras.items()}
        return [
            p._track_results(
                jax.tree.map(lambda a: a[s], out),
                {key: v[s] for key, v in extras.items()},
                self.src_hw,
                self._steps.lp,
            )
            for s in range(self.num_streams)
        ]

    def step(self, frames: np.ndarray, warps: np.ndarray | None = None):
        """frames: (S, H, W, 3) uint8 BGR -> list of S Results."""
        return self.materialize(self.step_async(frames, warps))
