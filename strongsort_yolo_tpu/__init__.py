"""strongsort_yolo_tpu — a TPU-native video detection + tracking framework.

A from-scratch rebuild of the capabilities of bharath5673/StrongSORT-YOLO
(reference: /root/reference/yolo_multi_model.py) designed TPU-first:

- YOLO detection / segmentation / pose models as pure-functional JAX
  (NHWC, bfloat16-friendly, jit/pjit/shard_map ready)     [models/]
- Fixed-shape XLA + Pallas pre/post-processing: letterbox, DFL box
  decode, class-aware NMS                                  [ops/]
- On-device trackers (ByteTrack / BoT-SORT / StrongSORT) with
  fixed-slot state pytrees, vmapped Kalman filters, and an in-jit
  Jonker-Volgenant style assignment solver                 [track/]
- Multi-stream batching over a jax.sharding.Mesh           [parallel/]
- Host media layer (decode/encode/draw) kept off the accelerator
                                                           [media/]
- CLI with parity to the reference's
  ``--source ... [--track] [--count]`` surface (reference
  yolo_multi_model.py:343-348), extended with --weights/--task.

The design stance (see SURVEY.md §7): the reference is a per-frame
Python interpreter loop with per-detection host syncs; this framework
inverts that into one jitted fixed-shape step
``(stream_state, frames) -> (stream_state, outputs)`` so the device
never waits on Python.
"""

__version__ = "0.1.0"
