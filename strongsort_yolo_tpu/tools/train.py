"""Training CLI: fit a YOLO detector on a detection dataset.

The reference consumes pretrained checkpoints only (SURVEY.md D1);
this gives the framework the producing side. Data: a simple YOLO-txt
layout (images dir + per-image ``cls cx cy w h`` normalized label
txts) or the built-in synthetic dataset for smoke runs.

Usage:
    python -m strongsort_yolo_tpu.tools.train --steps 500 \
        [--data DIR | --synthetic] [--model yolov8n] [--imgsz 320]
        [--batch 8] [--lr 1e-3] [--save out.npz]
        [--dp N --tp M]   # mesh axes (defaults: all devices on dp)
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def synthetic_batch(rng, batch, imgsz, max_gt=8):
    """Rectangles-on-noise detection task (class = brightness bucket)."""
    import jax.numpy as jnp

    imgs = rng.uniform(0.0, 0.3, (batch, imgsz, imgsz, 3)).astype(np.float32)
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    cls = np.zeros((batch, max_gt), np.int32)
    valid = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        n = rng.integers(1, max_gt // 2 + 1)
        for i in range(n):
            w = rng.uniform(imgsz * 0.15, imgsz * 0.4)
            h = rng.uniform(imgsz * 0.15, imgsz * 0.4)
            x1 = rng.uniform(0, imgsz - w)
            y1 = rng.uniform(0, imgsz - h)
            c = int(rng.integers(0, 3))
            shade = 0.5 + 0.16 * c
            imgs[b, int(y1):int(y1 + h), int(x1):int(x1 + w)] = shade
            boxes[b, i] = (x1, y1, x1 + w, y1 + h)
            cls[b, i] = c
            valid[b, i] = True
    return jnp.asarray(imgs), {
        "boxes": jnp.asarray(boxes),
        "cls": jnp.asarray(cls),
        "valid": jnp.asarray(valid),
    }


def yolo_txt_batches(data_dir, rng, batch, imgsz, max_gt=32):
    """Stream batches from a YOLO-format dataset directory."""
    import cv2
    import jax.numpy as jnp

    img_dir = os.path.join(data_dir, "images")
    lbl_dir = os.path.join(data_dir, "labels")
    files = sorted(
        f for f in os.listdir(img_dir)
        if f.lower().endswith((".jpg", ".png", ".jpeg"))
    )
    while True:
        sel = rng.choice(len(files), batch)
        imgs = np.zeros((batch, imgsz, imgsz, 3), np.float32)
        boxes = np.zeros((batch, max_gt, 4), np.float32)
        cls = np.zeros((batch, max_gt), np.int32)
        valid = np.zeros((batch, max_gt), bool)
        for b, fi in enumerate(sel):
            img = cv2.imread(os.path.join(img_dir, files[fi]))
            img = cv2.resize(img, (imgsz, imgsz))
            imgs[b] = img[..., ::-1] / 255.0
            lbl = os.path.join(
                lbl_dir, os.path.splitext(files[fi])[0] + ".txt"
            )
            if os.path.exists(lbl):
                for i, line in enumerate(open(lbl)):
                    if i >= max_gt:
                        break
                    c, cx, cy, w, h = map(float, line.split()[:5])
                    boxes[b, i] = (
                        (cx - w / 2) * imgsz, (cy - h / 2) * imgsz,
                        (cx + w / 2) * imgsz, (cy + h / 2) * imgsz,
                    )
                    cls[b, i] = int(c)
                    valid[b, i] = True
        yield jnp.asarray(imgs), {
            "boxes": jnp.asarray(boxes),
            "cls": jnp.asarray(cls),
            "valid": jnp.asarray(valid),
        }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default=None, help="YOLO-format dataset dir")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--model", default="yolov8n")
    ap.add_argument("--nc", type=int, default=None)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--save", default=None, help=".npz checkpoint path")
    ap.add_argument("--dp", type=int, default=None)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--log-every", type=int, default=20)
    args = ap.parse_args(argv)

    import jax

    from strongsort_yolo_tpu.models.yolo import build_model
    from strongsort_yolo_tpu.parallel.mesh import make_mesh
    from strongsort_yolo_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step, shard_batch,
    )

    cfg = build_model(args.model)
    if args.nc:
        import dataclasses

        cfg = dataclasses.replace(cfg, nc=args.nc)
    mesh = None
    if args.dp or args.tp > 1 or len(jax.devices()) > 1:
        mesh = make_mesh(dp=args.dp, tp=args.tp)
    tx = make_optimizer(args.lr)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tx, mesh)
    step = make_train_step(cfg, args.imgsz, tx)

    rng = np.random.default_rng(0)
    data = (
        yolo_txt_batches(args.data, rng, args.batch, args.imgsz)
        if args.data
        else iter(lambda: synthetic_batch(rng, args.batch, args.imgsz), None)
    )
    for i in range(args.steps):
        images, targets = next(data)
        if mesh is not None:
            images, targets = shard_batch(mesh, images, targets)
        state, metrics = step(state, images, targets)
        if i % args.log_every == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss={float(metrics['loss']):.4f} "
                f"box={float(metrics['box_loss']):.4f} "
                f"cls={float(metrics['cls_loss']):.4f} "
                f"dfl={float(metrics['dfl_loss']):.4f} "
                f"fg={float(metrics['num_fg']):.1f}"
            )
    if args.save:
        from strongsort_yolo_tpu.models.porting import save_npz_checkpoint

        save_npz_checkpoint(args.save, jax.device_get(state.params), cfg)
        print(f"saved {args.save}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
