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


def synthetic_batch_seg(rng, batch, imgsz, max_gt=8):
    """Ellipses-on-noise segmentation task: the gt MASK is the ellipse,
    the gt box its bounding box — so a mask head that merely repaints
    the box is measurably wrong (the e2e test exploits this)."""
    import jax.numpy as jnp

    hm = imgsz // 4  # proto resolution
    imgs = rng.uniform(0.0, 0.3, (batch, imgsz, imgsz, 3)).astype(np.float32)
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    cls = np.zeros((batch, max_gt), np.int32)
    valid = np.zeros((batch, max_gt), bool)
    masks = np.zeros((batch, max_gt, hm, hm), np.float32)
    yy, xx = np.mgrid[0:imgsz, 0:imgsz]
    yym, xxm = np.mgrid[0:hm, 0:hm]
    for b in range(batch):
        n = rng.integers(1, max_gt // 2 + 1)
        for i in range(n):
            rw = rng.uniform(imgsz * 0.09, imgsz * 0.2)
            rh = rng.uniform(imgsz * 0.09, imgsz * 0.2)
            cx = rng.uniform(rw, imgsz - rw)
            cy = rng.uniform(rh, imgsz - rh)
            c = int(rng.integers(0, 3))
            shade = 0.5 + 0.16 * c
            ell = ((xx - cx) / rw) ** 2 + ((yy - cy) / rh) ** 2 <= 1.0
            imgs[b][ell] = shade
            boxes[b, i] = (cx - rw, cy - rh, cx + rw, cy + rh)
            cls[b, i] = c
            valid[b, i] = True
            masks[b, i] = (
                ((xxm + 0.5) * 4 - cx) / rw) ** 2 + (
                ((yym + 0.5) * 4 - cy) / rh) ** 2 <= 1.0
    return jnp.asarray(imgs), {
        "boxes": jnp.asarray(boxes),
        "cls": jnp.asarray(cls),
        "valid": jnp.asarray(valid),
        "masks": jnp.asarray(masks),
    }


# One distinct saturated color per keypoint INDEX — the visual identity
# that makes "keypoint k" learnable (real pose keypoints are likewise
# visually distinct body parts). Shared with the e2e test.
POSE_KPT_COLORS = np.asarray(
    [
        [1.0, 0.1, 0.1],  # k0 red
        [0.1, 1.0, 0.1],  # k1 green
        [0.15, 0.25, 1.0],  # k2 blue
        [1.0, 0.9, 0.1],  # k3 yellow
        [1.0, 0.15, 1.0],  # k4 magenta
    ],
    np.float32,
)


def synthetic_batch_pose(rng, batch, imgsz, n_kpt=5, max_gt=8):
    """Rectangles with drawn color-coded DOTS at random in-box
    positions; gt keypoint k is the center of the k-colored dot — not
    derivable from the box, so the kpt head must localize each dot
    visually (and the colors make the index identifiable, as body
    parts are in real pose data)."""
    import jax.numpy as jnp

    imgs = rng.uniform(0.0, 0.3, (batch, imgsz, imgsz, 3)).astype(np.float32)
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    cls = np.zeros((batch, max_gt), np.int32)
    valid = np.zeros((batch, max_gt), bool)
    kpts = np.zeros((batch, max_gt, n_kpt, 3), np.float32)
    r = 3  # dot radius in training pixels (7x7 at imgsz)
    for b in range(batch):
        n = rng.integers(1, max_gt // 2 + 1)
        placed = 0
        for i in range(n):
            # rejection-sample a box DISJOINT from the ones already
            # drawn — an overlapping fill would erase earlier boxes'
            # dots, leaving gt keypoints with no visual evidence
            for _ in range(12):
                w = rng.uniform(imgsz * 0.2, imgsz * 0.4)
                h = rng.uniform(imgsz * 0.2, imgsz * 0.4)
                x1 = rng.uniform(0, imgsz - w)
                y1 = rng.uniform(0, imgsz - h)
                cand = np.asarray((x1, y1, x1 + w, y1 + h))
                prev = boxes[b, :placed]
                if placed == 0 or not np.any(
                    (cand[0] < prev[:, 2]) & (cand[2] > prev[:, 0])
                    & (cand[1] < prev[:, 3]) & (cand[3] > prev[:, 1])
                ):
                    break
            else:
                continue  # no disjoint spot; draw fewer objects
            c = int(rng.integers(0, 3))
            imgs[b, int(y1):int(y1 + h), int(x1):int(x1 + w)] = (
                0.5 + 0.16 * c
            )
            pts = np.zeros((n_kpt, 2), np.float32)
            for k in range(n_kpt):
                # keep dots from covering each other (min 2r+2 apart)
                for _ in range(12):
                    kx = x1 + rng.uniform(0.12, 0.88) * w
                    ky = y1 + rng.uniform(0.12, 0.88) * h
                    if k == 0 or np.min(
                        np.abs(pts[:k] - (kx, ky)).max(axis=1)
                    ) > 2 * r + 2:
                        break
                pts[k] = (kx, ky)
                iy, ix = int(ky), int(kx)
                imgs[
                    b, max(iy - r, 0):iy + r + 1, max(ix - r, 0):ix + r + 1
                ] = POSE_KPT_COLORS[k % len(POSE_KPT_COLORS)]
                kpts[b, i, k] = (kx, ky, 1.0)
            boxes[b, i] = (x1, y1, x1 + w, y1 + h)
            cls[b, i] = c
            valid[b, i] = True
            placed = i + 1
    return jnp.asarray(imgs), {
        "boxes": jnp.asarray(boxes),
        "cls": jnp.asarray(cls),
        "valid": jnp.asarray(valid),
        "kpts": jnp.asarray(kpts),
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
    ap.add_argument("--kpt", type=int, default=None,
                    help="keypoints per object (pose models)")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cosine", action="store_true",
                    help="warmup + cosine-decay the lr over --steps")
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
    import dataclasses

    if args.nc:
        cfg = dataclasses.replace(cfg, nc=args.nc)
    if cfg.task == "pose" and args.kpt:
        cfg = dataclasses.replace(cfg, kpt=(args.kpt, 3))
    mesh = None
    if args.dp or args.tp > 1 or len(jax.devices()) > 1:
        mesh = make_mesh(dp=args.dp, tp=args.tp)
    lr = args.lr
    if args.cosine:
        import optax

        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(100, max(args.steps // 10, 1)),
            args.steps, args.lr * 0.01,
        )
    tx = make_optimizer(lr)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tx, mesh)
    step = make_train_step(cfg, args.imgsz, tx)

    rng = np.random.default_rng(0)
    if args.data:
        data = yolo_txt_batches(args.data, rng, args.batch, args.imgsz)
    elif cfg.task == "segment":
        data = iter(
            lambda: synthetic_batch_seg(rng, args.batch, args.imgsz), None
        )
    elif cfg.task == "pose":
        data = iter(
            lambda: synthetic_batch_pose(
                rng, args.batch, args.imgsz, n_kpt=cfg.kpt[0]
            ),
            None,
        )
    else:
        data = iter(lambda: synthetic_batch(rng, args.batch, args.imgsz), None)
    for i in range(args.steps):
        images, targets = next(data)
        if mesh is not None:
            images, targets = shard_batch(mesh, images, targets)
        state, metrics = step(state, images, targets)
        if i % args.log_every == 0 or i == args.steps - 1:
            extra = "".join(
                f" {k.split('_')[0]}={float(metrics[k]):.4f}"
                for k in ("seg_loss", "kpt_loss", "kobj_loss")
                if k in metrics
            )
            print(
                f"step {i}: loss={float(metrics['loss']):.4f} "
                f"box={float(metrics['box_loss']):.4f} "
                f"cls={float(metrics['cls_loss']):.4f} "
                f"dfl={float(metrics['dfl_loss']):.4f} "
                f"fg={float(metrics['num_fg']):.1f}" + extra,
                flush=True,
            )
    if args.save:
        from strongsort_yolo_tpu.models.porting import save_npz_checkpoint

        save_npz_checkpoint(args.save, jax.device_get(state.params), cfg)
        print(f"saved {args.save}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
