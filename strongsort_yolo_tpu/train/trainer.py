"""Sharded train step: dp over the image batch, tp over conv channels.

One optax-driven update, jittable single-chip or over a
jax.sharding.Mesh (the driver's ``dryrun_multichip`` compiles this over
an N-device mesh). Sharding strategy is annotate-and-let-XLA-insert-
collectives: params are placed with tensor-parallel NamedShardings
(parallel/mesh.py), the optimizer state inherits them through
``tx.init`` on the sharded params, batches are placed on the 'dp'
axis, and jit propagates everything — gradients come back with a psum
over 'dp' inserted by SPMD partitioning.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from strongsort_yolo_tpu.models.yolo import YoloConfig, feat_hw, init_model, model_apply
from strongsort_yolo_tpu.ops.decode import make_anchors
from strongsort_yolo_tpu.parallel.mesh import batch_sharding, make_param_shardings
from strongsort_yolo_tpu.train.loss import LossWeights, detection_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-3, weight_decay: float = 5e-4):
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def init_train_state(
    key,
    cfg: YoloConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
) -> TrainState:
    """Build (optionally sharded) params + optimizer state."""
    params = init_model(key, cfg)
    if mesh is not None:
        shardings = make_param_shardings(params, mesh)
        params = jax.device_put(params, shardings)
    opt_state = tx.init(params)  # moments inherit the param shardings
    return TrainState(params, opt_state, jnp.int32(0))


def make_train_step(
    cfg: YoloConfig,
    imgsz: int,
    tx: optax.GradientTransformation,
    *,
    compute_dtype=jnp.float32,
    loss_weights: LossWeights = LossWeights(),
):
    """-> jitted ``train_step(state, images, targets) -> (state, metrics)``.

    images: (B, S, S, 3) float in [0,1]; targets: {"boxes" (B, M, 4),
    "cls" (B, M) int32, "valid" (B, M) bool}. Place the batch with
    ``shard_batch`` before calling to run data-parallel.
    """
    anchors, strides = make_anchors(
        feat_hw((imgsz, imgsz), cfg.strides), cfg.strides
    )

    def loss_fn(params, images, targets):
        out = model_apply(params, images, cfg, compute_dtype=compute_dtype)
        return detection_loss(
            out, targets, anchors, strides,
            nc=cfg.nc, reg_max=cfg.reg_max, weights=loss_weights,
        )

    @jax.jit
    def train_step(state: TrainState, images, targets):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, targets
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def shard_batch(mesh: Mesh, images, targets):
    """Place a host batch onto the mesh's 'dp' axis."""
    bs = batch_sharding(mesh)
    images = jax.device_put(images, bs)
    targets = {k: jax.device_put(v, bs) for k, v in targets.items()}
    return images, targets
