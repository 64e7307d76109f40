"""Mesh + sharding-rule helpers (pjit style: annotate, let XLA insert
collectives)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    *,
    dp: int | None = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """2-D ('dp', 'tp') mesh over the first n devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tp_spec_for(path_leaf: jnp.ndarray, tp: int, min_channels: int):
    """Shard conv kernels (HWIO) and biases on the output-channel dim
    across 'tp' when divisible and wide enough; replicate otherwise."""
    shape = path_leaf.shape
    if len(shape) == 4:  # HWIO conv kernel
        cout = shape[3]
        if cout % tp == 0 and cout >= min_channels:
            return P(None, None, None, "tp")
    if len(shape) == 1:  # bias / bn vector
        if shape[0] % tp == 0 and shape[0] >= min_channels:
            return P("tp")
    return P()


def make_param_shardings(
    params, mesh: Mesh, *, min_channels: int = 64
):
    """Tensor-parallel sharding tree for a model param pytree.

    Output-channel sharding of conv kernels is the natural TP split for
    conv nets: each shard computes a channel slice of every feature
    map; XLA inserts the all-gathers where a following op needs the
    full channel axis. With tp=1 this degenerates to full replication.
    """
    tp = mesh.shape["tp"]
    if tp == 1:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: rep, params)
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _tp_spec_for(leaf, tp, min_channels)),
        params,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch / stream) sharding over 'dp'."""
    return NamedSharding(mesh, P("dp"))
