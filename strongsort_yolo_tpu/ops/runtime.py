"""Target-platform resolution for trace-time kernel choices.

Several ops pick between a Pallas TPU kernel and an XLA formulation at
TRACE time (ops/assignment, ops/nms, track/gmc_tpu, the packed-prefix
gate in models/yolo). ``jax.default_backend()`` is the right default,
but it reports the AMBIENT platform — when a program is deliberately
staged on different devices (the multichip dryrun builds a CPU-mesh
serving program while the axon TPU plugin is the ambient default),
the ambient answer selects kernels the target backend cannot compile.
``force_platform`` scopes an explicit answer for those cases.
"""

from __future__ import annotations

import contextlib

import jax

_override: str | None = None


def target_platform() -> str:
    """Platform the current program is being staged for: the scoped
    override if one is active, else ``jax.default_backend()``."""
    return _override if _override is not None else jax.default_backend()


@contextlib.contextmanager
def force_platform(platform: str):
    """Scope trace-time kernel selection to ``platform`` ("cpu",
    "tpu", ...). Affects only choices made while tracing inside the
    scope; already-compiled programs are untouched."""
    global _override
    prev = _override
    _override = platform
    try:
        yield
    finally:
        _override = prev
