"""Tracker/pipeline state checkpoint & resume (SURVEY.md §5.4).

The reference has no state checkpointing; its only 'resume' is the
append-mode labels file surviving restarts
(/root/reference/yolo_multi_model.py:39). Here tracker state is a pure
pytree (track/state.py), so persistence is a one-call orbax save —
a stream can resume mid-video with identical track ids.
"""

from __future__ import annotations

import os
from typing import Any


def save_state(path: str, state: Any) -> None:
    """Save any pytree (e.g. TrackState) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_state``; ``template`` supplies
    structure/shapes/dtypes (e.g. ``init_track_state(...)``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
