"""Structured logging (SURVEY.md §5.5 — the reference only has stdout
prints and overlay text). JSON-lines event log per stream, cheap
enough for the hot loop (one dict + one write per event)."""

from __future__ import annotations

import json
import os
import time


class EventLogger:
    def __init__(self, path: str | None = None, stream=None):
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
        self._stream = stream

    def log(self, event: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        line = json.dumps(rec, default=str)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._stream:
            print(line, file=self._stream)

    def close(self):
        if self._fh:
            self._fh.close()


NULL_LOGGER = EventLogger()
