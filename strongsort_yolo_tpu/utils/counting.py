"""Streaming per-class unique-track counting (reference F7, fixed).

The reference's ``--count`` re-reads the entire label file with pandas
every frame and takes the per-track majority class
(/root/reference/yolo_multi_model.py:284-309) — O(frames²) and the
single biggest hot-loop sink (SURVEY.md §2.1). This replacement keeps
a running per-track class histogram and per-class majority tally, so
each frame is O(active tracks) and the resulting dict is identical to
the pandas pipeline's output:

- per track id, the majority class over its lifetime
  (``Counter.most_common(1)`` ties break toward the class first
  reaching the max count — reproduced via (count, -first_seen) order);
- count of tracks per majority class, keyed by class NAME, sorted.
"""

from __future__ import annotations

from collections import defaultdict


class StreamingCounter:
    def __init__(self, names: dict[int, str]):
        self.names = names
        # track -> {cls: [count, first_seen_order]}
        self._hist: dict[int, dict[int, list[int]]] = defaultdict(dict)
        self._seen_order: dict[int, int] = defaultdict(int)

    def update(self, boxes) -> None:
        """boxes: pipeline.Boxes with .id (track mode)."""
        if boxes is None or boxes.id is None:
            return
        for i in range(len(boxes)):
            tid = int(boxes.id[i])
            cls = int(boxes.cls[i])
            h = self._hist[tid]
            if cls not in h:
                h[cls] = [0, self._seen_order[tid]]
                self._seen_order[tid] += 1
            h[cls][0] += 1

    def majority_class(self, tid: int) -> int:
        h = self._hist[tid]
        # max count; ties -> smaller class id (sorted() + Counter
        # behavior in the reference: list is sorted before counting,
        # so most_common ties resolve to the smaller class id)
        return min(h, key=lambda c: (-h[c][0], c))

    def counts(self) -> dict[str, int]:
        """{class_name: number of unique tracks}, name-sorted — the
        dict the reference renders at yolo_multi_model.py:304-305."""
        per_class: dict[int, int] = defaultdict(int)
        for tid in self._hist:
            per_class[self.majority_class(tid)] += 1
        named = {
            self.names.get(c, str(c)): n for c, n in per_class.items()
        }
        return dict(sorted(named.items()))
