"""Multi-chip scaling: mesh construction, sharding rules, stream batching.

The reference's only parallelism is one OS process per video source
with zero communication (/root/reference/yolo_multi_model.py:353-354,
SURVEY.md §2.5). The TPU-native plan replaces processes with sharded
array axes on a jax.sharding.Mesh:

- dp: batch/stream axis — inference shards streams, training shards
  the image batch;
- tp: channel axis of the widest conv weights (useful for the larger
  model scales; collectives ride ICI, inserted by XLA from sharding
  constraints).

PP/SP/EP are intentionally absent: every supported model fits one
chip many times over (3-12M params), there is no sequence dimension
(temporal state is O(1) fixed-slot tracker memory, SURVEY.md §5.7),
and there are no experts. The honest scaling axes for this workload
are streams and batch.
"""

from strongsort_yolo_tpu.parallel.mesh import (
    make_mesh,
    make_param_shardings,
    replicate,
)

__all__ = ["make_mesh", "make_param_shardings", "replicate"]
