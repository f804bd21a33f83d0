"""Multi-chip scaling via jax.sharding meshes.

The reference's "parallelism" is 3 OS processes + shared-memory tensors
(SURVEY §2.2); it has no multi-GPU story.  Here scaling is SPMD:

- `data_parallel`: shard mapping rays across a ('data',) mesh — each chip
  samples its own ray batch against replicated map state, gradients are
  psummed over ICI.  This is the throughput axis for the mapping hot loop.
- grid/block sharding (scene-scale axis) lands in later revisions.
"""

from nice_slam_tpu.parallel.data_parallel import (
    make_mesh,
    dp_map_optimize,
)
