"""Multi-host / multi-process launch (SURVEY §2.2's "TPU-native
equivalent": replace the reference's shared-memory tensors +
torch.multiprocessing with `jax.distributed` + SPMD collectives).

Every process runs the SAME deterministic engine loop (same dataset,
same RNG streams) — per-process state stays bit-identical by
construction, so no pose/keyframe synchronization traffic is needed at
all.  The mapping optimization is the one cross-process computation:
its ray batch shards over the GLOBAL device mesh
(parallel/data_parallel.py — each process renders a disjoint ray shard,
one gradient psum per iteration rides ICI/DCN; or
parallel/grid_sharded.py for scene-scale grid slabs).  Tracking and all
glue compile as replicated SPMD programs with zero communication.

Cost model: per mapping iteration the psum moves the grid+decoder
gradient tree (tens of MB for Replica-scale grids) — on TPU pods that is
ICI traffic fully overlapped by XLA with the backward; on the CPU/gloo
validation path it is TCP.  Tracking adds nothing.  This is the
BASELINE.md "≥70% scaling efficiency at 2+ hosts" design: scaling
efficiency = dp speedup of the mapping hot loop (see docs/SCALING.md).

Validated on this machine with 2 coordinated OS processes over the CPU
backend + gloo collectives (tools/multihost_demo.py,
tests/test_multihost.py) — jax.distributed supports CPU exactly so such
topologies can be tested without a pod.

Usage (each process):
    from nice_slam_tpu.parallel.multihost import initialize
    initialize("host0:12345", num_processes=2, process_id=i)  # BEFORE
    # any jax backend use, then build/run SlamEngine with
    # cfg["tpu"]["data_parallel"] (or grid_sharded) as usual — the mesh
    # helpers build over jax.devices(), which is GLOBAL after init.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator: str, num_processes: int, process_id: int,
               timeout_s: int = 120) -> int:
    """jax.distributed.initialize + CPU-collectives selection.  MUST run
    before the first jax backend use (first device op / jax.devices()).
    Returns this process's index."""
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms.startswith("cpu"):
        # CPU backend needs an explicit cross-process collectives
        # implementation (gloo over TCP); TPU/GPU backends bring their own
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=timeout_s)
    return jax.process_index()


def initialize_from_cfg(cfg: dict) -> Optional[int]:
    """Initialize from cfg["tpu"]["multihost"] = {coordinator,
    num_processes, process_id} with env-var overrides
    (NICE_SLAM_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID — the
    launcher-friendly path: one yaml, per-process env).  Returns the
    process index, or None when multihost is not configured."""
    mh = cfg.get("tpu", {}).get("multihost")
    env_coord = os.environ.get("NICE_SLAM_TPU_COORDINATOR")
    if not mh and not env_coord:
        return None
    mh = dict(mh or {})
    coord = env_coord or mh.get("coordinator", "127.0.0.1:12765")
    n = int(os.environ.get("NICE_SLAM_TPU_NUM_PROCESSES",
                           mh.get("num_processes", 1)))
    pid = int(os.environ.get("NICE_SLAM_TPU_PROCESS_ID",
                             mh.get("process_id", 0)))
    if n <= 1:
        return None
    return initialize(coord, n, pid)


def is_primary() -> bool:
    """True on the process that owns filesystem outputs (ckpts, meshes,
    ate.json) — every process computes identical state, so only one
    needs to persist it."""
    import jax

    return jax.process_index() == 0
