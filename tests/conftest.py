"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run anywhere, and enable the persistent compilation cache (this
sandbox has few cores; first-run compiles dominate otherwise)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# deterministic decode math in tests regardless of backend: the fused
# Pallas kernel (TPU) uses MXU-speed matmuls whose rounding differs from
# the f32-highest jnp path; TPU-specific kernel tests opt back in.
os.environ.setdefault("NICE_SLAM_TPU_FUSED", "0")
# likewise pin the bf16 corner-gather fast path off (TPU default-on):
# oracle comparisons need the f32 gather; test_ops opts back in to cover it
os.environ.setdefault("NICE_SLAM_TPU_INTERP_BF16", "0")
# and the cell-mirror gather (TPU default-on; float-reassociated lerp):
# test_ops opts back in to cover it against the plain path
os.environ.setdefault("NICE_SLAM_TPU_MIRROR", "0")
# and the packed fine+color interp (TPU default-on): test_models opts in
os.environ.setdefault("NICE_SLAM_TPU_PACK_FC", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

# keep torch (test oracle) from fighting jax for the 2 cores
try:
    import torch

    torch.set_num_threads(1)
except ImportError:
    pass

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    Full-suite runs (~150 tests, hundreds of distinct XLA:CPU programs
    alive in one process) intermittently SEGFAULT inside
    `backend_compile_and_load` on a later compile (observed twice in
    round 3, different tests each time; every <=6-file subset of the same
    suite is green).  The crash is load-dependent compiler state, not any
    one test.  Clearing jax's executable caches at module boundaries
    bounds the live-program count; re-runs re-trace but reload compiled
    artifacts from the persistent cache, so the time cost is small."""
    yield
    import jax

    jax.clear_caches()
