"""Pallas TPU kernels for the hot decode path."""

from nice_slam_tpu.ops.pallas.fused_decode import (
    fused_nice_decode,
    pack_nice_weights,
    pallas_available,
)
