"""Feature-grid storage and trilinear interpolation.

TPU layout decision: grids are stored `[Nx, Ny, Nz, C]` with the channel
dim last (lane dimension), unlike the reference's `[1, C, Nz, Ny, Nx]`
torch layout for F.grid_sample (reference src/NICE_SLAM.py:192-250,
src/conv_onet/models/decoder.py:168-175).  Interpolation is 8-corner
gather + lerp with align_corners=True / border-clamp semantics, matching
`F.grid_sample(..., padding_mode='border', align_corners=True)` exactly.

The jnp implementation below is the reference path; a fused Pallas kernel
can be swapped in behind the same signature (ops/pallas/).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_coords(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """World coords (..., 3) -> [-1, 1]^3 w.r.t. AABB `bound` (3, 2).

    (reference src/common.py:269-284)"""
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0


def grid_coords(p_nor: jnp.ndarray, shape) -> jnp.ndarray:
    """[-1,1] coords -> continuous voxel coords with align_corners=True."""
    sizes = jnp.array(shape, dtype=p_nor.dtype)
    u = (p_nor + 1.0) * 0.5 * (sizes - 1.0)
    # border padding: clamp to the valid range
    return jnp.clip(u, 0.0, sizes - 1.0)


def trilinear_interp(grid: jnp.ndarray, p_nor: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolate `grid` [Nx, Ny, Nz, C] at p_nor (N, 3) in
    [-1, 1]^3 (x, y, z order).  Returns (N, C).

    Differentiable w.r.t. both grid (backward = scatter-add) and p_nor.
    """
    nx, ny, nz, C = grid.shape
    u = grid_coords(p_nor, (nx, ny, nz))  # (N, 3)

    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                  jnp.array([max(nx - 2, 0), max(ny - 2, 0), max(nz - 2, 0)]))
    f = u - i0.astype(u.dtype)  # (N, 3) in [0, 1]
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1]))

    flat = grid.reshape(nx * ny * nz, C)

    def lin(ix, iy, iz):
        return (ix * ny + iy) * nz + iz

    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1, z1 = i1[:, 0], i1[:, 1], i1[:, 2]
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]

    c000 = flat[lin(x0, y0, z0)]
    c001 = flat[lin(x0, y0, z1)]
    c010 = flat[lin(x0, y1, z0)]
    c011 = flat[lin(x0, y1, z1)]
    c100 = flat[lin(x1, y0, z0)]
    c101 = flat[lin(x1, y0, z1)]
    c110 = flat[lin(x1, y1, z0)]
    c111 = flat[lin(x1, y1, z1)]

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def grid_shape_for_bound(bound, voxel_len: float, enlarge: int = 1):
    """Voxel counts [Nx, Ny, Nz] for an AABB, reference grid sizing
    (src/NICE_SLAM.py:216-248): int(xyz_len * enlarge / voxel_len)."""
    import numpy as np

    xyz_len = np.asarray(bound)[:, 1] - np.asarray(bound)[:, 0]
    return [int(v) for v in (xyz_len * enlarge / voxel_len)]
