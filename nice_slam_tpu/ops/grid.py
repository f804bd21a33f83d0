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

import os
from contextlib import contextmanager

import jax
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


def _interp_impl(grid: jnp.ndarray, p_nor: jnp.ndarray,
                 gather_dtype=None) -> jnp.ndarray:
    """Plain trilinear interpolation (XLA autodiff backward: 8 gathers
    whose transpose is 8 vertex-indexed scatter-adds of N rows each).

    gather_dtype: optional narrow dtype (bf16) for the corner GATHERS —
    the 8-row random-access reads are HBM-bandwidth-bound, so halving the
    row bytes halves the dominant cost of the forward.  The lerp itself
    stays f32 (bf16 corner * f32 weight promotes to f32)."""
    nx, ny, nz, C = grid.shape
    u = grid_coords(p_nor, (nx, ny, nz))  # (N, 3)

    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                  jnp.array([max(nx - 2, 0), max(ny - 2, 0), max(nz - 2, 0)]))
    f = u - i0.astype(u.dtype)  # (N, 3) in [0, 1]
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1]))

    if gather_dtype is not None and grid.dtype != gather_dtype:
        grid = grid.astype(gather_dtype)  # one dense ~MB convert vs
    flat = grid.reshape(nx * ny * nz, C)  # 8 x N row reads

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


def _corner_weights(f):
    """(N, 3) fractional offsets -> (N, 8) trilinear corner weights in the
    (a, b, c) = x-major corner order used throughout this module."""
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
    wx = jnp.concatenate([1.0 - fx, fx], axis=1)
    wy = jnp.concatenate([1.0 - fy, fy], axis=1)
    wz = jnp.concatenate([1.0 - fz, fz], axis=1)
    return (wx[:, :, None, None] * wy[:, None, :, None]
            * wz[:, None, None, :]).reshape(-1, 8)


def _interp_impl_mirror(grid: jnp.ndarray, p_nor: jnp.ndarray,
                        gather_dtype=None) -> jnp.ndarray:
    """Trilinear interpolation through a CELL-CORNER MIRROR: a dense
    (nx-1, ny-1, nz-1, 8*C) buffer whose row for cell (x, y, z) holds all
    8 corner features, built with 8 shifted slices + concat.  One row
    gather per point then fetches every corner at once.

    Why: on TPU the corner fetch cost is per-ROW (a 128-lane row gather
    costs the same as a 32-lane one; measured in
    tools/microbench_scatter.py), so 1 wide gather beats 8 narrow ones
    ~1.6x even counting the mirror build — and XLA CSEs the build across
    every interp of the same grid inside one program (all iterations of a
    mapping scan see one build per grid per iteration).  Numerics: exact
    same corner values; the lerp is the Σ w_k·c_k form instead of the
    nested form (float reassociation only).  Requires min(n) >= 2
    (callers route tiny grids to _interp_impl)."""
    nx, ny, nz, C = grid.shape
    u = grid_coords(p_nor, (nx, ny, nz))
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                  jnp.array([nx - 2, ny - 2, nz - 2]))
    f = u - i0.astype(u.dtype)

    if gather_dtype is not None and grid.dtype != gather_dtype:
        grid = grid.astype(gather_dtype)
    mirror = jnp.concatenate(
        [grid[a:nx - 1 + a, b:ny - 1 + b, c:nz - 1 + c]
         for a in (0, 1) for b in (0, 1) for c in (0, 1)],
        axis=-1).reshape((nx - 1) * (ny - 1) * (nz - 1), 8 * C)

    cell = (i0[:, 0] * (ny - 1) + i0[:, 1]) * (nz - 1) + i0[:, 2]
    rows = mirror[cell]                                        # (N, 8C)
    w = _corner_weights(f)                                     # (N, 8)
    # explicit VPU multiply-sum, NOT einsum/dot: an 8-long contraction
    # lowered onto the MXU would round the f32 weights/features to bf16.
    # Accumulate over LANE SLICES of the gathered row rather than a
    # reshape-to-(N, 8, C) reduction: the slice form keeps every
    # intermediate row-major, so both this forward and its vjp (the
    # d/dw contraction in the pose backward) lower without the relayout
    # copies the (N, 8, C) form provoked (round-3 xprof: ~7 ms/group).
    out = None
    for k in range(8):
        term = rows[:, k * C:(k + 1) * C].astype(p_nor.dtype) * w[:, k:k + 1]
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# Moment-scatter backward
#
# Round-1 op-level profiling (tools/xprof_summary.py, README) measured the
# grid-GRADIENT scatter-adds at 64% of a color-stage mapping iteration
# (~3.2 ms per grid level), and found the cost row-count-bound: merged
# scatters, pre-sorting and segment_sum all lowered to the same or worse.
# The 8x row cut below is the lever that works: instead of XLA's transpose
# of 8 gathers (8 scatters x N rows x C values into grid VERTICES), scatter
# ONE row per point into its containing CELL, carrying all 8 corner-weighted
# cotangents (8*C values), then fold the (Ncells, 2,2,2, C) moment buffer
# onto the (Nx, Ny, Nz, C) vertex grid with 8 dense pad-and-add shifts —
# vertex (x,y,z) accumulates corner (a,b,c) of cell (x-a, y-b, z-c).  The
# fold is dense, fully vectorized, and a few hundred microseconds of HBM
# traffic; the scatter does 8x fewer rows at 8x the row width.  The result
# is bit-identical to the autodiff gradient (same weights, same adds up to
# float reassociation) — asserted by tests/test_ops.py.

def _moment_scatter_bwd(res, g):
    grid, p_nor = res
    nx, ny, nz, C = grid.shape

    # grad w.r.t. p_nor: autodiff of the forward with the grid frozen —
    # ALWAYS from f32 corners, even when the primal forward gathers bf16.
    # d(interp)/dp is built from corner DIFFERENCES; on a converged
    # (smooth) grid adjacent corners nearly cancel, so bf16 corner
    # rounding would be amplified into the pose gradients that drive
    # tracking.  The f32 gather costs the same (corner-fetch cost is
    # per-row, not per-byte).
    fwd = _fwd_impl(grid.shape)
    _, pull = jax.vjp(
        lambda pn: fwd(jax.lax.stop_gradient(grid), pn, None), p_nor)
    (gp,) = pull(g)

    u = grid_coords(p_nor, (nx, ny, nz))
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                  jnp.array([nx - 2, ny - 2, nz - 2]))
    f = u - i0.astype(u.dtype)
    w = _corner_weights(f)                                  # (N, 8)
    # corner-major lane layout matching the fold's slices; built as a
    # lane concat of 8 row-major products (the broadcast-reshape form
    # materialized column-major and cost a relayout copy per backward)
    vals = jnp.concatenate([w[:, k:k + 1] * g for k in range(8)], axis=1)

    # Optional bf16 MOMENT BUFFER (env NICE_SLAM_TPU_MSCATTER_BF16): the
    # (Ncells, 8C) buffer's dense zero-init + fold reads dominate the
    # backward's HBM traffic once Ncells >> N (e.g. 172k cells x 2 KB rows
    # for a fine||color pair); storing it bf16 halves that.  MEASURED
    # NEGATIVE (round 3): +4.4% bench fps (14.74 -> 15.38) but bf16
    # rounding of the per-cell adds wrecks the map gradients — 0.59 m ATE
    # vs 0.08 m baseline on the 120-frame synthetic (seed 0).  Keep OFF;
    # kept only as an A/B knob for future grids with more contributions
    # per cell.
    mdt = (jnp.bfloat16
           if os.environ.get("NICE_SLAM_TPU_MSCATTER_BF16", "0") == "1"
           else g.dtype)
    cell = (i0[:, 0] * (ny - 1) + i0[:, 1]) * (nz - 1) + i0[:, 2]
    m = jnp.zeros(((nx - 1) * (ny - 1) * (nz - 1), 8 * C), mdt)
    m = m.at[cell].add(vals.astype(mdt),
                       mode="promise_in_bounds")            # in-range by clip

    # fold the cell moments onto grid vertices.  Per-corner slabs are cut
    # as flat LANE slices m[:, kC:(k+1)C] (contiguous in the row-major
    # moment buffer) rather than reshaping to (..., 2, 2, 2, C) and
    # slicing the middle dims — the 7-D form made XLA materialize a
    # relaid-out copy of the whole buffer per backward (~3 ms/group in the
    # round-3 trace); the lane-slice form is copy-free and bit-identical
    # (same adds, same order).
    gg = None
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                k = ((a * 2) + b) * 2 + c
                slab = m[:, k * C:(k + 1) * C].reshape(
                    nx - 1, ny - 1, nz - 1, C)
                part = jnp.pad(slab,
                               ((a, 1 - a), (b, 1 - b), (c, 1 - c), (0, 0)))
                gg = part if gg is None else gg + part
    return (gg.astype(g.dtype) if gg.dtype != g.dtype else gg), gp


def _gather_dtype():
    """Trace-time choice of the corner-gather dtype.  Default: bf16 on
    TPU backends (the GEMMs already consume the features in bf16, so the
    gather rounding adds nothing new to the decode; gradients stay exact
    f32 through the moment-scatter backward).  Env overrides:
    NICE_SLAM_TPU_INTERP_BF16=0 forces f32, =1 forces bf16 on any
    backend (tests exercise the path on CPU)."""
    env = os.environ.get("NICE_SLAM_TPU_INTERP_BF16", "")
    if env == "0":
        return None
    if env == "1":
        return jnp.bfloat16
    return (jnp.bfloat16 if jax.default_backend() in ("tpu", "axon")
            else None)


def _fwd_impl(shape):
    """Trace-time choice of the interp forward: the cell-mirror single
    gather (TPU default; see _interp_impl_mirror) or the plain 8-gather
    lerp.  NICE_SLAM_TPU_MIRROR=0/1 overrides (tests pin 0 on CPU for
    bit-stable oracle comparisons and opt back in to cover the mirror)."""
    nx, ny, nz, _ = shape
    env = os.environ.get("NICE_SLAM_TPU_MIRROR", "")
    on = (env == "1" or (env != "0"
                         and jax.default_backend() in ("tpu", "axon")))
    return _interp_impl_mirror if on and min(nx, ny, nz) >= 2 \
        else _interp_impl


@jax.custom_vjp
def _interp_mscatter(grid, p_nor):
    return _fwd_impl(grid.shape)(grid, p_nor, _gather_dtype())


_interp_mscatter.defvjp(lambda grid, p_nor:
                        (_fwd_impl(grid.shape)(grid, p_nor, _gather_dtype()),
                         (grid, p_nor)),
                        _moment_scatter_bwd)


_FORCE_PLAIN = False


@contextmanager
def plain_interp():
    """Trace-time escape hatch: route trilinear_interp through the plain
    XLA-autodiff implementation.  custom_vjp functions reject forward-mode
    AD, so any jacfwd/jvp through the decode path (e.g. the Gauss-Newton
    pose Jacobians in parallel/schur_ba.py) must trace inside this
    context.  Python-level state consulted at trace time only."""
    global _FORCE_PLAIN
    old = _FORCE_PLAIN
    _FORCE_PLAIN = True
    try:
        yield
    finally:
        _FORCE_PLAIN = old


def trilinear_interp(grid: jnp.ndarray, p_nor: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolate `grid` [Nx, Ny, Nz, C] at p_nor (N, 3) in
    [-1, 1]^3 (x, y, z order).  Returns (N, C).

    Differentiable w.r.t. both grid (backward = one moment scatter + dense
    fold, see _moment_scatter_bwd; NICE_SLAM_TPU_MSCATTER=0 reverts to the
    XLA autodiff scatters — the choice is read at TRACE time) and p_nor.
    Forward-mode AD requires the plain_interp() context."""
    nx, ny, nz, _ = grid.shape
    if (_FORCE_PLAIN or min(nx, ny, nz) < 2 or p_nor.ndim != 2
            or os.environ.get("NICE_SLAM_TPU_MSCATTER", "1") == "0"):
        return _interp_impl(grid, p_nor)
    return _interp_mscatter(grid, p_nor)


def grid_shape_for_bound(bound, voxel_len: float, enlarge: int = 1):
    """Voxel counts [Nx, Ny, Nz] for an AABB, reference grid sizing
    (src/NICE_SLAM.py:216-248): int(xyz_len * enlarge / voxel_len)."""
    import numpy as np

    xyz_len = np.asarray(bound)[:, 1] - np.asarray(bound)[:, 0]
    return [int(v) for v in (xyz_len * enlarge / voxel_len)]
