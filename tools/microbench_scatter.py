#!/usr/bin/env python
"""Microbenchmark the grid-gradient backward alternatives on the live
backend: the moment scatter + pad-shift fold (current), a conv-based
fold, and a one-hot matmul scatter for small-cell-count grids.
`--gather` benchmarks the interp FORWARD's corner-fetch variants.

These are the ops the round-1/round-2 xprof traces put at >40% of the
mapping step (see README + tools/xprof_summary.py).  Run on the TPU:

    python tools/microbench_scatter.py [--gather]

Measured results (v5e, 48k points, Replica-budget shapes):
- scatter cost is ROW-COUNT-bound: ~0.84 ms per 48k-row scatter
  regardless of cell count (567 or 24025) or row width (256 or 512).
- one-hot MXU scatter only wins at tiny cell counts (coarse 0.50 vs
  0.84 ms) and loses at middle size (1.09 ms); f32 operand traffic
  dominates.
- pad-shift fold (0.275 ms) beats the conv-kernel fold (0.318 ms).
- gather cost is PER-ROW, not per-byte: 8 narrow corner gathers 0.95 ms
  vs ONE 8C-row gather from a cell-corner mirror 0.60 ms (incl. the
  dense mirror build) — the basis of ops/grid.py:_interp_impl_mirror.
- a 2-operand-dim lax.gather (z-pair slices) lowers catastrophically
  (230 ms) — never use start_index_map with a lane-dim start on TPU.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=100):
    """Time `fn` amortized over `iters` executions INSIDE one jitted
    program (fori_loop), so the remote-attach RPC floor (~17-26 ms per
    dispatch here) cancels out.  The loop carry perturbs the first arg
    so the body can't be hoisted out of the loop."""

    def looped(a0, rest):
        def body(_, carry):
            out = fn(carry, *rest)
            return carry + (jnp.sum(out) * 1e-30).astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, a0)

    jl = jax.jit(looped)
    jax.block_until_ready(jl(args[0], args[1:]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jl(args[0], args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms


def moments(key, n_pts, shape, C=32):
    """Random (cell, vals) scatter inputs shaped like a mapping iter."""
    nx, ny, nz = shape
    k1, k2 = jax.random.split(key)
    cell = jax.random.randint(k1, (n_pts,), 0, (nx - 1) * (ny - 1) * (nz - 1))
    vals = jax.random.normal(k2, (n_pts, 8 * C))
    return cell, vals


def fold_padshift(m, shape, C=32):
    nx, ny, nz = shape
    m = m.reshape(nx - 1, ny - 1, nz - 1, 2, 2, 2, C)
    gg = None
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                part = jnp.pad(m[..., a, b, c, :],
                               ((a, 1 - a), (b, 1 - b), (c, 1 - c), (0, 0)))
                gg = part if gg is None else gg + part
    return gg


def _fold_kernel(C):
    # K[1-a, 1-b, 1-c, (a*4+b*2+c)*C+ch, ch] = 1
    K = np.zeros((2, 2, 2, 8 * C, C), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                k = (a * 4 + b * 2 + c) * C
                for ch in range(C):
                    K[1 - a, 1 - b, 1 - c, k + ch, ch] = 1.0
    return jnp.asarray(K)


def fold_conv(m, shape, C=32, kernel=None):
    nx, ny, nz = shape
    x = m.reshape(1, nx - 1, ny - 1, nz - 1, 8 * C)
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        precision="highest")
    return out[0]


def scatter_add(cell, vals, n_cells):
    m = jnp.zeros((n_cells, vals.shape[1]), vals.dtype)
    return m.at[cell].add(vals, mode="promise_in_bounds")


def onehot_matmul(cell, vals, n_cells, precision="float32"):
    oh = (cell[None, :] == jnp.arange(n_cells)[:, None]).astype(vals.dtype)
    return jnp.dot(oh, vals, precision=precision,
                   preferred_element_type=jnp.float32)


def main():
    print(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    C = 32
    N = 48000

    # fine grid (Replica-ish): 32x26x32; middle: 15x12x15; coarse 7x9x9
    for name, shape in (("fine", (32, 26, 32)), ("middle", (15, 12, 15)),
                        ("coarse", (8, 10, 10))):
        nx, ny, nz = shape
        n_cells = (nx - 1) * (ny - 1) * (nz - 1)
        cell, vals = moments(key, N, shape, C)
        m = scatter_add(cell, vals, n_cells)

        t_sc = timeit(jax.jit(lambda c, v: scatter_add(c, v, n_cells)),
                      cell, vals)
        t_fold = timeit(jax.jit(lambda mm: fold_padshift(mm, shape, C)), m)
        kern = _fold_kernel(C)
        t_conv = timeit(jax.jit(
            lambda mm: fold_conv(mm, shape, C, kern)), m)
        line = (f"{name:7s} cells={n_cells:6d}  scatter {t_sc:7.3f} ms   "
                f"fold/padshift {t_fold:7.3f} ms   fold/conv {t_conv:7.3f} ms")
        if n_cells <= 4096:
            t_oh32 = timeit(jax.jit(
                lambda c, v: onehot_matmul(c, v, n_cells, "float32")),
                cell, vals)
            t_ohhi = timeit(jax.jit(
                lambda c, v: onehot_matmul(c, v, n_cells, "highest")),
                cell, vals)
            line += (f"   onehot/f32 {t_oh32:7.3f} ms"
                     f"   onehot/highest {t_ohhi:7.3f} ms")
        # correctness spot checks
        f1 = fold_padshift(m, shape, C)
        f2 = fold_conv(m, shape, C, kern)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   rtol=1e-5, atol=1e-4)
        if n_cells <= 4096:
            o1 = onehot_matmul(cell, vals, n_cells, "highest")
            np.testing.assert_allclose(np.asarray(o1), np.asarray(m),
                                       rtol=1e-4, atol=1e-3)
        print(line)




# ---------------------------------------------------------------------------
# Gather-side variants (run with --gather): the interp forward's 8 corner
# gathers vs 4 z-pair gathers (corners (...,z0),(...,z0+1) are contiguous
# in the [Nx,Ny,Nz,C] layout -> one 2C-wide slice per xy-corner).

def gather8(flat, lin_idx8, C):
    # lin_idx8: (8, N) vertex row ids
    return [flat[lin_idx8[k]] for k in range(8)]


def gather4_zpair(grid2d, row4, col0, C):
    """grid2d: (nx*ny, nz*C); row4: (4, N) xy-row ids; col0: (N,) = z0*C.
    Returns 4 arrays (N, 2C)."""
    import jax.lax as lax
    outs = []
    for k in range(4):
        idx = jnp.stack([row4[k], col0], axis=1)  # (N, 2)
        outs.append(lax.gather(
            grid2d, idx,
            lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0, 1)),
            slice_sizes=(1, 2 * C),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS))
    return outs


def main_gather():
    print(f"backend: {jax.default_backend()}  [gather variants]")
    key = jax.random.PRNGKey(0)
    C = 32
    N = 48000
    for name, shape, dt in (("fine/f32", (32, 26, 32), jnp.float32),
                            ("fine/bf16", (32, 26, 32), jnp.bfloat16),
                            ("packed64/bf16", (32, 26, 32), jnp.bfloat16)):
        nx, ny, nz = shape
        Ceff = 64 if name.startswith("packed") else C
        k1, k2 = jax.random.split(key)
        grid = jax.random.normal(k1, (nx, ny, nz, Ceff)).astype(dt)
        i0 = jnp.stack([
            jax.random.randint(k2, (N,), 0, nx - 1),
            jax.random.randint(jax.random.fold_in(k2, 1), (N,), 0, ny - 1),
            jax.random.randint(jax.random.fold_in(k2, 2), (N,), 0, nz - 1),
        ], axis=1)

        flat = grid.reshape(-1, Ceff)

        def lin(ix, iy, iz):
            return (ix * ny + iy) * nz + iz

        x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
        idx8 = jnp.stack([lin(x0 + a, y0 + b, z0 + c)
                          for a in (0, 1) for b in (0, 1) for c in (0, 1)])
        grid2d = grid.reshape(nx * ny, nz * Ceff)
        row4 = jnp.stack([(x0 + a) * ny + (y0 + b)
                          for a in (0, 1) for b in (0, 1)])
        col0 = z0 * Ceff

        def f8(flat_, idx8_):
            return sum(gather8(flat_, idx8_, Ceff)).astype(jnp.float32)

        def f4(g2d_, row4_, col0_):
            return sum(gather4_zpair(g2d_, row4_, col0_, Ceff)).astype(
                jnp.float32)

        t8 = timeit(jax.jit(f8), flat, idx8)
        t4 = timeit(jax.jit(f4), grid2d, row4, col0)
        # parity
        a = jax.jit(f8)(flat, idx8)
        b = jax.jit(f4)(grid2d, row4, col0)
        b = b[:, :Ceff] + b[:, Ceff:]
        pair_sum = a  # 8 corners summed = 4 pairs summed both halves
        np.testing.assert_allclose(np.asarray(b), np.asarray(pair_sum),
                                   rtol=1e-3, atol=1e-2)
        print(f"{name:14s} gather8 {t8:7.3f} ms   gather4-zpair {t4:7.3f} ms")


if __name__ == "__main__":
    import sys
    if "--gather" in sys.argv:
        main_gather()
    else:
        main()
