"""Native (C++) runtime kernels with build-on-import + numpy fallbacks.

The compiled library is cached next to the sources; if no toolchain is
available the pure-numpy fallbacks keep everything functional (slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    srcs = [os.path.join(_DIR, "marching_cubes.cpp")]
    extra = os.path.join(_DIR, "mesh_ops.cpp")
    if os.path.exists(extra):
        srcs.append(extra)
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < newest_src):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-o", _LIB_PATH] + srcs
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except Exception:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mt_run.restype = ctypes.c_void_p
    lib.mt_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.mt_nverts.restype = ctypes.c_int64
    lib.mt_nverts.argtypes = [ctypes.c_void_p]
    lib.mt_ntris.restype = ctypes.c_int64
    lib.mt_ntris.argtypes = [ctypes.c_void_p]
    lib.mt_get.restype = None
    lib.mt_get.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_int64)]
    lib.mt_free.restype = None
    lib.mt_free.argtypes = [ctypes.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def marching_tetrahedra(volume: np.ndarray, iso: float,
                        origin, spacing) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of volume (nx, ny, nz) at `iso`.

    Surface lies where the field crosses `iso` ("inside" = value > iso).
    Returns (verts (V,3) f32 world coords, tris (T,3) int64)."""
    volume = np.ascontiguousarray(volume, np.float32)
    origin = np.asarray(origin, np.float32)
    spacing = np.asarray(spacing, np.float32)

    lib = get_lib()
    if lib is not None:
        h = lib.mt_run(
            volume.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            volume.shape[0], volume.shape[1], volume.shape[2],
            ctypes.c_float(iso),
            origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        try:
            nv = lib.mt_nverts(h)
            nt = lib.mt_ntris(h)
            verts = np.empty((nv, 3), np.float32)
            tris = np.empty((nt, 3), np.int64)
            if nv:
                lib.mt_get(
                    h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return verts, tris
        finally:
            lib.mt_free(h)
    return _marching_tetrahedra_numpy(volume, iso, origin, spacing)


# ---------------------------------------------------------------------------
# Pure-numpy fallback (same tetrahedral decomposition; also the test oracle)

_TETS = np.array([[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7],
                  [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]])
_CORNER_OFF = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                        [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]])


def _marching_tetrahedra_numpy(vol, iso, origin, spacing):
    nx, ny, nz = vol.shape
    inside = vol > iso

    # global corner ids per cube corner: (8, nx-1, ny-1, nz-1)
    X, Y, Z = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                          np.arange(nz - 1), indexing="ij")
    corner_gid = np.stack([
        ((X + ox) * ny + (Y + oy)) * nz + (Z + oz)
        for ox, oy, oz in _CORNER_OFF])  # (8, ...)
    corner_in = inside.reshape(-1)[corner_gid]

    edges = {}
    verts = []
    tris = []
    flat_vol = vol.reshape(-1).astype(np.float64)

    def edge_vertex(ga, gb):
        if ga > gb:
            ga, gb = gb, ga
        k = (ga, gb)
        vid = edges.get(k)
        if vid is not None:
            return vid
        va, vb = flat_vol[ga], flat_vol[gb]
        t = 0.5 if vb == va else np.clip((iso - va) / (vb - va), 0.0, 1.0)
        az, ay, ax = ga % nz, (ga // nz) % ny, ga // (nz * ny)
        bz, by, bx = gb % nz, (gb // nz) % ny, gb // (nz * ny)
        p = (origin + spacing * np.array([ax + t * (bx - ax),
                                          ay + t * (by - ay),
                                          az + t * (bz - az)]))
        vid = len(verts)
        verts.append(p)
        edges[k] = vid
        return vid

    # only cubes with a crossing
    any_in = corner_in.any(axis=0)
    any_out = (~corner_in).any(axis=0)
    active = np.argwhere(any_in & any_out)
    cg_flat = corner_gid.reshape(8, -1)
    shape3 = (nx - 1, ny - 1, nz - 1)
    for (cx, cy, cz) in active:
        lin = (cx * shape3[1] + cy) * shape3[2] + cz
        cg = cg_flat[:, lin]
        for tet in _TETS:
            g = cg[tet]
            tin = flat_vol[g] > iso
            s = int(tin.sum())
            if s == 0 or s == 4:
                continue
            pick = True if s <= 2 else False
            lone = [i for i in range(4) if tin[i] == pick]
            other = [i for i in range(4) if tin[i] != pick]
            if len(lone) == 1:
                a = edge_vertex(g[lone[0]], g[other[0]])
                b = edge_vertex(g[lone[0]], g[other[1]])
                c = edge_vertex(g[lone[0]], g[other[2]])
                if len({a, b, c}) == 3:
                    tris.append((a, b, c))
            else:
                a = edge_vertex(g[lone[0]], g[other[0]])
                b = edge_vertex(g[lone[0]], g[other[1]])
                c = edge_vertex(g[lone[1]], g[other[1]])
                d = edge_vertex(g[lone[1]], g[other[0]])
                if len({a, b, c}) == 3:
                    tris.append((a, b, c))
                if len({a, c, d}) == 3:
                    tris.append((a, c, d))

    verts = (np.asarray(verts, np.float32) if verts
             else np.zeros((0, 3), np.float32))
    tris = (np.asarray(tris, np.int64) if tris
            else np.zeros((0, 3), np.int64))
    return verts, tris
