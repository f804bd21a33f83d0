"""The SLAM map state: feature grids + decoder params as one pytree.

Replaces the reference's shared-memory tensor dict + nn.Module
(src/NICE_SLAM.py:70-90, 192-250) with a plain pytree that jitted update
functions thread through.  Grids are [Nx, Ny, Nz, C] float32 (channel =
lane dim; see ops/grid.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.decoders import ModelSpec, init_model
from nice_slam_tpu.ops.grid import grid_shape_for_bound


def pad_bound(bound, bound_divisible: float):
    """Enlarge the AABB max so each side is divisible by `bound_divisible`
    (reference src/NICE_SLAM.py:147-150: int()+1 padding)."""
    b = np.array(bound, dtype=np.float64).copy()
    b[:, 1] = (((b[:, 1] - b[:, 0]) / bound_divisible).astype(int) + 1) \
        * bound_divisible + b[:, 0]
    return b


GRID_INIT_STD = {"coarse": 0.01, "middle": 0.01, "fine": 0.0001, "color": 0.01}


def init_grids(key, bound, grid_len: Dict[str, float], c_dim: int,
               coarse: bool, coarse_bound_enlarge: int = 2):
    """Allocate the hierarchical grids, N(0, std) init with the reference's
    per-level stds (src/NICE_SLAM.py:223-247)."""
    grids = {}
    names = (["coarse"] if coarse else []) + ["middle", "fine", "color"]
    keys = jax.random.split(key, len(names))
    for k, name in zip(keys, names):
        enlarge = coarse_bound_enlarge if name == "coarse" else 1
        nx, ny, nz = grid_shape_for_bound(bound, grid_len[name], enlarge)
        grids[name] = (jax.random.normal(k, (nx, ny, nz, c_dim))
                       * GRID_INIT_STD[name]).astype(jnp.float32)
    return grids


@dataclass
class MapState:
    """Mutable host-side container for the device pytrees."""
    params: Any           # decoder params pytree
    grids: Dict[str, jnp.ndarray]
    bound: jnp.ndarray    # (3, 2) f32

    def tree(self):
        return {"params": self.params, "grids": self.grids}


def make_map_state(key, spec: ModelSpec, bound, grid_len, bound_divisible: float,
                   occ_guided: bool = False):
    bound = pad_bound(bound, bound_divisible)
    kg, km = jax.random.split(key)
    grids = (init_grids(kg, bound, grid_len, spec.c_dim, spec.coarse,
                        spec.coarse_bound_enlarge) if spec.nice else {})
    if occ_guided and spec.nice:
        # non-trainable occupancy proxy for occupancy-guided ray sampling
        # (render.py); middle-grid resolution, init=1 (uniform sampling
        # until the first mapping refresh).  Lives in the grids dict so it
        # rides every pytree path; frozen by _lr_tree / zero-masked.
        nx, ny, nz = grid_shape_for_bound(bound, grid_len["middle"], 1)
        grids["occ_proxy"] = jnp.ones((nx, ny, nz, 1), jnp.float32)
    params = init_model(km, spec)
    return MapState(params=params, grids=grids,
                    bound=jnp.asarray(bound, jnp.float32))
