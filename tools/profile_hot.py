#!/usr/bin/env python
"""Microbenchmark the SLAM hot paths at the Replica compute budget.

Times (steady-state, compile excluded):
- render_rays forward (tracking batch: 200 rays x 48 samples, color stage)
- tracking loss+grad (what one tracking iter costs)
- track_frame (10-iter scan)
- mapping loss+grad (1000 rays over a 5-frame window)
- map_optimize (60-iter staged schedule)
- trilinear interp alone (the gather kernel)

Run on the TPU: `python tools/profile_hot.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2, **kw):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from nice_slam_tpu.camera import Camera
    from nice_slam_tpu.config import load_config, specs_from_config
    from nice_slam_tpu.keyframes import add_keyframe, build_window, make_store
    from nice_slam_tpu.mapping import grid_masks, map_optimize, mapping_loss
    from nice_slam_tpu.ops import tensor_from_cam
    from nice_slam_tpu.ops.grid import trilinear_interp
    from nice_slam_tpu.render import render_rays
    from nice_slam_tpu.state import make_map_state
    from nice_slam_tpu.tracking import track_frame, tracking_loss

    print("devices:", jax.devices())
    # Replica room0-like setup
    cfg = load_config(overrides={
        "cam": {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                "cx": 599.5, "cy": 339.5},
        "mapping": {"bound": [[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]]},
    })
    s = specs_from_config(cfg)
    state = make_map_state(jax.random.PRNGKey(0), s.model,
                           cfg["mapping"]["bound"], cfg["grid_len"], 0.32)
    print("grid shapes:", {k: v.shape for k, v in state.grids.items()})

    cam = s.camera
    key = jax.random.PRNGKey(1)
    color = jnp.full((cam.H, cam.W, 3), 0.5)
    depth = jnp.full((cam.H, cam.W), 2.0)

    # --- trilinear interp alone (mapping-scale batch)
    n_pts = 48 * 1000
    p = jax.random.uniform(key, (n_pts, 3), minval=-1, maxval=1)
    interp = jax.jit(lambda g, pp: trilinear_interp(g, pp))
    t = timeit(interp, state.grids["fine"], p)
    print(f"trilinear_interp fine {n_pts} pts:        {t * 1e3:8.3f} ms")

    # --- render forward, tracking batch
    n_rays = 200
    rays_o = jnp.zeros((n_rays, 3)) + jnp.array([1.0, 1.0, 0.0])
    rays_d = jnp.concatenate(
        [jnp.zeros((n_rays, 2)), -jnp.ones((n_rays, 1))], axis=1)
    gt_d = jnp.full((n_rays,), 2.0)

    fwd = jax.jit(lambda pr, g, o, d, gd, k: render_rays(
        pr, s.model, g, state.bound, o, d, k, s.render, "color", gd)[0])
    t = timeit(fwd, state.params, state.grids, rays_o, rays_d, gt_d, key)
    print(f"render fwd 200x48 (tracking iter fwd):   {t * 1e3:8.3f} ms")

    # --- tracking loss + grad
    cam0 = tensor_from_cam(jnp.eye(4))
    lg = jax.jit(jax.value_and_grad(
        lambda c, k: tracking_loss(c, state.params, state.grids, state.bound,
                                   color, depth, k, cam, s.track, s.render,
                                   s.model)))
    t = timeit(lg, cam0, key)
    print(f"tracking loss+grad (1 iter):             {t * 1e3:8.3f} ms")

    # --- full tracked frame (10-iter scan)
    t = timeit(track_frame, state.params, state.grids, state.bound, cam0,
               color, depth, key, cam, s.track, s.render, s.model, n=5)
    print(f"track_frame (10 iters):                  {t * 1e3:8.3f} ms")

    # --- mapping: window + one full 60-iter call
    store = make_store(8, cam.H, cam.W)
    eye = jnp.eye(4)
    for i in range(3):
        store = add_keyframe(store, color, depth, eye, eye, i)
    window = build_window(store, jnp.array([0, 1, 2], jnp.int32),
                          jnp.ones((3,), bool), color, depth, eye)
    masks = grid_masks(state.grids, state.bound, eye, depth, cam, True, 2)
    cams0 = tensor_from_cam(window["c2ws"][:, :3, :])
    lr_mask = jnp.zeros((5,))

    mlg = jax.jit(jax.value_and_grad(
        lambda tr, k: mapping_loss(tr, window, state.bound, k, cam, "color",
                                   s.mapper, s.render, s.model)))
    tree = {"params": state.params, "grids": state.grids, "cams": cams0}
    t = timeit(mlg, tree, key, n=5)
    print(f"mapping loss+grad (1 iter, 1000 rays):   {t * 1e3:8.3f} ms")

    it = s.mapper.stage_iters(60)
    stage_iters = tuple((st, it[st]) for st in
                        ("coarse", "middle", "fine", "color") if it[st] > 0)
    t = timeit(map_optimize, state.params, state.grids, state.bound, window,
               cams0, masks, lr_mask, jnp.float32(1.0), key, cam,
               stage_iters, s.mapper, s.render, s.model, n=3, warmup=1)
    print(f"map_optimize (60 iters):                 {t * 1e3:8.3f} ms")

    per_group = 5 * float(timeit(track_frame, state.params, state.grids,
                                 state.bound, cam0, color, depth, key, cam,
                                 s.track, s.render, s.model, n=5))
    print(f"\nimplied fps (5 tracks + 1 map + 1 coarse~=map): "
          f"{5 / (per_group + 2 * t):0.2f}")


if __name__ == "__main__":
    main()
