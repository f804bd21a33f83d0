#!/usr/bin/env python
"""Scaling harness: one mapping step under each parallel mode at several
mesh sizes, with weak/strong scaling-efficiency series and a psum
microbenchmark against the docs/SCALING.md ICI cost model.

On real multi-chip hardware this measures scaling efficiency (the
BASELINE.md ">=70% at 2+ hosts" axis — run THIS script unchanged on a
pod); on the virtual CPU mesh (default here) it validates the collective
structure end-to-end and the JSON artifact marks itself
`"virtual": true` (virtual devices share host cores, so wall times do
NOT reflect real scaling).

Definitions (emitted per mesh size N):
  weak efficiency   = T(1) / T(N)       at CONSTANT per-device ray work
  strong efficiency = T(1) / (N * T(N)) at CONSTANT total ray work
The psum microbench times an all-reduce of a grid-gradient-sized buffer
and compares against the analytic all-reduce model
2*size*(N-1)/N / link_bw (docs/SCALING.md "Cost model").

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/bench_scaling.py --iters 4 --pixels 256 \
        --json SCALING.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--pixels", type=int, default=256,
                    help="per-device ray budget")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", type=str, default=None,
                    help="write the machine-readable artifact here "
                         "(e.g. SCALING.json)")
    ap.add_argument("--ici-gbps", type=float, default=100.0,
                    help="assumed per-link ICI bandwidth (GB/s) for the "
                         "psum model comparison (v5e ~100)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nice_slam_tpu.config import load_config, specs_from_config
    from nice_slam_tpu.keyframes import add_keyframe, build_window, make_store
    from nice_slam_tpu.mapping import grid_masks
    from nice_slam_tpu.models import nice_model_spec
    from nice_slam_tpu.ops import tensor_from_cam
    from nice_slam_tpu.parallel import dp_map_optimize, make_mesh
    from nice_slam_tpu.parallel.grid_sharded import (
        gs_map_optimize,
        make_mesh_2d,
        shard_grids,
    )
    from nice_slam_tpu.state import make_map_state

    n_dev = len(jax.devices())
    bound = [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]]
    grid_len = {"coarse": 1.0, "middle": 0.32, "fine": 0.16, "color": 0.16}
    cfg = load_config(overrides={
        "cam": {"H": 120, "W": 160, "fx": 120.0, "fy": 120.0,
                "cx": 79.5, "cy": 59.5},
        "grid_len": grid_len,
        "mapping": {"bound": bound, "pixels": args.pixels,
                    "mapping_window_size": 4},
        "rendering": {"N_samples": 24, "N_surface": 12},
    })
    specs = specs_from_config(cfg)
    cam = specs.camera
    mspec = nice_model_spec()
    state = make_map_state(jax.random.PRNGKey(0), mspec, bound, grid_len,
                           0.32)

    store = make_store(6, cam.H, cam.W)
    eye = jnp.eye(4).at[:3, 3].set(jnp.array([2.0, 1.5, 2.0]))
    color = jnp.full((cam.H, cam.W, 3), 0.5)
    depth = jnp.full((cam.H, cam.W), 1.5)
    for i in range(3):
        store = add_keyframe(store, color, depth, eye, eye, i)
    window = build_window(store, jnp.arange(2, dtype=jnp.int32),
                          jnp.ones((2,), bool), color, depth, eye)
    masks = grid_masks(state.grids, state.bound, eye, depth, cam, False,
                       mspec.coarse_bound_enlarge)
    cams0 = tensor_from_cam(window["c2ws"][:, :3, :])
    clm = jnp.zeros((window["valid"].shape[0],), jnp.float32)
    stages = (("middle", args.iters), ("fine", args.iters),
              ("color", args.iters))

    def timed(fn, reps):
        out = fn(0)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for r in range(reps):
            out = fn(r + 1)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / reps

    results = []
    sizes = [s for s in (1, 2, 4, 8) if s <= n_dev]
    # weak scaling: pixels is PER DEVICE in dp mode -> per-device ray
    # work constant, total rays grow with N
    for n in sizes:
        mesh = make_mesh(n)
        t = timed(lambda r: dp_map_optimize(
            state.params, state.grids, state.bound, window, cams0, masks,
            clm, jnp.float32(1.0), jax.random.PRNGKey(r), cam, stages,
            specs.mapper, specs.render, mspec, mesh)[3], args.reps)
        results.append({"mode": "ray-dp", "scaling": "weak",
                        "devices": n, "step_s": round(t, 4),
                        "rays_per_step": args.pixels * n})

    # strong scaling: total rays fixed at pixels * max(sizes); the
    # per-device budget shrinks with N (needs a re-specced mapper since
    # mapping.pixels is per-device)
    from dataclasses import replace as dc_replace
    total_rays = args.pixels * max(sizes)
    for n in sizes:
        per_dev = total_rays // n
        mesh = make_mesh(n)
        mp = dc_replace(specs.mapper, pixels=per_dev)
        t = timed(lambda r: dp_map_optimize(
            state.params, state.grids, state.bound, window, cams0, masks,
            clm, jnp.float32(1.0), jax.random.PRNGKey(r), cam, stages,
            mp, specs.render, mspec, mesh)[3], args.reps)
        results.append({"mode": "ray-dp", "scaling": "strong",
                        "devices": n, "step_s": round(t, 4),
                        "rays_per_step": total_rays})

    for n in [s for s in sizes if s >= 2]:
        mesh2 = make_mesh_2d(max(n // 2, 1), 2)
        slabs, shapes = shard_grids(state.grids, 2, mesh2)
        mask_slabs, _ = shard_grids(
            {k: v for k, v in masks.items() if k != "coarse"}, 2, mesh2)
        t = timed(lambda r: gs_map_optimize(
            state.params, slabs, state.bound, window, cams0, mask_slabs,
            clm, jnp.float32(1.0), jax.random.PRNGKey(r), cam, stages,
            specs.mapper, specs.render, mspec, shapes, mesh2)[3],
            args.reps)
        results.append({"mode": "grid-sharded(data x 2model)",
                        "devices": n, "step_s": round(t, 4),
                        "rays_per_step": args.pixels * (n // 2)})

    # ---- scaling efficiencies (weak: T1/TN; strong: T1/(N*TN)) -------
    def series(scaling):
        return {r["devices"]: r["step_s"] for r in results
                if r["mode"] == "ray-dp" and r.get("scaling") == scaling}

    efficiency = []
    weak, strong = series("weak"), series("strong")
    for n in sizes:
        if n == 1:
            continue
        e = {"devices": n}
        if 1 in weak and n in weak and weak[n] > 0:
            e["weak_efficiency"] = round(weak[1] / weak[n], 3)
        if 1 in strong and n in strong and strong[n] > 0:
            e["strong_efficiency"] = round(
                strong[1] / (n * strong[n]), 3)
        efficiency.append(e)

    # ---- psum microbenchmark vs the docs/SCALING.md ICI model --------
    # all-reduce of the dp gradient pytree's dominant buffer (the fine +
    # color grids, tens of MB) and of the grid-sharded per-point feature
    # rows (KBs): measured seconds vs 2*size*(N-1)/N / link_bw
    psum_bench = []
    grid_bytes = sum(int(np.prod(g.shape)) * 4
                     for k, g in state.grids.items()
                     if k in ("fine", "color", "middle"))
    for size_label, nbytes in (("dp-grad(grids)", grid_bytes),
                               ("gs-feature-rows(256x32)", 256 * 32 * 4)):
        n = max(sizes)
        if n < 2:
            break
        mesh = make_mesh(n)
        x = jnp.zeros((n, max(nbytes // 4, 1)), jnp.float32)
        f = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")
        np.asarray(jax.device_get(f(x)[0, :1]))  # compile
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = f(x)
        np.asarray(jax.device_get(out[0, :1]))
        t = (time.perf_counter() - t0) / reps
        model_s = 2 * nbytes * (n - 1) / n / (args.ici_gbps * 1e9)
        psum_bench.append({
            "buffer": size_label, "bytes": nbytes, "devices": n,
            "measured_s": round(t, 6),
            "model_s_at_ici": round(model_s, 6),
            "model": f"2*size*(N-1)/N / {args.ici_gbps:.0f}GB/s",
        })

    backend = jax.default_backend()
    out = {
        "backend": backend,
        "devices": n_dev,
        # virtual CPU meshes validate STRUCTURE, not real scaling: the
        # devices share host cores, and psum rides shared memory, not
        # ICI.  On a pod this same artifact carries the real numbers.
        "virtual": backend == "cpu",
        "target": "BASELINE.md: >=70% scaling efficiency at 2+ hosts",
        "results": results,
        "efficiency": efficiency,
        "psum_microbench": psum_bench,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.json}", file=sys.stderr)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
