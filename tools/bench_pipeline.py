#!/usr/bin/env python
"""Measure the pipelined (two-device tracker/mapper) engine's wall-clock
overlap against the sequential engine at EQUAL budgets.

On real two-chip hardware the mapper's events hide behind the next
group's tracking; on the virtual CPU mesh the devices share host cores,
so the overlap upper bound is limited by host parallelism — report both
the wall clocks and the serial track/map split so the hidden fraction is
visible either way.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/bench_pipeline.py --frames 21
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def build_cfg(n_frames, pipelined):
    from nice_slam_tpu.config import load_config

    return load_config(overrides={
        "dataset": "synthetic",
        "synthetic": {"n_frames": n_frames},
        "cam": {"H": 120, "W": 160, "fx": 120.0, "fy": 120.0,
                "cx": 79.5, "cy": 59.5},
        "grid_len": {"coarse": 1.0, "middle": 0.32, "fine": 0.16,
                     "color": 0.16},
        "mapping": {"bound": [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]],
                    "marching_cubes_bound":
                        [[0.0, 4.0], [0.0, 3.0], [0.0, 4.0]],
                    "every_frame": 4, "iters_first": 30, "iters": 30,
                    "pixels": 600, "mapping_window_size": 4,
                    "keyframe_every": 4, "ckpt_freq": 100000,
                    "mesh_freq": 100000, "color_refine": False},
        "tracking": {"iters": 10, "pixels": 200, "ignore_edge_W": 10,
                     "ignore_edge_H": 10},
        "rendering": {"N_samples": 24, "N_surface": 12},
        "sync_method": "loose" if pipelined else "strict",
        "tpu": {"seed": 0, "pipelined": pipelined},
        "data": {"output": f"/tmp/bench_pipe_{int(pipelined)}"},
    })


def _build_engine(pipelined, n_frames):
    from nice_slam_tpu.engine import SlamEngine

    cfg = build_cfg(n_frames, pipelined)
    if pipelined:
        from nice_slam_tpu.parallel.pipelined import PipelinedSlamEngine
        return PipelinedSlamEngine(cfg)
    return SlamEngine(cfg)


def run_once(pipelined, n_frames):
    # cold pass populates the persistent compile cache; the timed pass
    # rebuilds the engine and runs the identical schedule warm
    _build_engine(pipelined, n_frames).run(n_frames=n_frames)
    eng = _build_engine(pipelined, n_frames)
    t0 = time.perf_counter()
    eng.run(n_frames=n_frames)
    wall = time.perf_counter() - t0
    rmse = eng.ate()["rmse"]
    return {"mode": "pipelined" if pipelined else "sequential",
            "wall_s": round(wall, 3),
            "frames": n_frames,
            "fps": round(n_frames / wall, 3),
            "timings_s": {k: round(v, 3) for k, v in eng.timings.items()},
            "ate_rmse_m": round(float(rmse), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=21)
    args = ap.parse_args()

    import jax
    print(f"devices: {len(jax.devices())}", file=sys.stderr)
    for pipelined in (False, True):
        print(json.dumps(run_once(pipelined, args.frames)), flush=True)


if __name__ == "__main__":
    main()
