#!/usr/bin/env python
"""Benchmark: tracked+mapped frames/s per chip at the reference's Replica
compute budget.

Schedule per 5-frame group (configs/Replica/replica.yaml +
configs/nice_slam.yaml in the reference):
  - 5 tracked frames x 10 iters x 200 rays x 48 samples ('color' stage)
  - 1 mapping call x 60 iters x 1000 rays (staged middle/fine/color)
  - 1 coarse-mapping call x 60 iters x 1000 rays
Measured on-device (compile excluded, I/O excluded), synthetic frames.

Baseline: the reference (PyTorch/CUDA, single desktop GPU) publishes no
number; wall-clock reports for NICE-SLAM on Replica put it at roughly
0.5-0.7 tracked fps end-to-end on an RTX-3090-class GPU (~1h for a
2000-frame scene).  BASELINE.md's target is >=5x that per chip.  We use
0.6 fps as the documented baseline anchor.

Robustness: the remote-attached TPU backend can drop an RPC mid-compile
(observed round 2: ``INTERNAL: remote_compile: response body closed``).
Two defenses here:
  1. staged warmup in ascending graph size — tracking scan, then
     first-frame mapping, then one UNFUSED group (track + mapping_step),
     and only then the giant fused track_map_group — so the largest cold
     compile never rides the first fragile RPC and every stage lands in
     the persistent compile cache for retries;
  2. the whole build+warmup+measure unit runs in a CHILD process under a
     watchdog (the parent never imports jax): a transient backend error
     OR an indefinite hang (observed: the axon tunnel can stall with no
     exception at all) kills the child and retries up to 3x, rebuilding
     from scratch (retries are cheap: completed compiles persist in the
     persistent cache).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent compile cache: TPU graph compiles through this backend take
# minutes; cache them across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_FPS = 0.6  # documented estimate of the reference's GPU throughput
# honest provenance for the denominator: the reference repo publishes NO
# throughput number (SURVEY §6); 0.6 fps is an estimate from wall-clock
# reports of NICE-SLAM on Replica (~1 h / 2000 frames on an RTX-3090-class
# GPU).  vs_baseline inherits this uncertainty — the >=5x target holds
# even under a 3 fps baseline.
BASELINE_PROVENANCE = {
    "fps": BASELINE_FPS,
    "provenance": "estimate",
    "basis": "reference publishes no number; ~1h/2000-frame Replica "
             "wall-clock reports on RTX-3090-class GPU",
}


def build_cfg(n_frames: int, sync: str = "strict"):
    from nice_slam_tpu.config import load_config

    # dataset is one frame longer than the measured range: the engine's
    # final-frame path (checkpoint save + color refine) must not fire
    # inside the measured segment — it fetches the whole map state
    return load_config(overrides={
        "sync_method": sync,
        "dataset": "synthetic",
        "synthetic": {"n_frames": n_frames + 1},
        "cam": {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                "cx": 599.5, "cy": 339.5},
        "grid_len": {"coarse": 1.0, "middle": 0.32, "fine": 0.16,
                     "color": 0.16},
        "mapping": {
            "bound": [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]],
            "marching_cubes_bound": [[0.0, 4.0], [0.0, 3.0], [0.0, 4.0]],
            "every_frame": 5,
            "iters": 60,
            "iters_first": 60,   # first-frame cost excluded from timing
            "pixels": 1000,
            "mapping_window_size": 5,
            "keyframe_every": 5,
            "ckpt_freq": 100000,
            "mesh_freq": 100000,
            "color_refine": False,
        },
        "tracking": {"iters": 10, "pixels": 200,
                     "ignore_edge_W": 100, "ignore_edge_H": 100},
        "rendering": {"N_samples": 32, "N_surface": 16},
        "data": {"output": "/tmp/bench_out"},
    })


def load_groups(eng, lo_first: int, n_frames: int):
    """Pre-upload frames [lo_first, n_frames) as per-group stacks, forcing
    the lazy uploads with tiny fetches so I/O is excluded from timing."""
    import jax
    import numpy as np

    groups = []
    for lo in range(lo_first, n_frames, eng.every_frame):
        hi = min(lo + eng.every_frame - 1, n_frames - 1)
        assert hi % eng.every_frame == 0 or hi == n_frames - 1
        colors, depths, gts = eng._load_frames_stacked(lo, hi)
        np.asarray(jax.device_get(colors[0, 0, 0]))
        np.asarray(jax.device_get(depths[0, 0, 0]))
        groups.append((lo, hi, colors, depths, gts))
    return groups


def run_groups(eng, groups, n_frames: int, fused: bool):
    """Drive pre-uploaded frame groups through the engine's grouped path.
    fused=True uses ONE dispatch per group (mapping.track_map_group) when
    the engine allows it (fuse_track_map on, no device mesh) — matching
    engine._run_grouped's gating; otherwise separate track-then-map
    dispatches.  loose/free (eng.map_lag > 0) route through the engine's
    own lagged group step (engine._grouped_lagged_step) so the benched
    code path IS the engine's."""
    import jax
    import numpy as np

    if eng.map_lag > 0:
        prev = getattr(eng, "_bench_prev_group", None)
        for (lo, hi, colors, depths, gts) in groups:
            eng.gt_c2w[lo:hi + 1] = gts
            eng._grouped_lagged_step(lo, hi, colors, depths, gts,
                                     n_frames, prev)
            prev = (lo, colors, depths, gts)
            eng.frames_done = hi + 1
        eng._bench_prev_group = prev
        return

    for (lo, hi, colors, depths, gts) in groups:
        eng.gt_c2w[lo:hi + 1] = gts
        maps_here = hi % eng.every_frame == 0 or hi == n_frames - 1
        if (maps_here and fused and eng.fuse_track_map
                and eng.mesh is None):
            # tracking + mapping event in ONE dispatch + ONE barrier
            # (mapping.track_map_group — the engine's default fast path)
            eng.mapping_event(hi, colors, depths, gts[-1],
                              frame_sel=hi - lo, track_group_start=lo)
        else:
            t0 = time.perf_counter()
            losses = eng._track_group(lo, hi, colors, depths)
            np.asarray(jax.device_get(losses))  # group barrier
            eng.timings["track"] += time.perf_counter() - t0
            if maps_here:
                eng.mapping_event(hi, colors, depths, gts[-1],
                                  frame_sel=hi - lo)
        eng.frames_done = hi + 1


def run_attempt(args):
    import jax
    import numpy as np

    from nice_slam_tpu.engine import SlamEngine
    from nice_slam_tpu.tracking import track_frames_group

    n_warm = 26    # through the first BA-active mapping event (>4 kfs)
    n_frames = n_warm + args.frames
    cfg = build_cfg(n_frames, args.sync)
    eng = SlamEngine(cfg, output="/tmp/bench_out")
    s = eng.specs

    # group/mapping alignment: each group must END on an every_frame
    # boundary or the measured loop silently degrades to tracking-only
    assert n_warm % eng.every_frame == 1, \
        "n_warm must start a fresh frame group (n_warm % every_frame == 1)"

    # ---- staged warmup, ascending graph size ----
    # stage 0: the tracking scan alone (smallest graph), throwaway buffers
    # (est_buf is donated — hand it a fresh derived copy)
    t_w = time.perf_counter()
    w_groups = load_groups(eng, 1, n_warm)
    c0s, d0s = w_groups[0][2], w_groups[0][3]
    _, losses = track_frames_group(
        eng.map_state.params, eng.map_state.grids, eng.bound,
        eng._est_dev + 0.0, 1, c0s, d0s, eng._key_base, 0,
        s.camera, s.track, s.render, s.model)
    np.asarray(jax.device_get(losses))
    print(f"warmup stage 0 (tracking scan) ok "
          f"{time.perf_counter() - t_w:.1f}s", file=sys.stderr, flush=True)

    # stage 1: first-frame mapping (mapping_step graph)
    color, depth, gt_pose = eng._load_frame(0)
    eng.gt_c2w[0] = gt_pose
    eng._est_dev = eng._set_pose(eng._est_dev, 0, gt_pose)
    eng.mapping_event(0, color, depth, gt_pose, first=True)
    eng.frames_done = 1
    print(f"warmup stage 1 (first mapping) ok "
          f"{time.perf_counter() - t_w:.1f}s", file=sys.stderr, flush=True)

    # stage 2: first group UNFUSED (steady mapping_step), then the rest of
    # the warmup on the default fused path — compiles track_map_group
    # last, over an already-exercised RPC channel.  Warmup must cover
    # every graph variant the measured loop hits: steady tracking/mapping/
    # coarse-mapping AND the local-BA variant (first at the frame-25
    # event: keyframes 0,5,10,15,20 -> >4).
    run_groups(eng, w_groups[:1], n_frames, fused=False)
    print(f"warmup stage 2 (unfused group) ok "
          f"{time.perf_counter() - t_w:.1f}s", file=sys.stderr, flush=True)
    run_groups(eng, w_groups[1:], n_frames, fused=True)
    print(f"warmup stage 3 (fused groups) ok "
          f"{time.perf_counter() - t_w:.1f}s", file=sys.stderr, flush=True)

    # ---- measured segment ----
    groups = load_groups(eng, n_warm, n_frames)
    n_measured = n_frames - n_warm
    if eng.map_lag > 0:
        # lagged modes: the first post-warmup group absorbs a measured
        # one-time backend cost (~5 s once, then 0.3-0.4 s/group steady
        # state) — burn one group as warmup stage 4 so the timed segment
        # is steady state, like the compile exclusions above
        run_groups(eng, groups[:1], n_frames, fused=True)
        n_measured -= groups[0][1] - groups[0][0] + 1
        groups = groups[1:]
        print(f"warmup stage 4 (lagged steady-state) ok "
              f"{time.perf_counter() - t_w:.1f}s", file=sys.stderr,
              flush=True)
    eng.timings = {k: 0.0 for k in eng.timings}

    prof = None
    if args.profile:
        import jax.profiler as prof
        prof.start_trace(args.profile)
    t0 = time.perf_counter()
    run_groups(eng, groups, n_frames, fused=True)
    device_time = time.perf_counter() - t0
    if prof is not None:
        prof.stop_trace()

    fps = n_measured / device_time
    print(json.dumps({"timings_s": eng.timings, "wall_s": device_time}),
          file=sys.stderr)
    return fps


def child_main(args):
    """One watchdogged attempt: build, staged warmup, measure, print the
    result JSON line.  Transient in-process backend errors retry inside
    the child too (cheaper than a full child restart when the failure
    raises instead of hanging)."""
    from nice_slam_tpu.utils.retry import retry_transient

    stats = {}
    fps = retry_transient(lambda: run_attempt(args), attempts=2,
                          label="bench attempt", stats=stats)
    print(json.dumps({
        "metric": "tracked+mapped frames/s per chip (Replica budget)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "baseline_anchor": BASELINE_PROVENANCE,
        "retry_attempts_used": stats.get("attempts", 1),
        "transient_errors": stats.get("transient_errors", []),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser(description="nice-slam-tpu benchmark")
    ap.add_argument("--frames", type=int, default=20,
                    help="measured frames (default 20; use 5 for a quick "
                         "profile run)")
    ap.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                    help="capture an XLA trace of the measured segment")
    ap.add_argument("--sync", type=str, default="strict",
                    choices=("strict", "loose", "free"),
                    help="sync mode to bench (loose/free run the lagged "
                         "grouped path, engine._grouped_lagged_step)")
    ap.add_argument("--attempts", type=int, default=3,
                    help="watchdog retries (hangs + transient failures)")
    ap.add_argument("--attempt-timeout", type=int, default=1500,
                    help="seconds before a child attempt is declared hung")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        child_main(args)
        return

    # Watchdog parent: no jax import here — a wedged backend cannot take
    # the watchdog down with it.
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--frames", str(args.frames), "--sync", args.sync]
    if args.profile:
        cmd += ["--profile", args.profile]
    for attempt in range(1, args.attempts + 1):
        t0 = time.time()
        try:
            res = subprocess.run(cmd, stdout=subprocess.PIPE,
                                 timeout=args.attempt_timeout)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt}/{args.attempts} HUNG after "
                  f"{args.attempt_timeout}s — killed, retrying",
                  file=sys.stderr, flush=True)
            continue
        out = res.stdout.decode()
        lines = [ln for ln in out.strip().splitlines()
                 if ln.startswith("{")]
        if res.returncode == 0 and lines:
            print(lines[-1])
            return
        print(f"[bench] attempt {attempt}/{args.attempts} failed "
              f"(rc={res.returncode}, {time.time() - t0:.0f}s); "
              f"stdout tail: {out[-500:]!r}", file=sys.stderr, flush=True)
    print("[bench] all attempts failed", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
