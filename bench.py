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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"hbm_utilization", "cost", ...}.  MFU accounting: the XLA cost analysis
(flops / bytes accessed) of each measured dispatch is captured via
`jitted.lower(...).compile().cost_analysis()` (engine.capture_cost) and
multiplied by the dispatch execution counts of the measured segment;
peaks per device kind in TPU_PEAKS.  See docs/PERF.md for the roofline
reading.

`--imap` benches the iMAP* mode instead, at the reference's iMAP budget
(tracking 50 it x 5000 rays, mapping 300 it x 5000 rays every 5 frames,
N_samples 32 + N_importance 12 — ref configs/imap.yaml; iters_first
reduced to 300 here since first-frame cost is excluded from timing, and
keyframe_every 5 instead of 50 so the measured segment contains no cold
keyframe-insertion graph — insertion cost itself is negligible).
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

# per-chip peaks by jax device_kind prefix: (bf16 FLOP/s, HBM bytes/s).
# Sources: public TPU spec sheets / the jax-ml scaling book tables.
# MFU is reported against the bf16 MXU peak — the hardware ceiling; the
# engine's GEMMs run bf16-input/f32-accumulate ("default" matmul
# precision), the rest of the pipeline f32.
TPU_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),     # v5e
    "TPU v5p": (459e12, 2765e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v3": (123e12, 900e9),
    "TPU v6 lite": (918e12, 1640e9),    # v6e / Trillium
}


def device_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    for prefix, peaks in TPU_PEAKS.items():
        if kind.startswith(prefix):
            return kind, peaks
    return kind, (None, None)


def build_cfg(n_frames: int, sync: str = "strict", imap: bool = False):
    from nice_slam_tpu.config import load_config

    # dataset is one frame longer than the measured range: the engine's
    # final-frame path (checkpoint save + color refine) must not fire
    # inside the measured segment — it fetches the whole map state
    overrides = {
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
            "mapping_window_size": 5,
            "keyframe_every": 5,
            "ckpt_freq": 100000,
            "mesh_freq": 100000,
            "color_refine": False,
        },
        "data": {"output": "/tmp/bench_out"},
    }
    if imap:
        # reference iMAP* budget (configs/imap.yaml): tracking 50x5000,
        # mapping 300x5000; iters_first shrunk (excluded from timing),
        # keyframe_every 5 (see module docstring)
        overrides["mapping"].update({"iters": 300, "iters_first": 300})
        overrides["tracking"] = {"ignore_edge_W": 20, "ignore_edge_H": 20}
    else:
        overrides["mapping"].update({
            "iters": 60,
            "iters_first": 60,  # first-frame cost excluded from timing
            "pixels": 1000,
        })
        overrides["tracking"] = {"iters": 10, "pixels": 200,
                                 "ignore_edge_W": 100, "ignore_edge_H": 100}
        overrides["rendering"] = {"N_samples": 32, "N_surface": 16}
    return load_config(nice=not imap, overrides=overrides)


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


def run_groups(eng, groups, n_frames: int, fused: bool,
               barrier_every: int = 1):
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
        saved = eng._map_barrier
        try:
            for g_i, (lo, hi, colors, depths, gts) in enumerate(groups):
                eng.gt_c2w[lo:hi + 1] = gts
                # same K-group barrier policy as the engine's own lagged
                # loop (the fused lagged dispatch barriers via map_once)
                eng._map_barrier = saved and (
                    g_i % barrier_every == barrier_every - 1
                    or g_i == len(groups) - 1)
                # pass the engine's TRUE n_img (the dataset is one frame
                # longer than the measured range) so the final-frame
                # mapping event — a distinct, never-warmed graph —
                # cannot fire inside the timed loop
                eng._grouped_lagged_step(lo, hi, colors, depths, gts,
                                         eng.n_img, prev)
                prev = (lo, colors, depths, gts)
                eng.frames_done = hi + 1
        finally:
            eng._map_barrier = saved
        eng._bench_prev_group = prev
        return

    for g_i, (lo, hi, colors, depths, gts) in enumerate(groups):
        eng.gt_c2w[lo:hi + 1] = gts
        maps_here = hi % eng.every_frame == 0 or hi == eng.n_img - 1
        if (maps_here and fused and eng.fuse_track_map
                and eng.mesh is None):
            # tracking + mapping event in ONE dispatch + ONE barrier
            # (mapping.track_map_group — the engine's default fast path).
            # barrier_every > 1: amortize the ~17 ms barrier-fetch RPC of
            # the remote-attached backend over several groups (the
            # schedule is deterministic — nothing host-side needs the
            # result between groups); the LAST group always barriers.
            saved = eng._map_barrier
            eng._map_barrier = (g_i % barrier_every == barrier_every - 1
                                or g_i == len(groups) - 1)
            try:
                eng.mapping_event(hi, colors, depths, gts[-1],
                                  frame_sel=hi - lo, track_group_start=lo)
            finally:
                eng._map_barrier = saved
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

    # NICE: warm through the first BA-active mapping event (>4 kfs);
    # iMAP*: BA is off (ref imap.yaml) — two steady events suffice
    n_warm = 11 if args.imap else 26
    n_frames = n_warm + args.frames
    cfg = build_cfg(n_frames, args.sync, imap=args.imap)
    eng = SlamEngine(cfg, output="/tmp/bench_out")
    eng.capture_cost = True   # record XLA flops/bytes of each dispatch
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
    # the first-frame event's graph (iters_first, no BA) is not the
    # steady-state graph — drop its cost record so the capture re-arms
    # on the steady variants below
    eng.cost_analyses.clear()
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
    # re-arm the cost capture before the LAST warmup group: in NICE mode
    # that group's event is the first BA-active one — the exact graph
    # variant the measured segment runs — so its flops/bytes record is
    # the measured segment's (the capture's AOT compile is a cache hit
    # by then and never rides the timed loop)
    run_groups(eng, w_groups[1:-1], n_frames, fused=True)
    eng.cost_analyses.clear()
    run_groups(eng, w_groups[-1:], n_frames, fused=True)
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
    eng.dispatch_counts = {}
    eng.capture_cost = False  # nothing may lower/compile in the timed loop

    prof = None
    if args.profile:
        import jax.profiler as prof
        prof.start_trace(args.profile)
    t0 = time.perf_counter()
    run_groups(eng, groups, n_frames, fused=True,
               barrier_every=args.barrier_every)
    device_time = time.perf_counter() - t0
    if prof is not None:
        prof.stop_trace()

    fps = n_measured / device_time
    print(json.dumps({"timings_s": eng.timings, "wall_s": device_time}),
          file=sys.stderr)
    return fps, mfu_report(eng, device_time)


def mfu_report(eng, device_time: float):
    """Roofline accounting of the measured segment: sum each dispatch's
    XLA cost analysis (flops / bytes accessed, engine.capture_cost) times
    its execution count, divide by measured time and the chip peaks."""
    kind, (peak_flops, peak_bw) = device_peaks()
    cost = {}
    flops = bytes_acc = 0.0
    incomplete = []
    for name, n_exec in sorted(eng.dispatch_counts.items()):
        c = eng.cost_analyses.get(name)
        if not c or "flops" not in c:
            incomplete.append(name)
            continue
        cost[name] = {"executions": n_exec, "flops": c["flops"],
                      "bytes_accessed": c["bytes_accessed"]}
        flops += n_exec * c["flops"]
        bytes_acc += n_exec * c["bytes_accessed"]
    rep = {
        "device_kind": kind,
        "flops_measured": flops,
        "bytes_accessed_measured": bytes_acc,
        "arithmetic_intensity": round(flops / bytes_acc, 3)
        if bytes_acc else None,
        "cost": cost,
    }
    if incomplete:
        rep["cost_missing_for"] = incomplete
    if peak_flops and flops:
        rep["mfu"] = round(flops / device_time / peak_flops, 5)
        rep["hbm_utilization"] = round(
            bytes_acc / device_time / peak_bw, 4)
    return rep


def child_main(args):
    """One watchdogged attempt: build, staged warmup, measure, print the
    result JSON line.  Transient in-process backend errors retry inside
    the child too (cheaper than a full child restart when the failure
    raises instead of hanging)."""
    from nice_slam_tpu.utils.retry import retry_transient

    stats = {}
    fps, roofline = retry_transient(lambda: run_attempt(args), attempts=2,
                                    label="bench attempt", stats=stats)
    out = {
        "metric": ("tracked+mapped frames/s per chip (iMAP* budget)"
                   if args.imap else
                   "tracked+mapped frames/s per chip (Replica budget)"),
        "value": round(fps, 3),
        "unit": "frames/s",
        # the 0.6 fps anchor is the NICE/Replica estimate; the iMAP*
        # budget has no anchor -> no vs_baseline there
        "vs_baseline": (None if args.imap
                        else round(fps / BASELINE_FPS, 2)),
        "baseline_anchor": (None if args.imap else BASELINE_PROVENANCE),
        "retry_attempts_used": stats.get("attempts", 1),
        "transient_errors": stats.get("transient_errors", []),
    }
    out.update(roofline)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser(description="nice-slam-tpu benchmark")
    ap.add_argument("--frames", type=int, default=40,
                    help="measured frames (default 40 = 8 frame groups — "
                         "long enough to amortize the K-group barrier "
                         "policy like a real run; use 5 for a quick "
                         "profile run)")
    ap.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                    help="capture an XLA trace of the measured segment")
    ap.add_argument("--sync", type=str, default="strict",
                    choices=("strict", "loose", "free"),
                    help="sync mode to bench (loose/free run the lagged "
                         "grouped path, engine._grouped_lagged_step)")
    ap.add_argument("--imap", action="store_true",
                    help="bench iMAP* mode at the reference iMAP budget "
                         "(ref configs/imap.yaml) instead of NICE/Replica")
    ap.add_argument("--barrier-every", type=int, default=4,
                    help="barrier once per K groups in the measured loop "
                         "(amortizes the remote backend's barrier RPC; "
                         "matches the engine default tpu."
                         "barrier_every_groups; 1 = round-4 behavior)")
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
           "--frames", str(args.frames), "--sync", args.sync,
           "--barrier-every", str(args.barrier_every)]
    if args.imap:
        cmd += ["--imap"]
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
