#!/usr/bin/env python
"""Run the TPU-native SLAM engine on a scene config.

Usage (mirrors the reference CLI, run.py:22-41):
    python run.py configs/Replica/room0.yaml
    python run.py configs/Demo/demo.yaml --output output/demo
    python run.py configs/Replica/room0.yaml --imap
    python run.py --synthetic 120           # built-in synthetic scene
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser(description="nice-slam-tpu SLAM runner")
    ap.add_argument("config", nargs="?", default=None,
                    help="scene config yaml")
    ap.add_argument("--input_folder", type=str, default=None,
                    help="overrides the input folder in the config")
    ap.add_argument("--output", type=str, default=None,
                    help="overrides the output folder in the config")
    group = ap.add_mutually_exclusive_group()
    group.add_argument("--nice", action="store_true", default=True)
    group.add_argument("--imap", action="store_false", dest="nice")
    ap.add_argument("--synthetic", type=int, default=None, metavar="N",
                    help="run on the built-in synthetic scene with N frames")
    ap.add_argument("--frames", type=int, default=None,
                    help="limit the number of frames processed")
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint to resume from")
    ap.add_argument("--seed", type=int, default=None,
                    help="override tpu.seed (A/B quality studies)")
    ap.add_argument("--no-mesh", action="store_true",
                    help="skip mesh extraction")
    ap.add_argument("--vis", action="store_true",
                    help="save GT/rendered/residual panels during tracking")
    ap.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                    help="capture an XLA device trace to LOGDIR "
                         "(view in TensorBoard / xprof)")
    args = ap.parse_args()

    from nice_slam_tpu.config import load_config
    from nice_slam_tpu.engine import SlamEngine

    overrides = {}
    if args.synthetic is not None:
        # the synthetic family yaml is the single source of the scene's
        # camera/bounds/budgets; --synthetic only sets the frame count
        explicit_config = args.config is not None
        if not explicit_config:
            args.config = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "configs", "Synthetic", "synthetic.yaml")
            # an explicit config's own data.output wins; the implicit
            # default gets a stable output dir
            overrides = {"data": {"output": "output/synthetic"}}
        elif "Synthetic" not in args.config:
            print(f"warning: --synthetic with explicit config "
                  f"{args.config!r} trusts that config's camera/bounds; "
                  f"the built-in synthetic scene expects "
                  f"configs/Synthetic/synthetic.yaml")
        overrides["dataset"] = "synthetic"
        overrides["synthetic"] = {"n_frames": args.synthetic}
    if args.seed is not None:
        overrides.setdefault("tpu", {})["seed"] = args.seed
    if args.input_folder:
        overrides.setdefault("data", {})["input_folder"] = args.input_folder
    if args.output:
        overrides.setdefault("data", {})["output"] = args.output

    cfg = load_config(args.config, nice=args.nice, overrides=overrides)

    # multi-process launch (cfg tpu.multihost / NICE_SLAM_TPU_* env):
    # must initialize BEFORE the first jax backend use so jax.devices()
    # is the global mesh (see parallel/multihost.py)
    from nice_slam_tpu.parallel.multihost import initialize_from_cfg
    proc_id = initialize_from_cfg(cfg)
    if proc_id is not None:
        print(f"multihost: process {proc_id} up")

    mesher_hook = None
    if not args.no_mesh:
        try:
            from nice_slam_tpu.utils.mesher import engine_mesher_hook
            mesher_hook = engine_mesher_hook
        except ImportError:
            pass

    pipelined = bool(cfg["tpu"].get("pipelined"))

    def latest_ckpt(output: str):
        import glob
        cks = sorted(glob.glob(os.path.join(output, "ckpts", "*.npz")))
        return cks[-1] if cks else None

    def build_and_run():
        # rebuildable unit for transient-backend retry: a failed attempt's
        # donated device buffers are discarded with the engine; the retry
        # resumes from the newest checkpoint (if any) instead of frame 0
        if pipelined:
            from nice_slam_tpu.parallel.pipelined import PipelinedSlamEngine
            eng = PipelinedSlamEngine(cfg, mesher_hook=mesher_hook)
        else:
            eng = SlamEngine(cfg, mesher_hook=mesher_hook)
        if args.vis:
            if pipelined:
                print("note: tpu.pipelined tracks in frame groups — "
                      "keeping mapping panels only (no per-frame tracking "
                      "panels)")
            eng.enable_visualizer(mapping_only=pipelined)
        resume_from = args.resume or (
            latest_ckpt(eng.output) if build_and_run.attempted else None)
        if resume_from:
            print(f"resuming from {resume_from}")
            eng.resume(resume_from)
        build_and_run.attempted = True
        from nice_slam_tpu.utils.profiling import xla_trace
        with xla_trace(args.profile):
            eng.run(n_frames=args.frames, progress=True)
        return eng

    build_and_run.attempted = False
    from nice_slam_tpu.utils.retry import retry_transient
    eng = retry_transient(build_and_run, attempts=3, label="slam run")

    stats = eng.ate()
    print(json.dumps({"ate_rmse_m": stats["rmse"],
                      "ate_mean_m": stats["mean"],
                      "frames": eng.frames_done,
                      "timings_s": eng.timings}, indent=2))
    if eng.is_primary:
        os.makedirs(eng.output, exist_ok=True)
        with open(os.path.join(eng.output, "ate.json"), "w") as f:
            json.dump(stats, f, indent=2)


if __name__ == "__main__":
    main()
