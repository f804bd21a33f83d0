#!/usr/bin/env python
"""Head-to-head quality comparison: this repo vs the ACTUAL reference
implementation (/root/reference, torch CPU), on identical exported data
at identical budgets, graded by the same ATE oracle.

Both systems run in iMAP* mode (`--imap`): the reference needs no
pretrained decoder checkpoints there (src/NICE_SLAM.py:56-58 only calls
load_pretrain when nice=True), so a full head-to-head is runnable on
this machine.  The reference runs its own orchestrator unmodified on CPU
(tools/refcmp/ref_driver.py documents the three import-time environment
adaptations, none of which changes the math); this repo runs its normal
`run.py <cfg> --imap` path on whatever backend is present.

Budget: a single BUDGETS entry generates BOTH sides' configs — the
reference yaml merges over /root/reference/configs/imap.yaml, ours over
this repo's IMAP_OVERRIDES, so every shared knob (iters, rays, samples,
schedule, camera, bound) is pinned to the same value.

Outputs: <workdir>/quality.json + QUALITY.md (repo root) with the
side-by-side ATE table.

Usage:
    python tools/compare_reference.py --frames 40          # both seqs
    python tools/compare_reference.py --seqs seq_a --skip-ref
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = os.environ.get("NICE_SLAM_REF", "/root/reference")

import numpy as np  # noqa: E402

from tools.refcmp.export import BOUND, CAM, export_sequence  # noqa: E402

# the shared budget (reduced from the reference's imap defaults —
# tracking 50x5000, mapping 300x5000 — to what a CPU head-to-head can
# run; both sides get exactly these numbers)
BUDGETS = {
    "default": {
        "tracking_iters": 20, "tracking_pixels": 500, "tracking_lr": 0.001,
        "mapping_iters": 30, "mapping_pixels": 1000, "iters_first": 150,
        "every_frame": 5, "keyframe_every": 10, "window": 5,
    },
    "pilot": {  # smoke-test budget
        "tracking_iters": 5, "tracking_pixels": 200, "tracking_lr": 0.001,
        "mapping_iters": 10, "mapping_pixels": 300, "iters_first": 30,
        "every_frame": 5, "keyframe_every": 10, "window": 3,
    },
    "high": {  # closer to the reference's imap defaults (50x5000 track,
        # 300x5000 map) — for sequences where `default` diverges
        "tracking_iters": 40, "tracking_pixels": 1500,
        "tracking_lr": 0.001,
        "mapping_iters": 60, "mapping_pixels": 2000, "iters_first": 300,
        "every_frame": 5, "keyframe_every": 10, "window": 5,
    },
}

# world scale by mode: imap 0.1 (ref configs/imap.yaml:3), nice 1.0
MODE_SCALE = {"imap": 0.1, "nice": 1.0}


def write_ref_yaml(path: str, b: dict, input_folder: str, output: str,
                   mode: str = "imap", pretrained: tuple = None):
    """Scene yaml for the reference (merged over its configs/imap.yaml or
    configs/nice_slam.yaml — selected by the driver's --imap/--nice)."""
    import yaml

    cfg = {
        "dataset": "replica",
        "verbose": True,
        "tracking": {
            "device": "cpu",
            "pixels": b["tracking_pixels"], "iters": b["tracking_iters"],
            "lr": b["tracking_lr"],
            "vis_freq": 10 ** 6, "vis_inside_freq": 10 ** 6,
        },
        "mapping": {
            "device": "cpu",
            "bound": BOUND,
            "marching_cubes_bound": BOUND,
            "pixels": b["mapping_pixels"], "iters": b["mapping_iters"],
            "iters_first": b["iters_first"],
            "every_frame": b["every_frame"],
            "keyframe_every": b["keyframe_every"],
            "mapping_window_size": b["window"],
            "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6,
            "vis_freq": 10 ** 6, "vis_inside_freq": 10 ** 6,
            "color_refine": False,
        },
        "cam": dict(CAM),
        "data": {"input_folder": input_folder, "output": output},
        "meshing": {"eval_rec": False},
    }
    if mode == "nice":
        # NICE mode: ConvONet-format decoders exported from this repo's
        # pretrained npz (tools/refcmp/export_decoders.py) — the
        # reference's own blobs are absent from the mount
        cfg["pretrained_decoders"] = {"coarse": pretrained[0],
                                      "middle_fine": pretrained[1]}
        cfg["grid_len"] = {"coarse": 1.0, "middle": 0.32, "fine": 0.16,
                           "color": 0.16, "bound_divisible": 0.32}
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def write_ours_yaml(path: str, b: dict, input_folder: str, output: str,
                    mode: str = "imap"):
    """Scene yaml for this repo (merged over config.IMAP_OVERRIDES /
    the NICE defaults, selected by run.py --imap/--nice)."""
    import yaml

    cfg = {
        "dataset": "replica",
        "tracking": {
            "pixels": b["tracking_pixels"], "iters": b["tracking_iters"],
            "lr": b["tracking_lr"],
            "ignore_edge_W": 20, "ignore_edge_H": 20,
        },
        "mapping": {
            "bound": BOUND,
            "marching_cubes_bound": BOUND,
            "pixels": b["mapping_pixels"], "iters": b["mapping_iters"],
            "iters_first": b["iters_first"],
            "every_frame": b["every_frame"],
            "keyframe_every": b["keyframe_every"],
            "mapping_window_size": b["window"],
            "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6,
            "color_refine": False,
        },
        "cam": dict(CAM),
        "data": {"input_folder": input_folder, "output": output},
    }
    if mode == "nice":
        cfg["grid_len"] = {"coarse": 1.0, "middle": 0.32, "fine": 0.16,
                           "color": 0.16}
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def ate_from_ref_ckpt(ckpt_dir: str, scale: float) -> dict:
    """Grade the reference's own checkpoint (src/utils/Logger.py:21-32)
    with this repo's ATE oracle; translations unscaled to meters."""
    import torch

    from nice_slam_tpu.utils.trajectory import ate_stats

    cks = sorted(os.listdir(ckpt_dir))
    ck = torch.load(os.path.join(ckpt_dir, cks[-1]), map_location="cpu",
                    weights_only=False)
    est = ck["estimate_c2w_list"].numpy().copy()
    gt = ck["gt_c2w_list"].numpy().copy()
    est[:, :3, 3] /= scale
    gt[:, :3, 3] /= scale
    return ate_stats(gt, est)


def ate_from_ours_ckpt(ckpt_dir: str, scale: float) -> dict:
    """Grade this repo's checkpoint with the same oracle, same units."""
    from nice_slam_tpu.utils.checkpoint import load_checkpoint
    from nice_slam_tpu.utils.trajectory import ate_stats

    cks = sorted(os.listdir(ckpt_dir))
    ck = load_checkpoint(os.path.join(ckpt_dir, cks[-1]))
    est = np.asarray(ck["est_c2w"]).copy()
    gt = np.asarray(ck["gt_c2w"]).copy()
    est[:, :3, 3] /= scale
    gt[:, :3, 3] /= scale
    return ate_stats(gt, est)


def run_reference(scene_yaml: str, log_path: str, timeout: int,
                  mode: str = "imap") -> float:
    t0 = time.time()
    with open(log_path, "w") as log:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "refcmp",
                                          "ref_driver.py"), scene_yaml,
             "--nice" if mode == "nice" else "--imap"],
            cwd=REF, stdout=log, stderr=subprocess.STDOUT,
            timeout=timeout, check=True)
    return time.time() - t0


def run_ours(scene_yaml: str, log_path: str, timeout: int,
             platform: str | None, seed: int | None = None,
             mode: str = "imap") -> float:
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
        if platform == "cpu":
            # the axon sitecustomize grabs the TPU regardless of
            # JAX_PLATFORMS — bypass it (CLAUDE.md)
            env["PYTHONPATH"] = ""
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/jax_cache_cpu" if platform == "cpu"
                       else "/tmp/jax_cache")
    cmd = [sys.executable, os.path.join(REPO, "run.py"), scene_yaml,
           "--nice" if mode == "nice" else "--imap", "--no-mesh"]
    if seed is not None:
        cmd += ["--seed", str(seed)]
    t0 = time.time()
    with open(log_path, "w") as log:
        subprocess.run(cmd, cwd=REPO, stdout=log,
                       stderr=subprocess.STDOUT, timeout=timeout,
                       check=True)
    return time.time() - t0


def write_quality_md(results: dict, budget_name: str, frames: int,
                     out_path: str, mode: str = "imap"):
    b = BUDGETS[budget_name]
    mode_label = ("NICE mode (hierarchical grids; the reference runs "
                  "with decoders exported from this repo's pretrained "
                  "npz — tools/refcmp/export_decoders.py)"
                  if mode == "nice" else "iMAP* mode")
    lines = [
        "# QUALITY — head-to-head vs the reference implementation",
        "",
        "Both systems ran on IDENTICAL data (the synthetic scene exported "
        "in Replica",
        f"on-disk layout — tools/refcmp/export.py) at IDENTICAL budgets "
        f"in {mode_label},",
        "and both trajectories are graded by the SAME oracle "
        "(nice_slam_tpu/utils/",
        "trajectory.py, Horn SVD — the reference's eval_ate.py:44-78 "
        "equivalent).",
        "The reference is the actual code at /root/reference run through "
        "its own",
        "orchestrator on CPU torch (adaptations documented in "
        "tools/refcmp/ref_driver.py",
        "— import shims + a CPU-safe re-bind of quad2rotation + meshing "
        "disabled; none",
        "changes the math).  Reproduce: `python tools/compare_reference.py"
        f" --frames {frames} --budget {budget_name} --mode {mode}`.",
        "",
        f"Budget (both sides): tracking {b['tracking_iters']} iters x "
        f"{b['tracking_pixels']} rays (lr {b['tracking_lr']}), mapping "
        f"{b['mapping_iters']} iters x {b['mapping_pixels']} rays every "
        f"{b['every_frame']} frames (first frame {b['iters_first']}), "
        f"keyframe every {b['keyframe_every']}, window {b['window']}, "
        + ("N_samples 32 + N_surface 16"
           if mode == "nice" else "N_samples 32 + N_importance 12")
        + f", {frames} frames.",
        "",
        "| sequence | system | run | ATE RMSE (m) | mean (m) | "
        "median (m) | max (m) | wall (s) |",
        "|---|---|---|---|---|---|---|---|",
    ]

    def runs_of(r, side):
        rr = r.get(side + "_runs") or ([r[side]] if side in r else [])
        return rr

    for seq, r in sorted(results.items()):
        for side in ("reference", "ours"):
            for i, s in enumerate(runs_of(r, side)):
                a = s["ate"]
                tag = (f"seed {s['seed']}" if "seed" in s else f"#{i}")
                lines.append(
                    f"| {seq} | {side} | {tag} | {a['rmse']:.4f} | "
                    f"{a['mean']:.4f} | {a['median']:.4f} | "
                    f"{a['max']:.4f} | {s['wall_s']:.0f} |")
    lines.append("")
    for seq, r in sorted(results.items()):
        ref_r, our_r = runs_of(r, "reference"), runs_of(r, "ours")
        if ref_r and our_r:
            mr = float(np.mean([x["ate"]["rmse"] for x in ref_r]))
            mo = float(np.mean([x["ate"]["rmse"] for x in our_r]))
            ratio = mr / max(mo, 1e-9)
            # a 2% band around 1.0 reads as a tie — an exact or
            # near-equal mean must not be reported as trailing
            verdict = ("BEATS" if ratio > 1.02
                       else "TIES" if ratio > 0.98 else "TRAILS")
            lines.append(
                f"- **{seq}**: ours {verdict} the reference on mean "
                f"rmse — {mo*100:.1f} cm ({len(our_r)} runs) vs "
                f"{mr*100:.1f} cm ({len(ref_r)} runs, {ratio:.2f}x); "
                "with few replicates treat sub-2x gaps as noise "
                "(per-run variance spans several cm on fast scenes).")
    lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--seqs", type=str, default="seq_a,seq_b")
    ap.add_argument("--budget", type=str, default="default",
                    choices=sorted(BUDGETS))
    ap.add_argument("--mode", type=str, default="imap",
                    choices=("imap", "nice"))
    ap.add_argument("--workdir", type=str, default="/tmp/refcmp_run")
    ap.add_argument("--ref-runs", type=int, default=1,
                    help="reference replicates per sequence (the "
                         "reference is unseeded — each run samples its "
                         "run-to-run variance; ~20-40 min each on CPU)")
    ap.add_argument("--seeds", type=str, default="0",
                    help="comma-separated seeds for our side (one run "
                         "per seed)")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--ours-platform", type=str, default=None,
                    help="JAX_PLATFORMS for our side (e.g. cpu); default: "
                         "whatever backend the environment provides")
    ap.add_argument("--timeout", type=int, default=14400,
                    help="per-system per-sequence timeout (s)")
    ap.add_argument("--quality-md", type=str,
                    default=os.path.join(REPO, "QUALITY.md"))
    args = ap.parse_args()

    b = BUDGETS[args.budget]
    os.makedirs(args.workdir, exist_ok=True)
    scale = MODE_SCALE[args.mode]
    pretrained = None
    if args.mode == "nice":
        from tools.refcmp.export_decoders import export_reference_decoders
        pretrained = export_reference_decoders(
            os.path.join(REPO, "pretrained", "decoders_tpu.npz"),
            os.path.join(args.workdir, "pretrained"))
    results_path = os.path.join(args.workdir, "quality.json")
    results: dict = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)  # resume partial runs

    for seq in args.seqs.split(","):
        seq = seq.strip()
        data_dir = os.path.join(args.workdir, seq)
        if not os.path.exists(os.path.join(data_dir, "traj.txt")):
            print(f"[cmp] exporting {seq} ({args.frames} frames)")
            export_sequence(data_dir, seq, args.frames)
        results.setdefault(seq, {})

        # replicates: runs are resumable — each completed run is saved
        # to quality.json before the next starts, and re-invoking skips
        # what is already there.  Legacy single-run keys ("reference",
        # "ours") alias the first replicate.
        ref_runs = results[seq].setdefault("reference_runs", [])
        if "reference" in results[seq] and not ref_runs:
            ref_runs.append(results[seq]["reference"])  # legacy resume
        while not args.skip_ref and len(ref_runs) < args.ref_runs:
            r_i = len(ref_runs)
            out = os.path.join(args.workdir, f"ref_{seq}_r{r_i}")
            yml = os.path.join(args.workdir, f"ref_{seq}_r{r_i}.yaml")
            write_ref_yaml(yml, b, data_dir, out, mode=args.mode,
                           pretrained=pretrained)
            print(f"[cmp] running REFERENCE on {seq} run {r_i} "
                  f"(torch CPU, its own orchestrator, {args.mode})")
            wall = run_reference(
                yml, os.path.join(args.workdir, f"ref_{seq}_r{r_i}.log"),
                args.timeout, mode=args.mode)
            ate = ate_from_ref_ckpt(os.path.join(out, "ckpts"), scale)
            ref_runs.append({"ate": ate, "wall_s": wall})
            results[seq]["reference"] = ref_runs[0]
            print(f"[cmp] reference {seq} run {r_i}: "
                  f"rmse {ate['rmse']:.4f} m ({wall:.0f}s)")
            with open(results_path, "w") as f:
                json.dump(results, f, indent=2)

        our_runs = results[seq].setdefault("ours_runs", [])
        if "ours" in results[seq] and not our_runs:
            our_runs.append(dict(results[seq]["ours"], seed=0))
        seeds = [int(s) for s in args.seeds.split(",")]
        for seed in seeds if not args.skip_ours else []:
            if any(r.get("seed") == seed for r in our_runs):
                continue
            out = os.path.join(args.workdir, f"ours_{seq}_s{seed}")
            yml = os.path.join(args.workdir, f"ours_{seq}_s{seed}.yaml")
            write_ours_yaml(yml, b, data_dir, out, mode=args.mode)
            print(f"[cmp] running OURS on {seq} seed {seed} ({args.mode})")
            wall = run_ours(yml, os.path.join(args.workdir,
                                              f"ours_{seq}_s{seed}.log"),
                            args.timeout, args.ours_platform, seed=seed,
                            mode=args.mode)
            ate = ate_from_ours_ckpt(os.path.join(out, "ckpts"), scale)
            our_runs.append({"seed": seed, "ate": ate, "wall_s": wall,
                             "platform": args.ours_platform or "default"})
            results[seq]["ours"] = our_runs[0]
            print(f"[cmp] ours {seq} seed {seed}: "
                  f"rmse {ate['rmse']:.4f} m ({wall:.0f}s)")
            with open(results_path, "w") as f:
                json.dump(results, f, indent=2)

    write_quality_md(results, args.budget, args.frames, args.quality_md,
                     mode=args.mode)
    print(f"[cmp] wrote {args.quality_md}")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
