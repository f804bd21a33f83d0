#!/usr/bin/env python
"""Multi-seed quality study on the synthetic scene (VERDICT round-3 #2:
isolate the residual ATE with controlled A/Bs at full budget).

Runs N seeds of the 120-frame synthetic sequence through run.py
(sequentially — one chip), optionally with a config-override yaml, and
prints a seed table + summary JSON.  Writes results to
<workdir>/study.json (resumable: finished (config, seed) pairs are
skipped).

Usage:
    python tools/quality_study.py --seeds 5                   # baseline
    python tools/quality_study.py --seeds 5 --yaml ab.yaml --name ab
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_seed(yaml_path, seed, out_dir, frames, timeout):
    cmd = [sys.executable, os.path.join(REPO, "run.py")]
    if yaml_path:
        cmd.append(yaml_path)
    cmd += ["--synthetic", str(frames), "--seed", str(seed),
            "--no-mesh", "--output", out_dir]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    res = subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout,
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    if res.returncode != 0:
        return None
    with open(os.path.join(out_dir, "ate.json")) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--yaml", type=str, default=None,
                    help="override config (inherit_from synthetic.yaml)")
    ap.add_argument("--name", type=str, default="baseline")
    ap.add_argument("--workdir", type=str, default="/tmp/quality_study")
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    study_path = os.path.join(args.workdir, "study.json")
    study = {}
    if os.path.exists(study_path):
        with open(study_path) as f:
            study = json.load(f)
    cfg_res = study.setdefault(args.name, {})

    for seed in range(args.seeds):
        k = str(seed)
        if k in cfg_res:
            continue
        out = os.path.join(args.workdir, f"{args.name}_s{seed}")
        stats = run_seed(args.yaml, seed, out, args.frames, args.timeout)
        cfg_res[k] = (None if stats is None
                      else {"rmse": stats["rmse"], "mean": stats["mean"],
                            "max": stats["max"]})
        label = "FAIL" if stats is None else f"{stats['rmse']:.4f}"
        print(f"{args.name} seed {seed}: {label}", flush=True)
        with open(study_path, "w") as f:
            json.dump(study, f, indent=2)

    vals = [v["rmse"] for v in cfg_res.values() if v]
    if vals:
        print(json.dumps({
            "config": args.name, "frames": args.frames,
            "seeds": len(vals),
            "rmse_per_seed": [round(v, 4) for v in vals],
            "worst": round(max(vals), 4),
            "mean": round(sum(vals) / len(vals), 4),
        }))


if __name__ == "__main__":
    main()
