#!/usr/bin/env python
"""Merge quality.json artifacts from several compare_reference.py
workdirs (e.g. parallel reference-replicate streams + a TPU ours-side
stream run on copies of the same exported data) into one results dict
and regenerate QUALITY.md.

Usage:
    python tools/merge_quality.py --out QUALITY.md --budget default \
        --mode nice --frames 40 /tmp/refcmp_a /tmp/refcmp_a_ours ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.compare_reference import write_quality_md  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdirs", nargs="+")
    ap.add_argument("--out", default="QUALITY.md")
    ap.add_argument("--budget", default="default")
    ap.add_argument("--mode", default="nice")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--json-out", default=None,
                    help="also write the merged results dict here")
    args = ap.parse_args()

    merged: dict = {}
    for wd in args.workdirs:
        path = os.path.join(wd, "quality.json")
        if not os.path.exists(path):
            print(f"[merge] {path} missing — skipped", file=sys.stderr)
            continue
        with open(path) as f:
            res = json.load(f)
        for seq, r in res.items():
            dst = merged.setdefault(seq, {})
            for key in ("reference_runs", "ours_runs"):
                if r.get(key):
                    dst.setdefault(key, []).extend(r[key])
    # drop duplicate ours seeds (same seed re-run in two workdirs):
    # keep the first occurrence
    for seq, r in merged.items():
        seen = set()
        uniq = []
        for run in r.get("ours_runs", []):
            s = run.get("seed")
            if s in seen:
                continue
            seen.add(s)
            uniq.append(run)
        if uniq:
            r["ours_runs"] = uniq

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(merged, f, indent=2)
    write_quality_md(merged, args.budget, args.frames, args.out,
                     mode=args.mode)
    for seq, r in sorted(merged.items()):
        print(f"{seq}: ref n={len(r.get('reference_runs', []))} "
              f"ours n={len(r.get('ours_runs', []))}")
    print(f"[merge] wrote {args.out}")


if __name__ == "__main__":
    main()
