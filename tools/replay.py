#!/usr/bin/env python
"""Offline trajectory/mesh replay (analogue of the reference's
visualizer.py + src/tools/viz.py, which need an Open3D GUI).

Renders a frame sequence (png, optionally mp4 via matplotlib writers) of
the estimated vs GT camera trajectory and mesh silhouette from a run's
checkpoint."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir", help="run output dir (ckpts/, mesh/)")
    ap.add_argument("--save", default=None, help="mp4 output path")
    ap.add_argument("--frames_dir", default=None,
                    help="also dump per-frame pngs here")
    ap.add_argument("--stride", type=int, default=5)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    from nice_slam_tpu.utils.checkpoint import latest_checkpoint
    from nice_slam_tpu.utils.plyio import read_ply

    ck = latest_checkpoint(os.path.join(args.output_dir, "ckpts"))
    if ck is None:
        sys.exit("no checkpoint found")
    with np.load(ck) as z:
        est = z["est_c2w"]
        gt = z["gt_c2w"]
        n = int(z["idx"]) or len(est)

    mesh_path = os.path.join(args.output_dir, "mesh", "final_mesh.ply")
    mesh_pts = None
    if os.path.exists(mesh_path):
        verts, _, _ = read_ply(mesh_path)
        if len(verts):
            sel = np.random.RandomState(0).choice(
                len(verts), min(len(verts), 20000), replace=False)
            mesh_pts = verts[sel]

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")

    def draw(k):
        ax.cla()
        m = min(k * args.stride + 1, n)
        if mesh_pts is not None:
            ax.scatter(mesh_pts[:, 0], mesh_pts[:, 1], mesh_pts[:, 2],
                       s=0.2, c="lightgray", alpha=0.5)
        ok = np.isfinite(gt[:m, :3, 3]).all(-1)
        ax.plot(*gt[:m][ok][:, :3, 3].T, color="black", label="GT")
        ax.plot(*est[:m, :3, 3].T, color="tab:red", label="estimated")
        ax.scatter(*est[m - 1, :3, 3], color="tab:red", s=40)
        ax.legend()
        ax.set_title(f"frame {m - 1}/{n - 1}")

    n_anim = (n + args.stride - 1) // args.stride
    if args.frames_dir:
        os.makedirs(args.frames_dir, exist_ok=True)
        for k in range(n_anim):
            draw(k)
            fig.savefig(os.path.join(args.frames_dir, f"{k:05d}.png"),
                        dpi=100)
        print(f"wrote {n_anim} frames to {args.frames_dir}")
    if args.save:
        anim = animation.FuncAnimation(fig, draw, frames=n_anim)
        anim.save(args.save, fps=10)
        print("saved", args.save)
    if not args.frames_dir and not args.save:
        draw(n_anim - 1)
        out = os.path.join(args.output_dir, "replay.png")
        fig.savefig(out, dpi=120)
        print("saved", out)


if __name__ == "__main__":
    main()
