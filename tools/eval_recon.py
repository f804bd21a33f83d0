#!/usr/bin/env python
"""Reconstruction quality metrics (analogue of src/tools/eval_recon.py).

3D: accuracy (cm), completion (cm), completion ratio (<5cm, %) via nearest
neighbours between 200k surface samples of the reconstructed and GT
meshes, with optional ICP pre-alignment (reference eval_recon.py:24-117).

2D: depth L1 over random interior views; meshes are depth-rendered by
dense surface-point splatting with a device z-buffer (scatter-min) instead
of the reference's Open3D offscreen rasterizer (eval_recon.py:131-210).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sample_surface(verts: np.ndarray, tris: np.ndarray, n: int,
                   seed: int = 0) -> np.ndarray:
    """Area-weighted uniform surface sampling (trimesh.sample equivalent)."""
    rng = np.random.RandomState(seed)
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    probs = areas / areas.sum()
    face_idx = rng.choice(len(tris), n, p=probs)
    r1 = np.sqrt(rng.rand(n, 1))
    r2 = rng.rand(n, 1)
    a, b, c = v0[face_idx], v1[face_idx], v2[face_idx]
    return (1 - r1) * a + r1 * (1 - r2) * b + r1 * r2 * c


def icp_align(src: np.ndarray, dst: np.ndarray, iters: int = 20):
    """Point-to-point ICP returning a 4x4 transform src->dst
    (replacement for the reference's Open3D ICP, eval_recon.py:45-59)."""
    from scipy.spatial import cKDTree

    from nice_slam_tpu.utils.trajectory import horn_align

    T = np.eye(4)
    cur = src.copy()
    tree = cKDTree(dst)
    for _ in range(iters):
        d, idx = tree.query(cur)
        keep = d < np.percentile(d, 90)
        rot, trans, _ = horn_align(cur[keep], dst[idx[keep]])
        cur = cur @ rot.T + trans
        Ti = np.eye(4)
        Ti[:3, :3] = rot
        Ti[:3, 3] = trans
        T = Ti @ T
    return T


def calc_3d_metrics(rec_mesh, gt_mesh, n_samples: int = 200_000,
                    align: bool = True) -> dict:
    from scipy.spatial import cKDTree

    rv, rt, _ = rec_mesh
    gv, gt_, _ = gt_mesh
    rec_pts = sample_surface(rv, rt, n_samples, seed=0)
    gt_pts = sample_surface(gv, gt_, n_samples, seed=1)

    if align:
        T = icp_align(rec_pts[::20], gt_pts[::20])
        rec_pts = rec_pts @ T[:3, :3].T + T[:3, 3]

    tree_gt = cKDTree(gt_pts)
    tree_rec = cKDTree(rec_pts)
    acc, _ = tree_gt.query(rec_pts)       # rec -> gt
    comp, _ = tree_rec.query(gt_pts)      # gt -> rec
    return {
        "accuracy_cm": float(acc.mean() * 100),
        "completion_cm": float(comp.mean() * 100),
        "completion_ratio_pct": float((comp < 0.05).mean() * 100),
    }


def splat_depth(verts, tris, c2w, H, W, fx, fy, cx, cy,
                points_per_m2: float = 200_000.0, seed: int = 0):
    """Depth-render a mesh by dense surface splatting + pixel z-buffer."""
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    total_area = float(0.5 * np.linalg.norm(
        np.cross(v1 - v0, v2 - v0), axis=1).sum())
    n = int(min(max(total_area * points_per_m2, 1e5), 4e6))
    pts = sample_surface(verts, tris, n, seed=seed)

    w2c = np.linalg.inv(c2w)
    pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = pc[:, 2]
    front = z < -1e-6
    u = (fx * (-pc[:, 0]) / (z - 1e-9) + cx)
    v = (fy * pc[:, 1] / (z - 1e-9) + cy)
    ok = front & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    ui = u[ok].astype(np.int64)
    vi = v[ok].astype(np.int64)
    d = -z[ok]
    depth = np.full(H * W, np.inf)
    np.minimum.at(depth, vi * W + ui, d)
    depth[~np.isfinite(depth)] = 0.0
    return depth.reshape(H, W)


def calc_2d_metric(rec_mesh, gt_mesh, n_views: int = 200, seed: int = 0,
                   H: int = 500, W: int = 500, focal: float = 300.0) -> dict:
    """Depth-L1 over random interior views (reference uses 1000 views at
    500x500 f=300; eval_recon.py:136-142)."""
    rng = np.random.RandomState(seed)
    gv = gt_mesh[0]
    lo, hi = gv.min(0), gv.max(0)
    errs = []
    for _ in range(n_views):
        eye = lo + (hi - lo) * (0.25 + 0.5 * rng.rand(3))
        angle = rng.rand() * 2 * np.pi
        fwd = np.array([np.cos(angle), 0.0, np.sin(angle)])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = eye
        d_gt = splat_depth(*gt_mesh[:2], c2w, H, W, focal, focal,
                           W / 2 - 0.5, H / 2 - 0.5, seed=1)
        d_rec = splat_depth(*rec_mesh[:2], c2w, H, W, focal, focal,
                            W / 2 - 0.5, H / 2 - 0.5, seed=2)
        mask = (d_gt > 0) & (d_rec > 0)
        if mask.sum() < 100:
            continue
        errs.append(np.abs(d_gt[mask] - d_rec[mask]).mean())
    return {"depth_l1_cm": float(np.mean(errs) * 100) if errs else
            float("nan"), "views_used": len(errs)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rec_mesh", help="reconstructed mesh .ply")
    ap.add_argument("gt_mesh", help="ground-truth (culled) mesh .ply")
    ap.add_argument("-2d", "--two_d", action="store_true")
    ap.add_argument("-3d", "--three_d", action="store_true", default=True)
    ap.add_argument("--n_views", type=int, default=200)
    args = ap.parse_args()

    from nice_slam_tpu.utils.plyio import read_ply

    rec = read_ply(args.rec_mesh)
    gt = read_ply(args.gt_mesh)
    out = {}
    if args.three_d:
        out.update(calc_3d_metrics(rec, gt))
    if args.two_d:
        out.update(calc_2d_metric(rec, gt, n_views=args.n_views))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
