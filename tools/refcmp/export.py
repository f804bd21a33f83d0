"""Export the procedural synthetic scene in Replica on-disk layout so the
REFERENCE implementation can consume it unmodified.

Layout (ref src/utils/datasets.py:116-137):
    <out>/results/frame{:06d}.jpg      RGB, read with cv2 (BGR on disk)
    <out>/results/depth{:06d}.png      uint16, / png_depth_scale -> meters
    <out>/traj.txt                     one row-major 4x4 c2w per line

The reference's Replica reader negates pose columns 1,2 after reading
(datasets.py:134-135) — the on-disk convention is +y-down/+z-forward — so
the exporter applies the same (involutive) flip when writing.  Both the
reference and this repo's Replica reader then recover the exact internal
(x-right / y-up / -z-forward) poses the frames were rendered from.

Two sequences are defined so the head-to-head covers more than one scene:
  seq_a — the default room (same content as tests/bench)
  seq_b — rearranged contents + a different orbit (reversed sweep,
          different radius/height), i.e. a genuinely different sequence.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from nice_slam_tpu.utils.synthetic import (  # noqa: E402
    Box,
    Sphere,
    SyntheticScene,
    orbit_trajectory,
    render_frame,
)

# shared camera for the exported sequences (the synthetic family camera,
# configs/Synthetic/synthetic.yaml)
CAM = {"H": 240, "W": 320, "fx": 240.0, "fy": 240.0,
       "cx": 159.5, "cy": 119.5, "png_depth_scale": 6553.5,
       "crop_edge": 0}
BOUND = [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]]


def scene_b() -> SyntheticScene:
    """A second room: same shell (so one bound config serves both), but
    rearranged, re-colored contents — a different scene to map."""
    return SyntheticScene(
        room_lo=np.array([0.0, 0.0, 0.0]),
        room_hi=np.array([4.0, 3.0, 4.0]),
        spheres=[
            Sphere(np.array([3.1, 0.7, 1.0]), 0.7,
                   np.array([0.3, 0.7, 0.75])),
            Sphere(np.array([0.9, 0.5, 3.0]), 0.5,
                   np.array([0.85, 0.6, 0.2])),
            Sphere(np.array([1.6, 2.4, 0.9]), 0.35,
                   np.array([0.75, 0.3, 0.8])),
        ],
        boxes=[
            Box(np.array([0.5, 0.0, 0.4]), np.array([1.5, 1.4, 1.2]),
                np.array([0.8, 0.35, 0.3])),
            Box(np.array([2.6, 0.0, 2.8]), np.array([3.6, 0.8, 3.7]),
                np.array([0.35, 0.4, 0.85])),
        ],
        wall_albedo=np.array([0.66, 0.7, 0.72]),
        light_dir=np.array([-0.3, 0.85, 0.35])
        / np.linalg.norm([-0.3, 0.85, 0.35]),
    )


SEQUENCES = {
    "seq_a": (SyntheticScene.default, {}),
    "seq_b": (scene_b, {"radius_frac": 0.33, "height_frac": 0.42,
                        "sweep": None}),
    # slow orbit (~half of seq_a's per-frame motion — Replica-like):
    # both systems' operating envelope, the clean-regime data point
    "seq_c": (SyntheticScene.default, {"radius_frac": 0.3,
                                       "height_frac": 0.55}),
}


def export_sequence(out_dir: str, seq: str, n_frames: int,
                    jpg_quality: int = 95) -> np.ndarray:
    """Render + write one sequence; returns the (n,4,4) internal GT c2w."""
    import cv2

    make_scene, traj_kwargs = SEQUENCES[seq]
    scene = make_scene()
    if seq == "seq_b":
        # reversed orbit direction: a different motion profile
        kw = dict(traj_kwargs)
        kw["sweep"] = -min(0.02 * n_frames, 1.5 * np.pi)
        traj_kwargs = kw
    elif seq == "seq_c":
        # half-speed sweep: ~1.1 cm / 0.6 deg per frame
        kw = dict(traj_kwargs)
        kw["sweep"] = min(0.01 * n_frames, 1.5 * np.pi)
        traj_kwargs = kw
    poses = orbit_trajectory(scene, n_frames, **traj_kwargs)

    res = os.path.join(out_dir, "results")
    os.makedirs(res, exist_ok=True)
    lines = []
    for k in range(n_frames):
        color, depth = render_frame(scene, poses[k], CAM["H"], CAM["W"],
                                    CAM["fx"], CAM["fy"], CAM["cx"],
                                    CAM["cy"])
        bgr = (np.clip(color, 0, 1) * 255.0).round().astype(np.uint8)[
            :, :, ::-1]
        cv2.imwrite(os.path.join(res, f"frame{k:06d}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, jpg_quality])
        d16 = np.clip(depth * CAM["png_depth_scale"], 0, 65535)
        cv2.imwrite(os.path.join(res, f"depth{k:06d}.png"),
                    d16.round().astype(np.uint16))
        disk = poses[k].astype(np.float64).copy()
        disk[:3, 1] *= -1.0
        disk[:3, 2] *= -1.0
        lines.append(" ".join(f"{v:.17g}" for v in disk.reshape(-1)))
    with open(os.path.join(out_dir, "traj.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return poses


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seq", default="seq_a", choices=sorted(SEQUENCES))
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()
    export_sequence(args.out_dir, args.seq, args.frames)
    print(f"exported {args.seq} ({args.frames} frames) -> {args.out_dir}")
