"""End-to-end run of a SHIPPED scene config through the real user entry
path (`python run.py configs/Replica/room0.yaml --input_folder ...`),
over a generated Replica-layout fixture — catches config-key drift
between the shipped yamls and the engine (the reference's demo flow,
README.md:141-158, is the model).

The fixture frames are rendered at the real Replica camera (680x1200,
f=600) so the shipped intrinsics are exercised verbatim; the child yaml
inherits the WHOLE room0 -> replica -> defaults chain and overrides only
compute budgets + crop_size (a key the chain itself supports,
src/NICE_SLAM.py:118-128) + data paths — exactly how a user would write
a scene variant."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nice_slam_tpu.utils.synthetic import (
    Sphere,
    SyntheticScene,
    orbit_trajectory,
    render_frame,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Replica camera (configs/Replica/replica.yaml == reference's)
RH, RW, RF = 680, 1200, 600.0
RCX, RCY = 599.5, 339.5
DEPTH_SCALE = 6553.5
N_FRAMES = 7


def room0_scene() -> SyntheticScene:
    """A room INSIDE room0's shipped bound ([[-2.9,8.9],[-3.2,5.5],
    [-3.5,3.3]]) so the shipped mapping.bound is exercised as-is."""
    return SyntheticScene(
        room_lo=np.array([-2.0, -2.5, -3.0]),
        room_hi=np.array([2.0, 0.5, 1.0]),
        spheres=[
            Sphere(np.array([-1.0, -1.9, -1.8]), 0.6,
                   np.array([0.85, 0.25, 0.2])),
            Sphere(np.array([1.0, -1.7, 0.0]), 0.7,
                   np.array([0.2, 0.45, 0.85])),
        ],
        boxes=[],
        wall_albedo=np.array([0.7, 0.68, 0.65]),
        light_dir=np.array([0.4, 0.8, 0.45])
        / np.linalg.norm([0.4, 0.8, 0.45]),
    )


@pytest.fixture(scope="module")
def replica_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("room0_fixture")
    res = root / "results"
    res.mkdir()
    scene = room0_scene()
    poses = orbit_trajectory(scene, N_FRAMES)
    lines = []
    for i in range(N_FRAMES):
        color, depth = render_frame(scene, poses[i], RH, RW, RF, RF,
                                    RCX, RCY)
        cv2.imwrite(str(res / f"frame{i:06d}.jpg"),
                    cv2.cvtColor((color * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(res / f"depth{i:06d}.png"),
                    (depth * DEPTH_SCALE).astype(np.uint16))
        disk = poses[i].astype(np.float64).copy()
        disk[:3, 1] *= -1
        disk[:3, 2] *= -1
        lines.append(" ".join(map(str, disk.reshape(-1))))
    (root / "traj.txt").write_text("\n".join(lines) + "\n")
    return str(root)


class TestShippedConfigE2E:
    def test_replica_room0_runs_via_cli(self, replica_fixture, tmp_path):
        out = str(tmp_path / "out")
        child = tmp_path / "room0_tiny.yaml"
        child.write_text(f"""
inherit_from: configs/Replica/room0.yaml
cam: {{crop_size: [170, 300]}}
tracking: {{iters: 4, pixels: 100, ignore_edge_W: 10, ignore_edge_H: 10}}
mapping:
  every_frame: 3
  iters_first: 30
  iters: 9
  pixels: 150
  mapping_window_size: 3
  keyframe_every: 3
  ckpt_freq: 100000
  mesh_freq: 100000
  color_refine: False
rendering: {{N_samples: 12, N_surface: 6}}
data: {{input_folder: {replica_fixture}, output: {out}}}
""")
        env = dict(os.environ)
        env.setdefault("JAX_PLATFORMS", "cpu")
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "run.py"), str(child),
             "--frames", str(N_FRAMES), "--no-mesh"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=1200)
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        with open(os.path.join(out, "ate.json")) as f:
            stats = json.load(f)
        assert np.isfinite(stats["rmse"])
        # checkpoints written through the shipped chain's final-frame path
        assert os.listdir(os.path.join(out, "ckpts"))

    def test_all_shipped_configs_build_specs(self):
        """Every shipped yaml loads and builds typed specs (key drift in
        any family fails here even without a dataset)."""
        import glob

        from nice_slam_tpu.config import load_config, specs_from_config

        yamls = glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
                          recursive=True)
        assert len(yamls) >= 25
        for y in yamls:
            cfg = load_config(y)
            specs = specs_from_config(cfg)
            assert specs.camera.H > 0
