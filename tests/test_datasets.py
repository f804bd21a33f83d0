"""Dataset-reader tests against tiny on-disk fixtures in each supported
layout (Replica / ScanNet / TUM / Azure), plus an end-to-end engine smoke
run over a file-backed dataset — which exercises the uint8 color
streaming path (BaseDataset.transfer_color_uint8) that the synthetic
tests never touch."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nice_slam_tpu.config import load_config
from nice_slam_tpu.utils.datasets import get_dataset
from nice_slam_tpu.utils.synthetic import (
    SyntheticScene,
    orbit_trajectory,
    render_frame,
)

H, W = 48, 64
FX = FY = 48.0
CX, CY = 31.5, 23.5
DEPTH_SCALE = 6553.5


def cam_cfg(**kw):
    d = {"H": H, "W": W, "fx": FX, "fy": FY, "cx": CX, "cy": CY,
         "png_depth_scale": DEPTH_SCALE, "crop_edge": 0}
    d.update(kw)
    return d


def render_tiny(n=4):
    scene = SyntheticScene.default()
    c2ws = orbit_trajectory(scene, n)
    frames = []
    for i in range(n):
        color, depth = render_frame(scene, c2ws[i], H, W, FX, FY, CX, CY)
        frames.append((color, depth, c2ws[i]))
    return frames


def flip_yz(m):
    m = m.copy()
    m[:3, 1] *= -1
    m[:3, 2] *= -1
    return m


def write_color(path, color):
    cv2.imwrite(path, cv2.cvtColor(
        (color * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))


def write_depth(path, depth):
    cv2.imwrite(path, (depth * DEPTH_SCALE).astype(np.uint16))


@pytest.fixture(scope="module")
def frames():
    return render_tiny()


class TestReplicaReader:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory, frames):
        root = tmp_path_factory.mktemp("replica_scene")
        (root / "results").mkdir()
        lines = []
        for i, (color, depth, c2w) in enumerate(frames):
            write_color(str(root / "results" / f"frame{i:06d}.jpg"), color)
            write_depth(str(root / "results" / f"depth{i:06d}.png"), depth)
            # traj.txt carries the dataset-convention pose; the reader
            # flips columns 1,2 back to the internal convention
            lines.append(" ".join(map(str, flip_yz(c2w).reshape(-1))))
        (root / "traj.txt").write_text("\n".join(lines) + "\n")
        return str(root)

    def test_read(self, root, frames):
        cfg = load_config(overrides={
            "dataset": "replica", "cam": cam_cfg(),
            "data": {"input_folder": root, "output": "/tmp/x"}})
        ds = get_dataset(cfg)
        assert len(ds) == len(frames)
        idx, color, depth, pose = ds[1]
        assert color.shape == (H, W, 3) and color.dtype == np.float32
        assert 0.0 <= color.min() and color.max() <= 1.0
        assert depth.shape == (H, W)
        # u16 PNG round-trip: depth exact to 1/DEPTH_SCALE
        np.testing.assert_allclose(depth, frames[1][1],
                                   atol=2.0 / DEPTH_SCALE)
        # pose read back in the internal convention
        np.testing.assert_allclose(pose, frames[1][2], atol=1e-5)
        assert ds.transfer_color_uint8

    def test_crop_edge(self, root):
        cfg = load_config(overrides={
            "dataset": "replica", "cam": cam_cfg(crop_edge=4),
            "data": {"input_folder": root, "output": "/tmp/x"}})
        _, color, depth, _ = get_dataset(cfg)[0]
        assert color.shape == (H - 8, W - 8, 3)
        assert depth.shape == (H - 8, W - 8)

    def test_engine_smoke_uint8_streaming(self, root):
        """End-to-end SLAM over a file-backed dataset: covers the uint8
        host->device color path + in-jit dequantization."""
        from nice_slam_tpu.engine import SlamEngine

        cfg = load_config(overrides={
            "dataset": "replica", "cam": cam_cfg(),
            "grid_len": {"coarse": 1.0, "middle": 0.32, "fine": 0.16,
                         "color": 0.16},
            "mapping": {"bound": [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]],
                        "marching_cubes_bound":
                            [[0.0, 4.0], [0.0, 3.0], [0.0, 4.0]],
                        "every_frame": 2, "iters_first": 30, "iters": 8,
                        "pixels": 120, "mapping_window_size": 3,
                        "keyframe_every": 2, "ckpt_freq": 10000,
                        "mesh_freq": 10000, "color_refine": False},
            "tracking": {"iters": 4, "pixels": 80,
                         "ignore_edge_W": 4, "ignore_edge_H": 4},
            "rendering": {"N_samples": 12, "N_surface": 6},
            "data": {"input_folder": root, "output": "/tmp/ds_engine_out"}})
        eng = SlamEngine(cfg, output="/tmp/ds_engine_out")
        eng.run(progress=False)
        assert np.isfinite(eng.est_c2w[:4]).all()
        assert np.isfinite(eng.ate()["rmse"])
        # keyframe colors survived the uint8 round trip
        import jax
        kc = np.asarray(jax.device_get(eng.store.colors[0]))
        assert kc.dtype == np.uint8 and kc.max() > 0


class TestScanNetReader:
    def test_read(self, tmp_path, frames):
        root = tmp_path / "scannet_scene"
        for sub in ("color", "depth", "pose"):
            (root / "frames" / sub).mkdir(parents=True)
        for i, (color, depth, c2w) in enumerate(frames):
            write_color(str(root / "frames" / "color" / f"{i}.jpg"), color)
            write_depth(str(root / "frames" / "depth" / f"{i}.png"), depth)
            np.savetxt(str(root / "frames" / "pose" / f"{i}.txt"),
                       flip_yz(c2w))
        cfg = load_config(overrides={
            "dataset": "scannet", "cam": cam_cfg(),
            "data": {"input_folder": str(root), "output": "/tmp/x"}})
        ds = get_dataset(cfg)
        assert len(ds) == len(frames)
        # numeric sort: frame 10 would come after 9, not after 1
        _, color, depth, pose = ds[2]
        np.testing.assert_allclose(pose, frames[2][2], atol=1e-5)
        np.testing.assert_allclose(depth, frames[2][1],
                                   atol=2.0 / DEPTH_SCALE)


class TestAzureReader:
    def test_read_with_trajectory_log(self, tmp_path, frames):
        root = tmp_path / "azure_scene"
        (root / "color").mkdir(parents=True)
        (root / "depth").mkdir()
        (root / "scene").mkdir()
        lines = []
        for i, (color, depth, c2w) in enumerate(frames):
            write_color(str(root / "color" / f"{i:05d}.jpg"), color)
            write_depth(str(root / "depth" / f"{i:05d}.png"), depth)
            lines.append(f"{i} {i} {i + 1}")
            for row in flip_yz(c2w):
                lines.append(" ".join(map(str, row)))
        (root / "scene" / "trajectory.log").write_text(
            "\n".join(lines) + "\n")
        cfg = load_config(overrides={
            "dataset": "azure", "cam": cam_cfg(),
            "data": {"input_folder": str(root), "output": "/tmp/x"}})
        ds = get_dataset(cfg)
        assert len(ds) == len(frames)
        _, _, _, pose = ds[3]
        np.testing.assert_allclose(pose, frames[3][2], atol=1e-5)

    def test_identity_poses_without_log(self, tmp_path, frames):
        root = tmp_path / "azure_scene2"
        (root / "color").mkdir(parents=True)
        (root / "depth").mkdir()
        for i, (color, depth, _) in enumerate(frames[:2]):
            write_color(str(root / "color" / f"{i:05d}.jpg"), color)
            write_depth(str(root / "depth" / f"{i:05d}.png"), depth)
        cfg = load_config(overrides={
            "dataset": "azure", "cam": cam_cfg(),
            "data": {"input_folder": str(root), "output": "/tmp/x"}})
        ds = get_dataset(cfg)
        _, _, _, pose = ds[0]
        np.testing.assert_allclose(pose, np.eye(4))


class TestTumReader:
    def test_association_and_pose_normalization(self, tmp_path, frames):
        from scipy.spatial.transform import Rotation

        root = tmp_path / "tum_scene"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        rgb_lines, dep_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
        for i, (color, depth, c2w) in enumerate(frames):
            t = 100.0 + i  # 1 Hz < frame_rate cap: all frames kept
            write_color(str(root / "rgb" / f"{t:.6f}.png"), color)
            write_depth(str(root / "depth" / f"{t:.6f}.png"),
                        depth / (DEPTH_SCALE / 5000.0))
            rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
            # depth timestamp offset < 0.08 s: association must pair them
            dep_lines.append(f"{t + 0.02:.6f} depth/{t:.6f}.png")
            m = flip_yz(c2w)
            q = Rotation.from_matrix(m[:3, :3]).as_quat()
            tr = m[:3, 3]
            gt_lines.append(
                f"{t + 0.01:.6f} {tr[0]} {tr[1]} {tr[2]} "
                f"{q[0]} {q[1]} {q[2]} {q[3]}")
        (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
        (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
        (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

        cfg = load_config(overrides={
            "dataset": "tumrgbd", "cam": cam_cfg(png_depth_scale=5000.0),
            "data": {"input_folder": str(root), "output": "/tmp/x"}})
        ds = get_dataset(cfg)
        assert len(ds) == len(frames)
        # poses are normalized to the first frame THEN y/z-flipped, like
        # the reference (datasets.py:301-308): first pose = flip(eye)
        _, _, _, p0 = ds[0]
        np.testing.assert_allclose(p0, flip_yz(np.eye(4)), atol=1e-6)
        _, _, depth1, p1 = ds[1]
        w0 = flip_yz(frames[0][2])  # raw dataset-convention poses
        w1 = flip_yz(frames[1][2])
        expect = flip_yz(np.linalg.inv(w0) @ w1)
        np.testing.assert_allclose(p1, expect, atol=1e-5)
        np.testing.assert_allclose(depth1, frames[1][1], atol=2.0 / 5000.0)
