"""Component tests: keyframe store/selection, synthetic scene, trajectory
metrics, config system, camera preprocessing, frustum masks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nice_slam_tpu.camera import Camera
from nice_slam_tpu.config import DEFAULTS, load_config, specs_from_config
from nice_slam_tpu.keyframes import (
    add_keyframe,
    build_window,
    make_store,
    project_points,
    se3_inverse,
    select_keyframes_global,
    select_keyframes_overlap,
    update_poses,
)
from nice_slam_tpu.mapping import MapSpec, frustum_mask
from nice_slam_tpu.utils.synthetic import (
    SyntheticScene,
    orbit_trajectory,
    render_frame,
)
from nice_slam_tpu.utils.trajectory import ate_stats, horn_align


class TestSynthetic:
    def test_render_frame(self):
        scene = SyntheticScene.default()
        c2w = orbit_trajectory(scene, 4)[0]
        color, depth = render_frame(scene, c2w, 48, 64, 48.0, 48.0, 31.5, 23.5)
        assert color.shape == (48, 64, 3) and depth.shape == (48, 64)
        assert color.min() >= 0 and color.max() <= 1
        assert (depth > 0.05).all() and (depth < 10).all()

    def test_depth_is_zbuffer(self):
        """Center pixel depth equals euclidean distance along the axis."""
        scene = SyntheticScene.default()
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [2.0, 1.5, 2.0]
        _, depth = render_frame(scene, c2w, 33, 33, 40.0, 40.0, 16.0, 16.0)
        # looking down -z from room center: wall at z=0 -> depth 2.0
        assert abs(depth[16, 16] - 2.0) < 1e-3

    def test_trajectory_in_room(self):
        scene = SyntheticScene.default()
        t = orbit_trajectory(scene, 20)
        pos = t[:, :3, 3]
        assert (pos > scene.room_lo).all() and (pos < scene.room_hi).all()
        # rotations orthonormal
        R = t[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (20, 1, 1)),
                                   atol=1e-5)


class TestKeyframes:
    def _store(self, n=3):
        store = make_store(6, 8, 10)
        for i in range(n):
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 3] = [i * 0.1, 0, 0]
            store = add_keyframe(
                store, jnp.full((8, 10, 3), 0.5), jnp.full((8, 10), 1.0),
                jnp.asarray(c2w), jnp.asarray(c2w), i * 5)
        return store

    def test_add_and_roundtrip(self):
        store = self._store(2)
        assert int(store.count) == 2
        np.testing.assert_allclose(
            np.asarray(store.colors[0], np.float32) / 255.0,
            np.full((8, 10, 3), 0.5), atol=1 / 255.0)
        assert float(store.est_c2w[1, 0, 3]) == pytest.approx(0.1)

    def test_se3_inverse(self):
        from scipy.spatial.transform import Rotation
        R = Rotation.random(random_state=1).as_matrix()
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = [1, 2, 3]
        inv = se3_inverse(jnp.asarray(c2w, jnp.float32))
        np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(c2w),
                                   atol=1e-5)

    def test_project_points_roundtrip(self):
        cam = Camera(H=48, W=64, fx=50.0, fy=50.0, cx=31.5, cy=23.5)
        c2w = jnp.eye(4)
        # a point 2m in front of the camera (z=-2), slightly right
        pts = jnp.array([[0.4, 0.0, -2.0]])
        u, v, z = project_points(pts, c2w, cam)
        assert float(z[0]) == pytest.approx(-2.0, abs=1e-4)
        assert float(u[0]) == pytest.approx(31.5 + 50 * 0.4 / 2, abs=1e-2)
        assert float(v[0]) == pytest.approx(23.5, abs=1e-2)

    def test_global_selection_excludes_latest(self):
        store = self._store(3)
        slots, valid = select_keyframes_global(jax.random.PRNGKey(0), store, 4)
        chosen = set(np.asarray(slots)[np.asarray(valid)].tolist())
        assert 2 not in chosen  # latest excluded
        assert chosen <= {0, 1}

    def test_overlap_selection(self):
        # image must be larger than the 2x20 px frustum edge margin the
        # selector uses (reference Mapper.py:213-215)
        cam = Camera(H=64, W=80, fx=64.0, fy=64.0, cx=39.5, cy=31.5)
        store = make_store(6, 64, 80)
        for i in range(3):
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 3] = [i * 0.05, 0, 0]
            store = add_keyframe(
                store, jnp.full((64, 80, 3), 0.5), jnp.full((64, 80), 1.0),
                jnp.asarray(c2w), jnp.asarray(c2w), i * 5)
        cur = np.eye(4, dtype=np.float32)
        slots, valid = select_keyframes_overlap(
            jax.random.PRNGKey(1), store, jnp.full((64, 80, 3), 0.5),
            jnp.full((64, 80), 1.0), jnp.asarray(cur), cam, 2)
        assert slots.shape == (2,)
        # co-located keyframes see the same volume -> some should qualify
        assert bool(valid.any())

    def test_build_window(self):
        store = self._store(3)
        slots = jnp.array([0, 1], jnp.int32)
        valid = jnp.array([True, False])
        cur_c = jnp.zeros((8, 10, 3))
        cur_d = jnp.ones((8, 10))
        w = build_window(store, slots, valid, cur_c, cur_d, jnp.eye(4))
        assert w["colors"].shape == (4, 8, 10, 3)
        assert np.asarray(w["valid"]).tolist() == [True, False, True, True]
        assert int(w["slots"][-1]) == -1  # current frame marker
        assert int(w["slots"][-2]) == 2   # most recent keyframe

    def test_update_poses(self):
        store = self._store(3)
        new = jnp.tile(jnp.eye(4) * 2, (2, 1, 1))
        store2 = update_poses(store, jnp.array([0, 1]), new,
                              jnp.array([True, False]))
        assert float(store2.est_c2w[0, 0, 0]) == 2.0
        assert float(store2.est_c2w[1, 0, 0]) == 1.0


class TestFrustumMask:
    def test_visible_region(self):
        cam = Camera(H=40, W=40, fx=40.0, fy=40.0, cx=19.5, cy=19.5)
        bound = jnp.array([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])
        c2w = jnp.eye(4)  # at origin looking down -z
        depth = jnp.full((40, 40), 1.5)
        m = frustum_mask(bound, (16, 16, 16), c2w, depth, cam)
        m = np.asarray(m)
        # voxels straight ahead within depth+0.5 visible: z in [-2, 0)
        # index mapping: z= -2 -> iz=0
        assert m[8, 8, 2]          # in front, within depth
        assert not m[8, 8, 14]     # behind the camera (z>0, outside 0.5m ball)
        assert m[8, 8, 8]          # at camera (within 0.5 m ball)
        # far off-axis voxel outside frustum
        assert not m[0, 0, 15]


class TestTrajectoryMetrics:
    def test_horn_exact_alignment(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(30, 3)
        from scipy.spatial.transform import Rotation
        R = Rotation.random(random_state=2).as_matrix()
        moved = pts @ R.T + np.array([1.0, -2.0, 0.5])
        rot, trans, err = horn_align(pts, moved)
        assert err.max() < 1e-8
        np.testing.assert_allclose(rot, R, atol=1e-8)

    def test_ate_stats_identity(self):
        n = 10
        c2w = np.tile(np.eye(4), (n, 1, 1))
        c2w[:, :3, 3] = np.random.RandomState(1).randn(n, 3)
        stats = ate_stats(c2w, c2w)
        assert stats["rmse"] < 1e-8
        assert stats["n_pairs"] == n

    def test_ate_masks_invalid_gt(self):
        n = 6
        c2w = np.tile(np.eye(4), (n, 1, 1))
        gt = c2w.copy()
        gt[2, 0, 3] = np.nan
        stats = ate_stats(gt, c2w)
        assert stats["n_pairs"] == n - 1


class TestConfig:
    def test_defaults_complete(self):
        cfg = load_config()
        specs = specs_from_config(cfg)
        assert specs.camera.H == 680
        assert specs.mapper.window_size == 5
        assert specs.coarse_mapper is not None
        assert specs.coarse_mapper.keyframe_selection == "global"
        assert specs.coarse_mapper.coarse_mapper

    def test_imap_mode(self):
        cfg = load_config(nice=False)
        specs = specs_from_config(cfg)
        assert not specs.model.nice
        assert specs.render.n_importance == 12
        assert specs.render.n_surface == 0
        assert not specs.render.occupancy
        assert specs.coarse_mapper is None

    def test_inherit_from_chain(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("tracking:\n  iters: 77\nmapping:\n  pixels: 123\n")
        child = tmp_path / "child.yaml"
        child.write_text(
            f"inherit_from: {base}\nmapping:\n  pixels: 456\n")
        cfg = load_config(str(child))
        assert cfg["tracking"]["iters"] == 77
        assert cfg["mapping"]["pixels"] == 456
        # untouched defaults survive
        assert cfg["mapping"]["iters"] == 60

    def test_stage_iters_schedule(self):
        ms = MapSpec()
        it = ms.stage_iters(60)
        # reference thresholds: iters 0..24 middle, 25..36 fine, 37..59 color
        assert it["middle"] == 25 and it["fine"] == 12 and it["color"] == 23
        assert sum(it.values()) == 60

    def test_camera_crop(self):
        cam = Camera.from_cfg({"H": 480, "W": 640, "fx": 517.3, "fy": 516.5,
                               "cx": 318.6, "cy": 255.3,
                               "crop_size": [384, 512], "crop_edge": 8})
        assert cam.H == 384 - 16 and cam.W == 512 - 16
        assert cam.fx == pytest.approx(517.3 * 512 / 640)
        assert cam.cx == pytest.approx(318.6 * 512 / 640 - 8)


class TestTinySceneWindowOverflow:
    def test_selection_pads_when_window_exceeds_capacity(self):
        """Window size larger than the keyframe-store capacity (tiny
        scenes) must pad with invalid slots, not crash top_k."""
        import jax
        import jax.numpy as jnp

        from nice_slam_tpu.camera import Camera
        from nice_slam_tpu.keyframes import (
            add_keyframe,
            make_store,
            select_keyframes_global,
            select_keyframes_overlap,
        )

        cam = Camera(H=24, W=32, fx=24.0, fy=24.0, cx=15.5, cy=11.5)
        store = make_store(3, cam.H, cam.W)
        eye = jnp.eye(4)
        color = jnp.full((cam.H, cam.W, 3), 0.5)
        depth = jnp.full((cam.H, cam.W), 1.0)
        store = add_keyframe(store, color, depth, eye, eye, 0)
        store = add_keyframe(store, color, depth, eye, eye, 1)

        for fn in (lambda k: select_keyframes_global(
                       jax.random.PRNGKey(0), store, k),
                   lambda k: select_keyframes_overlap(
                       jax.random.PRNGKey(0), store, color, depth, eye,
                       cam, k)):
            slots, valid = fn(8)  # k=8 > capacity=3
            assert slots.shape == (8,) and valid.shape == (8,)
            assert not bool(valid[3:].any())
