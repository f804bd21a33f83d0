"""Mesher stack tests: native marching tetrahedra (C++ vs numpy oracle),
PLY round-trip, surface sampling, component filtering, depth splatting."""

import numpy as np
import pytest

from nice_slam_tpu.native import (
    _marching_tetrahedra_numpy,
    get_lib,
    marching_tetrahedra,
)
from nice_slam_tpu.utils.plyio import read_ply, write_ply


def sphere_volume(n=24, r=0.6):
    xs = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = (r - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)
    origin = np.array([-1.0, -1.0, -1.0])
    spacing = np.full(3, 2.0 / (n - 1))
    return vol, origin, spacing


class TestMarchingTetrahedra:
    def test_sphere_radius(self):
        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        assert len(v) > 500 and len(t) > 1000
        r = np.linalg.norm(v, axis=1)
        assert abs(r.mean() - 0.6) < 0.01
        assert np.abs(r - 0.6).max() < 0.02

    def test_watertight_euler(self):
        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        # closed surface: V - E + F = 2, E = 3F/2
        edges = set()
        for a, b, c in t:
            for e in ((a, b), (b, c), (c, a)):
                edges.add((min(e), max(e)))
        assert len(v) - len(edges) + len(t) == 2

    def test_cpp_matches_numpy(self):
        if get_lib() is None:
            pytest.skip("no native lib")
        vol, origin, spacing = sphere_volume(n=10)
        v1, t1 = marching_tetrahedra(vol, 0.0, origin, spacing)
        v2, t2 = _marching_tetrahedra_numpy(vol, 0.0, origin, spacing)
        assert v1.shape == v2.shape and t1.shape == t2.shape
        np.testing.assert_allclose(v1, v2, atol=1e-5)
        np.testing.assert_array_equal(t1, t2)

    def test_empty_volume(self):
        vol = np.full((5, 5, 5), -1.0, np.float32)
        v, t = marching_tetrahedra(vol, 0.0, np.zeros(3), np.ones(3))
        assert len(v) == 0 and len(t) == 0

    def test_nonuniform_spacing_and_origin(self):
        vol, _, _ = sphere_volume(n=20)
        origin = np.array([5.0, -3.0, 1.0])
        spacing = np.array([0.1, 0.2, 0.3])
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        center = origin + spacing * (20 - 1) / 2
        d = (v - center) / (spacing * (20 - 1) / 2)  # back to unit sphere
        r = np.linalg.norm(d * 1.0, axis=1)
        assert abs(np.mean(r) - 0.6) < 0.02


class TestPly:
    def test_roundtrip_with_colors(self, tmp_path):
        rng = np.random.RandomState(0)
        v = rng.rand(17, 3).astype(np.float32)
        t = rng.randint(0, 17, (9, 3)).astype(np.int64)
        c = rng.randint(0, 256, (17, 3)).astype(np.uint8)
        p = str(tmp_path / "m.ply")
        write_ply(p, v, t, c)
        v2, t2, c2 = read_ply(p)
        np.testing.assert_allclose(v2, v, atol=1e-6)
        np.testing.assert_array_equal(t2, t)
        np.testing.assert_array_equal(c2, c)

    def test_roundtrip_no_colors(self, tmp_path):
        v = np.eye(3, dtype=np.float32)
        t = np.array([[0, 1, 2]], np.int64)
        p = str(tmp_path / "m.ply")
        write_ply(p, v, t)
        v2, t2, c2 = read_ply(p)
        np.testing.assert_allclose(v2, v)
        assert c2 is None


class TestEvalRecon:
    def test_surface_sampling_on_unit_square(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from eval_recon import sample_surface

        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
        t = np.array([[0, 1, 2], [0, 2, 3]])
        pts = sample_surface(v, t, 5000, seed=0)
        assert pts.shape == (5000, 3)
        assert (pts[:, 2] == 0).all()
        assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1
        # roughly uniform
        assert abs(pts[:, 0].mean() - 0.5) < 0.03

    def test_3d_metrics_identical_mesh(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from eval_recon import calc_3d_metrics

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        m = calc_3d_metrics((v, t, None), (v, t, None), n_samples=5000,
                            align=False)
        assert m["accuracy_cm"] < 2.0
        assert m["completion_ratio_pct"] > 99.0

    def test_rasterize_depth_sphere(self):
        """Native z-buffer rasterizer: camera at z=3 looking down -z at a
        sphere of radius 0.6 -> center depth 2.4, empty pixels 0."""
        from nice_slam_tpu.native import rasterize_depth

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        d = rasterize_depth(v, t, c2w, 64, 64, 64.0, 64.0, 31.5, 31.5)
        center = d[30:34, 30:34]
        assert (center > 0).all()   # full coverage (no splat holes)
        np.testing.assert_allclose(center.mean(), 2.4, atol=0.05)
        # corners see past the sphere: empty -> 0 like an Open3D buffer
        assert d[0, 0] == 0.0 and d[-1, -1] == 0.0

    def test_rasterize_native_matches_numpy_oracle(self):
        from nice_slam_tpu.native import (
            _rasterize_depth_numpy,
            get_lib,
            rasterize_depth,
        )

        if get_lib() is None:
            import pytest
            pytest.skip("no native toolchain")
        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.3, -0.2, 2.5]
        d_c = rasterize_depth(v, t, c2w, 48, 56, 50.0, 50.0, 27.5, 23.5)
        w2c = np.linalg.inv(c2w).astype(np.float32)
        d_py = _rasterize_depth_numpy(
            np.ascontiguousarray(v, np.float32),
            np.ascontiguousarray(t, np.int64), w2c,
            48, 56, 50.0, 50.0, 27.5, 23.5, 0.01, 20.0)
        np.testing.assert_allclose(d_c, d_py, atol=1e-4)

    def test_rasterize_near_plane_clipping(self):
        """A triangle straddling the camera plane must be clipped, not
        dropped or smeared across the image."""
        from nice_slam_tpu.native import rasterize_depth

        # vertical wall passing BEHIND and in front of the camera
        v = np.array([[0.5, -5, 5], [0.5, -5, -5], [0.5, 5, -5],
                      [0.5, 5, 5]], np.float32)
        t = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        d = rasterize_depth(v, t, np.eye(4), 64, 64, 32.0, 32.0,
                            31.5, 31.5)
        assert (d >= 0).all() and np.isfinite(d).all()
        # wall is at x=0.5, to the camera's right: right half of the
        # image hits it, left half is empty
        assert (d[:, 48:] > 0).mean() > 0.9
        assert (d[:, :16] == 0).all()

    def test_2d_metric_identical_meshes_is_zero(self):
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from eval_recon import calc_2d_metric

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        m = calc_2d_metric((v, t, None), (v, t, None), pc_unseen=None,
                           n_views=5, align=False)
        assert m["views_used"] == 5
        assert m["depth_l1_cm"] < 1e-3, m

    def test_2d_metric_rejects_views_seeing_unseen_points(self):
        """Reference semantics (eval_recon.py:146-177): candidate views
        in which unseen GT points are visible must be resampled."""
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from eval_recon import calc_2d_metric

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        # unseen points densely surrounding the scene: every view sees
        # some -> every sample is rejected through the retry cap
        th = np.linspace(0, 2 * np.pi, 64)
        ring = np.stack([2.5 * np.cos(th), 2.5 * np.sin(th),
                         np.zeros_like(th)], 1)
        ring = np.concatenate([ring, ring[:, [0, 2, 1]], ring[:, [2, 0, 1]]])
        m = calc_2d_metric((v, t, None), (v, t, None), pc_unseen=ring,
                           n_views=2, align=False)
        assert m["views_rejected"] > 0
        # every view either found a clean sample or was excluded — a
        # rejected view is never silently used
        assert m["views_used"] + m["views_excluded"] == 2

    def test_2d_metric_exhaustion_excludes_views(self):
        """When no clean view exists, views are EXCLUDED (with a count in
        the result), never silently used after the 200-resample cap —
        the reference loops forever instead (eval_recon.py:157-174)."""
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from eval_recon import calc_2d_metric

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        # dense unseen sphere fully surrounding the scene: the ~80-deg
        # view cone always contains some of 2000 uniform points, so no
        # clean view can ever be found
        rng = np.random.RandomState(0)
        p = rng.normal(size=(2000, 3))
        shell = 2.5 * p / np.linalg.norm(p, axis=1, keepdims=True)
        m = calc_2d_metric((v, t, None), (v, t, None), pc_unseen=shell,
                           n_views=2, align=False)
        assert m["views_excluded"] == 2
        assert m["views_used"] == 0
        assert np.isnan(m["depth_l1_cm"])

    def test_unseen_points_split(self):
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from cull_mesh import unseen_points

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        # narrow FOV (~9 deg): the frustum contains only a thin cone
        # around the +z pole; everything else is unseen (the cull test is
        # pure frustum containment, like the reference's)
        pts = unseen_points(v, t, [c2w], 64, 64, 400.0, 400.0, 31.5, 31.5,
                            n_samples=4000)
        assert 0 < len(pts) < 4000
        # the near-axis +z cap is seen, so it is absent from the unseen set
        cap = (pts[:, 2] > 0.55) & (np.abs(pts[:, 0]) < 0.1) & \
              (np.abs(pts[:, 1]) < 0.1)
        assert cap.sum() == 0


class TestCullMesh:
    def test_cull_keeps_visible(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from cull_mesh import cull

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        # camera at z=3 sees the whole sphere (fov wide enough)
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        kept = cull(v, t, [c2w], 64, 64, 40.0, 40.0, 31.5, 31.5)
        assert len(kept) == len(t)
        # a camera looking away sees nothing
        c2w2 = np.eye(4)
        c2w2[2, 3] = -3.0   # sphere is behind (+z of camera)
        kept2 = cull(v, t, [c2w2], 64, 64, 40.0, 40.0, 31.5, 31.5)
        assert len(kept2) == 0


class TestForecastComposition:
    def test_compose_semantics(self):
        """Scene-completion occupancy composition pins the reference's
        semantics (Mesher.py:386-418): seen->fine, unseen-in-hull->
        coarse+0.2, outside->solid."""
        from nice_slam_tpu.utils.mesher import compose_forecast_occupancy

        occ_f = np.array([5.0, -3.0, 1.0, 2.0], np.float32)
        occ_c = np.array([0.5, -0.5, -1.0, 3.0], np.float32)
        seen = np.array([True, False, False, True])
        hull = np.array([True, True, False, False])
        occ, fmask = compose_forecast_occupancy(occ_f, occ_c, seen, hull)
        np.testing.assert_array_equal(fmask, [False, True, False, False])
        assert occ[0] == 5.0                       # seen -> fine level
        assert occ[1] == pytest.approx(-0.5 + 0.2)  # forecast -> coarse+0.2
        assert occ[2] == 100.0                     # outside hull -> solid
        assert occ[3] == 2.0                       # seen even outside hull


class TestImapNormalColors:
    def test_colors_shape_and_range(self):
        """iMAP* vertex coloring renders along vertex normals
        (reference Mesher.py:526-553)."""
        import jax
        from nice_slam_tpu.models.decoders import imap_model_spec
        from nice_slam_tpu.state import make_map_state
        from nice_slam_tpu.utils.mesher import _imap_normal_colors

        mspec = imap_model_spec()
        state = make_map_state(
            jax.random.PRNGKey(0), mspec, [[-1.0, 1.0]] * 3,
            {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16},
            0.32)
        vol, origin, spacing = sphere_volume(n=12)
        verts, tris = marching_tetrahedra(vol, 0.0, origin, spacing)
        cols = _imap_normal_colors(state.params, mspec, state.grids,
                                   state.bound, verts, tris, chunk=256)
        assert cols.shape == (len(verts), 3)
        assert cols.dtype == np.uint8
