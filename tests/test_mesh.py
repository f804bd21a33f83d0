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

    def test_splat_depth(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from eval_recon import splat_depth

        vol, origin, spacing = sphere_volume()
        v, t = marching_tetrahedra(vol, 0.0, origin, spacing)
        c2w = np.eye(4)
        c2w[2, 3] = 3.0  # camera at z=3 looking down -z at sphere r=.6
        d = splat_depth(v, t, c2w, 64, 64, 64.0, 64.0, 31.5, 31.5)
        center = d[28:36, 28:36]
        center = center[center > 0]
        assert len(center) > 10
        np.testing.assert_allclose(center.mean(), 2.4, atol=0.05)


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
