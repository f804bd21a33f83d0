"""Renderer tests: structural invariants + chunked-image consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nice_slam_tpu.camera import Camera
from nice_slam_tpu.models import nice_model_spec
from nice_slam_tpu.render import RenderSpec, render_rays, render_image, eval_points
from nice_slam_tpu.state import make_map_state

BOUND = [[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]]
GRID_LEN = {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16}


@pytest.fixture(scope="module")
def setup():
    mspec = nice_model_spec()
    state = make_map_state(jax.random.PRNGKey(0), mspec, BOUND, GRID_LEN, 0.32)
    rspec = RenderSpec(n_samples=16, n_surface=8)
    return mspec, state, rspec


class TestRenderRays:
    def test_shapes_and_finiteness(self, setup):
        mspec, state, rspec = setup
        n = 33
        rays_o = jnp.zeros((n, 3))
        rays_d = jnp.stack([jnp.zeros(n), jnp.zeros(n), -jnp.ones(n)], -1)
        gt_d = jnp.full((n,), 1.5)
        depth, var, color, w = render_rays(
            state.params, mspec, state.grids, state.bound, rays_o, rays_d,
            jax.random.PRNGKey(1), rspec, "color", gt_depth=gt_d)
        assert depth.shape == (n,) and color.shape == (n, 3)
        assert w.shape == (n, rspec.n_samples + rspec.n_surface)
        for x in (depth, var, color, w):
            assert bool(jnp.all(jnp.isfinite(x)))
        # occupancy weights are a sub-probability distribution
        assert float(w.sum(-1).max()) <= 1.0 + 1e-4

    def test_depth_within_range(self, setup):
        mspec, state, rspec = setup
        rays_o = jnp.zeros((8, 3))
        rays_d = jnp.stack([jnp.zeros(8), jnp.zeros(8), -jnp.ones(8)], -1)
        gt_d = jnp.full((8,), 1.0)
        depth, _, _, _ = render_rays(
            state.params, mspec, state.grids, state.bound, rays_o, rays_d,
            jax.random.PRNGKey(1), rspec, "middle", gt_depth=gt_d)
        assert float(depth.min()) >= 0.0
        assert float(depth.max()) <= 2.2  # within clamped far

    def test_out_of_bound_opaque(self, setup):
        # a point outside the AABB must decode to occupancy 100
        mspec, state, _ = setup
        p = jnp.array([[10.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        raw = eval_points(state.params, mspec, state.grids, state.bound, p,
                          "color")
        assert float(raw[0, 3]) == 100.0
        assert float(raw[1, 3]) != 100.0

    def test_coarse_stage_ignores_depth(self, setup):
        mspec, state, rspec = setup
        rays_o = jnp.zeros((4, 3))
        rays_d = jnp.stack([jnp.zeros(4), jnp.zeros(4), -jnp.ones(4)], -1)
        d1, _, _, _ = render_rays(
            state.params, mspec, state.grids, state.bound, rays_o, rays_d,
            jax.random.PRNGKey(1), rspec, "coarse", gt_depth=jnp.full((4,), 1.0))
        d2, _, _, _ = render_rays(
            state.params, mspec, state.grids, state.bound, rays_o, rays_d,
            jax.random.PRNGKey(1), rspec, "coarse", gt_depth=None)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def test_importance_path(self, setup):
        mspec, state, _ = setup
        rspec = RenderSpec(n_samples=12, n_surface=0, n_importance=6,
                           occupancy=False)
        rays_o = jnp.zeros((5, 3))
        rays_d = jnp.stack([jnp.zeros(5), jnp.zeros(5), -jnp.ones(5)], -1)
        depth, var, color, w = render_rays(
            state.params, mspec, state.grids, state.bound, rays_o, rays_d,
            jax.random.PRNGKey(2), rspec, "color", gt_depth=jnp.full((5,), 1.0))
        assert w.shape == (5, 18)
        assert bool(jnp.all(jnp.isfinite(depth)))


class TestRenderImage:
    def test_matches_direct_rays(self, setup):
        mspec, state, rspec = setup
        cam = Camera(H=6, W=9, fx=10.0, fy=10.0, cx=4.0, cy=2.5)
        c2w = jnp.eye(4)
        gt_depth = jnp.full((cam.H, cam.W), 1.2)
        # perturb=0, importance=0 -> rendering is deterministic (key unused)
        depth_img, _, color_img = render_image(
            state.params, mspec, state.grids, state.bound, c2w, cam,
            jax.random.PRNGKey(3), rspec, "color", gt_depth, chunk=16)

        from nice_slam_tpu.ops import image_rays
        rays_o, rays_d = image_rays(cam.H, cam.W, cam.fx, cam.fy, cam.cx,
                                    cam.cy, c2w)
        d2, _, c2, _ = render_rays(
            state.params, mspec, state.grids, state.bound,
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            jax.random.PRNGKey(9), rspec, "color",
            gt_depth=gt_depth.reshape(-1))
        np.testing.assert_allclose(np.asarray(depth_img).ravel(),
                                   np.asarray(d2), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(color_img).reshape(-1, 3),
                                   np.asarray(c2), rtol=2e-3, atol=2e-3)


class TestOccGuidedSampling:
    def test_samples_concentrate_in_occupied_slab(self):
        """With an occupancy proxy that is solid only in a z-slab, the
        guided sampler must place most samples through that slab while
        keeping the floor share elsewhere (static shapes throughout)."""
        import jax.numpy as jnp

        from nice_slam_tpu.ops import occ_guided_zvals

        bound = jnp.asarray([[0.0, 4.0], [0.0, 4.0], [0.0, 4.0]])
        # proxy solid for world z in [2.4, 3.2] (cells 6..7 of 10)
        proxy = jnp.zeros((10, 10, 10, 1)).at[:, :, 6:8].set(1.0)
        n = 64
        rays_o = jnp.asarray([[2.0, 2.0, 0.1]])
        rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
        near = jnp.asarray([[0.2]])
        far = jnp.asarray([[3.9]])
        z = occ_guided_zvals(rays_o, rays_d, near, far, proxy, bound, n,
                             floor=0.05)
        assert z.shape == (1, n)
        zs = np.asarray(z[0])
        assert (np.diff(zs) >= -1e-6).all()          # sorted
        assert zs.min() >= 0.19 and zs.max() <= 3.91  # inside [near, far]
        world_z = rays_o[0, 2] + zs  # ray along +z
        in_slab = ((world_z > 2.2) & (world_z < 3.4)).mean()
        assert in_slab > 0.5, in_slab                # concentrated
        assert (world_z < 2.0).sum() >= 2            # floor share remains

    def test_uniform_proxy_matches_stratified(self):
        """A constant proxy reduces the guided sampler to (approximately)
        the uniform stratified placement."""
        import jax.numpy as jnp

        from nice_slam_tpu.ops import occ_guided_zvals, stratified_zvals

        bound = jnp.asarray([[0.0, 4.0], [0.0, 4.0], [0.0, 4.0]])
        proxy = jnp.ones((8, 8, 8, 1))
        rays_o = jnp.asarray([[2.0, 2.0, 0.1]])
        rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
        near = jnp.asarray([[0.5]])
        far = jnp.asarray([[3.5]])
        z = occ_guided_zvals(rays_o, rays_d, near, far, proxy, bound, 32)
        ref = stratified_zvals(near, far, 32)
        np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=0.15)

    def test_engine_occ_guided_reduced_samples(self):
        """End-to-end: occupancy-guided sampling at a REDUCED sample budget
        stays on-trajectory on the synthetic scene."""
        from nice_slam_tpu.config import load_config
        from nice_slam_tpu.engine import SlamEngine

        cfg = load_config(overrides={
            "dataset": "synthetic", "synthetic": {"n_frames": 9},
            "cam": {"H": 48, "W": 64, "fx": 48.0, "fy": 48.0,
                    "cx": 31.5, "cy": 23.5},
            "grid_len": {"coarse": 1.0, "middle": 0.32, "fine": 0.16,
                         "color": 0.16},
            "mapping": {"bound": [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]],
                        "every_frame": 3, "iters_first": 60, "iters": 15,
                        "pixels": 240, "mapping_window_size": 3,
                        "keyframe_every": 3, "ckpt_freq": 10000,
                        "mesh_freq": 10000, "color_refine": False},
            "tracking": {"iters": 6, "pixels": 120,
                         "ignore_edge_W": 4, "ignore_edge_H": 4},
            "rendering": {"N_samples": 12, "N_surface": 8,
                          "occupancy_guided": True},
            "data": {"output": "/tmp/occg_out"}})
        eng = SlamEngine(cfg, output="/tmp/occg_out")
        assert "occ_proxy" in eng.map_state.grids
        eng.run(progress=False)
        # proxy refreshed away from the all-ones init
        proxy = np.asarray(jax.device_get(
            eng.map_state.grids["occ_proxy"]))
        assert proxy.min() < 0.5
        rmse = eng.ate()["rmse"]
        assert np.isfinite(rmse) and rmse < 0.3, rmse
