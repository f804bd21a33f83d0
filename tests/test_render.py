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
