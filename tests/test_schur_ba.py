"""Schur-reduced Gauss-Newton pose refinement (parallel/schur_ba.py):
objective descent on fixed ray samples, freeze-mask semantics, and the
sharded (psum-reduced) system matching the single-device one."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from nice_slam_tpu.config import load_config, specs_from_config
from nice_slam_tpu.keyframes import add_keyframe, build_window, make_store
from nice_slam_tpu.models import nice_model_spec
from nice_slam_tpu.ops import tensor_from_cam
from nice_slam_tpu.ops.grid import plain_interp
from nice_slam_tpu.parallel.schur_ba import (
    gn_pose_update,
    pose_system,
    schur_pose_refine,
)
from nice_slam_tpu.state import make_map_state

BOUND = [[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]]
GRID_LEN = {"coarse": 1.0, "middle": 0.32, "fine": 0.16, "color": 0.16}


def _setup(seed=0):
    cfg = load_config(overrides={
        "cam": {"H": 24, "W": 32, "fx": 24.0, "fy": 24.0,
                "cx": 15.5, "cy": 11.5},
        "grid_len": GRID_LEN,
        "mapping": {"bound": BOUND, "pixels": 64,
                    "mapping_window_size": 3},
        "rendering": {"N_samples": 8, "N_surface": 4},
    })
    specs = specs_from_config(cfg)
    state = make_map_state(jax.random.PRNGKey(seed), nice_model_spec(),
                           BOUND, GRID_LEN, 0.32)
    cam = specs.camera
    store = make_store(4, cam.H, cam.W)
    eye = jnp.eye(4)
    color = jnp.full((cam.H, cam.W, 3), 0.5)
    depth = jnp.full((cam.H, cam.W), 1.0)
    store = add_keyframe(store, color, depth, eye, eye, 0)
    window = build_window(store, jnp.zeros((1,), jnp.int32),
                          jnp.ones((1,), bool), color, depth, eye)
    cams0 = tensor_from_cam(window["c2ws"][:, :3, :])
    rspec = dataclasses.replace(specs.render, train_decoders=False)
    return specs, state, window, cams0, cam, rspec


def _trained_map(specs, state, window, cams0, cam, iters=120):
    """Fit the grids to the window (constant-depth frame) so the render
    actually reproduces the observed depth — the regime GN refines in."""
    from nice_slam_tpu.mapping import grid_masks, map_optimize

    masks = grid_masks(state.grids, state.bound, jnp.eye(4),
                       window["depths"][-1], cam, False, 2)
    params, grids, _, _ = map_optimize(
        state.params, state.grids, state.bound, window, cams0, masks,
        jnp.zeros((3,)), jnp.float32(5.0), jax.random.PRNGKey(9), cam,
        (("middle", iters), ("fine", iters // 2)),
        specs.mapper, specs.render, specs.model, ba=False)
    return params, grids


class TestGaussNewton:
    def test_guarded_iteration_never_increases_sse(self):
        """The guarded step's per-frame objective is monotone on the
        evaluation sample BY CONSTRUCTION — even on a random-init map
        where the raw quadratic step overshoots."""
        from nice_slam_tpu.parallel.schur_ba import (
            gn_iteration,
            residual_sse,
        )

        specs, state, window, cams0, cam, rspec = _setup()
        mask = jnp.array([0.0, 0.0, 1.0])
        k = jax.random.PRNGKey(3)
        with plain_interp():
            sse0 = residual_sse(state.params, state.grids, state.bound,
                                window, cams0, k, cam, rspec, specs.model,
                                128, window["valid"])
            cams1, sse_acc = gn_iteration(
                state.params, state.grids, state.bound, window, cams0,
                mask, k, cam, rspec, specs.model, 128, 1e-3)
            sse1 = residual_sse(state.params, state.grids, state.bound,
                                window, cams1, k, cam, rspec, specs.model,
                                128, window["valid"])
        assert bool(jnp.all(jnp.isfinite(sse1)))
        assert bool(jnp.all(sse1 <= sse0 + 1e-3))

    def test_objective_decreases_on_trained_map(self):
        """With a map fitted to the observations and a small pose
        perturbation, the GN step strictly reduces the weighted SSE on
        the same rays (the quadratic model's regime)."""
        specs, state, window, cams0, cam, rspec = _setup()
        params, grids = _trained_map(specs, state, window, cams0, cam)
        # perturb the current frame's translation by 3 cm
        pert = cams0.at[2, 4:].add(jnp.array([0.02, -0.015, 0.01]))
        mask = jnp.array([0.0, 0.0, 1.0])
        k = jax.random.PRNGKey(5)
        with plain_interp():
            H, b, se0 = pose_system(params, grids, state.bound, window,
                                    pert, k, cam, rspec, specs.model, 128,
                                    window["valid"])
            cams1 = gn_pose_update(pert, H, b, mask, 1e-3)
            _, _, se1 = pose_system(params, grids, state.bound, window,
                                    cams1, k, cam, rspec, specs.model, 128,
                                    window["valid"])
        assert bool(jnp.isfinite(se0[2])) and bool(jnp.isfinite(se1[2]))
        assert float(se1[2]) < float(se0[2])

    def test_frozen_rows_untouched(self):
        specs, state, window, cams0, cam, rspec = _setup()
        mask = jnp.array([0.0, 0.0, 1.0])  # only the current frame may move
        out = schur_pose_refine(state.params, state.grids, state.bound,
                                window, cams0, mask, jax.random.PRNGKey(7),
                                cam, rspec, specs.model, 2, 64, 1e-3)
        assert bool(jnp.allclose(out[:2], cams0[:2]))

    def test_refine_moves_pose_on_trained_map(self):
        """On a fitted map with a perturbed pose, the guarded refine
        ACCEPTS steps (pose actually moves toward the objective's
        optimum)."""
        specs, state, window, cams0, cam, rspec = _setup()
        params, grids = _trained_map(specs, state, window, cams0, cam)
        pert = cams0.at[2, 4:].add(jnp.array([0.02, -0.015, 0.01]))
        mask = jnp.array([0.0, 0.0, 1.0])
        out = schur_pose_refine(params, grids, state.bound, window, pert,
                                mask, jax.random.PRNGKey(5), cam, rspec,
                                specs.model, 2, 128, 1e-3)
        assert not bool(jnp.allclose(out[2], pert[2]))

    def test_degenerate_candidate_rejected(self):
        """A candidate pose that pushes (almost) every ray out of bound
        zeroes the residual weights, making its SSE trivially ~0 — the
        guard must NOT accept it on SSE alone (observed end-to-end as a
        76 m trajectory explosion before the mask-count term)."""
        from nice_slam_tpu.parallel.schur_ba import (
            gn_iteration,
            mask_count,
        )

        specs, state, window, cams0, cam, rspec = _setup()
        # teleport the candidate far outside the bound: mask collapses
        far = cams0.at[2, 4:].set(jnp.array([50.0, 50.0, 50.0]))
        k = jax.random.PRNGKey(3)
        cnt_good = mask_count(state.bound, window, cams0, k, cam, 128)
        cnt_far = mask_count(state.bound, window, far, k, cam, 128)
        assert float(cnt_far[2]) < 0.5 * float(cnt_good[2])
        # force the solver toward the degenerate pose via a crafted
        # (H, b): monkeypatch not needed — just verify accept logic by
        # running an iteration from the far pose: its own system is
        # empty, so candidates cannot "win" by emptying further, and the
        # original pose must never be replaced by an empty-mask one.
        with plain_interp():
            cams1, _ = gn_iteration(
                state.params, state.grids, state.bound, window, cams0,
                jnp.array([0.0, 0.0, 1.0]), k, cam, rspec, specs.model,
                128, 1e-3)
        cnt_after = mask_count(state.bound, window, cams1, k, cam, 128)
        assert float(cnt_after[2]) >= 0.5 * float(cnt_good[2])

    def test_zero_mask_is_identity(self):
        specs, state, window, cams0, cam, rspec = _setup()
        out = schur_pose_refine(state.params, state.grids, state.bound,
                                window, cams0, jnp.zeros((3,)),
                                jax.random.PRNGKey(7), cam, rspec,
                                specs.model, 1, 64, 1e-3)
        assert bool(jnp.allclose(out, cams0))

    def test_tracking_gn_polish_recovers_perturbed_pose(self):
        """The tracking-side GN polish (TrackSpec.gn_iters,
        tracking._track_step_body) must pull a perturbed pose closer to
        the optimum on a trained map — the per-frame noise-floor fix."""
        import dataclasses as dc

        from nice_slam_tpu.ops import cam_from_tensor, to_homogeneous
        from nice_slam_tpu.tracking import track_frame_step

        from nice_slam_tpu.keyframes import build_window

        specs, state, _, _, cam, rspec = _setup()
        # structured depth (a plane gives no lateral/rotational pose
        # signal): smooth bumps make all 6 DoF observable
        jj, ii = jnp.meshgrid(jnp.arange(cam.H), jnp.arange(cam.W),
                              indexing="ij")
        depth = (1.0 + 0.25 * jnp.sin(2 * jnp.pi * ii / cam.W)
                 + 0.2 * jnp.cos(2 * jnp.pi * jj / cam.H)).astype(
            jnp.float32)
        color = jnp.full((cam.H, cam.W, 3), 0.5)
        eye = jnp.eye(4)
        store = make_store(4, cam.H, cam.W)
        store = add_keyframe(store, color, depth, eye, eye, 0)
        window = build_window(store, jnp.zeros((1,), jnp.int32),
                              jnp.ones((1,), bool), color, depth, eye)
        cams0 = tensor_from_cam(window["c2ws"][:, :3, :])
        params, grids = _trained_map(specs, state, window, cams0, cam,
                                     iters=200)
        true7 = cams0[2]
        # previous pose = perturbed truth; one Adam iter so the polish
        # does the heavy lifting
        pert7 = true7.at[4:].add(jnp.array([0.03, -0.02, 0.02]))
        pre = to_homogeneous(cam_from_tensor(pert7))
        est = jnp.tile(pre[None], (3, 1, 1))

        def run(gn_iters):
            ts = dc.replace(specs.track, iters=1, pixels=64,
                            const_speed=False, gn_iters=gn_iters,
                            gn_pixels=256)
            buf, *_ = track_frame_step(
                params, grids, state.bound, est + 0.0, 2, color, depth,
                jax.random.PRNGKey(11), 0, cam, ts, rspec, specs.model)
            return buf[2]

        true_c2w = to_homogeneous(cam_from_tensor(true7))
        err_off = float(jnp.linalg.norm(run(0)[:3, 3] - true_c2w[:3, 3]))
        err_gn = float(jnp.linalg.norm(run(3)[:3, 3] - true_c2w[:3, 3]))
        assert err_gn < err_off * 0.7, (err_off, err_gn)

    def test_psum_reduced_system_matches_concat(self):
        """The sharded design reduces per-device (H, b) by psum; summing
        systems from two disjoint ray sets must equal the GN system of
        the union (linearity of normal equations)."""
        specs, state, window, cams0, cam, rspec = _setup()
        ka, kb = jax.random.split(jax.random.PRNGKey(11))
        with plain_interp():
            Ha, ba_, sa = pose_system(state.params, state.grids,
                                      state.bound, window, cams0, ka, cam,
                                      rspec, specs.model, 64,
                                      window["valid"])
            Hb, bb, sb = pose_system(state.params, state.grids,
                                     state.bound, window, cams0, kb, cam,
                                     rspec, specs.model, 64,
                                     window["valid"])
        H, b = Ha + Hb, ba_ + bb
        # a union evaluation with the same two key-derived pixel sets isn't
        # directly constructible through the API; linearity is the claim:
        # the psum of PSD per-shard systems is itself the union's system,
        # so it must stay PSD and solvable
        cams1 = gn_pose_update(cams0, H, b, jnp.array([0.0, 0.0, 1.0]),
                               1e-3)
        assert bool(jnp.all(jnp.isfinite(cams1)))
        assert float(jnp.sum(sa + sb)) > 0

    @pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >1 device")
    def test_dp_pose_gn_runs_on_mesh(self):
        """dp_map_optimize with pose_gn_iters: the GN system psums over
        the mesh and every replica applies the identical pose update."""
        from nice_slam_tpu.mapping import grid_masks
        from nice_slam_tpu.parallel import dp_map_optimize, make_mesh

        specs, state, window, cams0, cam, rspec = _setup()
        masks = grid_masks(state.grids, state.bound, jnp.eye(4),
                           window["depths"][-1], cam, True, 2)
        mapspec = dataclasses.replace(specs.mapper, pose_gn_iters=1,
                                      pose_gn_pixels=32)
        mesh = make_mesh(len(jax.devices()))
        lr_mask = jnp.array([0.0, 1.0, 1.0])
        p, g, cams, losses = dp_map_optimize(
            state.params, state.grids, state.bound, window, cams0, masks,
            lr_mask, jnp.float32(1.0), jax.random.PRNGKey(1), cam,
            (("middle", 1), ("color", 1)), mapspec, specs.render,
            specs.model, mesh, ba=True)
        assert bool(jnp.all(jnp.isfinite(cams)))
        # GN moved the unfrozen poses on top of the Adam stages
        assert not bool(jnp.allclose(cams[1:], cams0[1:]))

    def test_map_optimize_pose_gn_path(self):
        """Single-device map_optimize with pose_gn_iters > 0 compiles and
        refines only the unfrozen poses."""
        from nice_slam_tpu.mapping import grid_masks, map_optimize

        specs, state, window, cams0, cam, rspec = _setup()
        masks = grid_masks(state.grids, state.bound, jnp.eye(4),
                           window["depths"][-1], cam, True, 2)
        mapspec = dataclasses.replace(specs.mapper, pose_gn_iters=1,
                                      pose_gn_pixels=32)
        lr_mask = jnp.array([0.0, 1.0, 1.0])
        p, g, cams, losses = map_optimize(
            state.params, state.grids, state.bound, window, cams0, masks,
            lr_mask, jnp.float32(1.0), jax.random.PRNGKey(1), cam,
            (("middle", 1), ("color", 1)), mapspec, specs.render,
            specs.model, ba=True)
        assert bool(jnp.all(jnp.isfinite(cams)))
        assert not bool(jnp.allclose(cams[1:], cams0[1:]))
