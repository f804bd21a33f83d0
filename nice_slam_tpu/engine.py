"""The SLAM engine: a single-program schedule driving jitted track/map steps.

The reference runs 3 OS processes (tracker / mapper / coarse mapper) around
shared-memory tensors with sleep-polling sync (src/NICE_SLAM.py:288-307,
src/Tracker.py:161-175, src/Mapper.py:550-563).  Under `sync_method:
strict` that machinery reduces to a sequential interleave (SURVEY §3.5):

    map(0, iters_first); for idx in 1..n-1: track(idx); every N: map(idx)

which is exactly what this engine runs — the map state lives on device the
whole time, and each step is one jitted call.  `loose`/`free` modes are
accepted and run the same deterministic interleave (the reference's bounded
asynchrony only changes scheduling noise, not the computation; a
multi-device pipelined mode lives in nice_slam_tpu/parallel).

Feature parity with the reference mapper loop (src/Mapper.py:542-657):
first-frame iters_first x lr_first_factor, keyframe insertion every
keyframe_every (and at n-2), local BA gated on >4 keyframes, final-frame
color refinement (window x2, color-only, 5x iters, color decoder frozen,
frustum selection off), periodic checkpointing, optional meshing hook.
"""

from __future__ import annotations

import os
import time
from dataclasses import replace
from typing import Callable, Optional

# NICE_SLAM_TPU_PROFILE=1: force a device fetch after every engine substep
# and accumulate fine-grained timings (async backends make section timers
# lie otherwise; see bench.py)
_PROFILE = os.environ.get("NICE_SLAM_TPU_PROFILE", "") == "1"

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.config import SlamSpecs, specs_from_config
from nice_slam_tpu.keyframes import (
    KeyframeStore,
    add_keyframe,
    make_store,
    update_poses,
)
from nice_slam_tpu.mapping import map_optimize, prepare_mapping
from nice_slam_tpu.ops import cam_from_tensor, to_homogeneous
from nice_slam_tpu.state import make_map_state
from nice_slam_tpu.tracking import track_frame_full
from nice_slam_tpu.utils.checkpoint import save_checkpoint
from nice_slam_tpu.utils.datasets import get_dataset


class SlamEngine:
    def __init__(self, cfg: dict, dataset=None, output: Optional[str] = None,
                 mesher_hook: Optional[Callable] = None,
                 vis_hook: Optional[Callable] = None):
        self.cfg = cfg
        self.specs: SlamSpecs = specs_from_config(cfg)
        self.dataset = dataset if dataset is not None else get_dataset(cfg)
        self.n_img = len(self.dataset)
        self.output = output or cfg["data"]["output"]
        self.mesher_hook = mesher_hook
        self.vis_hook = vis_hook
        self.verbose = bool(cfg.get("verbose", False))

        m = cfg["mapping"]
        self.every_frame = m["every_frame"]
        self.keyframe_every = m["keyframe_every"]
        self.ckpt_freq = m["ckpt_freq"]
        self.mesh_freq = m["mesh_freq"]
        self.iters = m["iters"]
        self.iters_first = m["iters_first"]
        self.lr_factor = m["lr_factor"]
        self.lr_first_factor = m["lr_first_factor"]
        self.color_refine = m["color_refine"]
        self.gt_camera = cfg["tracking"]["gt_camera"]
        # strict: map frame k*every right after tracking it (the reference
        # schedule, SURVEY §3.5).  loose/free: the reference lets the mapper
        # lag the tracker by up to every_frame*3/2 (Tracker.py:168-175);
        # here that becomes a DETERMINISTIC lag of every_frame//2 frames —
        # same staleness, reproducible schedule.
        sync = cfg.get("sync_method", "strict")
        self.map_lag = (self.every_frame // 2
                        if sync in ("loose", "free") else 0)
        self._frame_cache = {}

        key = jax.random.PRNGKey(cfg["tpu"]["seed"])
        key, kstate = jax.random.split(key)
        self.key = key
        self.map_state = make_map_state(
            kstate, self.specs.model, m["bound"], cfg["grid_len"],
            cfg["grid_len"]["bound_divisible"])
        self._load_pretrained_decoders()

        cap = cfg["tpu"].get("keyframe_capacity") or (
            self.n_img // self.keyframe_every + 4)
        cam = self.specs.camera
        self.store: KeyframeStore = make_store(cap, cam.H, cam.W)
        self.kf_frame_ids: list = []

        self.est_c2w = np.zeros((self.n_img, 4, 4), np.float32)
        self.gt_c2w = np.zeros((self.n_img, 4, 4), np.float32)
        self.tracking_stats: list = []
        self.frames_done = 0
        self.timings = {"track": 0.0, "map": 0.0, "coarse_map": 0.0,
                        "io": 0.0, "prepare": 0.0, "kf_add": 0.0,
                        "pose_wb": 0.0}

    def _load_pretrained_decoders(self):
        """Load frozen decoder weights: this repo's npz if present, else
        reference-format torch checkpoints (NICE_SLAM.py:159-190), else
        keep the calibrated random init (with a warning)."""
        if not self.cfg.get("nice", True):
            return
        pt = self.cfg.get("pretrained_decoders", {})
        npz = pt.get("tpu_npz")
        if npz and os.path.exists(npz):
            from nice_slam_tpu.models.pretrain import load_npz_decoders
            self.map_state.params = load_npz_decoders(
                npz, self.map_state.params)
            if self.verbose:
                print(f"loaded pretrained decoders from {npz}")
            return
        coarse_p, mf_p = pt.get("coarse"), pt.get("middle_fine")
        if (coarse_p and os.path.exists(coarse_p)) or \
                (mf_p and os.path.exists(mf_p)):
            from nice_slam_tpu.models.pretrain import load_pretrained_decoders
            self.map_state.params = load_pretrained_decoders(
                self.map_state.params, self.specs.model, coarse_p, mf_p)

    # -- helpers -----------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _sync(self, tree, name: str, t0: float):
        """Profiling helper: force completion of `tree` and book the time."""
        if _PROFILE:
            leaves = jax.tree.leaves(tree)
            if leaves:
                np.asarray(jax.device_get(jax.tree.leaves(tree)[0]))
            self.timings[name] += time.perf_counter() - t0

    @property
    def bound(self):
        return self.map_state.bound

    def _load_frame(self, idx: int):
        t0 = time.perf_counter()
        _, color, depth, gt_pose = self.dataset[idx]
        out = (jnp.asarray(color), jnp.asarray(depth), np.asarray(gt_pose))
        self.timings["io"] += time.perf_counter() - t0
        return out

    # -- tracking ----------------------------------------------------------

    def track(self, idx: int, color, depth, gt_pose) -> None:
        s = self.specs
        self.gt_c2w[idx] = gt_pose
        if idx == 0 or self.gt_camera:
            self.est_c2w[idx] = gt_pose
            return

        pre = jnp.asarray(self.est_c2w[idx - 1])
        use_cs = bool(s.track.const_speed and idx >= 2)
        prepre = jnp.asarray(self.est_c2w[idx - 2] if use_cs
                             else self.est_c2w[idx - 1])

        t0 = time.perf_counter()
        c2w, first_loss, last_loss, best_loss = track_frame_full(
            self.map_state.params, self.map_state.grids, self.bound,
            pre, prepre, color, depth, self._next_key(),
            s.camera, s.track, s.render, s.model, use_cs)
        c2w_np = np.asarray(jax.device_get(c2w))
        self.timings["track"] += time.perf_counter() - t0

        self.est_c2w[idx] = c2w_np
        self.tracking_stats.append(
            {"idx": idx, "first_loss": float(first_loss),
             "last_loss": float(last_loss), "best_loss": float(best_loss)})

    # -- mapping -----------------------------------------------------------

    def map_once(self, idx: int, color, depth, cur_c2w, mapspec,
                 num_joint_iters: int, lr_factor: float, ba: bool,
                 coarse: bool = False):
        s = self.specs
        tp = time.perf_counter()
        window, masks, cams0, cam_lr_mask = prepare_mapping(
            self._next_key(), self.store, color, depth,
            jnp.asarray(cur_c2w), self.map_state.grids, self.bound,
            s.camera, mapspec, ba, s.model.coarse_bound_enlarge)
        self._sync(cam_lr_mask, "prepare", tp)

        it = mapspec.stage_iters(num_joint_iters)
        stage_iters = tuple((st, it[st])
                            for st in ("coarse", "middle", "fine", "color")
                            if it[st] > 0)

        t0 = time.perf_counter()
        params, grids, cams, losses = map_optimize(
            self.map_state.params, self.map_state.grids, self.bound,
            window, cams0, masks, cam_lr_mask,
            jnp.asarray(lr_factor, jnp.float32), self._next_key(),
            s.camera, stage_iters, mapspec, s.render, s.model)
        if _PROFILE:
            np.asarray(jax.device_get(losses[-1]))
        else:
            jax.block_until_ready(losses)
        self.timings["coarse_map" if coarse else "map"] += \
            time.perf_counter() - t0

        self.map_state.params = params
        self.map_state.grids = grids

        if ba:
            tw = time.perf_counter()
            new_c2w = to_homogeneous(cam_from_tensor(cams))
            kf_mask = (window["valid"]
                       & (window["slots"] >= 0)
                       & (cam_lr_mask > 0))
            self.store = update_poses(
                self.store, jnp.maximum(window["slots"], 0), new_c2w, kf_mask)
            cur = np.asarray(jax.device_get(new_c2w[-1]))
            if _PROFILE:
                self.timings["pose_wb"] += time.perf_counter() - tw
            return cur, losses
        return None, losses

    def mapping_event(self, idx: int, color, depth, gt_pose,
                      first: bool = False) -> None:
        """One mapping wake-up: fine mapper (+BA, keyframe insertion,
        checkpoint/mesh hooks) and the coarse mapper."""
        cur_c2w = self.est_c2w[idx]
        final = idx == self.n_img - 1
        mapspec = self.specs.mapper

        if first:
            outer, n_iters, lr_f = 1, self.iters_first, self.lr_first_factor
        elif final and self.color_refine and mapspec.nice:
            # color refinement postprocess (Mapper.py:579-586)
            outer = 5
            n_iters = self.iters
            lr_f = self.lr_factor
            mapspec = replace(mapspec, window_size=mapspec.window_size * 2,
                              middle_iter_ratio=0.0, fine_iter_ratio=0.0,
                              fix_color=True, frustum_selection=False)
        else:
            outer = 1 if mapspec.nice else 3
            n_iters = max(self.iters // (1 if mapspec.nice else 3), 1)
            lr_f = self.lr_factor

        for _ in range(outer):
            ba = (len(self.kf_frame_ids) > 4) and mapspec.ba
            new_cur, _ = self.map_once(idx, color, depth, cur_c2w, mapspec,
                                       n_iters, lr_f, ba)
            if new_cur is not None:
                cur_c2w = new_cur
                self.est_c2w[idx] = new_cur

        # keyframe insertion (Mapper.py:611-617)
        if (idx % self.keyframe_every == 0 or idx >= self.n_img - 2) \
                and idx not in self.kf_frame_ids \
                and len(self.kf_frame_ids) < self.store.capacity:
            tk = time.perf_counter()
            self.store = add_keyframe(
                self.store, color, depth, jnp.asarray(cur_c2w),
                jnp.asarray(gt_pose), idx)
            self._sync(self.store.count, "kf_add", tk)
            self.kf_frame_ids.append(idx)

        # coarse mapper (independent; coarse grid only)
        if self.specs.coarse_mapper is not None:
            self.map_once(idx, color, depth, cur_c2w,
                          self.specs.coarse_mapper,
                          self.iters_first if first else self.iters,
                          self.lr_first_factor if first else self.lr_factor,
                          ba=False, coarse=True)

        if (idx % self.ckpt_freq == 0 and idx > 0) or final:
            self.save(os.path.join(self.output, "ckpts",
                                   f"{idx:05d}.npz"))
        if self.mesher_hook is not None and (
                (idx % self.mesh_freq == 0 and idx > 0) or final):
            self.mesher_hook(self, idx, final)

    # -- main loop ---------------------------------------------------------

    def enable_visualizer(self):
        """Attach the residual-panel visualizer using the config's
        tracking vis_freq (reference src/utils/Visualizer.py usage)."""
        from nice_slam_tpu.utils.visualizer import make_engine_vis_hook

        freq = self.cfg["tracking"].get("vis_freq", 50)
        self.vis_hook = make_engine_vis_hook(
            os.path.join(self.output, "tracking_vis"), freq)
        return self

    def run(self, n_frames: Optional[int] = None, progress: bool = False):
        n = min(n_frames or self.n_img, self.n_img)
        it = range(n)
        if progress:
            try:
                from tqdm import tqdm
                it = tqdm(it, desc="slam")
            except ImportError:
                pass
        for idx in it:
            color, depth, gt_pose = self._load_frame(idx)
            if self.map_lag > 0:
                self._frame_cache[idx] = (color, depth, gt_pose)
                for old in [k for k in self._frame_cache
                            if k < idx - self.map_lag - 1]:
                    del self._frame_cache[old]
            if idx == 0:
                self.gt_c2w[0] = gt_pose
                self.est_c2w[0] = gt_pose
                self.mapping_event(0, color, depth, gt_pose, first=True)
                continue
            self.track(idx, color, depth, gt_pose)
            midx = idx - self.map_lag
            if idx == n - 1:
                # final frame always maps itself (color refine, final mesh)
                self.mapping_event(idx, color, depth, gt_pose)
            elif midx > 0 and midx % self.every_frame == 0:
                mc, md, mg = (self._frame_cache[midx] if self.map_lag > 0
                              else (color, depth, gt_pose))
                self.mapping_event(midx, mc, md, mg)
            if self.vis_hook is not None:
                self.vis_hook(self, idx, color, depth)
            self.frames_done = idx + 1
        return self

    def save(self, path: str):
        save_checkpoint(
            path, self.map_state.params, self.map_state.grids,
            self.bound, self.est_c2w, self.gt_c2w, self.store,
            self.frames_done,
            extra={"kf_frame_ids": np.asarray(self.kf_frame_ids, np.int64)})

    def resume(self, path: str):
        from nice_slam_tpu.utils.checkpoint import load_checkpoint

        ck = load_checkpoint(path, self.map_state.params,
                             self.map_state.grids)
        self.map_state.params = jax.tree.map(jnp.asarray, ck["params"])
        self.map_state.grids = jax.tree.map(jnp.asarray, ck["grids"])
        self.est_c2w = ck["est_c2w"]
        self.gt_c2w = ck["gt_c2w"]
        kf = ck.get("keyframes")
        if kf:
            self.store = KeyframeStore(
                colors=jnp.asarray(kf["colors"]),
                depths=jnp.asarray(kf["depths"]),
                est_c2w=jnp.asarray(kf["est_c2w"]),
                gt_c2w=jnp.asarray(kf["gt_c2w"]),
                frame_idx=jnp.asarray(kf["frame_idx"]),
                count=jnp.asarray(kf["count"]),
            )
        self.kf_frame_ids = list(ck["extra"]["kf_frame_ids"])
        self.frames_done = ck["idx"]
        return self

    def ate(self):
        from nice_slam_tpu.utils.trajectory import ate_stats

        n = self.frames_done
        return ate_stats(self.gt_c2w[:n], self.est_c2w[:n])
