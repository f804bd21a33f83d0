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

Dispatch discipline (remote-attached TPUs; measured in bench.py): every
EAGER device op costs a full RPC (~17 ms), deeply queued programs execute
~4x slower than serially-synced ones, and block_until_ready / fetches of
donation-aliased buffers do not reliably wait.  Hence: the trajectory is
device-resident, all per-step glue (RNG fold-in, pose reads/writes,
keyframe-store updates) runs inside jits, each inter-mapping frame group
is ONE dispatch (tracking.track_frames_group), a mapping event is ONE
dispatch (mapping.mapping_step), and every step ends with one
fresh-buffer scalar fetch as the barrier.
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
    add_keyframe_from,
    make_store,
)
from nice_slam_tpu.mapping import mapping_step
from nice_slam_tpu.state import make_map_state
from nice_slam_tpu.tracking import track_frame_step
from nice_slam_tpu.utils.checkpoint import save_checkpoint
from nice_slam_tpu.utils.datasets import get_dataset, quantize_color_u8


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
        self._map_vis_hook = None
        self._map_barrier = True  # pipelined engine turns this off
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
        # per-event selected-keyframe-window record (the reference's
        # save_selected_keyframes_info, src/Mapper.py:74-76,274-287 +
        # Logger.py:30): {event frame idx -> (W,) frame-id array,
        # -2 = empty slot}.  Values stay lazy device handles until a
        # checkpoint fetches them (no extra RPC in the loop).
        self.save_selected_kf = bool(
            m.get("save_selected_keyframes_info", False))
        self.selected_keyframes = {}
        # XLA cost-analysis capture for the hot dispatches (bench.py MFU):
        # off by default — capturing lowers+compiles each graph once more
        # (served by the persistent compile cache, but still an RPC)
        self.capture_cost = False
        self.cost_analyses = {}
        # executions per hot-dispatch name (same keys as cost_analyses);
        # bench.py resets this at the start of its measured segment
        self.dispatch_counts = {}
        self.gt_camera = cfg["tracking"]["gt_camera"]
        # strict: map frame k*every right after tracking it (the reference
        # schedule, SURVEY §3.5).  loose: the reference lets the mapper lag
        # the tracker by up to every_frame*3/2 (Tracker.py:168-175); here
        # that becomes a DETERMINISTIC lag of every_frame//2 frames — same
        # staleness, reproducible schedule.  free: the tracker never waits
        # at all (Tracker.py:169-170) — deterministically, a full
        # every_frame of lag (the maximum staleness the reference's free
        # mode reaches before the mapper catches up).
        sync = cfg.get("sync_method", "strict")
        self.map_lag = {"strict": 0,
                        "loose": self.every_frame // 2,
                        "free": self.every_frame}.get(sync, 0)
        self.grouped_tracking = bool(
            cfg["tpu"].get("grouped_tracking", True))
        # barrier once per K fused group dispatches (see config.py tpu.
        # barrier_every_groups; the deterministic schedule makes the
        # intermediate barriers pure RPC overhead)
        self.barrier_every_groups = int(
            cfg["tpu"].get("barrier_every_groups", 4))
        # fuse each frame group's tracking scan into its mapping-event
        # dispatch (mapping.track_map_group) — bit-identical, one fewer
        # dispatch+barrier per group; off only for A/B testing
        self.fuse_track_map = bool(cfg["tpu"].get("fuse_track_map", True))
        # fuse the loose/free lagged group schedule into ONE dispatch
        # (mapping.lagged_track_map_group).  Default: only on TPU-class
        # backends — the fusion exists to amortize RPC round trips, which
        # CPU doesn't have, and the giant CPU-compiled program tickles an
        # XLA:CPU persistent-cache deserialization abort in long test
        # processes (round 5; bit-parity with the unfused path is still
        # asserted on CPU by forcing tpu.fuse_lagged true).
        fl = cfg["tpu"].get("fuse_lagged")
        self.fuse_lagged = (jax.default_backend() in ("tpu", "axon")
                            if fl is None else bool(fl))
        # device-mesh mapping modes: tpu.data_parallel (1D ray sharding,
        # parallel/data_parallel.py) or tpu.grid_sharded: [n_data, n_model]
        # (2D rays x halo-exchanged grid slabs, parallel/grid_sharded.py).
        # mapping._one_map_optimize routes on the mesh's axis names.
        self.mesh = None
        gs = cfg["tpu"].get("grid_sharded")
        if gs:
            n_data, n_model = int(gs[0]), int(gs[1])
            if len(jax.devices()) >= n_data * n_model and n_model > 1:
                from nice_slam_tpu.parallel.grid_sharded import make_mesh_2d
                self.mesh = make_mesh_2d(n_data, n_model)
            else:
                print(f"warning: tpu.grid_sharded={gs} needs "
                      f"{n_data * n_model} devices (have "
                      f"{len(jax.devices())}) — running dense")
        elif cfg["tpu"].get("data_parallel") and len(jax.devices()) > 1:
            from nice_slam_tpu.parallel import make_mesh
            shape = cfg["tpu"].get("mesh_shape")
            self.mesh = make_mesh(shape[0] if shape else None)
        self._frame_cache = {}
        # multi-process runs (parallel/multihost.py): every process holds
        # bit-identical state, so only one persists outputs
        self.is_primary = (jax.process_count() == 1
                           or jax.process_index() == 0)

        key = jax.random.PRNGKey(cfg["tpu"]["seed"])
        key, kstate = jax.random.split(key)
        # RNG discipline: jitted steps receive (key_base, step_no) and
        # fold_in INSIDE the jit — an eager jax.random.split per step would
        # cost a full RPC round trip on remote-attached TPUs
        self.key = key
        self._key_base = jax.random.fold_in(key, 0xB0B)
        self._step_no = 0
        self.map_state = make_map_state(
            kstate, self.specs.model, m["bound"], cfg["grid_len"],
            cfg["grid_len"]["bound_divisible"],
            occ_guided=self.specs.render.occ_guided)
        self._load_pretrained_decoders()

        cap = cfg["tpu"].get("keyframe_capacity") or (
            self.n_img // self.keyframe_every + 4)
        cam = self.specs.camera
        self.store: KeyframeStore = make_store(cap, cam.H, cam.W)
        self.kf_frame_ids: list = []

        # the estimated trajectory lives ON DEVICE: tracking reads previous
        # poses and writes the new one inside the jitted step, so the
        # steady-state loop runs with zero host<->device synchronizations
        # (each sync costs a full round trip on remote-attached chips)
        self._est_dev = jnp.zeros((self.n_img, 4, 4), jnp.float32)
        self._warned_bad_pose = False
        self._warned_kf_capacity = False
        # per-iteration visualizers (enable_visualizer(inside=True))
        self._track_inside_vis = None
        self._map_inside_vis = None
        self.gt_c2w = np.zeros((self.n_img, 4, 4), np.float32)
        self.tracking_stats: list = []  # device scalars; see stats()
        self.frames_done = 0
        # "track+map" books the fused track_map_group dispatches (the
        # default path): tracking and mapping share one device program
        # there, so their split is not separately observable
        self.timings = {"track": 0.0, "map": 0.0, "track+map": 0.0,
                        "coarse_map": 0.0, "io": 0.0, "kf_add": 0.0}
        # background frame loading: dataset decode + host preprocessing
        # overlap device compute (one worker, one group ahead — the
        # reference pays this cost on the tracker's critical path via its
        # synchronous DataLoader, Tracker.py:64-65)
        self.prefetch = bool(cfg["tpu"].get("prefetch", True))

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

    def _safe_est_pose(self, gt_pose, idx: int):
        """Guard non-finite GT poses (a real ScanNet artifact: inf rows in
        pose files) before they feed the estimated trajectory: frame-0 /
        gt_camera initialization from an inf pose would poison every
        subsequent tracked frame.  gt_c2w keeps the raw value — the ATE
        eval masks non-finite GT (utils/trajectory.py), matching the
        reference's eval-side handling (src/tools/eval_ate.py:239-256)."""
        p = np.asarray(gt_pose)
        if np.isfinite(p).all():
            return gt_pose
        if not self._warned_bad_pose:
            print(f"warning: non-finite GT pose at frame {idx}; using "
                  "identity for trajectory initialization (ATE eval masks "
                  "such frames)")
            self._warned_bad_pose = True
        return np.eye(4, dtype=np.float32)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _next_step(self) -> int:
        """Host-side step counter for in-jit RNG derivation (no device op)."""
        self._step_no += 1
        return self._step_no

    _set_pose = staticmethod(jax.jit(
        lambda buf, i, pose: buf.at[i].set(pose), donate_argnums=(0,)))

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

    @property
    def est_c2w(self) -> np.ndarray:
        """Host view of the device-resident trajectory (forces a sync).

        The buffer is donation-aliased (track steps write it in place);
        fetching it directly can return stale contents on remote backends
        — fetch through a fresh derived buffer instead."""
        return np.asarray(jax.device_get(self._est_dev + 0.0))

    @est_c2w.setter
    def est_c2w(self, value):
        self._est_dev = jnp.asarray(value, jnp.float32)

    def stats(self) -> list:
        """tracking_stats with device scalars materialized in ONE
        device_get.  Entries come in two shapes: per-frame dicts
        (per-frame path) and {"idxs", "arr"} group records (grouped
        path); both flatten to per-frame dicts here."""
        pending = [s for s in self.tracking_stats if "first_loss" not in s
                   or not isinstance(s.get("first_loss"), float)]
        fetched = jax.device_get([
            s["arr"] if "idxs" in s
            else [s["first_loss"], s["last_loss"], s["best_loss"]]
            for s in pending]) if pending else []
        vals = iter(fetched)
        out = []
        for s in self.tracking_stats:
            if "idxs" in s:
                arr = np.asarray(next(vals))
                for i, idx in enumerate(s["idxs"]):
                    out.append({"idx": idx,
                                "first_loss": float(arr[i, 0]),
                                "last_loss": float(arr[i, 1]),
                                "best_loss": float(arr[i, 2])})
            elif not isinstance(s.get("first_loss"), float):
                v = np.asarray(next(vals))
                out.append({"idx": s["idx"], "first_loss": float(v[0]),
                            "last_loss": float(v[1]),
                            "best_loss": float(v[2])})
            else:
                out.append(s)
        self.tracking_stats = out
        return self.tracking_stats

    def _load_frame(self, idx: int):
        t0 = time.perf_counter()
        _, color, depth, gt_pose = self.dataset[idx]
        if getattr(self.dataset, "transfer_color_uint8", False):
            # 8-bit-native color crosses the host->device link as uint8
            # (4x less traffic); dequantized inside the jitted steps
            color = quantize_color_u8(color)
        out = (jnp.asarray(color), jnp.asarray(depth), np.asarray(gt_pose))
        self.timings["io"] += time.perf_counter() - t0
        return out

    def _load_frames_stacked(self, lo: int, hi: int):
        """Load frames lo..hi inclusive as stacked device arrays
        (one upload for the whole group)."""
        t0 = time.perf_counter()
        u8 = getattr(self.dataset, "transfer_color_uint8", False)
        colors, depths, gts = [], [], []
        for i in range(lo, hi + 1):
            _, c, d, g = self.dataset[i]
            if u8:
                c = quantize_color_u8(c)
            colors.append(c)
            depths.append(d)
            gts.append(np.asarray(g))
        out = (jnp.asarray(np.stack(colors)), jnp.asarray(np.stack(depths)),
               np.stack(gts))
        self.timings["io"] += time.perf_counter() - t0
        return out

    # -- tracking ----------------------------------------------------------

    def track(self, idx: int, color, depth, gt_pose) -> None:
        s = self.specs
        self.gt_c2w[idx] = gt_pose
        if idx == 0 or self.gt_camera:
            self._est_dev = self._set_pose(
                self._est_dev, idx, self._safe_est_pose(gt_pose, idx))
            return

        if (self._track_inside_vis is not None
                and self._track_inside_vis.frame_selected(idx)):
            self._track_with_inside_vis(idx, color, depth)
            return

        t0 = time.perf_counter()
        self._est_dev, first_loss, last_loss, best_loss = track_frame_step(
            self.map_state.params, self.map_state.grids, self.bound,
            self._est_dev, idx, color, depth, self._key_base,
            self._next_step(), s.camera, s.track, s.render, s.model)
        # one SCALAR FETCH per step: remote-attached chips execute queued
        # programs ~4x slower than serially-synced ones, and fetches of
        # donation-aliased buffers (est_buf) do not wait for the compute —
        # a fresh-scalar fetch is the only reliable step barrier
        np.asarray(jax.device_get(best_loss))
        self.timings["track"] += time.perf_counter() - t0

        # loss scalars stay on device; materialized lazily by stats()
        self.tracking_stats.append(
            {"idx": idx, "first_loss": first_loss,
             "last_loss": last_loss, "best_loss": best_loss})

    def _track_with_inside_vis(self, idx: int, color, depth) -> None:
        """Tracking step + per-iteration panels: fetch the pre-step camera
        history and re-render against the frozen map — exact parity with
        the reference's per-iteration tracking panels
        (src/Tracker.py:230-231, src/utils/Visualizer.py:24-107)."""
        from nice_slam_tpu.ops import cam_from_tensor, to_homogeneous
        from nice_slam_tpu.tracking import track_frame_step_vis

        s = self.specs
        t0 = time.perf_counter()
        (self._est_dev, first_loss, last_loss, best_loss,
         cams) = track_frame_step_vis(
            self.map_state.params, self.map_state.grids, self.bound,
            self._est_dev, idx, color, depth, self._key_base,
            self._next_step(), s.camera, s.track, s.render, s.model)
        c2ws = np.asarray(jax.device_get(
            to_homogeneous(cam_from_tensor(cams))))  # barrier + fetch
        self.timings["track"] += time.perf_counter() - t0
        vis = self._track_inside_vis
        for it in range(c2ws.shape[0]):
            if it % vis.inside_freq == 0:
                vis.render_panel(self, idx, it, color, depth, c2ws[it])
        self.tracking_stats.append(
            {"idx": idx, "first_loss": first_loss,
             "last_loss": last_loss, "best_loss": best_loss})

    def _map_event_inside_vis(self, idx: int, color, depth, mapspec,
                              num_joint_iters: int, lr_factor: float,
                              ba: bool):
        """One fine-mapping optimization driven as SEGMENTS of
        vis_inside_freq iterations with a panel rendered from the
        mid-optimization state before each (reference per-iteration
        mapping vis, src/Mapper.py:426-430).  Functionally equivalent to
        map_once's fused dispatch (same selection, staged LRs, Adam
        moments threaded across segments, BA write-back); RNG segmentation
        differs, so this is a debug path, not the perf path."""
        from nice_slam_tpu.mapping import (
            map_optimize_segment,
            prepare_mapping,
            refresh_occ_proxy,
        )
        from nice_slam_tpu.keyframes import update_poses
        from nice_slam_tpu.ops import (
            adam_init,
            cam_from_tensor,
            to_homogeneous,
        )

        s = self.specs
        vis = self._map_inside_vis
        stage_iters = self._stage_iters_of(mapspec, num_joint_iters)
        key = jax.random.fold_in(self._key_base, self._next_step())
        k1, key = jax.random.split(key)

        if getattr(color, "ndim", 3) == 4:
            raise ValueError("inside-vis mapping expects a single frame")
        if color.dtype == jnp.uint8:
            color_f = color.astype(jnp.float32) / 255.0
        else:
            color_f = color

        cur_c2w = self._est_dev[idx]
        window, masks, cams0, cam_lr_mask = prepare_mapping(
            k1, self.store, color_f, depth, cur_c2w,
            self.map_state.grids, self.bound, s.camera, mapspec, ba,
            s.model.coarse_bound_enlarge)
        if self.save_selected_kf:
            # same record as mapping_step's sel_frames output
            self.selected_keyframes[idx] = jnp.where(
                window["valid"],
                jnp.where(window["slots"] >= 0,
                          self.store.frame_idx[
                              jnp.maximum(window["slots"], 0)], idx),
                -2).astype(jnp.int32)
        tree = {"params": self.map_state.params,
                "grids": self.map_state.grids, "cams": cams0}
        opt = adam_init(tree)
        c2w_host = np.asarray(jax.device_get(cur_c2w + 0.0))

        from nice_slam_tpu.utils.visualizer import segment_stage_iters
        losses = None
        for start, seg in segment_stage_iters(stage_iters,
                                              vis.inside_freq):
            vis.render_panel(self, idx, start, color_f, depth, c2w_host,
                             params=tree["params"], grids=tree["grids"])
            key, ks = jax.random.split(key)
            tree, opt, losses = map_optimize_segment(
                tree, opt, self.bound, window, masks, cam_lr_mask,
                float(lr_factor), ks, s.camera, seg, mapspec, s.render,
                s.model)

        self.map_state.params = tree["params"]
        self.map_state.grids = tree["grids"]
        if ba:
            new_c2w = to_homogeneous(cam_from_tensor(tree["cams"]))
            kf_mask = (window["valid"] & (window["slots"] >= 0)
                       & (cam_lr_mask > 0))
            self.store = update_poses(
                self.store, jnp.maximum(window["slots"], 0), new_c2w,
                kf_mask)
            self._est_dev = self._est_dev.at[idx].set(new_c2w[-1])
        if (mapspec.nice and not mapspec.coarse_mapper
                and "occ_proxy" in self.map_state.grids):
            g = dict(self.map_state.grids)
            g["occ_proxy"] = refresh_occ_proxy(
                self.map_state.params, g, self.bound, s.model)
            self.map_state.grids = g
        return losses

    # -- mapping -----------------------------------------------------------

    def _maybe_capture_cost(self, name: str, jitfn, args, kw):
        """Record the XLA cost analysis (flops / bytes accessed) of a hot
        dispatch, once per name, when capture_cost is on (bench.py's MFU
        accounting).  Lowering happens BEFORE the real call so donated
        buffers are still alive; the AOT compile is served by the
        persistent compile cache."""
        if not self.capture_cost or name in self.cost_analyses:
            return
        try:
            c = jitfn.lower(*args, **kw).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0] if c else {}
            self.cost_analyses[name] = {
                "flops": float(c.get("flops", float("nan"))),
                "bytes_accessed": float(c.get("bytes accessed",
                                              float("nan"))),
            }
        except Exception as e:  # cost analysis is best-effort diagnostics
            self.cost_analyses[name] = {"error": repr(e)}

    @staticmethod
    def _stage_iters_of(mapspec, num_joint_iters: int):
        it = mapspec.stage_iters(num_joint_iters)
        return tuple((st, it[st])
                     for st in ("coarse", "middle", "fine", "color")
                     if it[st] > 0)

    def map_once(self, idx: int, color, depth, mapspec,
                 num_joint_iters: int, lr_factor: float, ba: bool,
                 coarse: bool = False, frame_sel: int = 0,
                 insert_kf: bool = False, gt_pose=None,
                 coarse_spec=None, coarse_iters: int = 0,
                 coarse_lr_factor: float = 1.0,
                 track_group_start: Optional[int] = None,
                 lagged_track=None):
        """One mapping optimization: keyframe selection, frustum masks,
        staged optimization and BA pose write-back fused into a single
        dispatch (mapping.mapping_step).  With insert_kf/coarse_spec the
        keyframe insertion and the whole coarse-mapper optimization ride
        the SAME dispatch (one barrier per mapping event); with
        track_group_start the frame group's tracking scan rides it too
        (mapping.track_map_group); with lagged_track=(cur, idx_e, g_end,
        colors, depths) the loose/free-mode group schedule — track
        [cur, idx_e], this lagged mapping event (frame idx from the
        color/depth args = the PREVIOUS group's stack), track
        [idx_e+1, g_end] — rides ONE dispatch
        (mapping.lagged_track_map_group)."""
        s = self.specs
        stage_iters = self._stage_iters_of(mapspec, num_joint_iters)
        coarse_stage_iters = (self._stage_iters_of(coarse_spec, coarse_iters)
                              if coarse_spec is not None else ())

        t0 = time.perf_counter()
        kw = dict(
            insert_kf=insert_kf,
            gt_pose=(jnp.asarray(gt_pose, jnp.float32) if insert_kf
                     else None),
            coarse_spec=coarse_spec,
            coarse_stage_iters=coarse_stage_iters,
            coarse_lr_factor=float(coarse_lr_factor))
        if lagged_track is not None:
            from nice_slam_tpu.mapping import lagged_track_map_group

            l_cur, l_idx_e, l_g_end, l_colors, l_depths = lagged_track
            split = l_idx_e - l_cur + 1
            step_a = self._next_step()
            step_map = self._next_step()
            # step_b consumed only when a tail segment exists — keeps the
            # RNG stream identical to the unfused three-dispatch path
            step_b = self._next_step() if l_idx_e < l_g_end else 0
            args = (self.map_state.params, self.map_state.grids, self.bound,
                    self.store, self._est_dev, l_cur, l_colors, l_depths,
                    color, depth, idx, frame_sel, split, step_a, step_map,
                    step_b, float(lr_factor), self._key_base, s.camera,
                    s.track, stage_iters, mapspec, s.render, s.model, ba,
                    s.model.coarse_bound_enlarge, self.mesh)
            self._maybe_capture_cost("lagged_track_map_group",
                                     lagged_track_map_group, args, kw)
            self.dispatch_counts["lagged_track_map_group"] = \
                self.dispatch_counts.get("lagged_track_map_group", 0) + 1
            (self.map_state.params, self.map_state.grids, self.store,
             self._est_dev, tl_a, tl_b, losses, sel) = \
                lagged_track_map_group(*args, **kw)
            self.tracking_stats.append(
                {"idxs": list(range(l_cur, l_idx_e + 1)), "arr": tl_a})
            if tl_b is not None:
                self.tracking_stats.append(
                    {"idxs": list(range(l_idx_e + 1, l_g_end + 1)),
                     "arr": tl_b})
        elif track_group_start is not None:
            from nice_slam_tpu.mapping import track_map_group

            track_step_no = self._next_step()
            args = (self.map_state.params, self.map_state.grids, self.bound,
                    self.store, self._est_dev, track_group_start, color,
                    depth, track_step_no, self._next_step(), frame_sel,
                    float(lr_factor), self._key_base, s.camera, s.track,
                    stage_iters, mapspec, s.render, s.model, ba,
                    s.model.coarse_bound_enlarge, self.mesh)
            self._maybe_capture_cost("track_map_group", track_map_group,
                                     args, kw)
            self.dispatch_counts["track_map_group"] = \
                self.dispatch_counts.get("track_map_group", 0) + 1
            (self.map_state.params, self.map_state.grids, self.store,
             self._est_dev, tlosses, losses, sel) = track_map_group(
                *args, **kw)
            self.tracking_stats.append(
                {"idxs": list(range(track_group_start, idx + 1)),
                 "arr": tlosses})
        else:
            args = (self.map_state.params, self.map_state.grids, self.bound,
                    self.store, self._est_dev, idx, color, depth, frame_sel,
                    float(lr_factor), self._key_base, self._next_step(),
                    s.camera, stage_iters, mapspec, s.render, s.model, ba,
                    s.model.coarse_bound_enlarge, self.mesh)
            nm = "coarse_mapping_step" if coarse else "mapping_step"
            self._maybe_capture_cost(nm, mapping_step, args, kw)
            self.dispatch_counts[nm] = self.dispatch_counts.get(nm, 0) + 1
            (self.map_state.params, self.map_state.grids, self.store,
             self._est_dev, losses, sel) = mapping_step(*args, **kw)
        if self.save_selected_kf and not coarse:
            self.selected_keyframes[idx] = sel  # lazy handle
        # fresh-buffer fetch = reliable step barrier (see track()); the
        # pipelined engine disables it so its mapping events overlap the
        # next tracking group on the other device
        if self._map_barrier:
            np.asarray(jax.device_get(losses))
        bucket = ("coarse_map" if coarse
                  else "track+map" if (track_group_start is not None
                                       or lagged_track is not None)
                  else "map")
        self.timings[bucket] += time.perf_counter() - t0
        return losses

    def mapping_event(self, idx: int, color, depth, gt_pose,
                      first: bool = False, frame_sel: int = 0,
                      track_group_start: Optional[int] = None,
                      lagged_track=None) -> None:
        """One mapping wake-up: fine mapper (+BA, keyframe insertion,
        checkpoint/mesh hooks) and the coarse mapper.  color/depth may be
        a stacked frame group with `frame_sel` picking the frame in-jit.

        track_group_start (grouped fast path): also track frames
        [track_group_start, idx] FIRST, fused into the SAME dispatch as
        the mapping event (mapping.track_map_group) — one dispatch + one
        barrier per frame group instead of two of each.  Bit-identical to
        the separate track-then-map dispatches (same RNG streams).

        lagged_track (loose/free fast path, see map_once): the group's
        two tracking segments ride the same dispatch AROUND this lagged
        event (mapping.lagged_track_map_group).  The caller
        (_grouped_lagged_step) guarantees the common single-pass branch
        applies."""
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

        due = ((idx % self.keyframe_every == 0 or idx >= self.n_img - 2)
               and idx not in self.kf_frame_ids)
        want_insert = due and len(self.kf_frame_ids) < self.store.capacity
        if due and not want_insert and not self._warned_kf_capacity:
            print(f"warning: keyframe store full "
                  f"({self.store.capacity}) — dropping keyframe {idx} and "
                  "later ones; raise tpu.keyframe_capacity")
            self._warned_kf_capacity = True
        losses = None
        use_inside = (
            self._map_inside_vis is not None and outer == 1 and mapspec.nice
            and self._map_inside_vis.frame_selected(idx)
            and not (first and self.cfg["mapping"].get(
                "no_vis_on_first_frame", True)))
        # the fused lagged dispatch embeds the group's tracking — it must
        # not silently fall into a branch that skips it
        assert lagged_track is None or (outer == 1 and not use_inside), \
            "lagged_track requires the single-pass mapping branch"
        if use_inside:
            # per-iteration mapping vis: segmented optimization (debug
            # path; see _map_event_inside_vis)
            if track_group_start is not None:
                t0 = time.perf_counter()
                tl = self._track_group(track_group_start, idx, color, depth)
                np.asarray(jax.device_get(tl))
                self.timings["track"] += time.perf_counter() - t0
            c_one = (color[frame_sel] if getattr(color, "ndim", 3) == 4
                     else color)
            d_one = (depth[frame_sel] if getattr(depth, "ndim", 2) == 3
                     else depth)
            ba = (len(self.kf_frame_ids) > 4) and mapspec.ba
            t0 = time.perf_counter()
            losses = self._map_event_inside_vis(idx, c_one, d_one, mapspec,
                                                n_iters, lr_f, ba)
            np.asarray(jax.device_get(losses))
            self.timings["map"] += time.perf_counter() - t0
            if want_insert:
                tk = time.perf_counter()
                self.store = add_keyframe_from(
                    self.store, c_one, d_one, self._est_dev, gt_pose, idx,
                    0)
                self._sync(self.store.count, "kf_add", tk)
                self.kf_frame_ids.append(idx)
            if self.specs.coarse_mapper is not None:
                self.map_once(idx, c_one, d_one, self.specs.coarse_mapper,
                              self.iters_first if first else self.iters,
                              self.lr_first_factor if first
                              else self.lr_factor,
                              ba=False, coarse=True, frame_sel=0)
        elif outer == 1:
            # the common path: fine map (+BA), keyframe insertion
            # (Mapper.py:611-617) and the independent coarse mapper all
            # fused into ONE dispatch + ONE barrier — optionally together
            # with the whole frame group's tracking (track_group_start)
            ba = (len(self.kf_frame_ids) > 4) and mapspec.ba
            losses = self.map_once(
                idx, color, depth, mapspec, n_iters, lr_f, ba,
                frame_sel=frame_sel, insert_kf=want_insert, gt_pose=gt_pose,
                coarse_spec=self.specs.coarse_mapper,
                coarse_iters=self.iters_first if first else self.iters,
                coarse_lr_factor=(self.lr_first_factor if first
                                  else self.lr_factor),
                track_group_start=track_group_start,
                lagged_track=lagged_track)
            if want_insert:
                self.kf_frame_ids.append(idx)
        else:
            if track_group_start is not None:
                # non-fusable event shapes (color refine, iMAP* 3-pass):
                # track the group in its own dispatch first
                t0 = time.perf_counter()
                tl = self._track_group(track_group_start, idx, color, depth)
                np.asarray(jax.device_get(tl))
                self.timings["track"] += time.perf_counter() - t0
            # multi-pass events (final color refine, iMAP*'s 3-pass loop)
            # keep the sequential sub-dispatches
            for _ in range(outer):
                ba = (len(self.kf_frame_ids) > 4) and mapspec.ba
                losses = self.map_once(idx, color, depth, mapspec,
                                       n_iters, lr_f, ba,
                                       frame_sel=frame_sel)

            if want_insert:
                tk = time.perf_counter()
                self.store = add_keyframe_from(
                    self.store, color, depth, self._est_dev, gt_pose, idx,
                    frame_sel)
                self._sync(self.store.count, "kf_add", tk)
                self.kf_frame_ids.append(idx)

            # coarse mapper (independent; coarse grid only)
            if self.specs.coarse_mapper is not None:
                self.map_once(idx, color, depth,
                              self.specs.coarse_mapper,
                              self.iters_first if first else self.iters,
                              self.lr_first_factor if first
                              else self.lr_factor,
                              ba=False, coarse=True, frame_sel=frame_sel)

        if self._map_vis_hook is not None:
            self._map_vis_hook(self, idx, color, depth, frame_sel)

        if (idx % self.ckpt_freq == 0 and idx > 0) or final:
            # the grouped loops bump frames_done only after the whole
            # group returns, but by event time every frame up to and
            # including `idx` is tracked — record that, or the final
            # checkpoint under-reports progress (stale-by-one-group idx
            # truncates replay and makes resume re-track done frames)
            self.frames_done = max(self.frames_done, idx + 1)
            if self.is_primary:
                self.save(os.path.join(self.output, "ckpts",
                                       f"{idx:05d}.npz"))
        if self.mesher_hook is not None and self.is_primary and (
                (idx % self.mesh_freq == 0 and idx > 0) or final):
            self.mesher_hook(self, idx, final)

    # -- main loop ---------------------------------------------------------

    def enable_visualizer(self, mapping_only: bool = False,
                          inside: bool = True):
        """Attach the residual-panel visualizers in separate dirs,
        mirroring the reference's per-worker Visualizer instances
        (src/Tracker.py:66-68, src/Mapper.py:87-90).

        inside=True (default — the reference's semantics,
        src/utils/Visualizer.py:24-107): panels render PER OPTIMIZATION
        ITERATION at the (vis_freq, vis_inside_freq) cadence —
        {idx:05d}_{iter:04d}.jpg.  Tracking re-renders the per-iteration
        camera history against the frozen map (exact reference panels);
        mapping runs selected events as segments of vis_inside_freq
        iterations and renders from the mid-optimization grids.

        inside=False: cheap per-frame tracking panels + per-EVENT mapping
        panels (it=0 only).  mapping_only skips the per-frame tracking
        hook (the pipelined engine tracks in groups and cannot host
        it)."""
        from nice_slam_tpu.utils.visualizer import (
            InsideVisualizer,
            make_engine_vis_hook,
        )

        tfreq = self.cfg["tracking"].get("vis_freq", 50)
        mfreq = self.cfg["mapping"].get("vis_freq", 50)
        if inside:
            if not mapping_only:
                self._track_inside_vis = InsideVisualizer(
                    os.path.join(self.output, "tracking_vis"), tfreq,
                    self.cfg["tracking"].get("vis_inside_freq", 25))
                # per-frame loop required for per-iteration tracking vis
                self.vis_hook = lambda eng, idx, color, depth: None
            self._map_inside_vis = InsideVisualizer(
                os.path.join(self.output, "mapping_vis"), mfreq,
                self.cfg["mapping"].get("vis_inside_freq", 25))
            return self
        if not mapping_only:
            self.vis_hook = make_engine_vis_hook(
                os.path.join(self.output, "tracking_vis"), tfreq)
        self._map_vis_hook = make_engine_vis_hook(
            os.path.join(self.output, "mapping_vis"), mfreq,
            by_call_count=True)
        return self

    def run(self, n_frames: Optional[int] = None, progress: bool = False,
            start: Optional[int] = None):
        """Process frames [start, n).  start defaults to frames_done, so a
        resumed engine (resume()/retry after a transient backend failure)
        continues where the checkpoint left off instead of re-running from
        frame 0."""
        n = min(n_frames or self.n_img, self.n_img)
        start = self.frames_done if start is None else start
        if start >= n:
            return self
        grouped = (self.grouped_tracking
                   and self.vis_hook is None and not self.gt_camera
                   and self.every_frame > 1)
        if grouped:
            return self._run_grouped(n, progress, start)
        it = range(start, n)
        if progress:
            try:
                from tqdm import tqdm
                it = tqdm(it, desc="slam")
            except ImportError:
                pass
        pool = None
        fut = None
        if self.prefetch and n > start:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="frame-prefetch")
            fut = pool.submit(self._load_frame, start)
        for idx in it:
            if fut is not None:
                color, depth, gt_pose = fut.result()
                if idx + 1 < n:
                    fut = pool.submit(self._load_frame, idx + 1)
            else:
                color, depth, gt_pose = self._load_frame(idx)
            if self.map_lag > 0:
                self._frame_cache[idx] = (color, depth, gt_pose)
                for old in [k for k in self._frame_cache
                            if k < idx - self.map_lag - 1]:
                    del self._frame_cache[old]
            if idx == 0:
                self.gt_c2w[0] = gt_pose
                self._est_dev = self._set_pose(
                    self._est_dev, 0, self._safe_est_pose(gt_pose, 0))
                self.mapping_event(0, color, depth, gt_pose, first=True)
                continue
            self.track(idx, color, depth, gt_pose)
            midx = idx - self.map_lag
            if idx == n - 1:
                # final frame always maps itself (color refine, final mesh)
                self.mapping_event(idx, color, depth, gt_pose)
            elif midx > 0 and midx % self.every_frame == 0:
                # lagged frame may predate a resume point — fall back to
                # the current frame (same map cadence, fresher data)
                mc, md, mg = (self._frame_cache.get(
                                  midx, (color, depth, gt_pose))
                              if self.map_lag > 0
                              else (color, depth, gt_pose))
                self.mapping_event(midx, mc, md, mg)
            if self.vis_hook is not None:
                self.vis_hook(self, idx, color, depth)
            self.frames_done = idx + 1
        if pool is not None:
            pool.shutdown(wait=False)
        return self

    def _track_group(self, cur: int, g_end: int, colors, depths,
                     params=None, grids=None):
        """Track frames cur..g_end in ONE dispatch against (params, grids)
        — default: the canonical map state (the pipelined engine passes
        its tracking-device snapshot).  Appends the group's loss record
        and returns the losses handle (the caller owns the barrier)."""
        from nice_slam_tpu.tracking import track_frames_group

        s = self.specs
        args = (self.map_state.params if params is None else params,
                self.map_state.grids if grids is None else grids,
                self.bound, self._est_dev, cur, colors, depths,
                self._key_base, self._next_step(), s.camera, s.track,
                s.render, s.model)
        self._maybe_capture_cost("track_frames_group", track_frames_group,
                                 args, {})
        self.dispatch_counts["track_frames_group"] = \
            self.dispatch_counts.get("track_frames_group", 0) + 1
        self._est_dev, losses = track_frames_group(*args)
        self.tracking_stats.append(
            {"idxs": list(range(cur, g_end + 1)), "arr": losses})
        return losses

    @staticmethod
    def group_end(cur: int, every_frame: int, n: int) -> int:
        """Last frame of the group starting at `cur`: the next every_frame
        boundary, capped at the final frame."""
        return min(((cur - 1) // every_frame + 1) * every_frame, n - 1)

    def _run_grouped(self, n: int, progress: bool = False, start: int = 0):
        """Grouped fast path: every inter-mapping frame group is tracked
        in ONE dispatch (tracking.track_frames_group) and its uploaded
        frame stack is reused by the mapping event in-jit — one device
        barrier per group instead of per frame.

        strict (map_lag 0): the group's mapping event rides the SAME
        dispatch as its tracking scan (mapping.track_map_group).

        loose/free (map_lag L > 0): the lag is deterministic, so the
        group splits at the known event point — track [cur, cur-1+L]
        against the stale map, run the mapping event for frame cur-1
        (the previous group boundary, its frame taken from the previous
        group's retained stack), then track the rest — same three-step
        semantics as the per-frame loop (run()), but 2-3 dispatches and
        ONE barrier per group instead of one of each per frame.  The
        per-frame loop remains the reference implementation for these
        modes (TestSyncModeSchedules pins the interleavings)."""
        bar = None
        if progress:
            try:
                from tqdm import tqdm
                bar = tqdm(total=n, initial=start, desc="slam")
            except ImportError:
                pass

        if start == 0:
            color, depth, gt_pose = self._load_frame(0)
            self.gt_c2w[0] = gt_pose
            self._est_dev = self._set_pose(
                self._est_dev, 0, self._safe_est_pose(gt_pose, 0))

        # group schedule, known up front -> prefetch one group ahead on a
        # worker thread (dataset decode + upload overlap device compute)
        bounds = []
        cur = max(1, start)
        while cur < n:
            g_end = self.group_end(cur, self.every_frame, n)
            bounds.append((cur, g_end))
            cur = g_end + 1
        pool = None
        fut = None
        if self.prefetch and bounds:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="frame-prefetch")
            fut = pool.submit(self._load_frames_stacked, *bounds[0])

        if start == 0:
            self.mapping_event(0, color, depth, gt_pose, first=True)
            self.frames_done = 1
            if bar:
                bar.update(1)

        prev = None  # previous group's stack, retained for lagged events
        ksaved = self._map_barrier
        try:
            for gi, (cur, g_end) in enumerate(bounds):
                if fut is not None:
                    colors, depths, gts = fut.result()
                    if gi + 1 < len(bounds):
                        fut = pool.submit(self._load_frames_stacked,
                                          *bounds[gi + 1])
                else:
                    colors, depths, gts = self._load_frames_stacked(
                        cur, g_end)
                self.gt_c2w[cur:g_end + 1] = gts

                # K-group barrier policy (tpu.barrier_every_groups): the
                # schedule is deterministic, so only every Kth fused
                # dispatch needs the end-of-group barrier fetch — the
                # others queue behind it (amortizes the remote backend's
                # ~17 ms barrier RPC; measured +9% fps at K=4).  The
                # final group and hook-bearing events always barrier
                # (mapping_event's save() does its own fresh-op fetch).
                k = max(self.barrier_every_groups, 1)
                self._map_barrier = ksaved and (
                    gi % k == k - 1 or gi == len(bounds) - 1)

                if self.map_lag > 0:
                    self._grouped_lagged_step(cur, g_end, colors, depths,
                                              gts, n, prev)
                    prev = (cur, colors, depths, gts)
                    self.frames_done = g_end + 1
                    if bar:
                        bar.update(g_end + 1 - cur)
                    continue

                maps_here = g_end == n - 1 or g_end % self.every_frame == 0
                if maps_here and self.mesh is None and self.fuse_track_map:
                    # tracking + mapping event in ONE dispatch + barrier
                    # (mapping.track_map_group; bit-identical RNG streams)
                    self.mapping_event(g_end, colors, depths, gts[-1],
                                       frame_sel=g_end - cur,
                                       track_group_start=cur)
                else:
                    t0 = time.perf_counter()
                    losses = self._track_group(cur, g_end, colors, depths)
                    np.asarray(jax.device_get(losses))  # group barrier
                    self.timings["track"] += time.perf_counter() - t0
                    if maps_here:
                        self.mapping_event(g_end, colors, depths, gts[-1],
                                           frame_sel=g_end - cur)
                self.frames_done = g_end + 1
                if bar:
                    bar.update(g_end + 1 - cur)
        finally:
            self._map_barrier = ksaved
            if pool is not None:
                pool.shutdown(wait=False)
        if bar:
            bar.close()
        return self

    def _grouped_lagged_step(self, cur: int, g_end: int, colors, depths,
                             gts, n: int, prev):
        """One loose/free-mode frame group.  Exactly the per-frame loop's
        schedule (run(): track idx; at idx == m+L map frame m = the
        previous every_frame boundary; at idx == n-1 map the final frame
        instead), but the tracking runs as at most two grouped dispatches
        split at the deterministic event point, with ONE end-of-group
        barrier — on remote-attached backends the per-frame loop's
        dispatch+barrier per frame costs more than the optimization
        itself (see bench.py --sync)."""
        L = self.map_lag
        m = cur - 1                      # frame the lagged event maps
        idx_e = m + L                    # tracker index where it fires
        final = g_end == n - 1
        # the final frame's own event wins over a lagged event at n-1
        # (run(): `if idx == n-1` precedes the midx branch).  The
        # boundary check matters after a mid-group resume: cur-1 is only
        # a mapping frame when it lies on the every_frame cadence.
        has_event = (m > 0 and m % self.every_frame == 0
                     and cur <= idx_e <= g_end
                     and not (final and idx_e == n - 1))
        # fused fast path: the whole lagged group (track A, mapping
        # event, track B) in ONE dispatch + ONE barrier
        # (mapping.lagged_track_map_group) — bit-identical RNG streams.
        # Gated to the guaranteed single-pass mapping branch; the
        # three-dispatch path below remains the reference implementation
        # (and the fallback after a mid-group resume, where the lagged
        # frame's stack is gone).
        if (has_event and prev is not None and self.fuse_track_map
                and self.fuse_lagged and self.mesh is None
                and self.specs.mapper.nice
                and self._map_inside_vis is None):
            p_cur, p_colors, p_depths, p_gts = prev
            self.mapping_event(m, p_colors, p_depths, p_gts[m - p_cur],
                               frame_sel=m - p_cur,
                               lagged_track=(cur, idx_e, g_end,
                                             colors, depths))
            if final:
                self.mapping_event(g_end, colors, depths, gts[-1],
                                   frame_sel=g_end - cur)
            return
        t0 = time.perf_counter()
        if has_event:
            lo = idx_e - cur             # split point within the stack
            last = self._track_group(cur, idx_e, colors[:lo + 1],
                                     depths[:lo + 1])
            t_pre = time.perf_counter() - t0
            self.timings["track"] += t_pre
            # when track B follows (loose), the end-of-group barrier
            # covers the mapping event too — skip the event's own barrier
            # to save one RPC round trip per group.  free mode (event at
            # group end) keeps it: nothing later would wait otherwise.
            saved_barrier = self._map_barrier
            if idx_e < g_end:
                self._map_barrier = False
            try:
                if prev is not None:
                    p_cur, p_colors, p_depths, p_gts = prev
                    self.mapping_event(m, p_colors, p_depths,
                                       p_gts[m - p_cur],
                                       frame_sel=m - p_cur)
                else:
                    # resume landed mid-schedule and the lagged frame's
                    # stack is gone — fall back to the freshest tracked
                    # frame (same fallback as run()'s _frame_cache miss)
                    self.mapping_event(m, colors, depths, gts[lo],
                                       frame_sel=lo)
            finally:
                self._map_barrier = saved_barrier
            t0 = time.perf_counter()
            if idx_e < g_end:
                last = self._track_group(idx_e + 1, g_end,
                                         colors[lo + 1:],
                                         depths[lo + 1:])
        else:
            last = self._track_group(cur, g_end, colors, depths)
        np.asarray(jax.device_get(last))  # end-of-group barrier
        self.timings["track"] += time.perf_counter() - t0
        if final:
            self.mapping_event(g_end, colors, depths, gts[-1],
                               frame_sel=g_end - cur)

    def save(self, path: str):
        # barrier before fetching: params/grids/store are donation-aliased
        # buffers (mapping_step updates them in place) — a fresh-op fetch
        # guarantees in-flight mapping work has landed before the dump
        leaves = (jax.tree.leaves(self.map_state.grids)
                  or jax.tree.leaves(self.map_state.params))  # iMAP: no grids
        np.asarray(jax.device_get(jnp.sum(leaves[0][:1])))
        extra = {"kf_frame_ids": np.asarray(self.kf_frame_ids, np.int64)}
        if self.selected_keyframes:
            # fetch the lazy per-event window records once, ragged-pad to
            # the widest window (color refine doubles it), cache as numpy
            ev = sorted(self.selected_keyframes)
            rows = []
            for i in ev:
                r = np.asarray(jax.device_get(self.selected_keyframes[i]),
                               np.int64)
                self.selected_keyframes[i] = r
                rows.append(r)
            w = max(r.shape[0] for r in rows)
            mat = np.full((len(rows), w), -2, np.int64)
            for r_i, r in enumerate(rows):
                mat[r_i, : r.shape[0]] = r
            extra["selkf_event_idx"] = np.asarray(ev, np.int64)
            extra["selkf_frames"] = mat
        save_checkpoint(
            path, self.map_state.params, self.map_state.grids,
            self.bound, self.est_c2w, self.gt_c2w, self.store,
            self.frames_done, extra=extra)

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
        if "selkf_event_idx" in ck["extra"]:
            self.selected_keyframes = {
                int(i): row for i, row in
                zip(ck["extra"]["selkf_event_idx"],
                    ck["extra"]["selkf_frames"])}
        self.frames_done = ck["idx"]
        return self

    def ate(self):
        from nice_slam_tpu.utils.trajectory import ate_stats

        n = self.frames_done
        return ate_stats(self.gt_c2w[:n], self.est_c2w[:n])
