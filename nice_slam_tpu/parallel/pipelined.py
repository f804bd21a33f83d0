"""Pipelined tracker/mapper: TRUE overlap on two devices.

The reference's `loose`/`free` sync modes run the tracker and mapper as
concurrent OS processes around shared-memory tensors
(src/NICE_SLAM.py:288-307, src/Tracker.py:161-175); the single-device
engine emulates them with a deterministic mapping lag.  This engine makes
the overlap REAL on TPU: the tracker owns one device, the mapper another,
and JAX's async dispatch runs both simultaneously — the analogue of the
reference's process parallelism, with device_put snapshots playing the
role of `update_para_from_mapping` (Tracker.py:130-142).

Schedule (one mapping event of lag, like `loose`):

    map(0) on M;  snapshot -> T
    for each frame group [b_prev+1 .. b]:
        track the group on T with the CURRENT snapshot     (device T)
        pull the PREVIOUS event's map + BA pose            (M -> T copy)
        enqueue mapping event for frame b                  (device M)
    drain the final event; final snapshot

The tracker therefore uses a map that lags by exactly one mapping event —
the same staleness bound as the reference's loose gate
(mapping_idx >= idx - every_frame*3/2), but deterministic.

On a real pod the M->T snapshot rides ICI; on single-chip rigs this
engine still runs (both "devices" are the same chip — it degrades to the
sequential schedule).  Validated on the virtual CPU mesh.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.engine import SlamEngine


class PipelinedSlamEngine(SlamEngine):
    """Two-device tracker/mapper pipeline.  Use via
    cfg['tpu']['pipelined']=true (run.py picks this class) or directly.

    Restrictions: strict/loose scheduling only (the mapping lag is one
    event), no per-frame vis hook (tracking is grouped)."""

    def __init__(self, cfg: dict, dataset=None,
                 output: Optional[str] = None, mesher_hook=None,
                 devices=None):
        super().__init__(cfg, dataset=dataset, output=output,
                         mesher_hook=mesher_hook)
        devs = devices if devices is not None else jax.devices()
        self.dev_track = devs[0]
        self.dev_map = devs[1] if len(devs) > 1 else devs[0]
        # canonical map state lives on the mapping device; the tracker
        # works from a snapshot on its own device
        self.map_state.params = jax.device_put(self.map_state.params,
                                               self.dev_map)
        self.map_state.grids = jax.device_put(self.map_state.grids,
                                              self.dev_map)
        self.store = jax.device_put(self.store, self.dev_map)
        self._est_dev = jax.device_put(self._est_dev, self.dev_track)
        self._params_t = jax.device_put(self.map_state.params,
                                        self.dev_track)
        self._grids_t = jax.device_put(self.map_state.grids, self.dev_track)
        # mapping events must NOT block the host: the next tracking group
        # overlaps them on the other device (engine.map_once honors this)
        self._map_barrier = False
        if self.mesh is not None:
            raise ValueError(
                "tpu.pipelined and tpu.data_parallel are mutually "
                "exclusive: the pipelined engine commits the map state to "
                "one device; dp mapping would shard it over the mesh")

    # mapping_step donates its inputs, so map_state.params/grids are
    # donation-ALIASED buffers; per the measured axon invariant
    # (engine.py docstring), copies/fetches of aliased buffers may not
    # wait for the in-flight program.  Derive FRESH buffers on the map
    # device first — one jitted dispatch — then device_put those.  The
    # BA-pose row selection rides the same dispatch (idx is a traced
    # scalar) so a snapshot stays one program + device_puts.
    _freshen = staticmethod(jax.jit(
        lambda t, idx: (
            jax.tree.map(lambda x: x + jnp.zeros((), x.dtype), t),
            jax.lax.dynamic_index_in_dim(t["e"], idx, keepdims=False))))

    _fresh_copy = staticmethod(jax.jit(
        lambda t: jax.tree.map(lambda x: x + jnp.zeros((), x.dtype), t)))

    def _est_to_map(self, est):
        """Trajectory copy for the mapper.  On two devices this is the
        cross-device transfer; on ONE device (degraded single-chip mode)
        jax.device_put is a NO-OP returning the SAME buffer — which
        mapping_step then DONATES, deleting the tracker's est buffer out
        from under it.  Force a fresh buffer in that case."""
        if self.dev_map is self.dev_track:
            return self._fresh_copy(est)
        return jax.device_put(est, self.dev_map)

    def _snapshot(self, idx: Optional[int]):
        """Pull the mapper's latest params/grids to the tracking device
        (the analogue of Tracker.update_para_from_mapping) and fold the
        BA-refined pose for `idx` back into the tracker's trajectory."""
        fresh, row = self._freshen(
            {"p": self.map_state.params, "g": self.map_state.grids,
             "e": self._est_m}, 0 if idx is None else idx)
        self._params_t = jax.device_put(fresh["p"], self.dev_track)
        self._grids_t = jax.device_put(fresh["g"], self.dev_track)
        if idx is not None:
            row_t = jax.device_put(row, self.dev_track)
            self._est_dev = self._set_pose(self._est_dev, idx, row_t)

    def run(self, n_frames: Optional[int] = None, progress: bool = False):
        if self.gt_camera:
            # GT-pose mode has no tracking to overlap; the sequential
            # engine's per-frame path is the correct (and honest) schedule
            return super().run(n_frames=n_frames, progress=progress)
        n = min(n_frames or self.n_img, self.n_img)
        assert self.vis_hook is None, \
            "pipelined engine tracks in groups; use the sequential engine " \
            "for per-frame vis (mapping panels still work: " \
            "enable_visualizer(mapping_only=True))"

        # frame 0: first mapping event on M, then snapshot
        color, depth, gt_pose = self._load_frame(0)
        color_m = jax.device_put(color, self.dev_map)
        depth_m = jax.device_put(depth, self.dev_map)
        self.gt_c2w[0] = gt_pose
        self._est_dev = self._set_pose(self._est_dev, 0, gt_pose)
        self._est_m = self._est_to_map(self._est_dev)
        self.mapping_event(0, color_m, depth_m, gt_pose, first=True)
        self._snapshot(None)
        self.frames_done = 1

        cur = 1
        prev_event = None  # frame idx of the in-flight mapping event
        while cur < n:
            g_end = self.group_end(cur, self.every_frame, n)
            colors, depths, gts = self._load_frames_stacked(cur, g_end)
            self.gt_c2w[cur:g_end + 1] = gts

            # 1) track the group on T against the CURRENT (stale) snapshot
            t0 = time.perf_counter()
            losses_t = self._track_group(cur, g_end, colors, depths,
                                         params=self._params_t,
                                         grids=self._grids_t)

            # 2) the PREVIOUS event finished on M while we tracked: pull it
            if prev_event is not None:
                self._snapshot(prev_event)
            np.asarray(jax.device_get(losses_t))  # group barrier on T
            self.timings["track"] += time.perf_counter() - t0

            # 3) enqueue THIS boundary's mapping event on M
            if g_end % self.every_frame == 0 or g_end == n - 1:
                self._est_m = self._est_to_map(self._est_dev)
                cm = jax.device_put(colors, self.dev_map)
                dm = jax.device_put(depths, self.dev_map)
                self.mapping_event(g_end, cm, dm, gts[-1],
                                   frame_sel=g_end - cur)
                prev_event = g_end

            self.frames_done = g_end + 1
            cur = g_end + 1

        if prev_event is not None:
            self._snapshot(prev_event)
        return self

    # -- map-side trajectory plumbing ---------------------------------------
    #
    # SlamEngine.mapping_event reads/writes self._est_dev; on this engine
    # the mapper must use the MAP-side copy.  Swap it in around the call.

    def mapping_event(self, idx, color, depth, gt_pose, first=False,
                      frame_sel=0):
        est_t = self._est_dev
        self._est_dev = self._est_m
        try:
            super().mapping_event(idx, color, depth, gt_pose, first=first,
                                  frame_sel=frame_sel)
        finally:
            self._est_m = self._est_dev
            self._est_dev = est_t
