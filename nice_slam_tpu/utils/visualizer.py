"""Debug visualizer: GT / rendered / residual panels per iteration.

Equivalent of src/utils/Visualizer.py: every (freq, inside_freq) the
current frame is fully rendered and a 2x3 matplotlib panel (depth row,
color row) is saved to <vis_dir>/{idx:05d}_{iter:04d}.jpg."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_panel(out_path: str, gt_depth: np.ndarray, gt_color: np.ndarray,
               depth: np.ndarray, color: np.ndarray) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    depth_residual = np.abs(gt_depth - depth)
    depth_residual[gt_depth == 0.0] = 0.0
    color_residual = np.abs(gt_color - color)
    color_residual[gt_depth == 0.0] = 0.0

    fig, axs = plt.subplots(2, 3, figsize=(12, 7))
    max_depth = float(np.max(gt_depth)) or 1.0
    for a, (img, title) in enumerate([
            (gt_depth, "Input Depth"), (depth, "Generated Depth"),
            (depth_residual, "Depth Residual")]):
        axs[0, a].imshow(img, cmap="plasma", vmin=0, vmax=max_depth)
        axs[0, a].set_title(title)
        axs[0, a].set_xticks([])
        axs[0, a].set_yticks([])
    for a, (img, title) in enumerate([
            (gt_color, "Input RGB"), (np.clip(color, 0, 1), "Generated RGB"),
            (np.clip(color_residual, 0, 1), "RGB Residual")]):
        axs[1, a].imshow(img)
        axs[1, a].set_title(title)
        axs[1, a].set_xticks([])
        axs[1, a].set_yticks([])
    plt.subplots_adjust(wspace=0, hspace=0)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.savefig(out_path, dpi=120, bbox_inches="tight", pad_inches=0.2)
    plt.close(fig)


class Visualizer:
    def __init__(self, freq: int, inside_freq: int, vis_dir: str):
        self.freq = freq
        self.inside_freq = inside_freq
        self.vis_dir = vis_dir

    def maybe_vis(self, engine, idx: int, it: int, gt_color, gt_depth,
                  c2w) -> Optional[str]:
        if idx % self.freq != 0 or it % self.inside_freq != 0:
            return None
        import jax
        import jax.numpy as jnp

        from nice_slam_tpu.render import render_image

        s = engine.specs
        depth, _, color = render_image(
            engine.map_state.params, s.model, engine.map_state.grids,
            engine.bound, jnp.asarray(c2w), s.camera,
            jax.random.PRNGKey(0), s.render, "color", jnp.asarray(gt_depth))
        out = os.path.join(self.vis_dir, f"{idx:05d}_{it:04d}.jpg")
        save_panel(out, np.asarray(gt_depth), np.asarray(gt_color),
                   np.asarray(depth), np.asarray(color))
        return out


class InsideVisualizer:
    """Per-ITERATION panels inside tracking/mapping optimizations —
    the reference's (vis_freq, vis_inside_freq) cadence
    (src/utils/Visualizer.py:24-107: every inside_freq-th iteration of
    every freq-th frame renders the full frame and saves
    {idx:05d}_{iter:04d}.jpg).

    Tracking: the engine fetches the per-iteration camera history from
    track_frame_step_vis and re-renders against the frozen map — exact
    reference panels.  Mapping: the engine drives the event as segments
    of inside_freq iterations (mapping.map_optimize_segment) and renders
    between them from the mid-optimization grids."""

    def __init__(self, vis_dir: str, freq: int, inside_freq: int):
        self.vis_dir = vis_dir
        self.freq = max(int(freq), 1)
        self.inside_freq = max(int(inside_freq), 1)

    def frame_selected(self, idx: int) -> bool:
        return idx % self.freq == 0

    def render_panel(self, engine, idx: int, it: int, gt_color, gt_depth,
                     c2w, params=None, grids=None) -> str:
        import jax
        import jax.numpy as jnp

        from nice_slam_tpu.render import render_image

        s = engine.specs
        depth, _, color = render_image(
            params if params is not None else engine.map_state.params,
            s.model,
            grids if grids is not None else engine.map_state.grids,
            engine.bound, jnp.asarray(c2w), s.camera,
            jax.random.PRNGKey(0), s.render, "color",
            jnp.asarray(gt_depth))
        gt_c = np.asarray(gt_color)
        if gt_c.dtype == np.uint8:
            gt_c = gt_c.astype(np.float32) / 255.0
        out = os.path.join(self.vis_dir, f"{idx:05d}_{it:04d}.jpg")
        save_panel(out, np.asarray(gt_depth), gt_c,
                   np.asarray(depth), np.asarray(color))
        return out


def segment_stage_iters(stage_iters, inside_freq: int):
    """Split ((stage, n), ...) into segments of <= inside_freq iterations,
    tagging each with its cumulative starting iterate: returns a list of
    (start_iter, ((stage, chunk),)).  Panels render BEFORE each segment —
    the reference renders before the optimization step of the selected
    iteration (src/Mapper.py:426-430)."""
    out = []
    cum = 0
    for stage, n in stage_iters:
        done = 0
        while done < n:
            chunk = min(inside_freq - (cum % inside_freq), n - done)
            out.append((cum, ((stage, chunk),)))
            cum += chunk
            done += chunk
    # merge segments that do not start on an inside_freq boundary into
    # their predecessor (they exist only to realign stage boundaries)
    merged = []
    for start, seg in out:
        if merged and start % inside_freq != 0:
            merged[-1] = (merged[-1][0], merged[-1][1] + seg)
        else:
            merged.append((start, seg))
    return merged


def make_engine_vis_hook(vis_dir: str, freq: int = 50,
                         by_call_count: bool = False):
    """Engine-level hook: render a panel every `freq` frames — or, with
    by_call_count (used for the mapping hook, which only fires at mapping
    events), every `freq`-th CALL, so 'every N-th mapping event' holds
    whatever every_frame is."""
    # by_call_count does its own gating; disable maybe_vis's idx gate then
    vis = Visualizer(1 if by_call_count else freq, 1, vis_dir)
    n_calls = [0]

    def hook(engine, idx, color, depth, frame_sel=0):
        gate = (n_calls[0] % freq != 0) if by_call_count \
            else (idx % vis.freq != 0)
        n_calls[0] += 1
        if gate:
            return  # skip BEFORE the trajectory fetch — est_c2w is a
            # full device_get and would stall every frame on remote chips
        if getattr(color, "ndim", 3) == 4:
            # grouped / pipelined mapping passes stacked (G,H,W,3) frames;
            # slice the mapped frame out (eager, but only at vis cadence)
            color, depth = color[frame_sel], depth[frame_sel]
        c = np.asarray(color)
        if c.dtype == np.uint8:  # engine may stream color as uint8
            c = c.astype(np.float32) / 255.0
        vis.maybe_vis(engine, idx, 0, c, np.asarray(depth),
                      engine.est_c2w[idx])

    return hook
