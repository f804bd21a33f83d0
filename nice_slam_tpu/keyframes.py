"""Device-resident keyframe store + keyframe window selection.

The reference keeps keyframes as a Python list of CPU tensors and moves
them to GPU per mapping iteration (src/Mapper.py:82-83, 439-440).  On TPU
the store is a fixed-capacity ring of HBM arrays (uint8 color, f32 depth)
updated with dynamic_update_slice — no host round-trips in the mapping
loop.

Window selection implements both reference policies
(src/Mapper.py:256-272):
- 'overlap': sample rays from the current frame, lift 16 depth-guided
  samples, project into every stored keyframe, rank by in-frustum fraction
  and take a random subset of qualifying frames (Mapper.py:166-228);
- 'global': uniform random subset (src/common.py:66-71).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.camera import Camera
from nice_slam_tpu.ops.rays import rays_from_uv, sample_pixels, gather_pixels


class KeyframeStore(NamedTuple):
    """colors: (K, H, W, 3) uint8; depths: (K, H, W) f32;
    est_c2w/gt_c2w: (K, 4, 4); frame_idx: (K,) i32; count: () i32."""
    colors: jnp.ndarray
    depths: jnp.ndarray
    est_c2w: jnp.ndarray
    gt_c2w: jnp.ndarray
    frame_idx: jnp.ndarray
    count: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.colors.shape[0]


def make_store(capacity: int, H: int, W: int) -> KeyframeStore:
    return KeyframeStore(
        colors=jnp.zeros((capacity, H, W, 3), jnp.uint8),
        depths=jnp.zeros((capacity, H, W), jnp.float32),
        est_c2w=jnp.tile(jnp.eye(4), (capacity, 1, 1)),
        gt_c2w=jnp.tile(jnp.eye(4), (capacity, 1, 1)),
        frame_idx=jnp.full((capacity,), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def add_keyframe_impl(store: KeyframeStore, color, depth, est_c2w, gt_c2w,
                      frame_idx) -> KeyframeStore:
    """Plain (trace-inlinable) keyframe append — the body of add_keyframe,
    also inlined into mapping.mapping_step so a whole mapping event
    (fine map + BA + keyframe insert + coarse map) is ONE dispatch."""
    i = store.count
    c8 = (color if color.dtype == jnp.uint8
          else jnp.clip(color * 255.0 + 0.5, 0, 255).astype(jnp.uint8))
    return KeyframeStore(
        colors=jax.lax.dynamic_update_index_in_dim(store.colors, c8, i, 0),
        depths=jax.lax.dynamic_update_index_in_dim(store.depths, depth, i, 0),
        est_c2w=jax.lax.dynamic_update_index_in_dim(
            store.est_c2w, est_c2w.astype(store.est_c2w.dtype), i, 0),
        gt_c2w=jax.lax.dynamic_update_index_in_dim(
            store.gt_c2w, gt_c2w.astype(store.gt_c2w.dtype), i, 0),
        frame_idx=store.frame_idx.at[i].set(frame_idx),
        count=store.count + 1,
    )


@partial(jax.jit, donate_argnums=(0,))
def add_keyframe(store: KeyframeStore, color, depth, est_c2w, gt_c2w,
                 frame_idx) -> KeyframeStore:
    """Append a keyframe (color float in [0,1] -> uint8).  The store is
    donated: the insert is a true in-place dynamic_update_slice — without
    donation every insert would copy the whole multi-GB ring."""
    return add_keyframe_impl(store, color, depth, est_c2w, gt_c2w, frame_idx)


@partial(jax.jit, donate_argnums=(0,))
def add_keyframe_from(store: KeyframeStore, color, depth, est_buf,
                      gt_c2w, frame_idx, frame_sel=0) -> KeyframeStore:
    """add_keyframe with the estimated pose read out of the device-resident
    trajectory buffer inside the jit (no eager slice on the host path).
    color/depth may be stacked groups (G, H, W, ...) with `frame_sel`
    picking the frame in-jit."""
    if color.ndim == 4:
        color = color[frame_sel]
        depth = depth[frame_sel]
    return add_keyframe(store, color, depth, est_buf[frame_idx], gt_c2w,
                        frame_idx)


@partial(jax.jit, donate_argnums=(0,))
def update_poses(store: KeyframeStore, slots, new_c2w, mask) -> KeyframeStore:
    """Write BA-refined poses back for `slots` where mask is True."""
    cur = store.est_c2w[slots]
    upd = jnp.where(mask[:, None, None], new_c2w, cur)
    return store._replace(est_c2w=store.est_c2w.at[slots].set(upd))


def se3_inverse(c2w: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a rigid 4x4 transform."""
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                              top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def project_points(pts: jnp.ndarray, c2w: jnp.ndarray, camera: Camera):
    """Project world points into a camera.  Returns (u, v, z) with z < 0 in
    front (the -z forward convention; projection math mirrors
    Mapper.py:198-216)."""
    w2c = se3_inverse(c2w)
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    pc = jnp.matmul(ph, w2c.T, precision="highest")  # (N, 4)
    x, y, z = -pc[..., 0], pc[..., 1], pc[..., 2]
    zs = z + 1e-5
    u = camera.fx * x / zs + camera.cx
    v = camera.fy * y / zs + camera.cy
    return u, v, z


@partial(jax.jit, static_argnames=("camera", "k", "n_samples", "n_pixels"))
def select_keyframes_overlap(key, store: KeyframeStore, gt_color, gt_depth,
                             cur_c2w, camera: Camera, k: int,
                             n_samples: int = 16, n_pixels: int = 100):
    """Rank stored keyframes by view overlap with the current frame, pick a
    random subset of size <= k of those with overlap > 0.

    Returns (slots (k,) i32, valid (k,) bool)."""
    kp, kr = jax.random.split(key)
    i, j = sample_pixels(kp, n_pixels, 0, camera.H, 0, camera.W)
    rays_o, rays_d = rays_from_uv(i, j, cur_c2w, camera.fx, camera.fy,
                                  camera.cx, camera.cy)
    d = gather_pixels(gt_depth, i, j)[:, None]
    t = jnp.linspace(0.0, 1.0, n_samples)
    z = (d * 0.8) * (1.0 - t) + (d + 0.5) * t  # (P, S)
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]).reshape(-1, 3)

    def percent_for(c2w):
        u, v, zc = project_points(pts, c2w, camera)
        edge = 20
        m = ((u < camera.W - edge) & (u > edge)
             & (v < camera.H - edge) & (v > edge) & (zc < 0))
        return jnp.mean(m.astype(jnp.float32))

    percents = jax.vmap(percent_for)(store.est_c2w)  # (K,)
    slot_ids = jnp.arange(store.capacity)
    # the most recent keyframe is excluded here — it joins the window
    # unconditionally (reference selects among keyframe_dict[:-1],
    # Mapper.py:265-270)
    stored = slot_ids < store.count - 1
    qualify = stored & (percents > 0.0)
    # uniform random top-k over qualifying slots
    scores = jnp.where(qualify, jax.random.uniform(kr, (store.capacity,)), -1.0)
    return _topk_slots(scores, k, store.capacity)


def _topk_slots(scores, k: int, capacity: int):
    """top_k slots by score with k possibly exceeding the store capacity
    (tiny scenes): the overflow is padded with invalid slots."""
    k_eff = min(k, capacity)
    _, slots = jax.lax.top_k(scores, k_eff)
    valid = scores[slots] > 0.0
    if k_eff < k:
        slots = jnp.concatenate(
            [slots, jnp.zeros((k - k_eff,), slots.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((k - k_eff,), bool)])
    return slots.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("k",))
def select_keyframes_global(key, store: KeyframeStore, k: int):
    """Uniform random subset of stored keyframes, excluding the most recent
    (the reference selects among keyframe_dict[:-1]; Mapper.py:259-265)."""
    n_eligible = jnp.maximum(store.count - 1, 0)
    scores = jnp.where(jnp.arange(store.capacity) < n_eligible,
                       jax.random.uniform(key, (store.capacity,)), -1.0)
    return _topk_slots(scores, k, store.capacity)


def build_window(store: KeyframeStore, slots, valid, cur_color, cur_depth,
                 cur_c2w):
    """Assemble the fixed-size optimization window:
    [selected keyframes..., most recent keyframe, current frame]
    (reference Mapper.py:267-272).  Invalid slots carry zero weight.

    Returns dict of stacked arrays with leading dim k+2."""
    last = jnp.maximum(store.count - 1, 0)
    slots_full = jnp.concatenate(
        [slots, last[None].astype(jnp.int32)])  # selected + most recent kf
    valid_full = jnp.concatenate([valid, (store.count > 0)[None]])

    colors = store.colors[slots_full].astype(jnp.float32) / 255.0
    depths = store.depths[slots_full]
    c2ws = store.est_c2w[slots_full]

    colors = jnp.concatenate([colors, cur_color[None]], axis=0)
    depths = jnp.concatenate([depths, cur_depth[None]], axis=0)
    c2ws = jnp.concatenate([c2ws, cur_c2w[None].astype(c2ws.dtype)], axis=0)
    valid_all = jnp.concatenate([valid_full,
                                 jnp.ones((1,), bool)])
    slots_all = jnp.concatenate([slots_full, jnp.full((1,), -1, jnp.int32)])
    return {
        "colors": colors, "depths": depths, "c2ws": c2ws,
        "valid": valid_all, "slots": slots_all,
    }
