"""Differentiable volume renderer (TPU re-design of src/utils/Renderer.py).

Everything is shape-static and jit-friendly:

- per-ray near/far: near = 0.01 * sensor depth, far = ray/AABB exit + 0.01
  clamped to 1.2 * max depth (reference Renderer.py:88-111),
- N_samples stratified bins + N_surface depth-guided samples with the
  depth-hole uniform fallback expressed as a per-ray `where` select instead
  of boolean indexing (Renderer.py:112-150),
- merge by sort, decode all points in one batch, alpha-composite,
- optional N_importance inverse-CDF refinement (Renderer.py:181-196).

Out-of-bound points get occupancy forced to +100 (an opaque wall at the
AABB, Renderer.py:57).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nice_slam_tpu.models.decoders import ModelSpec, model_apply
from nice_slam_tpu.ops import (
    perturb_zvals,
    raw2outputs,
    ray_aabb_far,
    sample_pdf,
    stratified_zvals,
    surface_zvals,
)


@dataclass(frozen=True)
class RenderSpec:
    n_samples: int = 32
    n_surface: int = 16
    n_importance: int = 0
    lindisp: bool = False
    perturb: float = 0.0
    occupancy: bool = True
    # occupancy-guided stratified sampling (ops.sampling.occ_guided_zvals):
    # concentrates the SAME n_samples where the map's occupancy proxy is
    # high — a static-shape quality-per-sample accelerator (enables lower
    # n_samples budgets at equal ATE).  Needs grids["occ_proxy"].
    occ_guided: bool = False
    # fused Pallas decode control (models/decoders.py:_use_fused):
    # None = auto (TPU + matching dims), True/False force.  train_decoders
    # False prunes decoder weight grads from the fused backward (set by
    # tracking and by non-color mapping stages, where decoders are frozen).
    fused: object = None
    train_decoders: bool = True


def eval_points(params, mspec: ModelSpec, grids, bound, p: jnp.ndarray,
                stage: str, fused=None,
                train_decoders: bool = True) -> jnp.ndarray:
    """Decode raw (N, 4) predictions; occupancy forced to 100 outside the
    AABB (reference Renderer.py:38-61)."""
    raw = model_apply(params, mspec, grids, bound, p, stage, fused=fused,
                      train_decoders=train_decoders)
    inside = jnp.all((p > bound[:, 0]) & (p < bound[:, 1]), axis=-1)
    occ = jnp.where(inside, raw[..., 3], 100.0)
    return jnp.concatenate([raw[..., :3], occ[..., None]], axis=-1)


def _zvals(key, rays_o, rays_d, gt_depth, bound, rspec: RenderSpec,
           with_depth: bool, occ_proxy=None):
    """Sample depths along each ray.  Returns (N, S) sorted z values."""
    far_bb = ray_aabb_far(jax.lax.stop_gradient(rays_o),
                          jax.lax.stop_gradient(rays_d), bound)[:, None] + 0.01

    if with_depth:
        d = gt_depth[:, None]
        near = d * 0.01
        max_d = jnp.max(gt_depth)
        far = jnp.clip(far_bb, 0.0, max_d * 1.2)
    else:
        near = jnp.full_like(far_bb, 0.01)
        far = far_bb

    if occ_proxy is not None:
        if rspec.lindisp:
            raise ValueError(
                "occ_guided sampling builds linear-in-depth probe bins and "
                "does not support lindisp=True; set occupancy_guided=False "
                "or lindisp=False")
        from nice_slam_tpu.ops import occ_guided_zvals
        z_vals = occ_guided_zvals(rays_o, rays_d, near, far, occ_proxy,
                                  bound, rspec.n_samples)
    else:
        z_vals = stratified_zvals(near, far, rspec.n_samples, rspec.lindisp)
    if rspec.perturb > 0.0:
        key, kp = jax.random.split(key)
        z_vals = perturb_zvals(kp, z_vals)

    if with_depth and rspec.n_surface > 0:
        z_surf = surface_zvals(gt_depth, rspec.n_surface, jnp.max(gt_depth))
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_surf], axis=-1), axis=-1)
    return z_vals


def render_rays(params, mspec: ModelSpec, grids, bound,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                key, rspec: RenderSpec, stage: str,
                gt_depth: Optional[jnp.ndarray] = None,
                decode_fn=None):
    """Render a batch of rays.

    gt_depth=None (a static choice — e.g. the coarse stage) disables
    surface sampling and uses scalar near (reference Renderer.py:88-92).

    decode_fn: optional override (M, 3) points -> raw (M, 4), replacing
    eval_points — the hook the sharded-grid path uses to psum feature
    gathers over a device mesh (parallel/grid_sharded.py).  Must include
    the out-of-AABB occupancy forcing.

    Returns (depth (N,), uncertainty (N,), color (N, 3), weights (N, S)).
    """
    if decode_fn is None:
        def decode_fn(pp):
            return eval_points(params, mspec, grids, bound, pp, stage,
                               fused=rspec.fused,
                               train_decoders=rspec.train_decoders)

    with_depth = gt_depth is not None and stage != "coarse"
    occ_proxy = (grids.get("occ_proxy")
                 if (rspec.occ_guided and stage != "coarse"
                     and isinstance(grids, dict)) else None)
    z_vals = _zvals(key, rays_o, rays_d,
                    gt_depth if with_depth else None, bound, rspec,
                    with_depth, occ_proxy=occ_proxy)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    n, s, _ = pts.shape
    raw = decode_fn(pts.reshape(-1, 3))
    raw = raw.reshape(n, s, 4)
    depth, var, color, weights = raw2outputs(raw, z_vals, rays_d,
                                             rspec.occupancy)

    if rspec.n_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        key, ki = jax.random.split(key)
        z_imp = sample_pdf(ki, z_mid, weights[..., 1:-1], rspec.n_importance,
                           det=(rspec.perturb == 0.0))
        z_imp = jax.lax.stop_gradient(z_imp)
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_imp], axis=-1), axis=-1)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        raw = decode_fn(pts.reshape(-1, 3))
        raw = raw.reshape(n, s + rspec.n_importance, 4)
        depth, var, color, weights = raw2outputs(raw, z_vals, rays_d,
                                                 rspec.occupancy)

    return depth, var, color, weights


@partial(jax.jit, static_argnames=("mspec", "rspec", "stage", "H", "W",
                                   "chunk", "with_depth"))
def _render_image_jit(params, mspec, grids, bound, c2w, intr, gt_depth,
                      key, rspec, stage, H, W, chunk, with_depth):
    from nice_slam_tpu.ops import image_rays

    fx, fy, cx, cy = intr
    rays_o, rays_d = image_rays(H, W, fx, fy, cx, cy, c2w)
    n = H * W
    n_pad = (-n) % chunk
    flat_o = jnp.concatenate(
        [rays_o.reshape(-1, 3), jnp.zeros((n_pad, 3))]).reshape(-1, chunk, 3)
    flat_d = jnp.concatenate(
        [rays_d.reshape(-1, 3), jnp.ones((n_pad, 3))]).reshape(-1, chunk, 3)
    if with_depth:
        flat_gt = jnp.concatenate(
            [gt_depth.reshape(-1), jnp.zeros((n_pad,))]).reshape(-1, chunk)
    else:
        flat_gt = jnp.zeros((flat_o.shape[0], chunk))
    keys = jax.random.split(key, flat_o.shape[0])

    def body(args):
        o, d, g, k = args
        depth, var, color, _ = render_rays(
            params, mspec, grids, bound, o, d, k, rspec, stage,
            gt_depth=g if with_depth else None)
        return depth, var, color

    depth, var, color = jax.lax.map(body, (flat_o, flat_d, flat_gt, keys))
    depth = depth.reshape(-1)[:n].reshape(H, W)
    var = var.reshape(-1)[:n].reshape(H, W)
    color = color.reshape(-1, 3)[:n].reshape(H, W, 3)
    return depth, var, color


def render_image(params, mspec: ModelSpec, grids, bound, c2w, camera,
                 key, rspec: RenderSpec, stage: str = "color",
                 gt_depth=None, chunk: int = 16384):
    """Full-image rendering in fixed-size chunks (reference
    Renderer.py:200-255).  `camera` carries (H, W, fx, fy, cx, cy)."""
    intr = (camera.fx, camera.fy, camera.cx, camera.cy)
    return _render_image_jit(
        params, mspec, grids, bound, c2w, intr,
        gt_depth if gt_depth is not None else jnp.zeros((camera.H, camera.W)),
        key, rspec, stage, camera.H, camera.W, chunk,
        gt_depth is not None)


def regulation_sigma(params, mspec: ModelSpec, grids, bound,
                     rays_o, rays_d, gt_depth, key, n_samples: int,
                     stage: str = "color"):
    """iMAP* free-space regulation: sigma sampled along [0, 0.85*depth]
    with stratified jitter (reference Renderer.py:258-296)."""
    d = gt_depth[:, None]
    z_vals = stratified_zvals(jnp.zeros_like(d), d * 0.85, n_samples)
    z_vals = perturb_zvals(key, z_vals)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    raw = eval_points(params, mspec, grids, bound, pts.reshape(-1, 3), stage)
    return raw[:, 3]
