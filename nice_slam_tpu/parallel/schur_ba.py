"""Schur-reduced Gauss-Newton pose refinement for the mapping BA.

The reference's local BA is purely first-order: keyframe poses ride the
same Adam optimizer as the grids, with a small stage-gated learning rate
(src/Mapper.py:346-363, 417-419, 521-536).  Convergence of the pose block
is therefore tied to the feature-learning schedule.  This module adds the
second-order pose solve the multi-chip design calls for (BASELINE.json
north star): the joint render objective's normal equations, with the grid
feature block ELIMINATED, solved exactly for the pose block.

Why the reduced system is per-pose block-diagonal
-------------------------------------------------
The full Gauss-Newton system over (poses p, features f) is

    [ Hpp  Hpf ] [dp]   [bp]
    [ Hfp  Hff ] [df] = [bf]

and the Schur complement for poses is S = Hpp − Hpf Hff⁻¹ Hfp.  Here the
feature block is millions of grid coefficients being simultaneously
optimized by Adam; eliminating it through its (diagonally-dominated,
Adam-preconditioned) Hessian contributes the pose-pose coupling term.
We take the standard alternation approximation: features are held at
their current Adam iterate during the pose solve (Hpf ≡ 0), which makes
S = Hpp.  Hpp itself is EXACTLY block-diagonal per pose — each sampled
ray is generated from one window frame's camera, so residual ∂/∂pose
cross-terms vanish — and the whole solve reduces to one damped 7x7
system per window frame.  Features then re-adapt in the next mapping
event's Adam stages (the outer alternation).

This is the structure that scales: on an N-chip mesh each device renders
a disjoint ray shard and contributes a partial (H, b, sse); ONE psum of
(Wn x 7 x 7 + 2 Wn x 7) floats per GN iteration reduces the system, and
the tiny solve replicates on every chip.  Compare: the feature gradients
psummed by the first-order path are tens of MB.  dp_map_optimize wires
this in over its mesh (parallel/data_parallel.py); the single-chip path
uses the same code with a no-op reduction.

Each iteration is a GUARDED (trust-region-flavored) step: the candidate
pose is evaluated on the same ray sample and accepted per frame only if
it does not increase the weighted SSE — one extra forward render per
iteration buys monotone descent even on a half-trained map, where the
raw quadratic model can overshoot badly.

Residuals are depth residuals weighted by the same robust terms as the
mapping loss (valid-depth mask, in-bound mask, 1/sqrt(depth variance)),
so the GN step optimizes (the quadratic model of) the depth term the
Adam BA also descends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nice_slam_tpu.camera import Camera
from nice_slam_tpu.ops import cam_from_tensor, ray_aabb_far
from nice_slam_tpu.ops.rays import gather_pixels, rays_from_uv, sample_pixels
from nice_slam_tpu.render import RenderSpec, render_rays


def _frame_residuals(cam7, i, j, gt_d, params, grids, bound, key,
                     camera: Camera, rspec: RenderSpec, mspec):
    """Weighted depth residuals for one window frame at pose `cam7`.

    i, j: (P,) pixel coordinates; gt_d: (P,) sensor depth.
    Returns (P,) residuals (zeroed where masked)."""
    c2w = cam_from_tensor(cam7)
    rays_o, rays_d = rays_from_uv(i, j, c2w, camera.fx, camera.fy,
                                  camera.cx, camera.cy)
    depth, var, _color, _w = render_rays(
        params, mspec, grids, bound, rays_o, rays_d, key, rspec, "color",
        gt_depth=gt_d)
    # weights are data terms, not functions of the pose being solved for:
    # freeze them so J is the Jacobian of a plain weighted LSQ residual
    t_exit = ray_aabb_far(jax.lax.stop_gradient(rays_o),
                          jax.lax.stop_gradient(rays_d), bound)
    m = (gt_d > 0) & (t_exit >= gt_d)
    w = jax.lax.stop_gradient(
        m.astype(jnp.float32) / jnp.sqrt(var + 1e-10))
    return (depth - gt_d) * w


def _frame_keys(key, wn: int):
    kpix, krender = jax.random.split(key)
    return (jax.random.split(kpix, wn), jax.random.split(krender, wn))


def pose_system(params, grids, bound, window, cams, key, camera: Camera,
                rspec: RenderSpec, mspec, pixels_per_frame: int,
                valid_mask):
    """Per-frame Gauss-Newton system from the key-derived ray sample.

    Returns (H (Wn, 7, 7), b (Wn, 7), sse (Wn,)).  Pure function of its
    inputs — safe inside shard_map; callers psum H/b/sse over the mesh
    axis to reduce a sharded ray batch."""
    wn = cams.shape[0]
    pix_keys, ren_keys = _frame_keys(key, wn)

    def per_frame(cam7, kp, kr, depth_, valid):
        i, j = sample_pixels(kp, pixels_per_frame, 0, camera.H, 0, camera.W)
        gt_d = gather_pixels(depth_, i, j)

        def resid(c):
            return _frame_residuals(c, i, j, gt_d, params, grids, bound,
                                    kr, camera, rspec, mspec)

        r = resid(cam7)
        # 7 JVP columns (forward-mode: the render runs once per tangent);
        # rays depend on the pose, so jacfwd differentiates through ray
        # generation AND the volume render.  Requires the plain_interp()
        # trace context (the moment-scatter custom_vjp rejects jvp).
        J = jax.jacfwd(resid)(cam7)            # (P, 7)
        v = valid.astype(jnp.float32)
        return (J.T @ J) * v, (J.T @ r) * v, jnp.sum(r * r) * v

    H, b, sse = jax.vmap(per_frame)(cams, pix_keys, ren_keys,
                                    window["depths"], valid_mask)
    return H, b, sse


def residual_sse(params, grids, bound, window, cams, key, camera: Camera,
                 rspec: RenderSpec, mspec, pixels_per_frame: int,
                 valid_mask):
    """Per-frame weighted SSE on the SAME key-derived ray sample as
    pose_system (forward only — the guard evaluation)."""
    wn = cams.shape[0]
    pix_keys, ren_keys = _frame_keys(key, wn)

    def per_frame(cam7, kp, kr, depth_, valid):
        i, j = sample_pixels(kp, pixels_per_frame, 0, camera.H, 0, camera.W)
        gt_d = gather_pixels(depth_, i, j)
        r = _frame_residuals(cam7, i, j, gt_d, params, grids, bound, kr,
                             camera, rspec, mspec)
        return jnp.sum(r * r) * valid.astype(jnp.float32)

    return jax.vmap(per_frame)(cams, pix_keys, ren_keys,
                               window["depths"], valid_mask)


def mask_count(bound, window, cams, key, camera: Camera,
               pixels_per_frame: int):
    """Per-frame count of VALID residual rays (the mask part of
    _frame_residuals — pose-dependent via the ray/AABB test, no render
    needed).  The guard needs it: a garbage candidate pose that pushes
    every ray out of bound zeroes all residual weights, so its SSE is
    trivially ~0 and would win the sse1 <= sse0 test — observed
    end-to-end as a 76 m trajectory explosion (round 4, seq_b nice +
    tracking GN)."""
    wn = cams.shape[0]
    pix_keys, _ = _frame_keys(key, wn)

    def per_frame(cam7, kp, depth_):
        i, j = sample_pixels(kp, pixels_per_frame, 0, camera.H, 0, camera.W)
        gt_d = gather_pixels(depth_, i, j)
        c2w = cam_from_tensor(cam7)
        rays_o, rays_d = rays_from_uv(i, j, c2w, camera.fx, camera.fy,
                                      camera.cx, camera.cy)
        t_exit = ray_aabb_far(rays_o, rays_d, bound)
        return jnp.sum(((gt_d > 0) & (t_exit >= gt_d))
                       .astype(jnp.float32))

    return jax.vmap(per_frame)(cams, pix_keys, window["depths"])


def gn_pose_update(cams, H, b, cam_lr_mask, damping: float,
                   delta_max: float = 0.2):
    """Damped per-frame solve: (H + λ·(diag(H) + εI)) Δ = b, applied only
    where cam_lr_mask > 0 (the BA convention: oldest + invalid window
    slots stay frozen, Mapper.py:349-351).

    The step is trust-region clamped to ‖Δ‖ <= delta_max (in quat‖trans
    units): on weakly-constrained geometry the quadratic model can
    propose huge steps whose SSE happens to pass the sampled guard —
    iterated, that walks the pose off the map (observed on seq_b with
    the tracking polish).  A pose within delta_max of the optimum still
    converges in 1-2 clamped iterations."""
    eye = jnp.eye(7)

    def solve(Hf, bf):
        d = jnp.diagonal(Hf)
        A = Hf + damping * (jnp.diag(d) + eye)
        return jnp.linalg.solve(A, bf)

    delta = jax.vmap(solve)(H, b)              # (Wn, 7)
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
    norm = jnp.linalg.norm(delta, axis=1, keepdims=True)
    delta = delta * jnp.minimum(1.0, delta_max / (norm + 1e-12))
    step_mask = (cam_lr_mask > 0).astype(cams.dtype)[:, None]
    return cams - delta * step_mask


def gn_iteration(params, grids, bound, window, cams, cam_lr_mask, key,
                 camera: Camera, rspec: RenderSpec, mspec,
                 pixels_per_frame: int, damping: float, reduce_fn=None):
    """One guarded GN iteration.  reduce_fn(tree) -> tree: identity on one
    chip, a psum over the mesh axis in the sharded paths (applied to both
    the normal equations and the guard SSEs).  Returns (cams, sse)."""
    valid_mask = window["valid"]
    H, b, sse0 = pose_system(params, grids, bound, window, cams, key,
                             camera, rspec, mspec, pixels_per_frame,
                             valid_mask)
    if reduce_fn is not None:
        H, b, sse0 = reduce_fn((H, b, sse0))
    cand = gn_pose_update(cams, H, b, cam_lr_mask, damping)
    sse1 = residual_sse(params, grids, bound, window, cand, key, camera,
                        rspec, mspec, pixels_per_frame, valid_mask)
    # the SSE compares WEIGHTED residuals, and the weights vanish for
    # rays a candidate pushes out of bound — an sse1 of ~0 from an empty
    # mask is a degenerate win, not an improvement.  Require the
    # candidate to keep at least half the current pose's valid rays.
    cnt0 = mask_count(bound, window, cams, key, camera, pixels_per_frame)
    cnt1 = mask_count(bound, window, cand, key, camera, pixels_per_frame)
    if reduce_fn is not None:
        sse1, cnt0, cnt1 = reduce_fn((sse1, cnt0, cnt1))
    accept = (sse1 <= sse0) & (cnt1 >= 0.5 * cnt0) & (cam_lr_mask > 0)
    cams = jnp.where(accept[:, None], cand, cams)
    return cams, jnp.where(accept, sse1, sse0)


def schur_pose_refine(params, grids, bound, window, cams, cam_lr_mask, key,
                      camera: Camera, rspec: RenderSpec, mspec,
                      n_iters: int, pixels_per_frame: int, damping: float,
                      reduce_fn=None):
    """n_iters guarded GN pose iterations (fresh ray sample each)."""
    if n_iters <= 0:
        return cams
    from nice_slam_tpu.ops.grid import plain_interp

    def step(cams_, k):
        return gn_iteration(params, grids, bound, window, cams_,
                            cam_lr_mask, k, camera, rspec, mspec,
                            pixels_per_frame, damping,
                            reduce_fn=reduce_fn)

    keys = jax.random.split(key, n_iters)
    # jacfwd can't pass through the moment-scatter custom_vjp; trace the
    # GN loop against the plain interpolation (forward decode only — no
    # grid gradients are taken here, so nothing is lost)
    with plain_interp():
        cams, _ = jax.lax.scan(step, cams, keys)
    return cams
