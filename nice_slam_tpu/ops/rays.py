"""Ray generation and pixel sampling.

Camera convention matches the reference (x right, y up, -z forward):
``dir = [(i-cx)/fx, -(j-cy)/fy, -1]`` rotated by the c2w rotation
(reference src/common.py:74-89, 248-266).  All functions are shape-static;
random pixel selection threads explicit jax PRNG keys instead of the
reference's global torch RNG (src/common.py:92-122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_dirs(i: jnp.ndarray, j: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Camera-frame ray directions for pixel coords i (x/col), j (y/row)."""
    return jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )


def rays_from_uv(i, j, c2w, fx, fy, cx, cy):
    """World-space rays for pixel coords. c2w is (3|4, 4).

    Returns (rays_o (N,3), rays_d (N,3)).
    """
    dirs = ray_dirs(i, j, fx, fy, cx, cy)  # (N, 3)
    # world_dir[k] = sum_m R[k, m] * dir[m].  Full f32 precision: pose
    # geometry must not go through the fast low-precision matmul path.
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def image_rays(H: int, W: int, fx, fy, cx, cy, c2w):
    """Rays for every pixel of an HxW image. Returns ((H,W,3), (H,W,3))."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = ray_dirs(i, j, fx, fy, cx, cy)  # (H, W, 3)
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_pixels(key, n: int, H0: int, H1: int, W0: int, W1: int):
    """Sample n pixel coords uniformly (with replacement) from the region
    rows [H0, H1) x cols [W0, W1).  Returns float (i, j) = (x, y).

    Equivalent in distribution to the reference's flat-index sampling over
    the cropped meshgrid (src/common.py:92-122).
    """
    ki, kj = jax.random.split(key)
    i = jax.random.randint(ki, (n,), W0, W1).astype(jnp.float32)
    j = jax.random.randint(kj, (n,), H0, H1).astype(jnp.float32)
    return i, j


def gather_pixels(img: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray):
    """Gather values at integer pixel coords (i=x/col, j=y/row).

    img: (H, W) or (H, W, C)."""
    return img[j.astype(jnp.int32), i.astype(jnp.int32)]


def ray_aabb_far(rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: jnp.ndarray):
    """Distance along each ray to its exit from the scene AABB.

    Matches the reference's per-ray far computation
    (src/utils/Renderer.py:98-105): t = (bound - o)/d per axis/face,
    far = min over axes of max over the two faces.

    bound: (3, 2).  Returns (N,) float.
    """
    d = jnp.where(jnp.abs(rays_d) < 1e-10, 1e-10, rays_d)
    t = (bound[None, :, :] - rays_o[..., None]) / d[..., None]  # (N, 3, 2)
    return jnp.min(jnp.max(t, axis=2), axis=1)
