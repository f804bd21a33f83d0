"""Alpha compositing of raw decoder outputs along rays.

Matches the reference's `raw2outputs_nerf_color` (src/common.py:204-245):
occupancy mode uses alpha = sigmoid(10 * raw); density mode uses
alpha = 1 - exp(-relu(raw) * dist) with dists scaled by |ray_d|.  Also
returns the depth variance ("uncertainty") used by the tracker's robust
loss.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """cumprod shifted right by one with a leading 1 (transmittance)."""
    ones = jnp.ones_like(x[..., :1])
    return jnp.cumprod(jnp.concatenate([ones, x[..., :-1]], axis=-1), axis=-1)


def raw2outputs(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                occupancy: bool = True):
    """Composite raw (N, S, 4) predictions into per-ray outputs.

    Returns (depth (N,), depth_var (N,), rgb (N,3), weights (N,S)).
    """
    rgb = raw[..., :3]
    if occupancy:
        alpha = jax.nn.sigmoid(10.0 * raw[..., 3])
    else:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
        )
        dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)

    weights = alpha * exclusive_cumprod(1.0 - alpha + 1e-10)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    resid = z_vals - depth[..., None]
    depth_var = jnp.sum(weights * resid * resid, axis=-1)
    return depth, depth_var, rgb_map, weights
