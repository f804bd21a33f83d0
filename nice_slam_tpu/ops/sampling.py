"""Depth sampling along rays: stratified bins, depth-guided surface samples,
and hierarchical inverse-CDF resampling.

Shape-static versions of the reference's samplers
(src/utils/Renderer.py:112-170, src/common.py:19-63): the per-ray
"depth hole" special case becomes a `jnp.where` select instead of boolean
indexing so batch shapes never change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_zvals(near, far, n: int, lindisp: bool = False):
    """Evenly spaced z values between per-ray near/far.

    near/far broadcast against (..., 1); returns (..., n)."""
    t = jnp.linspace(0.0, 1.0, n)
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


def perturb_zvals(key, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter within each bin (reference Renderer.py:159-166)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t = jax.random.uniform(key, z_vals.shape)
    return lower + (upper - lower) * t


def surface_zvals(gt_depth: jnp.ndarray, n_surface: int, max_depth):
    """Depth-guided samples: [0.95, 1.05]*d for valid-depth rays, uniform
    [0.001, max_depth] for depth holes (reference Renderer.py:121-150).

    gt_depth: (N,). Returns (N, n_surface)."""
    t = jnp.linspace(0.0, 1.0, n_surface)
    d = gt_depth[..., None]
    z_surf = 0.95 * d * (1.0 - t) + 1.05 * d * t
    z_hole = 0.001 * (1.0 - t) + max_depth * t
    return jnp.where(d > 0, z_surf, jnp.broadcast_to(z_hole, z_surf.shape))


def occ_guided_zvals(rays_o, rays_d, near, far, occ_proxy, bound, n: int,
                     n_probe: int = 32, floor: float = 0.05):
    """Occupancy-guided stratified sampling (static-shape NerfAcc-style
    placement; see PAPERS.md): probe a cheap occupancy proxy grid at
    n_probe uniform bin centers along each ray, then place the SAME n
    samples by deterministic inverse-CDF over the (floored) per-bin
    occupancy — samples concentrate where matter can be, empty space gets
    the floor share.  Shapes stay static: this reallocates samples, never
    drops them.

    EXPERIMENTAL — measured to DEGRADE depth-supervised SLAM (39-72 cm vs
    7 cm baseline ATE on the 40-frame synthetic scene): the L1 depth loss
    relies on free-space samples to carve emptiness; starving them leaves
    floaters that derail tracking.  Off by default; see README.

    occ_proxy: (Nx, Ny, Nz, 1) in [0, 1] (stop-gradient applied here —
    the proxy steers sampling, it is not a trainable quantity).
    Returns (N, n) sorted z values in [near, far]."""
    from nice_slam_tpu.ops.grid import normalize_coords, trilinear_interp

    occ_proxy = jax.lax.stop_gradient(occ_proxy)
    edges = stratified_zvals(near, far, n_probe + 1)       # (N, P+1)
    mids = 0.5 * (edges[..., 1:] + edges[..., :-1])        # (N, P)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mids[..., None]
    pn = normalize_coords(pts.reshape(-1, 3), bound)
    w = trilinear_interp(occ_proxy, pn)[..., 0].reshape(mids.shape)
    w = jnp.clip(w, floor, 1.0)
    # bins include near/far endpoints so the first/last half probe-bin
    # stays covered (the uniform sampler places samples AT near/far)
    bins = jnp.concatenate([near, mids, far], axis=-1)     # (N, P+2)
    w_edge = jnp.concatenate(
        [w[..., :1], 0.5 * (w[..., 1:] + w[..., :-1]), w[..., -1:]],
        axis=-1)                                           # (N, P+1)
    z = sample_pdf(None, bins, w_edge, n, det=True)
    return z


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray, n: int, det: bool = False):
    """Hierarchical inverse-CDF sampling (reference src/common.py:19-63).

    bins: (B, M), weights: (B, M-1)... same layout as the reference: bins are
    interval midpoints, weights are interior weights. Returns (B, n).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B, M)

    if det:
        u = jnp.linspace(0.0, 1.0, n)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bins_lo = jnp.take_along_axis(bins, below, axis=-1)
    bins_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)
