"""Scene-scale model parallelism: feature grids sharded into X-slabs.

The reference bounds memory per scene with hierarchical grids and bounds
the optimized set with frustum selection (reference src/Mapper.py:93-164);
it has no multi-device story at all (SURVEY §2.2).  This module is the
"scale the scene volume across chips" design from SURVEY §5/§7 step 8:

- the fine/color/middle grids are split into X-axis **slabs with a
  one-plane halo**, laid out over the mesh's `model` axis — per-chip HBM
  now bounds the *slab*, not the scene;
- ray batches are sharded over the `data` axis (same scaling as
  parallel/data_parallel.py);
- per decode, each device interpolates only the points whose base cell
  lives in its slab and the per-point feature rows are **psum'd over
  `model`** — an (N, c_dim) collective on ICI instead of grid replication;
- gradients land in each slab locally; each step the halo plane's
  gradient is **ppermute'd to its owning neighbor** and the refreshed
  owner plane ppermute'd back — a classic halo exchange;
- decoder/camera gradients are psum'd over `data` (they are replicated
  along `model` since every model shard sees identical psum'd features).

The MLP decode is replicated along `model` (it is tiny — hidden 32); the
grid memory, the gather/scatter bandwidth, and the ray work are what
shard.  Everything is shape-static and runs as ONE jitted shard_map per
mapping call, mirroring mapping.map_optimize's staged schedule exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nice_slam_tpu.camera import Camera
from nice_slam_tpu.mapping import MapSpec, _lr_tree, _stop_frozen
from nice_slam_tpu.models.decoders import ModelSpec, model_apply_feats
from nice_slam_tpu.ops import adam_init, adam_update
from nice_slam_tpu.ops.grid import grid_coords, normalize_coords
from nice_slam_tpu.ops.rays import ray_aabb_far
from nice_slam_tpu.render import RenderSpec, render_rays

SHARDED_LEVELS = ("middle", "fine", "color")


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    devs = np.asarray(jax.devices()[: n_data * n_model])
    return Mesh(devs.reshape(n_data, n_model), ("data", "model"))


# ---------------------------------------------------------------------------
# Slab layout

def slab_rows(nx: int, n_shards: int) -> int:
    """Owned rows per shard (ceil split)."""
    return -(-nx // n_shards)


def shard_grid_x(grid: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """(nx, ny, nz, C) -> stacked slabs (n_shards, sx+1, ny, nz, C).

    Shard s owns global X rows [s*sx, (s+1)*sx); row sx of its slab is a
    HALO copy of the next shard's first owned row (interpolation of a
    point whose base cell is the shard's last owned row reads x0+1).
    Zero-padding beyond nx is never read (base cells are clipped to
    nx-2, so the largest row touched is nx-1)."""
    nx = grid.shape[0]
    sx = slab_rows(nx, n_shards)
    pad = n_shards * sx + 1 - nx
    g = jnp.concatenate(
        [grid, jnp.zeros((pad,) + grid.shape[1:], grid.dtype)], axis=0)
    return jnp.stack([g[s * sx: s * sx + sx + 1] for s in range(n_shards)])


def unshard_grid_x(slabs: jnp.ndarray, nx: int) -> jnp.ndarray:
    """Inverse of shard_grid_x (drops halos and padding)."""
    own = slabs[:, :-1]  # (n, sx, ny, nz, C)
    return own.reshape((-1,) + slabs.shape[2:])[:nx]


def shard_grids(grids: Dict[str, jnp.ndarray], n_shards: int,
                mesh: Mesh = None):
    """Shard every SHARDED_LEVELS grid; returns (slabs dict, shapes dict).

    With `mesh` given, slab arrays are device_put with the stacked axis on
    the `model` mesh axis (replicated over `data`)."""
    slabs, shapes = {}, {}
    for name in SHARDED_LEVELS:
        if name not in grids:
            continue
        shapes[name] = tuple(grids[name].shape[:3])
        s = shard_grid_x(grids[name], n_shards)
        if mesh is not None:
            s = jax.device_put(
                s, NamedSharding(mesh, P("model", None, None, None, None)))
        slabs[name] = s
    return slabs, shapes


# ---------------------------------------------------------------------------
# Per-device slab interpolation (runs inside shard_map)

def slab_interp(slab: jnp.ndarray, p_nor: jnp.ndarray,
                global_shape: Tuple[int, int, int], shard_idx, sx: int):
    """Trilinear interp of this device's slab at p_nor in [-1,1]^3 using
    GLOBAL voxel coordinates; rows not owned by this shard contribute 0.
    psum over the model axis reconstructs ops.grid.trilinear_interp
    exactly (each point has exactly one owner)."""
    nx, ny, nz = global_shape
    C = slab.shape[-1]
    u = grid_coords(p_nor, (nx, ny, nz))
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                  jnp.array([max(nx - 2, 0), max(ny - 2, 0),
                             max(nz - 2, 0)]))
    f = u - i0.astype(u.dtype)
    i1y = jnp.minimum(i0[:, 1] + 1, ny - 1)
    i1z = jnp.minimum(i0[:, 2] + 1, nz - 1)

    x0g, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    own = (x0g >= shard_idx * sx) & (x0g < (shard_idx + 1) * sx)
    xl0 = jnp.clip(x0g - shard_idx * sx, 0, sx - 1)
    xl1 = xl0 + 1  # <= sx: always inside the slab (halo plane)

    flat = slab.reshape(-1, C)
    ny_l, nz_l = slab.shape[1], slab.shape[2]

    def lin(ix, iy, iz):
        return (ix * ny_l + iy) * nz_l + iz

    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
    c000 = flat[lin(xl0, y0, z0)]
    c001 = flat[lin(xl0, y0, i1z)]
    c010 = flat[lin(xl0, i1y, z0)]
    c011 = flat[lin(xl0, i1y, i1z)]
    c100 = flat[lin(xl1, y0, z0)]
    c101 = flat[lin(xl1, y0, i1z)]
    c110 = flat[lin(xl1, i1y, z0)]
    c111 = flat[lin(xl1, i1y, i1z)]

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fx) + c1 * fx
    return jnp.where(own[:, None], out, 0.0)


def _gs_feats(slabs, bound, p, shapes, levels, axis="model"):
    """Gather per-point features for `levels` from sharded slabs: local
    masked interp + ONE psum over the model axis per level."""
    p_nor = normalize_coords(p, bound)
    idx = jax.lax.axis_index(axis)
    feats = {}
    for name in levels:
        sl = slabs[name]
        # slab arrives in shard_map with a leading singleton (stack axis)
        sl = sl[0] if sl.ndim == 5 else sl
        sx = sl.shape[0] - 1
        loc = slab_interp(sl, p_nor, shapes[name], idx, sx)
        feats[name] = jax.lax.psum(loc, axis)
    return feats


_STAGE_LEVELS = {"middle": ("middle",), "fine": ("middle", "fine"),
                 "color": ("middle", "fine", "color")}


def make_gs_decode_fn(params, mspec: ModelSpec, slabs, bound, shapes,
                      stage: str, axis: str = "model"):
    """(M, 3) points -> raw (M, 4) with sharded feature gathers; includes
    the out-of-AABB occupancy forcing (reference Renderer.py:38-61)."""
    def decode_fn(pp):
        feats = _gs_feats(slabs, bound, pp, shapes, _STAGE_LEVELS[stage],
                          axis)
        raw = model_apply_feats(params, mspec, pp, feats, stage)
        inside = jnp.all((pp > bound[:, 0]) & (pp < bound[:, 1]), axis=-1)
        occ = jnp.where(inside, raw[..., 3], 100.0)
        return jnp.concatenate([raw[..., :3], occ[..., None]], axis=-1)

    return decode_fn


# ---------------------------------------------------------------------------
# Sharded decode for scene-scale queries (mesher path)

def gs_eval_points(params, mspec: ModelSpec, slabs, bound, shapes,
                   pts: jnp.ndarray, stage: str, mesh: Mesh):
    """Decode raw (N, 4) with grids sharded over mesh axis 'model' and
    points sharded over 'data' (pad N to a multiple of n_data)."""
    rep = lambda t: jax.tree.map(lambda _: P(), t)
    slab_spec = jax.tree.map(lambda _: P("model"), slabs)

    def body(params_, slabs_, bound_, pts_):
        dec = make_gs_decode_fn(params_, mspec, slabs_, bound_, shapes,
                                stage)
        return dec(pts_)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep(params), slab_spec, P(), P("data")),
        out_specs=P("data"))
    return fn(params, slabs, bound, pts)


def gs_map_once(params, grids, bound, window, cams0, masks, cam_lr_mask,
                lr_factor, key, camera: Camera,
                stage_iters: Tuple[Tuple[str, int], ...],
                mapspec: MapSpec, rspec: RenderSpec, mspec: ModelSpec,
                mesh: Mesh):
    """Engine adapter: run ONE mapping optimization with the grids sharded
    into X-slabs over `mesh` axis 'model' and rays over 'data', from/to
    the engine's DENSE grid dict — the drop-in analogue of
    mapping.map_optimize for the grid-sharded mode (cfg tpu.grid_sharded).

    The dense->slab->dense round trip keeps the engine state, tracking
    path and checkpoints unchanged; the optimization itself (interp,
    backward scatter, halo exchange) runs fully sharded.  On a real
    multi-host deployment the slabs would stay resident (the round trip
    is a per-event reshape, not a host transfer)."""
    n_model = mesh.shape["model"]
    slabs, shapes = shard_grids(grids, n_model)
    mask_slabs = {n: shard_grid_x(masks[n], n_model) for n in slabs}
    params, slabs, cams, losses = gs_map_optimize(
        params, slabs, bound, window, cams0, mask_slabs, cam_lr_mask,
        lr_factor, key, camera, stage_iters, mapspec, rspec, mspec,
        shapes, mesh)
    new_grids = dict(grids)
    for name, sl in slabs.items():
        new_grids[name] = unshard_grid_x(sl, shapes[name][0])
    return params, new_grids, cams, losses


# ---------------------------------------------------------------------------
# Sharded mapping optimization

def gs_mapping_loss(tree, window, bound, shapes, key, camera: Camera,
                    stage: str, mapspec: MapSpec, rspec: RenderSpec,
                    mspec: ModelSpec):
    """mapping.mapping_loss with sharded-grid decode (NICE mode only).
    Ray sampling reuses mapping._window_rays (one source of truth for the
    dense sampler); the data-axis fold makes shards draw disjoint rays."""
    from nice_slam_tpu.mapping import _window_rays

    params, slabs, cams = tree["params"], tree["grids"], tree["cams"]
    pix = mapspec.pixels // window["colors"].shape[0]
    key = jax.random.fold_in(key, jax.lax.axis_index("data"))
    rays_o, rays_d, gt_d, gt_c, valid = _window_rays(
        key, window, cams, camera, pix)

    t_exit = ray_aabb_far(jax.lax.stop_gradient(rays_o),
                          jax.lax.stop_gradient(rays_d), bound)
    m = valid & (t_exit >= gt_d)

    key, kr = jax.random.split(key)
    decode_fn = make_gs_decode_fn(params, mspec, slabs, bound, shapes, stage)
    depth, var, color, _ = render_rays(
        params, mspec, None, bound, rays_o, rays_d, kr, rspec, stage,
        gt_depth=gt_d, decode_fn=decode_fn)

    dm = (gt_d > 0) & m
    loss = jnp.sum(jnp.abs(gt_d - depth) * dm)
    if stage == "color":
        loss = loss + mapspec.w_color_loss * jnp.sum(
            jnp.abs(gt_c - color) * m[:, None])
    return loss


def gs_map_optimize(params, slabs, bound, window, cams0, mask_slabs,
                    cam_lr_mask, lr_factor, key, camera: Camera,
                    stage_iters: Tuple[Tuple[str, int], ...],
                    mapspec: MapSpec, rspec: RenderSpec, mspec: ModelSpec,
                    shapes, mesh: Mesh):
    """Sharded-grid analogue of mapping.map_optimize (public wrapper —
    normalizes `shapes` to a hashable static tuple)."""
    shapes_t = tuple(sorted((n, tuple(s)) for n, s in dict(shapes).items()))
    return _gs_map_optimize(
        params, slabs, bound, window, cams0, mask_slabs, cam_lr_mask,
        lr_factor, key, camera, stage_iters, mapspec, rspec, mspec,
        shapes_t, mesh)


@partial(jax.jit, static_argnames=("camera", "stage_iters", "mapspec",
                                   "rspec", "mspec", "shapes_t", "mesh"))
def _gs_map_optimize(params, slabs, bound, window, cams0, mask_slabs,
                     cam_lr_mask, lr_factor, key, camera: Camera,
                     stage_iters: Tuple[Tuple[str, int], ...],
                     mapspec: MapSpec, rspec: RenderSpec, mspec: ModelSpec,
                     shapes_t, mesh: Mesh):
    """Sharded-grid analogue of mapping.map_optimize.

    slabs/mask_slabs: dicts of stacked slab arrays (n_model, sx+1, ...),
    model-axis sharded (see shard_grids); masks are the frustum masks cut
    into the same layout.  `shapes` is the static dict of global grid
    shapes.  Per-device ray budget = mapspec.pixels (total rays scale with
    the data axis).  Returns (params, slabs, cams, losses)."""
    shapes = dict(shapes_t)
    n_model = mesh.shape["model"]
    rep = lambda t: jax.tree.map(lambda _: P(), t)
    slab_spec = jax.tree.map(lambda _: P("model"), slabs)

    def body(params_, slabs_, bound_, window_, cams0_, masks_, clm_, lrf_,
             key_):
        tree = {"params": params_, "grids": slabs_, "cams": cams0_}
        opt = adam_init(tree)
        all_losses = []
        k = key_

        for stage, n_iters in stage_iters:
            if n_iters == 0:
                continue
            lr_tree, frozen = _lr_tree(tree, stage, mapspec, lrf_, clm_,
                                       ba=True)

            def floss(tr, kk, _stage=stage, _frozen=frozen):
                return gs_mapping_loss(
                    _stop_frozen(tr, _frozen), window_, bound_, shapes, kk,
                    camera, _stage, mapspec, rspec, mspec)

            def step(carry, kk, _stage=stage, _lr=lr_tree, _frozen=frozen,
                     _floss=floss):
                tr, op = carry
                loss, g = jax.value_and_grad(
                    lambda t: _floss(t, kk))(tr)
                # ray shards: sum loss + all grads over `data` (decoder/
                # cam grads are replicated along `model` by construction)
                loss = jax.lax.psum(loss, "data")
                g = jax.tree.map(lambda x: jax.lax.psum(x, "data"), g)
                g = dict(g)
                new_grids_g = {}
                for name, gg in g["grids"].items():
                    gg = gg[0] if gg.ndim == 5 else gg  # drop stack axis
                    sx = gg.shape[0] - 1
                    # halo exchange: this slab's halo-plane gradient
                    # belongs to the right neighbor's first owned plane
                    from_left = jax.lax.ppermute(
                        gg[sx], "model",
                        [(s, s + 1) for s in range(n_model - 1)])
                    gg = gg.at[0].add(from_left)
                    gg = gg.at[sx].set(jnp.zeros_like(gg[sx]))
                    m = masks_[name]
                    m = m[0] if m.ndim == 5 else m
                    gg = gg * m
                    new_grids_g[name] = gg[None] if \
                        g["grids"][name].ndim == 5 else gg
                g["grids"] = new_grids_g
                tr, op = adam_update(tr, g, op, _lr, frozen=_frozen)
                # refresh the halo plane from the right neighbor's
                # freshly-updated first owned plane
                new_slabs = {}
                for name, sl in tr["grids"].items():
                    sl2 = sl[0] if sl.ndim == 5 else sl
                    sx = sl2.shape[0] - 1
                    halo = jax.lax.ppermute(
                        sl2[0], "model",
                        [(s + 1, s) for s in range(n_model - 1)])
                    keep_last = jax.lax.axis_index("model") == n_model - 1
                    halo = jnp.where(keep_last, sl2[sx], halo)
                    sl2 = sl2.at[sx].set(halo)
                    new_slabs[name] = sl2[None] if sl.ndim == 5 else sl2
                tr = dict(tr)
                tr["grids"] = new_slabs
                return (tr, op), loss

            k, ks = jax.random.split(k)
            keys = jax.random.split(ks, n_iters)
            (tree, opt), losses = jax.lax.scan(step, (tree, opt), keys)
            all_losses.append(losses)

        return (tree["params"], tree["grids"], tree["cams"],
                jnp.concatenate(all_losses) if all_losses
                else jnp.zeros((0,)))

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep(params), slab_spec, P(), rep(window), P(),
                  jax.tree.map(lambda _: P("model"), mask_slabs), P(), P(),
                  P()),
        out_specs=(rep(params), slab_spec, P(), P()),
    )
    return fn(params, slabs, bound, window, cams0, mask_slabs, cam_lr_mask,
              jnp.asarray(lr_factor, jnp.float32), key)
