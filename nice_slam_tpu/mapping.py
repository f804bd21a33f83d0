"""Keyframe-window joint mapping (TPU re-design of src/Mapper.py).

One call = one `optimize_map` of the reference (Mapper.py:230-540), fully
jitted:

- the staged middle -> fine -> color schedule becomes three `lax.scan`s
  with static iteration counts (the stage boundaries are static given
  num_joint_iters; Mapper.py:403-419),
- the 5-6 Adam param groups with per-stage LRs become ONE pytree Adam with
  a per-stage learning-rate tree (ops/optim.py); Adam moments persist
  across the stages of a call, fresh per call — exactly like the
  reference's per-call Adam,
- frustum feature selection (Mapper.py:93-164, 297-333) becomes a voxel
  mask multiplied into the grid gradients: non-visible features receive
  exactly zero update (with fresh Adam state this is identical to
  excluding them from the optimizer),
- local BA optimizes window camera 7-vectors with a per-slot LR mask
  (oldest + invalid slots frozen; Mapper.py:346-363, 417-419).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from nice_slam_tpu.camera import Camera
from nice_slam_tpu.keyframes import project_points
from nice_slam_tpu.models.decoders import ModelSpec
from nice_slam_tpu.ops import adam_init, adam_update, cam_from_tensor
from nice_slam_tpu.ops.rays import (
    gather_pixels,
    ray_aabb_far,
    rays_from_uv,
    sample_pixels,
)
from nice_slam_tpu.render import RenderSpec, regulation_sigma, render_rays


@dataclass(frozen=True)
class StageLR:
    decoders: float = 0.0
    coarse: float = 0.0
    middle: float = 0.0
    fine: float = 0.0
    color: float = 0.0


# Defaults mirror configs/nice_slam.yaml:71-95 in the reference.
DEFAULT_STAGE_LR = {
    "coarse": StageLR(coarse=0.001),
    "middle": StageLR(middle=0.1),
    "fine": StageLR(middle=0.005, fine=0.005),
    "color": StageLR(decoders=0.005, middle=0.005, fine=0.005, color=0.005),
}


@dataclass(frozen=True)
class MapSpec:
    pixels: int = 1000
    window_size: int = 5
    w_color_loss: float = 0.2
    middle_iter_ratio: float = 0.4
    fine_iter_ratio: float = 0.6
    fix_fine: bool = True
    fix_color: bool = False
    # Deviation knob for pretrain-free runs: the reference freezes the
    # (pretrained) middle decoder; without its checkpoints, training it
    # online recovers map quality (see models/pretrain.py docstring).
    train_middle: bool = False
    frustum_selection: bool = True
    keyframe_selection: str = "overlap"
    keyframe_every: int = 50
    ba: bool = True                    # config-level switch (BA starts >4 kfs)
    ba_cam_lr: float = 0.001
    # Second-order pose refinement after the Adam stages (parallel/
    # schur_ba.py): n damped Gauss-Newton iterations on the window poses
    # with the feature block eliminated (Schur-reduced under the
    # frozen-feature alternation).  0 = off (the reference is first-order
    # only).  Runs only when BA is active.
    pose_gn_iters: int = 0
    pose_gn_pixels: int = 200
    pose_gn_damping: float = 1e-3
    nice: bool = True
    coarse_mapper: bool = False
    imap_decoders_lr: float = 0.0002
    # optional global-norm gradient clipping (0 = off).  The reference has
    # no clipping; this is a stability net for pretrain-free decoders.
    grad_clip: float = 0.0
    stage_lr: Tuple[Tuple[str, StageLR], ...] = tuple(
        sorted(DEFAULT_STAGE_LR.items()))

    def stage_lr_table(self):
        return dict(self.stage_lr)

    def stage_iters(self, num_joint_iters: int):
        """Static per-stage iteration counts from the reference's
        iter-ratio thresholds (Mapper.py:403-410)."""
        if self.coarse_mapper:
            return {"coarse": num_joint_iters, "middle": 0, "fine": 0,
                    "color": 0}
        n = num_joint_iters
        mid_end = int(n * self.middle_iter_ratio)
        fine_end = int(n * self.fine_iter_ratio)
        n_mid = min(mid_end + 1, n)
        n_fine = max(min(fine_end + 1, n) - n_mid, 0)
        n_color = n - n_mid - n_fine
        return {"coarse": 0, "middle": n_mid, "fine": n_fine,
                "color": n_color}


# ---------------------------------------------------------------------------
# Frustum feature selection

def bilinear_sample_2d(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear lookup of img (H, W) at x=u, y=v (cv2.remap INTER_LINEAR
    semantics up to border handling; callers mask out-of-image anyway)."""
    H, W = img.shape
    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(u, jnp.int32)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(v, jnp.int32)
    fx = u - x0
    fy = v - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy)
            + i10 * (1 - fx) * fy + i11 * fx * fy)


def grid_node_points(bound, shape: Tuple[int, int, int]) -> jnp.ndarray:
    """World positions of a grid's nodes: align-corners linspace over the
    AABB per axis — the SAME convention trilinear_interp reads at
    (ops/grid.py grid_coords).  Returns (Nx*Ny*Nz, 3)."""
    nx, ny, nz = shape
    xs = jnp.linspace(bound[0, 0], bound[0, 1], nx)
    ys = jnp.linspace(bound[1, 0], bound[1, 1], ny)
    zs = jnp.linspace(bound[2, 0], bound[2, 1], nz)
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)


@partial(jax.jit, static_argnames=("camera", "shape"))
def frustum_mask(bound, shape: Tuple[int, int, int], c2w, depth,
                 camera: Camera):
    """Voxel visibility mask for one grid (reference Mapper.py:93-164):
    voxel centers projected into the current depth image; keep voxels
    in-frustum with -z <= depth + 0.5, plus all voxels within 0.5 m of the
    camera center.  Returns (Nx, Ny, Nz) bool."""
    nx, ny, nz = shape
    pts = grid_node_points(bound, shape)

    u, v, z = project_points(pts, c2w, camera)
    d_at = bilinear_sample_2d(depth, u, v)
    d_at = jnp.where(d_at == 0, jnp.max(d_at), d_at)
    mask = ((u < camera.W) & (u > 0) & (v < camera.H) & (v > 0)
            & (0 <= -z) & (-z <= d_at + 0.5))

    cam_o = c2w[:3, 3]
    dist2 = jnp.sum((pts - cam_o) ** 2, axis=-1)
    mask = mask | (dist2 < 0.25)
    return mask.reshape(nx, ny, nz)


def grid_masks(grids, bound, c2w, depth, camera: Camera, enabled: bool,
               coarse_bound_enlarge: int = 2):
    """Frustum masks for every grid level; coarse is always fully
    optimizable (Mapper.py:113-115)."""
    masks = {}
    for name, g in grids.items():
        if not enabled or name in ("coarse", "occ_proxy"):
            masks[name] = jnp.ones(g.shape[:3] + (1,), g.dtype)
        else:
            m = frustum_mask(bound, g.shape[:3], c2w, depth, camera)
            masks[name] = m[..., None].astype(g.dtype)
    return masks


@partial(jax.jit, static_argnames=("camera", "mapspec", "ba",
                                   "coarse_bound_enlarge"))
def prepare_mapping(key, store, color, depth, cur_c2w, grids, bound,
                    camera: Camera, mapspec: MapSpec, ba: bool,
                    coarse_bound_enlarge: int = 2):
    """All pre-optimization glue in ONE dispatch: keyframe selection,
    window assembly, frustum masks, camera tensors and the BA
    learning-rate mask (oldest + invalid slots frozen,
    Mapper.py:267-272, 346-363)."""
    from nice_slam_tpu.keyframes import (
        build_window, select_keyframes_global, select_keyframes_overlap)
    from nice_slam_tpu.ops import tensor_from_cam

    ksel, key = jax.random.split(key)
    k = mapspec.window_size - 2
    if mapspec.keyframe_selection == "overlap":
        slots, valid = select_keyframes_overlap(
            ksel, store, color, depth, cur_c2w, camera, k)
    else:
        slots, valid = select_keyframes_global(ksel, store, k)
    window = build_window(store, slots, valid, color, depth, cur_c2w)

    masks = grid_masks(grids, bound, cur_c2w, depth, camera,
                       mapspec.frustum_selection and mapspec.nice,
                       coarse_bound_enlarge)
    cams0 = tensor_from_cam(window["c2ws"][:, :3, :])

    wn = window["valid"].shape[0]
    if ba:
        sl = window["slots"][:-1]
        va = window["valid"][:-1]
        oldest_pos = jnp.argmin(jnp.where(va, sl, jnp.iinfo(jnp.int32).max))
        cam_lr_mask = window["valid"].astype(jnp.float32)
        cam_lr_mask = cam_lr_mask.at[oldest_pos].set(0.0)
    else:
        cam_lr_mask = jnp.zeros((wn,), jnp.float32)
    return window, masks, cams0, cam_lr_mask


# ---------------------------------------------------------------------------
# Loss

def _window_rays(key, window, cams, camera: Camera, pix_per_frame: int):
    """Sample pix_per_frame pixels from every window frame and build rays
    from the (optimizable) camera tensors.  Returns flattened batches."""
    wn = window["colors"].shape[0]
    c2ws = cam_from_tensor(cams)  # (Wn, 3, 4)
    keys = jax.random.split(key, wn)

    def per_frame(k, c2w, color, depth):
        i, j = sample_pixels(k, pix_per_frame, 0, camera.H, 0, camera.W)
        o, d = rays_from_uv(i, j, c2w, camera.fx, camera.fy, camera.cx,
                            camera.cy)
        return o, d, gather_pixels(depth, i, j), gather_pixels(color, i, j)

    o, d, gd, gc = jax.vmap(per_frame)(keys, c2ws, window["colors"],
                                       window["depths"])
    valid = jnp.repeat(window["valid"], pix_per_frame)
    return (o.reshape(-1, 3), d.reshape(-1, 3), gd.reshape(-1),
            gc.reshape(-1, 3), valid)


def mapping_loss(tree, window, bound, key, camera: Camera, stage: str,
                 mapspec: MapSpec, rspec: RenderSpec, mspec: ModelSpec):
    """One mapping loss evaluation (Mapper.py:430-501): masked L1 depth +
    (color stage) unmasked L1 color; iMAP* adds sigma regulation."""
    params, grids, cams = tree["params"], tree["grids"], tree["cams"]
    pix = mapspec.pixels // window["colors"].shape[0]
    rays_o, rays_d, gt_d, gt_c, valid = _window_rays(
        key, window, cams, camera, pix)

    if mapspec.nice:
        t_exit = ray_aabb_far(jax.lax.stop_gradient(rays_o),
                              jax.lax.stop_gradient(rays_d), bound)
        inside = t_exit >= gt_d
    else:
        inside = jnp.ones_like(gt_d, bool)
    m = valid & inside

    key, kr = jax.random.split(key)
    depth, var, color, _ = render_rays(
        params, mspec, grids, bound, rays_o, rays_d, kr, rspec, stage,
        gt_depth=None if mapspec.coarse_mapper else gt_d)

    dm = (gt_d > 0) & m
    loss = jnp.sum(jnp.abs(gt_d - depth) * dm)
    if (not mapspec.nice) or stage == "color":
        loss = loss + mapspec.w_color_loss * jnp.sum(
            jnp.abs(gt_c - color) * m[:, None])
    if not rspec.occupancy:
        key, ks = jax.random.split(key)
        sigma = regulation_sigma(params, mspec, grids, bound, rays_o, rays_d,
                                 gt_d, ks, rspec.n_samples, stage)
        sig_m = jnp.repeat(m, rspec.n_samples)
        loss = loss + 0.0005 * jnp.sum(jnp.abs(sigma) * sig_m)
    return loss


# ---------------------------------------------------------------------------
# LR trees

def _decoder_lr_tree(params, mapspec: MapSpec, dec_lr: float,
                     dec_lr_static: float):
    """Per-leaf LR for decoder params: only fine (unless fixed) and color
    (unless fixed) decoders train in NICE mode (Mapper.py:335-344).

    Also returns a STATIC frozen tree (python bools) so XLA can prune the
    backward + Adam update of decoders whose LR is structurally zero."""
    def lr_for(name):
        if not mapspec.nice:
            return mapspec.imap_decoders_lr
        if name == "fine":
            return 0.0 if mapspec.fix_fine else dec_lr
        if name == "color":
            return 0.0 if mapspec.fix_color else dec_lr
        if name == "middle":
            return dec_lr if mapspec.train_middle else 0.0
        return 0.0

    def frozen_for(name):
        if not mapspec.nice:
            return False
        if name == "fine":
            return mapspec.fix_fine or dec_lr_static == 0.0
        if name == "color":
            return mapspec.fix_color or dec_lr_static == 0.0
        if name == "middle":
            return (not mapspec.train_middle) or dec_lr_static == 0.0
        return True

    lr = {name: jax.tree.map(lambda _: lr_for(name), sub)
          for name, sub in params.items()}
    frozen = {name: jax.tree.map(lambda _: frozen_for(name), sub)
              for name, sub in params.items()}
    return lr, frozen


def _lr_tree(tree, stage: str, mapspec: MapSpec, lr_factor, cam_lr_mask,
             ba: bool = True):
    """Returns (lr pytree, STATIC frozen pytree).  Frozen-ness is decided
    from the static stage table (lr_factor is always > 0), so zero-lr
    leaves are structurally excluded from backward + Adam."""
    table = mapspec.stage_lr_table()[stage] if mapspec.nice else None
    if mapspec.nice:
        # unknown grid names (e.g. the occ_proxy sampling grid) are frozen
        grid_lrs = {"coarse": table.coarse, "middle": table.middle,
                    "fine": table.fine, "color": table.color}
        grids_lr = {n: jax.tree.map(
                        lambda _: grid_lrs.get(n, 0.0) * lr_factor, g)
                    for n, g in tree["grids"].items()}
        grids_frozen = {n: jax.tree.map(
                            lambda _: grid_lrs.get(n, 0.0) == 0.0, g)
                        for n, g in tree["grids"].items()}
        dec_lr_tree, dec_frozen = _decoder_lr_tree(
            tree["params"], mapspec, table.decoders * lr_factor,
            table.decoders)
        cams_active = ba and stage == "color"
        cam_lr = (mapspec.ba_cam_lr * cam_lr_mask if cams_active
                  else jnp.zeros_like(cam_lr_mask))
    else:
        grids_lr = {}
        grids_frozen = {}
        dec_lr_tree, dec_frozen = _decoder_lr_tree(tree["params"], mapspec,
                                                   0.0, 1.0)
        cams_active = ba
        cam_lr = mapspec.ba_cam_lr * cam_lr_mask
    lr = {"params": dec_lr_tree, "grids": grids_lr,
          "cams": cam_lr[:, None] * jnp.ones((1, 7))}
    frozen = {"params": dec_frozen, "grids": grids_frozen,
              "cams": not cams_active}
    return lr, frozen


def _stop_frozen(tree, frozen):
    """stop_gradient on structurally frozen leaves: prunes their whole
    backward from the XLA graph."""
    return jax.tree.map(
        lambda x, f: jax.lax.stop_gradient(x) if f else x, tree, frozen)


# ---------------------------------------------------------------------------
# The jitted mapping call

@partial(jax.jit, static_argnames=("camera", "stage_iters", "mapspec",
                                   "rspec", "mspec", "ba"))
def map_optimize(params, grids, bound, window, cams0, masks, cam_lr_mask,
                 lr_factor, key, camera: Camera,
                 stage_iters: Tuple[Tuple[str, int], ...],
                 mapspec: MapSpec, rspec: RenderSpec, mspec: ModelSpec,
                 ba: bool = True):
    """Run the staged mapping optimization.

    cams0: (Wn, 7) camera tensors for the window (from est poses).
    masks: frustum masks per grid, multiplied into grid grads.
    cam_lr_mask: (Wn,) BA learning-rate mask (0 = frozen pose).

    Returns (params, grids, cams, losses)."""
    tree = {"params": params, "grids": grids, "cams": cams0}
    opt = adam_init(tree)
    tree, opt, losses, key = _map_optimize_stages(
        tree, opt, bound, window, masks, cam_lr_mask, lr_factor, key,
        camera, stage_iters, mapspec, rspec, mspec, _with_key=True)

    if ba and mapspec.pose_gn_iters > 0 and mapspec.nice:
        from nice_slam_tpu.parallel.schur_ba import schur_pose_refine
        key, kg = jax.random.split(key)
        gn_rspec = dataclasses.replace(rspec, train_decoders=False)
        tree["cams"] = schur_pose_refine(
            tree["params"], tree["grids"], bound, window, tree["cams"],
            cam_lr_mask, kg, camera, gn_rspec, mspec,
            mapspec.pose_gn_iters, mapspec.pose_gn_pixels,
            mapspec.pose_gn_damping)

    return tree["params"], tree["grids"], tree["cams"], losses


@partial(jax.jit, static_argnames=("camera", "stage_iters", "mapspec",
                                   "rspec", "mspec"))
def map_optimize_segment(tree, opt, bound, window, masks, cam_lr_mask,
                         lr_factor, key, camera: Camera,
                         stage_iters: Tuple[Tuple[str, int], ...],
                         mapspec: MapSpec, rspec: RenderSpec,
                         mspec: ModelSpec):
    """One SEGMENT of the staged optimization with Adam state threaded
    in/out — the per-iteration visualizer (utils/visualizer.py) drives
    the event as several segments of vis_inside_freq iterations,
    rendering a panel from the mid-optimization state between them
    (reference src/utils/Visualizer.py:24-107 renders inside the joint
    iteration loop, src/Mapper.py:426-428)."""
    return _map_optimize_stages(tree, opt, bound, window, masks,
                                cam_lr_mask, lr_factor, key, camera,
                                stage_iters, mapspec, rspec, mspec)


def _map_optimize_stages(tree, opt, bound, window, masks, cam_lr_mask,
                         lr_factor, key, camera: Camera,
                         stage_iters: Tuple[Tuple[str, int], ...],
                         mapspec: MapSpec, rspec: RenderSpec,
                         mspec: ModelSpec, _with_key: bool = False):
    """Shared staged-Adam body; returns (tree, opt, losses[, key]) —
    the evolved key keeps map_optimize's post-stage RNG (Schur GN refine)
    on its original stream."""
    all_losses = []
    for stage, n_iters in stage_iters:
        if n_iters == 0:
            continue
        # cams stay structurally live (their backward is tiny and BA-ness
        # is carried by the traced cam_lr_mask)
        lr_tree, frozen = _lr_tree(tree, stage, mapspec, lr_factor,
                                   cam_lr_mask, ba=True)

        # decoders only train in the color stage: prune their weight-grad
        # accumulation from the fused kernel's backward elsewhere
        rspec_stage = dataclasses.replace(
            rspec, train_decoders=(stage == "color" or not mapspec.nice))

        def frozen_loss(tr, k, _stage=stage, _frozen=frozen,
                        _rspec=rspec_stage):
            # stop_gradient INSIDE the differentiated function: frozen
            # leaves get zero cotangents and XLA prunes their backward
            return mapping_loss(_stop_frozen(tr, _frozen), window, bound,
                                k, camera, _stage, mapspec, _rspec, mspec)

        def step(carry, k, _stage=stage, _lr=lr_tree, _frozen=frozen,
                 _floss=None):
            tr, op = carry
            loss, g = jax.value_and_grad(
                lambda t: frozen_loss(t, k, _stage, _frozen))(tr)
            g = dict(g)
            g["grids"] = {n: gg * masks[n] for n, gg in g["grids"].items()}
            if mapspec.grad_clip > 0.0:
                gnorm = jnp.sqrt(sum(
                    jnp.sum(x * x) for x in jax.tree.leaves(g)))
                scale = jnp.minimum(1.0, mapspec.grad_clip / (gnorm + 1e-12))
                g = jax.tree.map(lambda x: x * scale, g)
            if not mapspec.nice:
                # iMAP* StepLR(200, 0.8) on decoder lr (Mapper.py:388-389)
                scale = 0.8 ** (op.step // 200).astype(jnp.float32)
                _lr = dict(_lr)
                _lr["params"] = jax.tree.map(lambda l: l * scale,
                                             _lr["params"])
            tr, op = adam_update(tr, g, op, _lr, frozen=_frozen)
            return (tr, op), loss

        key, ks = jax.random.split(key)
        keys = jax.random.split(ks, n_iters)
        (tree, opt), losses = jax.lax.scan(step, (tree, opt), keys)
        all_losses.append(losses)

    losses = (jnp.concatenate(all_losses) if all_losses
              else jnp.zeros((0,)))
    return (tree, opt, losses, key) if _with_key else (tree, opt, losses)


def _one_map_optimize(params, grids, bound, store, est_buf, idx, color,
                      depth, lr_factor, key, camera, stage_iters, mapspec,
                      rspec, mspec, ba, coarse_bound_enlarge, mesh):
    """One keyframe-window optimization (selection + frustum masks + staged
    Adam + BA write-back), trace-inlined into mapping_step."""
    from nice_slam_tpu.keyframes import update_poses
    from nice_slam_tpu.ops import to_homogeneous

    k1, k2 = jax.random.split(key)
    cur_c2w = est_buf[idx]
    window, masks, cams0, cam_lr_mask = prepare_mapping(
        k1, store, color, depth, cur_c2w, grids, bound, camera, mapspec,
        ba, coarse_bound_enlarge)
    # per-event selected-window record (save_selected_keyframes_info,
    # reference Mapper.py:274-287): frame id per window slot, current
    # frame included, -2 = empty slot.  Computed from the pre-BA store so
    # it reflects what was SELECTED, and returned so the engine can
    # checkpoint it (src/utils/Logger.py:21-32 parity) with no extra
    # dispatch.
    sel_frames = jnp.where(
        window["valid"],
        jnp.where(window["slots"] >= 0,
                  store.frame_idx[jnp.maximum(window["slots"], 0)],
                  idx),
        -2).astype(jnp.int32)
    if (mesh is not None and "model" in mesh.axis_names
            and mapspec.nice and not mapspec.coarse_mapper):
        # grid-sharded (scene-scale) step: grids in halo-exchanged X-slabs
        # over mesh axis 'model', rays over 'data'
        # (parallel/grid_sharded.py; the coarse mapper keeps the dense
        # path below — its grid is tiny and gs shards middle/fine/color)
        from nice_slam_tpu.parallel.grid_sharded import gs_map_once
        params, grids, cams, losses = gs_map_once(
            params, grids, bound, window, cams0, masks, cam_lr_mask,
            lr_factor, k2, camera, stage_iters, mapspec, rspec, mspec,
            mesh)
    elif mesh is not None and "model" not in mesh.axis_names:
        # ray-data-parallel step: each device renders a disjoint ray
        # shard, gradients psum over the mesh (parallel/data_parallel.py)
        from nice_slam_tpu.parallel.data_parallel import dp_map_optimize
        params, grids, cams, losses = dp_map_optimize(
            params, grids, bound, window, cams0, masks, cam_lr_mask,
            lr_factor, k2, camera, stage_iters, mapspec, rspec, mspec,
            mesh, ba=ba)
    else:
        params, grids, cams, losses = map_optimize(
            params, grids, bound, window, cams0, masks, cam_lr_mask,
            lr_factor, k2, camera, stage_iters, mapspec, rspec, mspec,
            ba=ba)
    if ba:
        new_c2w = to_homogeneous(cam_from_tensor(cams))
        kf_mask = (window["valid"]
                   & (window["slots"] >= 0)
                   & (cam_lr_mask > 0))
        store = update_poses(store, jnp.maximum(window["slots"], 0),
                             new_c2w, kf_mask)
        est_buf = est_buf.at[idx].set(new_c2w[-1])
    return params, grids, store, est_buf, losses, sel_frames


@partial(jax.jit, static_argnames=("camera", "stage_iters", "mapspec",
                                   "rspec", "mspec", "ba",
                                   "coarse_bound_enlarge", "mesh",
                                   "insert_kf", "coarse_spec",
                                   "coarse_stage_iters"),
         donate_argnums=(0, 1, 3, 4))
def mapping_step(params, grids, bound, store, est_buf, idx, color, depth,
                 frame_sel, lr_factor, key, step_no, camera: Camera,
                 stage_iters: Tuple[Tuple[str, int], ...], mapspec: MapSpec,
                 rspec: RenderSpec, mspec: ModelSpec, ba: bool,
                 coarse_bound_enlarge: int = 2, mesh=None,
                 insert_kf: bool = False, gt_pose=None,
                 coarse_spec: MapSpec = None,
                 coarse_stage_iters: Tuple[Tuple[str, int], ...] = (),
                 coarse_lr_factor=1.0):
    """ONE dispatch per mapping EVENT: RNG derivation, keyframe-window
    selection, frustum masks, the staged optimization, the BA
    keyframe-store + trajectory pose write-back, and optionally the
    keyframe insertion (insert_kf, the host-decided cadence of
    Mapper.py:611-617) and the whole independent coarse-mapper
    optimization (coarse_spec; the reference's third process,
    NICE_SLAM.py:278-286) — all fused into a single jit so one mapping
    event costs ONE dispatch + ONE barrier instead of three (each eager
    op / barrier costs a full RPC on remote-attached TPUs; see engine.py
    docstring).

    color/depth may be a single frame (H, W, ...) or a stacked group
    (G, H, W, ...) with `frame_sel` picking the mapping frame in-jit (the
    grouped tracking path reuses its uploaded stack for free).

    Order matches the reference event: fine map (+BA) -> keyframe insert
    -> coarse map (the coarse mapper sees the post-BA poses and the
    freshly inserted keyframe, exactly like the sequential path).

    Returns (params, grids, store, est_buf, losses, sel_frames) —
    sel_frames is the fine mapper's selected-window frame-id record
    (save_selected_keyframes_info; reference Mapper.py:274-287)."""
    from nice_slam_tpu.keyframes import add_keyframe_impl

    key = jax.random.fold_in(key, step_no)
    if color.ndim == 4:
        color = color[frame_sel]
        depth = depth[frame_sel]
    if color.dtype == jnp.uint8:
        color = color.astype(jnp.float32) / 255.0
    # the fine branch consumes `key` exactly as the standalone step did
    # (bit-identical streams); the coarse branch folds a fresh tag
    k_coarse = jax.random.fold_in(key, 0x0C)
    params, grids, store, est_buf, losses, sel_frames = _one_map_optimize(
        params, grids, bound, store, est_buf, idx, color, depth, lr_factor,
        key, camera, stage_iters, mapspec, rspec, mspec, ba,
        coarse_bound_enlarge, mesh)
    if mapspec.nice and not mapspec.coarse_mapper and "occ_proxy" in grids:
        grids = dict(grids)
        grids["occ_proxy"] = refresh_occ_proxy(params, grids, bound, mspec)
    if insert_kf:
        store = add_keyframe_impl(store, color, depth, est_buf[idx],
                                  gt_pose, idx)
    if coarse_spec is not None:
        params, grids, store, est_buf, _, _ = _one_map_optimize(
            params, grids, bound, store, est_buf, idx, color, depth,
            coarse_lr_factor, k_coarse, camera, coarse_stage_iters,
            coarse_spec, rspec, mspec, False, coarse_bound_enlarge, mesh)
    return params, grids, store, est_buf, losses, sel_frames


@partial(jax.jit, static_argnames=("camera", "tspec", "stage_iters",
                                   "mapspec", "rspec", "mspec", "ba",
                                   "coarse_bound_enlarge", "mesh",
                                   "insert_kf", "coarse_spec",
                                   "coarse_stage_iters"),
         donate_argnums=(0, 1, 3, 4))
def track_map_group(params, grids, bound, store, est_buf, idx0, colors,
                    depths, track_step_no, map_step_no, frame_sel,
                    lr_factor, key, camera: Camera, tspec,
                    stage_iters: Tuple[Tuple[str, int], ...],
                    mapspec: MapSpec, rspec: RenderSpec, mspec: ModelSpec,
                    ba: bool, coarse_bound_enlarge: int = 2, mesh=None,
                    insert_kf: bool = False, gt_pose=None,
                    coarse_spec: MapSpec = None,
                    coarse_stage_iters: Tuple[Tuple[str, int], ...] = (),
                    coarse_lr_factor=1.0):
    """Track a whole frame group AND run its mapping event in ONE dispatch.

    The strict schedule (SURVEY §3.5) makes the mapping event of frame
    group [idx0, idx0+G-1] depend only on on-device state produced by the
    group's tracking scan — there is no host decision between them (the
    keyframe cadence and BA gate are static per event).  Splitting them
    into two dispatches costs one extra RPC dispatch + one extra barrier
    per group on remote-attached chips (~20 ms measured, see engine.py
    docstring) for zero benefit.  RNG: tracking folds in track_step_no and
    mapping folds in map_step_no exactly like the standalone dispatches,
    so the computation is bit-identical to the unfused path (asserted in
    tests/test_slam.py).

    Returns (params, grids, store, est_buf, track_losses (G, 3),
    map_losses, sel_frames)."""
    from nice_slam_tpu.tracking import track_frames_group

    est_buf, track_losses = track_frames_group(
        params, grids, bound, est_buf, idx0, colors, depths, key,
        track_step_no, camera, tspec, rspec, mspec)
    params, grids, store, est_buf, map_losses, sel_frames = mapping_step(
        params, grids, bound, store, est_buf, idx0 + frame_sel, colors,
        depths, frame_sel, lr_factor, key, map_step_no, camera,
        stage_iters, mapspec, rspec, mspec, ba, coarse_bound_enlarge,
        mesh, insert_kf=insert_kf, gt_pose=gt_pose, coarse_spec=coarse_spec,
        coarse_stage_iters=coarse_stage_iters,
        coarse_lr_factor=coarse_lr_factor)
    return params, grids, store, est_buf, track_losses, map_losses, sel_frames


@partial(jax.jit, static_argnames=("split", "camera", "tspec",
                                   "stage_iters", "mapspec", "rspec",
                                   "mspec", "ba", "coarse_bound_enlarge",
                                   "mesh", "insert_kf", "coarse_spec",
                                   "coarse_stage_iters"),
         donate_argnums=(0, 1, 3, 4))
def lagged_track_map_group(params, grids, bound, store, est_buf, cur,
                           colors, depths, prev_colors, prev_depths,
                           map_idx, prev_sel, split, step_a, step_map,
                           step_b, lr_factor, key, camera: Camera, tspec,
                           stage_iters: Tuple[Tuple[str, int], ...],
                           mapspec: MapSpec, rspec: RenderSpec,
                           mspec: ModelSpec, ba: bool,
                           coarse_bound_enlarge: int = 2, mesh=None,
                           insert_kf: bool = False, gt_pose=None,
                           coarse_spec: MapSpec = None,
                           coarse_stage_iters: Tuple[Tuple[str, int],
                                                     ...] = (),
                           coarse_lr_factor=1.0):
    """One loose/free-mode frame group in ONE dispatch: track frames
    [cur, cur+split-1] against the stale map, run the lagged mapping
    event for frame `map_idx` (whose image lives at prev_sel in the
    PREVIOUS group's stack prev_colors/prev_depths — already device-
    resident, so passing it costs nothing), then track the rest of the
    group against the fresh map.

    The lag is deterministic (engine.map_lag), so the split point is a
    STATIC argument and the whole three-step schedule of
    engine._grouped_lagged_step collapses to one dispatch + one barrier
    — the same fusion trick track_map_group plays for strict mode
    (reference loose semantics: Tracker.py:168-175, the tracker runs
    ahead of the mapper by a bounded lag).  RNG: the three sub-steps
    fold step_a/step_map/step_b exactly like the three standalone
    dispatches, so the computation is bit-identical to the unfused
    lagged path (asserted in tests/test_slam.py).

    Returns (params, grids, store, est_buf, track_losses_a (split, 3),
    track_losses_b (G-split, 3) | None, map_losses, sel_frames)."""
    from nice_slam_tpu.tracking import track_frames_group

    est_buf, tl_a = track_frames_group(
        params, grids, bound, est_buf, cur, colors[:split],
        depths[:split], key, step_a, camera, tspec, rspec, mspec)
    params, grids, store, est_buf, map_losses, sel = mapping_step(
        params, grids, bound, store, est_buf, map_idx, prev_colors,
        prev_depths, prev_sel, lr_factor, key, step_map, camera,
        stage_iters, mapspec, rspec, mspec, ba, coarse_bound_enlarge,
        mesh, insert_kf=insert_kf, gt_pose=gt_pose,
        coarse_spec=coarse_spec, coarse_stage_iters=coarse_stage_iters,
        coarse_lr_factor=coarse_lr_factor)
    tl_b = None
    if split < colors.shape[0]:  # free mode: the event ends the group
        est_buf, tl_b = track_frames_group(
            params, grids, bound, est_buf, cur + split, colors[split:],
            depths[split:], key, step_b, camera, tspec, rspec, mspec)
    return params, grids, store, est_buf, tl_a, tl_b, map_losses, sel


def refresh_occ_proxy(params, grids, bound, mspec: ModelSpec):
    """Re-decode the occupancy proxy at its grid NODES (the positions its
    own trilinear reads interpolate between) from the current map ('fine'
    stage = middle+fine occupancy) — one cheap decode per mapping event
    that steers occupancy-guided ray sampling
    (ops.sampling.occ_guided_zvals)."""
    from nice_slam_tpu.models.decoders import model_apply

    shape = grids["occ_proxy"].shape[:3]
    pts = grid_node_points(bound, shape)
    raw = model_apply(params, mspec, grids, bound, pts, "fine",
                      train_decoders=False)
    occ = jax.nn.sigmoid(10.0 * raw[..., 3]).reshape(shape + (1,))
    return jax.lax.stop_gradient(occ)
