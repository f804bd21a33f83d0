"""Ray-data-parallel mapping over a device mesh.

Each device holds a full replica of the map state (grids are tens of MB —
cheap in HBM) and renders a disjoint shard of the sampled rays; loss
gradients are `psum`med across the mesh so the Adam update is identical on
every chip.  This multiplies the ray budget per wall-clock step — the
mapping hot loop (SURVEY §3.3: 48k point-decodes/iter on one GPU in the
reference) scales linearly until the per-chip batch is too small to fill
the MXU.

Built with shard_map so collectives are explicit (one psum per iteration
over ICI); everything else is the same jitted mapping step as
nice_slam_tpu/mapping.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nice_slam_tpu.camera import Camera
from nice_slam_tpu.mapping import MapSpec, _lr_tree, _stop_frozen, mapping_loss
from nice_slam_tpu.models.decoders import ModelSpec
from nice_slam_tpu.ops import adam_init, adam_update
from nice_slam_tpu.render import RenderSpec


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def dp_map_optimize(params, grids, bound, window, cams0, masks, cam_lr_mask,
                    lr_factor, key, camera: Camera,
                    stage_iters: Tuple[Tuple[str, int], ...],
                    mapspec: MapSpec, rspec: RenderSpec, mspec: ModelSpec,
                    mesh: Mesh, ba: bool = True):
    """Data-parallel analogue of mapping.map_optimize: same staged
    schedule, but each step's loss+grad runs sharded over `mesh` with the
    per-device ray budget = mapspec.pixels (total rays = pixels * n_dev).

    With mapspec.pose_gn_iters > 0 (and ba), the Schur-reduced
    Gauss-Newton pose refinement (parallel/schur_ba.py) runs after the
    Adam stages: each device builds the per-pose normal equations from
    its own ray shard and ONE psum of (Wn x 7 x 7 + Wn x 7) floats
    reduces the system — the pose block of the BA solved with a
    collective 10^4x smaller than the feature-gradient psums.

    Returns (params, grids, cams, losses)."""
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    def sharded_loss_grad(tree, window_, bound_, keys, stage, frozen):
        """Each device evaluates the loss on its own ray shard (its own
        PRNG key); loss and grads are psummed so every replica applies the
        identical update."""

        def per_device(tree_, win_, b_, keys_shard):
            # Replicated inputs enter the body as UNVARYING over the mesh
            # axis, but the per-shard keys make every downstream value
            # varying; the moment-scatter custom VJP (ops/grid.py) then
            # produces varying cotangents, which JAX's vma check rejects
            # against unvarying primals.  Cast the primals to varying up
            # front — the explicit psum below is what makes the update
            # replica-identical, exactly as before.
            tree_, win_, b_ = jax.tree.map(
                lambda x: jax.lax.pcast(x, axis, to="varying"),
                (tree_, win_, b_))
            loss, g = jax.value_and_grad(
                lambda t: mapping_loss(_stop_frozen(t, frozen), win_, b_,
                                       keys_shard[0], camera, stage,
                                       mapspec, rspec, mspec))(tree_)
            loss = jax.lax.psum(loss, axis)
            g = jax.tree.map(lambda x: jax.lax.psum(x, axis), g)
            return loss, g

        rep = lambda t: jax.tree.map(lambda _: P(), t)
        return jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(rep(tree), rep(window_), P(), P(axis)),
            out_specs=(P(), rep(tree)),
        )(tree, window_, bound_, keys)

    @partial(jax.jit, static_argnames=())
    def run(params, grids, cams0, window, bound, masks, cam_lr_mask,
            lr_factor, key):
        tree = {"params": params, "grids": grids, "cams": cams0}
        opt = adam_init(tree)
        all_losses = []
        nonlocal_key = key
        for stage, n_iters in stage_iters:
            if n_iters == 0:
                continue
            lr_tree, frozen = _lr_tree(tree, stage, mapspec, lr_factor,
                                       cam_lr_mask)

            def step(carry, ks, _stage=stage, _lr=lr_tree, _frozen=frozen):
                tr, op = carry
                loss, g = sharded_loss_grad(tr, window, bound, ks, _stage,
                                            _frozen)
                g = dict(g)
                g["grids"] = {n: gg * masks[n]
                              for n, gg in g["grids"].items()}
                tr, op = adam_update(tr, g, op, _lr, frozen=_frozen)
                return (tr, op), loss

            nonlocal_key, ks = jax.random.split(nonlocal_key)
            keys = jax.random.split(ks, n_iters * n_dev).reshape(
                n_iters, n_dev, 2)
            (tree, opt), losses = jax.lax.scan(step, (tree, opt), keys)
            all_losses.append(losses)

        if ba and mapspec.pose_gn_iters > 0 and mapspec.nice:
            import dataclasses

            from nice_slam_tpu.ops.grid import plain_interp
            from nice_slam_tpu.parallel.schur_ba import gn_iteration

            gn_rspec = dataclasses.replace(rspec, train_decoders=False)

            def sharded_gn(tree_, window_, bound_, cams_, lrm_, keys_shard):
                def per_device(tree__, win__, b__, cams__, lrm__, ks__):
                    # each device builds the system from its own ray
                    # shard (its own key); the psum reduce makes every
                    # replica solve (and guard) the identical union
                    # system.  No pcast needed: the GN path is
                    # forward-mode only (no moment-scatter custom_vjp),
                    # and the psum outputs are inferably replicated.
                    reduce_fn = lambda t: jax.tree.map(
                        lambda x: jax.lax.psum(x, axis), t)
                    cams_new, sse = gn_iteration(
                        tree__["params"], tree__["grids"], b__, win__,
                        cams__, lrm__, ks__[0], camera, gn_rspec, mspec,
                        mapspec.pose_gn_pixels, mapspec.pose_gn_damping,
                        reduce_fn=reduce_fn)
                    return cams_new, sse

                rep = lambda t: jax.tree.map(lambda _: P(), t)
                return jax.shard_map(
                    per_device, mesh=mesh,
                    in_specs=(rep(tree_), rep(window_), P(), P(), P(),
                              P(axis)),
                    out_specs=(P(), P()),
                )(tree_, window_, bound_, cams_, lrm_, keys_shard)

            def gn_step(cams_, ks):
                return sharded_gn(tree, window, bound, cams_, cam_lr_mask,
                                  ks)

            nonlocal_key, kg = jax.random.split(nonlocal_key)
            gn_keys = jax.random.split(
                kg, mapspec.pose_gn_iters * n_dev).reshape(
                mapspec.pose_gn_iters, n_dev, 2)
            with plain_interp():
                tree["cams"], _ = jax.lax.scan(gn_step, tree["cams"],
                                               gn_keys)

        return (tree["params"], tree["grids"], tree["cams"],
                jnp.concatenate(all_losses) if all_losses
                else jnp.zeros((0,)))

    return run(params, grids, cams0, window, bound, masks, cam_lr_mask,
               lr_factor, key)
