#!/usr/bin/env python
"""Pretrain the hierarchical-grid decoders on procedural scenes.

The reference ships ConvONet-pretrained decoders (pretrained/coarse.pt,
middle_fine.pt, loaded at src/NICE_SLAM.py:159-190) and keeps middle/fine
frozen during SLAM.  Those checkpoints are not redistributable, so this
tool reproduces the *regime*: decoders are trained across many randomized
primitive scenes (each with its own freshly-optimized feature grids) to
map grid features + position encodings to calibrated occupancy logits —
then frozen and shipped (pretrained/decoders_tpu.npz), exactly how the
reference uses its ConvONet weights.

Training objective per scene: BCE between sigmoid(10*occ) and the
analytic inside/outside field at the middle, fine (=middle+fine residual)
and coarse levels, plus L2 color regression — the same occupancy
parameterization the renderer consumes (ops/composite.py), so the
decoders come out calibrated for sigmoid(10 x) compositing.

Run on the TPU (default JAX platform); ~2k scenes x 60 steps is a few
minutes.  Output: --out (default pretrained/decoders_tpu.npz).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=300)
    ap.add_argument("--steps", type=int, default=80,
                    help="grid+decoder steps per scene")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--decoder_lr", type=float, default=1e-3)
    ap.add_argument("--grid_lr", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="pretrained/decoders_tpu.npz")
    ap.add_argument("--report_every", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.models.decoders import (
        ModelSpec, apply_mlp, apply_mlp_no_xyz, init_model)
    from nice_slam_tpu.ops import adam_init, adam_update
    from nice_slam_tpu.state import init_grids
    from nice_slam_tpu.utils.checkpoint import _flatten

    spec = ModelSpec()  # nice, coarse, c_dim 32, hidden 32
    dspecs = spec.decoder_specs()

    # canonical pretraining volume: an 8 m cube centred at origin — covers
    # the coordinate ranges of the target scene families (Replica/ScanNet
    # bounds span roughly [-8, 12] per axis)
    BOUND = np.array([[-4.0, 4.0], [-4.0, 4.0], [-4.0, 4.0]])
    GRID_LEN = {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16}
    N_SPH, N_BOX = 6, 3

    key = jax.random.PRNGKey(args.seed)
    key, kinit = jax.random.split(key)
    params = init_model(kinit, spec)
    bound = jnp.asarray(BOUND, jnp.float32)

    def sample_scene(k):
        """Random primitive scene: sphere centers/radii, box los/his,
        per-primitive albedo, inside a random sub-room of the volume."""
        ks = jax.random.split(k, 8)
        room_lo = jax.random.uniform(ks[0], (3,), minval=-4.0, maxval=-1.0)
        room_hi = jax.random.uniform(ks[1], (3,), minval=1.0, maxval=4.0)
        ctr = jax.random.uniform(ks[2], (N_SPH, 3), minval=-3.0, maxval=3.0)
        rad = jax.random.uniform(ks[3], (N_SPH,), minval=0.2, maxval=0.9)
        blo = jax.random.uniform(ks[4], (N_BOX, 3), minval=-3.5, maxval=2.0)
        bsz = jax.random.uniform(ks[5], (N_BOX, 3), minval=0.3, maxval=1.5)
        alb = jax.random.uniform(ks[6], (N_SPH + N_BOX + 1, 3))
        return {"room_lo": room_lo, "room_hi": room_hi, "ctr": ctr,
                "rad": rad, "blo": blo, "bhi": blo + bsz, "alb": alb}

    def field(scene, p):
        """(occupied (N,), albedo (N,3)) of the analytic scene at p."""
        d_sph = jnp.linalg.norm(p[:, None, :] - scene["ctr"][None], axis=-1) \
            - scene["rad"][None]
        in_sph = d_sph < 0.0  # (N, S)
        in_box = jnp.all((p[:, None, :] > scene["blo"][None])
                         & (p[:, None, :] < scene["bhi"][None]), axis=-1)
        outside_room = jnp.any((p < scene["room_lo"])
                               | (p > scene["room_hi"]), axis=-1)
        occ = in_sph.any(-1) | in_box.any(-1) | outside_room
        # albedo: first matching primitive, else wall albedo (last row)
        ids = jnp.concatenate([in_sph, in_box,
                               outside_room[:, None]], axis=-1)
        first = jnp.argmax(ids, axis=-1)
        alb = scene["alb"][jnp.where(ids.any(-1), first, ids.shape[-1] - 1)]
        return occ.astype(jnp.float32), alb

    def bce_logits(logit, target):
        # numerically stable BCE on sigmoid(logit)
        return jnp.mean(jnp.maximum(logit, 0) - logit * target
                        + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    def scene_loss(tree, scene, k):
        p = jax.random.uniform(k, (args.batch, 3), minval=bound[:, 0],
                               maxval=bound[:, 1])
        occ_t, alb_t = field(scene, p)
        prm, grids = tree["params"], tree["grids"]

        mid = apply_mlp(prm["middle"], dspecs["middle"], p, grids, bound)
        fine = apply_mlp(prm["fine"], dspecs["fine"], p, grids, bound)
        col = apply_mlp(prm["color"], dspecs["color"], p, grids, bound)
        coarse = apply_mlp_no_xyz(prm["coarse"], dspecs["coarse"], p, grids,
                                  bound * spec.coarse_bound_enlarge)
        loss = (bce_logits(10.0 * mid, occ_t)
                + bce_logits(10.0 * (mid + fine), occ_t)
                + bce_logits(10.0 * coarse, occ_t)
                + jnp.mean((col[:, :3] - alb_t) ** 2))
        return loss

    @jax.jit
    def scene_round(params, scene, k):
        """Fresh grids; `steps` joint grid+decoder updates; returns the
        updated decoders and the final loss."""
        kg, kloop = jax.random.split(k)
        grids = init_grids(kg, BOUND, GRID_LEN, spec.c_dim, True,
                           spec.coarse_bound_enlarge)
        tree = {"params": params, "grids": grids}
        opt = adam_init(tree)
        lr = {"params": jax.tree.map(lambda _: args.decoder_lr, params),
              "grids": jax.tree.map(lambda _: args.grid_lr, grids)}

        def step(carry, kk):
            tr, op = carry
            loss, g = jax.value_and_grad(scene_loss)(tr, scene, kk)
            tr, op = adam_update(tr, g, op, lr)
            return (tr, op), loss

        keys = jax.random.split(kloop, args.steps)
        (tree, _), losses = jax.lax.scan(step, (tree, opt), keys)
        return tree["params"], losses[-1]

    for i in range(args.scenes):
        key, ks, kr = jax.random.split(key, 3)
        scene = sample_scene(ks)
        params, loss = scene_round(params, scene, kr)
        if i % args.report_every == 0:
            print(f"scene {i}/{args.scenes}: final loss {float(loss):.4f}",
                  flush=True)

    flat = {}
    _flatten(jax.device_get(params), "params", flat)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **flat)
    print("saved", args.out, f"({len(flat)} arrays)")


if __name__ == "__main__":
    main()
