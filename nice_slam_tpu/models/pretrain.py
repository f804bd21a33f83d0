"""Pretrained ConvONet decoder ingestion + from-scratch fallback.

The reference ships pretrained decoder checkpoints (pretrained/coarse.pt,
pretrained/middle_fine.pt) loaded with key surgery in
src/NICE_SLAM.py:159-190: keys containing 'decoder' but not 'encoder' are
stripped of their prefixes and routed to the coarse / middle / fine
decoders.  `load_pretrained_decoders` performs the same surgery on a torch
checkpoint and converts tensors into this framework's param pytrees
(transposing Linear weights to (in, out)).

When the checkpoints are unavailable (they are not distributable with this
repo), `pretrain_decoders_synthetic` trains middle/fine decoders from
scratch against procedural geometry so the frozen-fine-decoder regime of
the reference still functions; alternatively set mapping.fix_fine=False to
co-train the fine decoder online (iMAP-style).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nice_slam_tpu.models.decoders import DecoderSpec, ModelSpec


def _torch_state_to_params(state: Dict[str, "object"],
                           spec: DecoderSpec) -> dict:
    """Map a reference decoder state_dict (MLP / MLP_no_xyz naming,
    decoder.py:91-274) to our param pytree."""
    import numpy as np

    def arr(key):
        t = state[key]
        return jnp.asarray(np.asarray(t.detach().cpu().numpy()
                                      if hasattr(t, "detach") else t))

    params: dict = {}
    n = spec.n_blocks
    params["pts"] = [
        {"w": arr(f"pts_linears.{i}.weight").T,
         "b": arr(f"pts_linears.{i}.bias")} for i in range(n)]
    params["out"] = {"w": arr("output_linear.weight").T,
                     "b": arr("output_linear.bias")}
    if not spec.no_xyz:
        if any(k.startswith("embedder.") for k in state):
            params["embed"] = {"B": arr("embedder._B")}
        else:
            params["embed"] = {}
        if spec.c_dim != 0:
            params["fc_c"] = [
                {"w": arr(f"fc_c.{i}.weight").T,
                 "b": arr(f"fc_c.{i}.bias")} for i in range(n)]
    return params


def load_pretrained_decoders(params: dict, spec: ModelSpec,
                             coarse_path: Optional[str],
                             middle_fine_path: Optional[str]) -> dict:
    """Overwrite coarse/middle/fine decoder params from reference-format
    torch checkpoints.  Returns the updated pytree; missing files leave the
    corresponding decoders at their random init (a warning is printed)."""
    import warnings

    try:
        import torch
    except ImportError:
        warnings.warn("torch unavailable; keeping random-init decoders")
        return params

    dspecs = spec.decoder_specs()
    params = dict(params)

    if spec.coarse and coarse_path and os.path.exists(coarse_path):
        ckpt = torch.load(coarse_path, map_location="cpu")
        coarse_state = {}
        for key, val in ckpt["model"].items():
            if "decoder" in key and "encoder" not in key:
                coarse_state[key[8:]] = val
        params["coarse"] = _torch_state_to_params(coarse_state,
                                                  dspecs["coarse"])
    elif spec.coarse:
        warnings.warn(f"coarse pretrain missing ({coarse_path}); "
                      "random init")

    if middle_fine_path and os.path.exists(middle_fine_path):
        ckpt = torch.load(middle_fine_path, map_location="cpu")
        mid_state, fine_state = {}, {}
        for key, val in ckpt["model"].items():
            if "decoder" in key and "encoder" not in key:
                # reference surgery: 'coarse'-tagged keys are the MIDDLE
                # decoder, 'fine' keys the fine one (NICE_SLAM.py:181-188)
                if "coarse" in key:
                    mid_state[key[8 + 7:]] = val
                elif "fine" in key:
                    fine_state[key[8 + 5:]] = val
        params["middle"] = _torch_state_to_params(mid_state, dspecs["middle"])
        params["fine"] = _torch_state_to_params(fine_state, dspecs["fine"])
    else:
        warnings.warn(f"middle_fine pretrain missing ({middle_fine_path}); "
                      "random init — consider mapping.fix_fine=False")
    return params


def load_npz_decoders(path: str, params_template: dict) -> dict:
    """Load decoders pretrained by tools/pretrain_decoders.py (.npz of the
    flattened param pytree).  Keys missing from the checkpoint keep their
    current (template) values."""
    import numpy as np

    from nice_slam_tpu.utils.checkpoint import _unflatten

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}

    def fill(template, prefix):
        if isinstance(template, dict):
            return {k: fill(v, f"{prefix}/{k}") for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            return type(template)(
                fill(v, f"{prefix}/{i}") for i, v in enumerate(template))
        arr = flat.get(prefix)
        if arr is not None and arr.shape == tuple(template.shape):
            return jnp.asarray(arr)
        return template

    return fill(params_template, "params")


def pretrain_decoders_synthetic(key, params: dict, spec: ModelSpec,
                                bound, steps: int = 2000,
                                batch: int = 4096, lr: float = 1e-3,
                                grids=None, verbose: bool = False) -> dict:
    """Train middle+fine decoders (and grids if given) to regress procedural
    occupancy fields (boxes + spheres), giving the frozen decoders a
    meaningful prior in the absence of the ConvONet checkpoints.

    The fit target: occupancy logit o(p) = +/-; decoders learn to turn grid
    features into occupancy residuals the way the ConvONet pretraining did.
    """
    from nice_slam_tpu.models.decoders import model_apply
    from nice_slam_tpu.ops import adam_init, adam_update
    from nice_slam_tpu.state import init_grids

    bound = jnp.asarray(bound, jnp.float32)
    if grids is None:
        key, kg = jax.random.split(key)
        grids = init_grids(kg, np.asarray(bound),
                           {"coarse": 2.0, "middle": 0.32,
                            "fine": 0.16, "color": 0.16},
                           spec.c_dim, spec.coarse, spec.coarse_bound_enlarge)

    def occ_target(p, centers, radii):
        d = jnp.linalg.norm(p[:, None, :] - centers[None], axis=-1) - radii
        return -10.0 * jnp.min(d, axis=-1)  # signed logit-ish target

    tree = {"params": params, "grids": grids}
    opt = adam_init(tree)

    lo, hi = bound[:, 0], bound[:, 1]

    @jax.jit
    def step(tree, opt, k):
        k1, k2, k3 = jax.random.split(k, 3)
        centers = lo + (hi - lo) * jax.random.uniform(k1, (6, 3))
        radii = 0.1 + 0.4 * jax.random.uniform(k2, (6,))
        p = lo + (hi - lo) * jax.random.uniform(k3, (batch, 3))

        def loss_fn(tr):
            raw = model_apply(tr["params"], spec, tr["grids"], bound, p,
                              "fine")
            tgt = jnp.tanh(occ_target(p, centers, radii))
            return jnp.mean((jnp.tanh(raw[:, 3]) - tgt) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(tree)
        tree, opt = adam_update(tree, g, opt, lr)
        return tree, opt, loss

    for i in range(steps):
        key, k = jax.random.split(key)
        tree, opt, loss = step(tree, opt, k)
        if verbose and i % 200 == 0:
            print(f"pretrain step {i}: loss {float(loss):.5f}")
    return tree["params"]
