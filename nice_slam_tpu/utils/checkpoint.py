"""Checkpoint save/load with true resume support.

The reference writes torch .tar checkpoints consumed only by offline tools
(src/utils/Logger.py:21-32; no resume path exists in run.py).  Here
checkpoints are flat .npz archives of the full engine state — map pytree,
trajectories, keyframe store, frame cursor — and `SlamEngine.resume()` can
continue a run from one.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np
import jax


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], f"{prefix}/{k}", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray], template: Any, prefix: str):
    if isinstance(template, dict):
        return {k: _unflatten(flat, template[k], f"{prefix}/{k}")
                for k in sorted(template)}
    if isinstance(template, (list, tuple)):
        seq = [_unflatten(flat, v, f"{prefix}/{i}")
               for i, v in enumerate(template)]
        return type(template)(seq)
    return flat[prefix]


def save_checkpoint(path: str, params, grids, bound,
                    est_c2w: np.ndarray, gt_c2w: np.ndarray,
                    keyframe_store, idx: int, extra: Dict[str, Any] = None):
    flat: Dict[str, np.ndarray] = {}
    _flatten(jax.device_get(params), "params", flat)
    _flatten(jax.device_get(grids), "grids", flat)
    flat["bound"] = np.asarray(bound)
    flat["est_c2w"] = np.asarray(est_c2w)
    flat["gt_c2w"] = np.asarray(gt_c2w)
    if keyframe_store is not None:
        kf = jax.device_get(keyframe_store._asdict())
        _flatten(kf, "keyframes", flat)
    flat["idx"] = np.asarray(idx)
    for k, v in (extra or {}).items():
        flat[f"extra/{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def load_checkpoint(path: str, params_template=None, grids_template=None):
    """Returns a dict with params/grids (if templates given, as pytrees),
    bound, trajectories, keyframes dict, idx."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    out: Dict[str, Any] = {
        "bound": flat["bound"],
        "est_c2w": flat["est_c2w"],
        "gt_c2w": flat["gt_c2w"],
        "idx": int(flat["idx"]),
    }
    if params_template is not None:
        out["params"] = _unflatten(flat, params_template, "params")
    else:
        out["params_flat"] = {k: v for k, v in flat.items()
                              if k.startswith("params/")}
    if grids_template is not None:
        out["grids"] = _unflatten(flat, grids_template, "grids")
    else:
        out["grids_flat"] = {k: v for k, v in flat.items()
                             if k.startswith("grids/")}
    kf = {k[len("keyframes/"):]: v for k, v in flat.items()
          if k.startswith("keyframes/")}
    if kf:
        out["keyframes"] = kf
    out["extra"] = {k[len("extra/"):]: v for k, v in flat.items()
                    if k.startswith("extra/")}
    return out


def latest_checkpoint(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    cands = sorted(f for f in os.listdir(ckpt_dir) if f.endswith(".npz"))
    return os.path.join(ckpt_dir, cands[-1]) if cands else None
