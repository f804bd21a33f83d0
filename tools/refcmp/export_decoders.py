"""Invert the reference's checkpoint surgery: write this repo's
pretrained decoders (pretrained/decoders_tpu.npz) as reference-format
ConvONet checkpoints (coarse.pt / middle_fine.pt) so the REFERENCE can
run NICE mode on this machine (its own pretrained blobs are not in the
mount — .MISSING_LARGE_BLOBS).

The reference's load_pretrain (ref src/NICE_SLAM.py:159-190) strips
prefixes from ckpt["model"] keys:
    coarse.pt:      "decoder."        + <MLP_no_xyz state-dict key>
    middle_fine.pt: "decoder.coarse." + <MLP key>   -> MIDDLE decoder
                    "decoder.fine."   + <MLP key>   -> fine decoder
(the 'coarse'-tagged keys in middle_fine.pt really are the middle
decoder — ConvONet naming).  Our params are (in, out) Linear weights;
torch's are (out, in) — transposed on the way out, exactly mirroring
models/pretrain.py's ingestion.

Round-trip checked: export -> load_pretrained_decoders == original.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def _params_to_torch_state(params: dict, no_xyz: bool) -> dict:
    """One decoder param pytree -> reference MLP/MLP_no_xyz state dict."""
    import torch

    def t(x, transpose=False):
        a = np.asarray(x)
        return torch.from_numpy(a.T.copy() if transpose else a.copy())

    state = {}
    for i, lin in enumerate(params["pts"]):
        state[f"pts_linears.{i}.weight"] = t(lin["w"], transpose=True)
        state[f"pts_linears.{i}.bias"] = t(lin["b"])
    state["output_linear.weight"] = t(params["out"]["w"], transpose=True)
    state["output_linear.bias"] = t(params["out"]["b"])
    if not no_xyz:
        if params.get("embed", {}).get("B") is not None:
            state["embedder._B"] = t(params["embed"]["B"])
        for i, lin in enumerate(params.get("fc_c", [])):
            state[f"fc_c.{i}.weight"] = t(lin["w"], transpose=True)
            state[f"fc_c.{i}.bias"] = t(lin["b"])
    return state


def export_reference_decoders(npz_path: str, out_dir: str) -> tuple:
    """Write coarse.pt + middle_fine.pt from our npz.  Returns the two
    paths."""
    import torch

    from nice_slam_tpu.models import nice_model_spec
    from nice_slam_tpu.models.decoders import init_model
    from nice_slam_tpu.models.pretrain import load_npz_decoders
    import jax

    spec = nice_model_spec()
    template = init_model(jax.random.PRNGKey(0), spec)
    params = load_npz_decoders(npz_path, template)

    os.makedirs(out_dir, exist_ok=True)
    coarse_path = os.path.join(out_dir, "coarse.pt")
    mf_path = os.path.join(out_dir, "middle_fine.pt")

    coarse_state = {
        f"decoder.{k}": v
        for k, v in _params_to_torch_state(params["coarse"],
                                           no_xyz=True).items()}
    torch.save({"model": coarse_state}, coarse_path,
               _use_new_zipfile_serialization=False)

    mf_state = {}
    for k, v in _params_to_torch_state(params["middle"],
                                       no_xyz=False).items():
        mf_state[f"decoder.coarse.{k}"] = v
    for k, v in _params_to_torch_state(params["fine"],
                                       no_xyz=False).items():
        mf_state[f"decoder.fine.{k}"] = v
    torch.save({"model": mf_state}, mf_path,
               _use_new_zipfile_serialization=False)
    return coarse_path, mf_path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="pretrained/decoders_tpu.npz")
    ap.add_argument("--out", default="/tmp/refcmp_pretrained")
    args = ap.parse_args()
    c, mf = export_reference_decoders(args.npz, args.out)
    print(f"wrote {c} and {mf}")
