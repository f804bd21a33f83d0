"""Run the ACTUAL reference NICE-SLAM/iMAP* (torch) on CPU.

This drives the reference's own orchestrator (src/NICE_SLAM.py:288-307 —
tracker + mapper as torch.multiprocessing spawn processes with
shared-memory tensors and the strict sync gates) end-to-end on an
exported Replica-layout dataset, and leaves its own checkpoint
(`ckpts/<last>.tar`, src/utils/Logger.py:21-32) for the comparison
orchestrator to grade.

Environment adaptations (all import-time, so spawn children that
re-import this module get them too — none changes the math):
  1. sys.path shims for deps absent from the sandbox (mathutils is a
     functional numpy implementation — it sits on the tracking hot path;
     open3d/skimage/trimesh are inert because meshing is disabled).
  2. `src.common.quad2rotation` is re-bound to a numerically IDENTICAL
     CPU-safe version: the original does `.to(quad.get_device())`, and
     torch raises on device index -1 for CPU tensors
     (src/common.py:150) — the reference cannot run on CPU unpatched.
  3. `Mesher.get_mesh` is a no-op: meshing needs open3d/skimage/trimesh
     and is irrelevant to the trajectory head-to-head.

Usage (cwd must be the reference root so 'configs/imap.yaml' resolves):
    cd /root/reference && python /root/repo/tools/refcmp/ref_driver.py \
        <scene.yaml> --output <out_dir>
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF = os.environ.get("NICE_SLAM_REF", "/root/reference")
sys.path.insert(0, os.path.join(_HERE, "shims"))
sys.path.insert(0, _REF)

import torch  # noqa: E402


def _install_patches():
    import src.common as common

    def quad2rotation(quad):
        """CPU-safe re-bind of src/common.py:137-160 — identical math,
        only the device plumbing differs (torch.zeros(..., device=...)
        instead of .to(get_device()), which raises for CPU tensors)."""
        bs = quad.shape[0]
        qr, qi, qj, qk = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
        two_s = 2.0 / (quad * quad).sum(-1)
        rot_mat = torch.zeros(bs, 3, 3, device=quad.device,
                              dtype=quad.dtype)
        rot_mat[:, 0, 0] = 1 - two_s * (qj ** 2 + qk ** 2)
        rot_mat[:, 0, 1] = two_s * (qi * qj - qk * qr)
        rot_mat[:, 0, 2] = two_s * (qi * qk + qj * qr)
        rot_mat[:, 1, 0] = two_s * (qi * qj + qk * qr)
        rot_mat[:, 1, 1] = 1 - two_s * (qi ** 2 + qk ** 2)
        rot_mat[:, 1, 2] = two_s * (qj * qk - qi * qr)
        rot_mat[:, 2, 0] = two_s * (qi * qk - qj * qr)
        rot_mat[:, 2, 1] = two_s * (qj * qk + qi * qr)
        rot_mat[:, 2, 2] = 1 - two_s * (qi ** 2 + qj ** 2)
        return rot_mat

    common.quad2rotation = quad2rotation

    # NICE.forward hardcodes device = f'cuda:{p.get_device()}'
    # (src/conv_onet/models/decoder.py:316) -> 'cuda:-1' on CPU tensors.
    # Re-bind with device = p.device; identical math.
    from src.conv_onet.models import decoder as ref_decoder
    import torch as _torch

    def nice_forward(self, p, c_grid, stage="middle", **kwargs):
        device = p.device
        if stage == "coarse":
            occ = self.coarse_decoder(p, c_grid).squeeze(0)
            raw = _torch.zeros(occ.shape[0], 4, device=device).float()
            raw[..., -1] = occ
            return raw
        elif stage == "middle":
            middle_occ = self.middle_decoder(p, c_grid).squeeze(0)
            raw = _torch.zeros(middle_occ.shape[0], 4,
                               device=device).float()
            raw[..., -1] = middle_occ
            return raw
        elif stage == "fine":
            fine_occ = self.fine_decoder(p, c_grid)
            raw = _torch.zeros(fine_occ.shape[0], 4,
                               device=device).float()
            middle_occ = self.middle_decoder(p, c_grid).squeeze(0)
            raw[..., -1] = fine_occ + middle_occ
            return raw
        elif stage == "color":
            fine_occ = self.fine_decoder(p, c_grid)
            raw = self.color_decoder(p, c_grid)
            middle_occ = self.middle_decoder(p, c_grid).squeeze(0)
            raw[..., -1] = fine_occ + middle_occ
            return raw

    ref_decoder.NICE.forward = nice_forward

    from src.utils.Mesher import Mesher

    def get_mesh(self, mesh_out_file, *args, **kwargs):
        print(f"[ref_driver] meshing disabled — skipped {mesh_out_file}")

    Mesher.get_mesh = get_mesh


_install_patches()


def main():
    import argparse

    ap = argparse.ArgumentParser(
        description="Run the reference NICE-SLAM/iMAP* on CPU")
    ap.add_argument("config", help="scene yaml (reference format)")
    ap.add_argument("--input_folder", type=str, default=None)
    ap.add_argument("--output", type=str, default=None)
    ap.add_argument("--nice", dest="nice", action="store_true")
    ap.add_argument("--imap", dest="nice", action="store_false")
    ap.set_defaults(nice=False)
    args = ap.parse_args()

    from src import config
    from src.NICE_SLAM import NICE_SLAM

    cfg = config.load_config(
        args.config,
        "configs/nice_slam.yaml" if args.nice else "configs/imap.yaml")
    slam = NICE_SLAM(cfg, args)
    slam.run()


if __name__ == "__main__":
    main()
