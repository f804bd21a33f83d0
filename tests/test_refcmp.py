"""Head-to-head harness pinning (tools/refcmp/): the exporter's on-disk
layout round-trips through this repo's Replica reader, the decoder
export round-trips through the reference-surgery ingestion bit-exactly,
and the mathutils shim is a correct inverse of the quaternion->matrix
map.  (The reference run itself is a tool, not a test — VERDICT r3 #1.)
"""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refcmp.export import CAM, export_sequence  # noqa: E402


class TestExporter:
    def test_replica_layout_roundtrip(self, tmp_path):
        """Exported frames + poses read back through OUR Replica reader
        must reproduce the rendered GT (the reference's reader applies
        the same transform — src/utils/datasets.py:116-137)."""
        from nice_slam_tpu.config import load_config
        from nice_slam_tpu.utils.datasets import get_dataset

        out = str(tmp_path / "seq")
        poses = export_sequence(out, "seq_a", 4)
        cfg = load_config(overrides={
            "dataset": "replica", "cam": dict(CAM),
            "data": {"input_folder": out, "output": "/tmp/x"}})
        ds = get_dataset(cfg)
        assert len(ds) == 4
        _, color, depth, pose = ds[2]
        np.testing.assert_allclose(pose, poses[2], atol=1e-5)
        assert depth.shape == (CAM["H"], CAM["W"])
        # u16 png round trip: depth exact to quantization
        assert float(np.abs(depth).max()) > 0.5
        assert color.dtype == np.float32 and color.shape[-1] == 3

    def test_sequences_differ(self, tmp_path):
        """seq_b must be a genuinely different sequence (scene content
        and motion), not a re-render of seq_a."""
        pa = export_sequence(str(tmp_path / "a"), "seq_a", 3)
        pb = export_sequence(str(tmp_path / "b"), "seq_b", 3)
        assert np.abs(pa[2] - pb[2]).max() > 0.05


class TestDecoderExport:
    def test_roundtrip_bit_exact(self, tmp_path):
        """npz -> ConvONet .pt -> reference-surgery ingestion must be
        the identity (tools/refcmp/export_decoders.py inverts
        NICE_SLAM.py:159-190 exactly)."""
        torch = pytest.importorskip("torch")  # noqa: F841
        import jax

        from nice_slam_tpu.models import init_model, nice_model_spec
        from nice_slam_tpu.models.pretrain import (
            load_npz_decoders,
            load_pretrained_decoders,
        )
        from tools.refcmp.export_decoders import export_reference_decoders

        npz = os.path.join(REPO, "pretrained", "decoders_tpu.npz")
        if not os.path.exists(npz):
            pytest.skip("no pretrained npz in repo")
        spec = nice_model_spec()
        orig = load_npz_decoders(npz, init_model(jax.random.PRNGKey(0),
                                                 spec))
        c, mf = export_reference_decoders(npz, str(tmp_path))
        back = load_pretrained_decoders(
            init_model(jax.random.PRNGKey(1), spec), spec, c, mf)
        for name in ("coarse", "middle", "fine"):
            for a, b in zip(jax.tree.leaves(orig[name]),
                            jax.tree.leaves(back[name])):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))


class TestMathutilsShim:
    def test_matrix_to_quaternion_inverts_quad2rotation(self):
        """The shim sits on the reference's tracking hot path: its
        quaternion must reproduce the rotation through the reference's
        quad2rotation convention (w,x,y,z Hamilton)."""
        sys.path.insert(0, os.path.join(REPO, "tools", "refcmp", "shims"))
        import importlib

        import mathutils
        importlib.reload(mathutils)

        rng = np.random.RandomState(0)
        for _ in range(20):
            # random rotation via QR
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            quad = np.asarray(mathutils.Matrix(q).to_quaternion())
            w, x, y, z = quad
            # rebuild with the reference's quad2rotation formulas
            # (src/common.py:137-160)
            s = 2.0 / (quad @ quad)
            R = np.array([
                [1 - s * (y * y + z * z), s * (x * y - z * w),
                 s * (x * z + y * w)],
                [s * (x * y + z * w), 1 - s * (x * x + z * z),
                 s * (y * z - x * w)],
                [s * (x * z - y * w), s * (y * z + x * w),
                 1 - s * (x * x + y * y)],
            ])
            np.testing.assert_allclose(R, q, atol=1e-10)


class TestQualityMdReplicates:
    """write_quality_md renders replicate lists (reference_runs /
    ours_runs) and falls back to the legacy single-run keys."""

    def _fake(self, rmse, seed=None, wall=10.0):
        ate = {"rmse": rmse, "mean": rmse * 0.9, "median": rmse * 0.8,
               "max": rmse * 1.5}
        d = {"ate": ate, "wall_s": wall}
        if seed is not None:
            d["seed"] = seed
        return d

    def test_replicates_and_legacy(self, tmp_path):
        from tools.compare_reference import write_quality_md
        results = {
            "seq_x": {
                "reference_runs": [self._fake(0.034), self._fake(0.040)],
                "ours_runs": [self._fake(0.029, seed=0),
                              self._fake(0.050, seed=1)],
            },
            "seq_y": {  # legacy single-run layout
                "reference": self._fake(0.10),
                "ours": self._fake(0.05),
            },
        }
        out = tmp_path / "q.md"
        write_quality_md(results, "default", 40, str(out), mode="nice")
        text = out.read_text()
        assert "| seq_x | reference | #0 | 0.0340 |" in text
        assert "| seq_x | reference | #1 | 0.0400 |" in text
        assert "| seq_x | ours | seed 1 | 0.0500 |" in text
        assert "| seq_y | ours | #0 | 0.0500 |" in text
        # mean-based verdicts: seq_x ref mean 3.7 vs ours 3.95 -> TRAILS;
        # seq_y 10 vs 5 -> BEATS
        assert "**seq_x**: ours TRAILS" in text
        assert "**seq_y**: ours BEATS" in text
