"""The interactive HTML replay viewer (tools/replay.py --html).

Covers the offline-interactive analogue of the reference's live Open3D
replay window (src/tools/viz.py:180-209): geometry embedding, mesh
decimation, NaN-GT masking, and the no-mesh path."""

import base64
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nice_slam_tpu.utils.plyio import write_ply  # noqa: E402


def _orbit_c2w(n, radius=2.0):
    out = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    out[:, 0, 3] = radius * np.cos(th)
    out[:, 2, 3] = radius * np.sin(th)
    return out


def _fake_run(tmp_path, n=12, with_mesh=True, nan_gt_frames=(),
              selkf=False):
    out = tmp_path / "run"
    (out / "ckpts").mkdir(parents=True)
    est = _orbit_c2w(n)
    gt = _orbit_c2w(n, radius=2.01)
    for f in nan_gt_frames:
        gt[f] = np.nan
    extra = {"extra/kf_frame_ids": np.array([0, 5, 10])}
    if selkf:
        # two mapping events with padded windows (-2 = empty slot); the
        # second references frame 20 >= n to exercise range filtering
        extra["extra/selkf_event_idx"] = np.array([5, 10])
        extra["extra/selkf_frames"] = np.array([[0, 5, -2], [0, 5, 20]])
    np.savez(out / "ckpts" / "00011.npz", est_c2w=est, gt_c2w=gt,
             idx=np.int64(n), **extra)
    if with_mesh:
        (out / "mesh").mkdir()
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     np.float32)
        t = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
        c = np.full((4, 3), 128, np.uint8)
        write_ply(str(out / "mesh" / "final_mesh.ply"), v, t, c)
    return out


def _extract_data(html):
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA block missing"
    return json.loads(m.group(1))


class TestReplayHtml:
    def test_writes_selfcontained_viewer(self, tmp_path):
        run = _fake_run(tmp_path)
        out = tmp_path / "viewer.html"
        from tools.replay import write_html
        write_html(str(run), str(out))
        html = out.read_text()
        # self-contained: no external fetches of any kind
        assert "http://" not in html and "https://" not in html
        data = _extract_data(html)
        assert data["n"] == 12
        assert data["kf"] == [0, 5, 10]
        est = np.frombuffer(base64.b64decode(data["est"]),
                            np.float32).reshape(12, 16)
        np.testing.assert_allclose(est[:, 3], 2.0 * np.cos(
            np.linspace(0, 2 * np.pi, 12, endpoint=False)), atol=1e-6)
        tris = np.frombuffer(base64.b64decode(data["mesh_i"]), np.uint32)
        assert tris.shape == (12,)  # 4 faces x 3
        assert float(data["ate"]) < 0.05  # near-identical orbits

    def test_no_mesh_and_nan_gt(self, tmp_path):
        run = _fake_run(tmp_path, with_mesh=False, nan_gt_frames=(3, 7))
        out = tmp_path / "viewer.html"
        from tools.replay import write_html
        write_html(str(run), str(out))
        data = _extract_data(out.read_text())
        assert "mesh_i" not in data
        assert "ate" in data  # NaN frames masked, not fatal

    def test_mesh_decimation_cap(self, tmp_path):
        run = _fake_run(tmp_path)
        out = tmp_path / "viewer.html"
        from tools.replay import write_html
        write_html(str(run), str(out), max_faces=2)
        data = _extract_data(out.read_text())
        tris = np.frombuffer(base64.b64decode(data["mesh_i"]), np.uint32)
        assert tris.shape == (6,)  # capped at 2 faces

    def test_selected_keyframes_embedded(self, tmp_path):
        """The save_selected_keyframes_info record reaches the viewer:
        per-event windows with empty slots dropped and out-of-range
        frames filtered."""
        run = _fake_run(tmp_path, selkf=True)
        out = tmp_path / "viewer.html"
        from tools.replay import write_html
        write_html(str(run), str(out))
        data = _extract_data(out.read_text())
        assert data["selkf"] == [[5, [0, 5]], [10, [0, 5]]]

    def test_mesh_decimation_compacts_vertices(self, tmp_path):
        """Capping faces must also shrink the embedded vertex/color
        arrays to the referenced vertices (the cap otherwise does not
        bound file size)."""
        run = _fake_run(tmp_path)
        out = tmp_path / "viewer.html"
        from tools.replay import write_html
        write_html(str(run), str(out), max_faces=1)
        data = _extract_data(out.read_text())
        tris = np.frombuffer(base64.b64decode(data["mesh_i"]), np.uint32)
        verts = np.frombuffer(base64.b64decode(data["mesh_v"]), np.float32)
        assert tris.shape == (3,)
        assert verts.shape == (9,)  # exactly the 3 referenced vertices
        assert tris.max() < 3  # indices remapped into the compacted array
        cols = np.frombuffer(base64.b64decode(data["mesh_c"]), np.float32)
        assert cols.shape == (9,)

    def test_cli_entry(self, tmp_path):
        run = _fake_run(tmp_path)
        out = tmp_path / "v.html"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "replay.py"),
             str(run), "--html", str(out)],
            capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        assert out.exists() and out.stat().st_size > 10000
