"""Multi-process (multi-host analogue) launch path
(nice_slam_tpu/parallel/multihost.py): 2 coordinated OS processes over
the CPU backend + gloo collectives, full engine loop, mapping rays
sharded over the cross-process global mesh.  This is the CPU-testable
stand-in for the TPU-pod topology (BASELINE.md "2+ hosts")."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestMultihost:
    def test_two_process_run_converges_and_agrees(self, tmp_path):
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "multihost_demo.py"),
             "--procs", "2", "--frames", "6",
             "--coordinator", "127.0.0.1:12923",
             "--workdir", str(tmp_path)],
            capture_output=True, text=True, timeout=900, cwd=REPO)
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-500:]
        out = json.loads(res.stdout.strip().splitlines()[-1])
        assert out["ok"] is True
        assert len(out["rmse"]) == 2
        # both processes computed the identical trajectory (replicated
        # SPMD state): spread is numerically zero
        assert out["est_sum_spread"] < 1e-3

    def test_initialize_from_cfg_noop_without_config(self):
        from nice_slam_tpu.parallel.multihost import initialize_from_cfg

        assert initialize_from_cfg({"tpu": {}}) is None
        assert initialize_from_cfg(
            {"tpu": {"multihost": {"num_processes": 1}}}) is None
