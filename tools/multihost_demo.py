#!/usr/bin/env python
"""2-process multi-host SLAM validation (BASELINE.md "2+ hosts" path).

Launches N coordinated OS processes, each running the FULL synthetic
SLAM engine under `jax.distributed` with the mapping optimization
ray-sharded over the global (cross-process) device mesh and its gradient
psum riding gloo/TCP — the CPU-backend stand-in for a TPU pod's ICI/DCN
(design + rationale: nice_slam_tpu/parallel/multihost.py docstring).

Every process computes bit-identical state (same data, same RNG); the
driver asserts each converged trajectory and that the processes agree.

Usage:
    python tools/multihost_demo.py               # parent: spawn + assert
    python tools/multihost_demo.py --procs 2 --frames 6
Exit 0 + one JSON line on success.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(args):
    sys.path.insert(0, REPO)
    from nice_slam_tpu.parallel.multihost import initialize

    pid = initialize(args.coordinator, args.procs, args.proc_id,
                     timeout_s=90)
    import jax
    import numpy as np

    assert jax.device_count() == args.procs, (
        f"global mesh missing: {jax.device_count()} devices")

    from nice_slam_tpu.config import load_config
    from nice_slam_tpu.engine import SlamEngine

    cfg = load_config(overrides={
        "dataset": "synthetic", "synthetic": {"n_frames": args.frames},
        "cam": {"H": 40, "W": 52, "fx": 40.0, "fy": 40.0,
                "cx": 25.5, "cy": 19.5},
        "grid_len": {"coarse": 1.0, "middle": 0.4, "fine": 0.2,
                     "color": 0.2},
        "mapping": {"bound": [[-0.5, 4.5], [-0.5, 3.5], [-0.5, 4.5]],
                    "every_frame": 3, "iters_first": 30, "iters": 8,
                    "pixels": 96, "mapping_window_size": 3,
                    "keyframe_every": 3, "ckpt_freq": 10000,
                    "mesh_freq": 10000, "color_refine": False},
        "tracking": {"iters": 4, "pixels": 64,
                     "ignore_edge_W": 4, "ignore_edge_H": 4},
        "rendering": {"N_samples": 10, "N_surface": 5},
        # the global mesh: data_parallel over every device of every
        # process (mapping rays shard, gradients psum cross-process)
        "tpu": {"seed": 0, "data_parallel": True,
                "mesh_shape": [args.procs]},
        "data": {"output": args.out}})
    eng = SlamEngine(cfg, output=args.out)
    assert eng.mesh is not None and eng.mesh.devices.size == args.procs
    assert eng.is_primary == (pid == 0)
    eng.run(progress=False)
    stats = eng.ate()
    est = eng.est_c2w[:args.frames]

    # cross-process psum microbenchmark: the SAME measurement
    # tools/bench_scaling.py takes on a device mesh, here riding the
    # real inter-process transport (gloo/TCP on CPU; DCN on a pod) —
    # times the all-reduce of a dp-gradient-sized buffer so the
    # docs/SCALING.md cost model has a measured cross-HOST point
    import time as _time

    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    nbytes = 8 * 2 ** 20  # 8 MiB/process — dp grid-gradient order
    mesh = Mesh(np.array(jax.devices()), ("data",))
    f = jax.jit(shard_map(lambda v: jax.lax.psum(v, "data"), mesh=mesh,
                          in_specs=P("data"), out_specs=P()))
    x = jnp.zeros((args.procs, nbytes // 4), jnp.float32)
    np.asarray(jax.device_get(f(x)[:1]))  # compile + first exec
    t0 = _time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = f(x)
    np.asarray(jax.device_get(y[:1]))
    psum_s = (_time.perf_counter() - t0) / reps

    out = {"proc": pid, "rmse": stats["rmse"],
           "est_sum": float(np.abs(est).sum()),
           "psum_bytes_per_proc": nbytes,
           "psum_s": round(psum_s, 6),
           "psum_algbw_gbps": round(
               2 * nbytes * (args.procs - 1) / args.procs
               / psum_s / 1e9, 4)}
    # every process reports; the parent cross-checks agreement
    with open(os.path.join(args.workdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--coordinator", default="127.0.0.1:12921")
    ap.add_argument("--workdir", default="/tmp/nice_slam_tpu_multihost")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--rmse-bound", type=float, default=0.5)
    ap.add_argument("--proc-id", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--out", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.proc_id is not None:
        child(args)
        return

    os.makedirs(args.workdir, exist_ok=True)
    env = dict(os.environ)
    # bypass any sitecustomize that would grab an accelerator before
    # jax.distributed.initialize, and pin one local CPU device/process
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")

    procs = []
    logs = []
    for i in range(args.procs):
        log = open(os.path.join(args.workdir, f"proc{i}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--proc-id", str(i), "--procs", str(args.procs),
             "--frames", str(args.frames),
             "--coordinator", args.coordinator,
             "--workdir", args.workdir,
             "--out", os.path.join(args.workdir, f"out{i}")],
            env=env, stdout=log, stderr=subprocess.STDOUT, cwd=REPO))
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=args.timeout))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    results = []
    for i in range(args.procs):
        path = os.path.join(args.workdir, f"proc{i}.json")
        if rcs[i] != 0 or not os.path.exists(path):
            tail = open(os.path.join(args.workdir,
                                     f"proc{i}.log")).read()[-2000:]
            sys.exit(f"process {i} failed (rc={rcs[i]}):\n{tail}")
        with open(path) as f:
            results.append(json.load(f))

    rmses = [r["rmse"] for r in results]
    sums = [r["est_sum"] for r in results]
    ok = (all(r < args.rmse_bound for r in rmses)
          and max(sums) - min(sums) < 1e-3)
    print(json.dumps({"ok": ok, "procs": args.procs, "rmse": rmses,
                      "est_sum_spread": max(sums) - min(sums),
                      "psum_s": results[0].get("psum_s"),
                      "psum_algbw_gbps":
                          results[0].get("psum_algbw_gbps")}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
