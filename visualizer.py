#!/usr/bin/env python
"""Trajectory/mesh replay — CLI-parity alias for tools/replay.py
(the reference exposes this entry point at the repo root,
reference visualizer.py:1-96).  Its interactive Open3D window becomes
either an offline matplotlib animation (--save/--frames_dir) or a
self-contained INTERACTIVE WebGL viewer (--html: orbit/zoom/pan, time
scrubbing, mesh + frusta + keyframe graph) that opens in any browser —
no GUI stack needed on this host.

Usage:
    python visualizer.py output/Replica/room0 --save replay.mp4
    python visualizer.py output/Replica/room0 --html replay.html
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))

from replay import main  # noqa: E402

if __name__ == "__main__":
    main()
