#!/usr/bin/env python
"""Offline trajectory/mesh replay — CLI-parity alias for tools/replay.py
(the reference exposes this entry point at the repo root,
reference visualizer.py:1-96; its interactive Open3D window becomes an
offline matplotlib animation here — this sandbox has no GUI stack).

Usage:
    python visualizer.py output/Replica/room0 --save replay.mp4
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))

from replay import main  # noqa: E402

if __name__ == "__main__":
    main()
