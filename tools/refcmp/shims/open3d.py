"""Inert import shim for open3d (absent from this sandbox).

The reference imports it at module level in src/utils/Mesher.py but only
CALLS it inside get_mesh/get_bound_from_frames, which the comparison
driver disables (meshing is irrelevant to the trajectory comparison).
Any accidental use raises immediately instead of silently computing
nonsense."""


def __getattr__(name):
    raise RuntimeError(
        f"open3d shim: open3d.{name} is not available in the comparison "
        f"sandbox (meshing is disabled for the head-to-head run)")
