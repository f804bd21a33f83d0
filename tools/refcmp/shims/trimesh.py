"""Inert import shim for trimesh (absent from this sandbox).  Only
src/utils/Mesher.py uses it, and the comparison driver disables
meshing."""


def __getattr__(name):
    raise RuntimeError(
        f"trimesh shim: trimesh.{name} is not available in the comparison "
        f"sandbox (meshing is disabled for the head-to-head run)")
