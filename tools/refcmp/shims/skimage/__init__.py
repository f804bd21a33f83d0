"""Inert import shim for scikit-image (absent from this sandbox).
Only src/utils/Mesher.py uses it (marching_cubes), and the comparison
driver disables meshing."""

from . import measure  # noqa: F401

__version__ = "0.19.0"
