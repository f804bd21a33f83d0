"""Functional stand-in for Blender's `mathutils` — only what the
reference uses: `Matrix(R).to_quaternion()` (ref src/common.py:190-193,
the rotation-matrix -> quaternion direction of its pose parametrization).

Must be numerically correct: it sits on the reference's tracking hot path
(every const-speed init goes matrix -> tensor through it).  Returns
(w, x, y, z) as a numpy array — Blender's Quaternion order, and the order
the reference's quad2rotation consumes (qr, qi, qj, qk =
src/common.py:148)."""

import numpy as np


class Quaternion(np.ndarray):
    def __new__(cls, wxyz):
        return np.asarray(wxyz, dtype=np.float64).view(cls)


class Matrix:
    def __init__(self, rows):
        self.m = np.asarray(rows, dtype=np.float64)

    def to_quaternion(self) -> Quaternion:
        """Shepperd's method (max-pivot branch) — stable for all rotation
        matrices; standard Hamilton convention, the exact inverse of the
        reference's quad2rotation (src/common.py:137-160)."""
        m = self.m[:3, :3]
        t = np.trace(m)
        if t > 0.0:
            s = np.sqrt(t + 1.0) * 2.0
            w = 0.25 * s
            x = (m[2, 1] - m[1, 2]) / s
            y = (m[0, 2] - m[2, 0]) / s
            z = (m[1, 0] - m[0, 1]) / s
        elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
            s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2.0
            w = (m[2, 1] - m[1, 2]) / s
            x = 0.25 * s
            y = (m[0, 1] + m[1, 0]) / s
            z = (m[0, 2] + m[2, 0]) / s
        elif m[1, 1] > m[2, 2]:
            s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2.0
            w = (m[0, 2] - m[2, 0]) / s
            x = (m[0, 1] + m[1, 0]) / s
            y = 0.25 * s
            z = (m[1, 2] + m[2, 1]) / s
        else:
            s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2.0
            w = (m[1, 0] - m[0, 1]) / s
            x = (m[0, 2] + m[2, 0]) / s
            y = (m[1, 2] + m[2, 1]) / s
            z = 0.25 * s
        q = np.array([w, x, y, z])
        return Quaternion(q / np.linalg.norm(q))
