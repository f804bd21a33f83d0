"""Differentiable SE(3) <-> tensor conversions.

The camera is parameterized as a 7-vector ``[qw qx qy qz tx ty tz]``
(quaternion + translation), matching the reference's camera tensor
(reference src/common.py:137-201).  Both directions are closed-form jnp and
differentiable — the reference needs CPU ``mathutils`` for matrix->quat
(src/common.py:190-193); here matrix->quat is a branchless Shepperd method
so pose initialization stays on-device.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (..., 4) [w x y z] -> rotation matrices (..., 3, 3).

    Handles non-unit quaternions via the 2/|q|^2 normalization so gradient
    steps on the raw 4-vector stay valid rotations (reference
    src/common.py:137-160 semantics).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = 2.0 / jnp.sum(q * q, axis=-1)
    r00 = 1 - s * (y * y + z * z)
    r01 = s * (x * y - z * w)
    r02 = s * (x * z + y * w)
    r10 = s * (x * y + z * w)
    r11 = 1 - s * (x * x + z * z)
    r12 = s * (y * z - x * w)
    r20 = s * (x * z - y * w)
    r21 = s * (y * z + x * w)
    r22 = 1 - s * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4) [w x y z].

    Branchless Shepperd: compute all four case quaternions, pick the one with
    the numerically largest pivot. Safe under jit/vmap, differentiable a.e.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22

    # Four pivot magnitudes (4*q_i^2 forms).
    pw = 1.0 + tr
    px = 1.0 + r00 - r11 - r22
    py = 1.0 - r00 + r11 - r22
    pz = 1.0 - r00 - r11 + r22
    p = jnp.stack([pw, px, py, pz], axis=-1)
    p = jnp.maximum(p, 1e-12)
    s = jnp.sqrt(p)  # 2*|q_pivot|

    # Candidate quaternions, one per pivot.  With S_i = 2*sqrt(p_i), the
    # pivot component is S_i/4 = p_i/(2*s_i) and the rest are (sum/diff)/S_i,
    # so every candidate is [numerators]/(2*s_i) with pivot numerator p_i.
    qw = jnp.stack([p[..., 0], r21 - r12, r02 - r20, r10 - r01], axis=-1) / s[..., 0:1]
    qx = jnp.stack([r21 - r12, p[..., 1], r01 + r10, r02 + r20], axis=-1) / s[..., 1:2]
    qy = jnp.stack([r02 - r20, r01 + r10, p[..., 2], r12 + r21], axis=-1) / s[..., 2:3]
    qz = jnp.stack([r10 - r01, r02 + r20, r12 + r21, p[..., 3]], axis=-1) / s[..., 3:4]
    cands = jnp.stack([qw, qx, qy, qz], axis=-2) * 0.5  # (..., 4cases, 4)

    case = jnp.argmax(p, axis=-1)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32).repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0 (sign is gauge; fix it for reproducibility).
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return q


def cam_from_tensor(t: jnp.ndarray) -> jnp.ndarray:
    """Camera 7-vector(s) (..., 7) -> c2w matrices (..., 3, 4)."""
    R = quat_to_rot(t[..., :4])
    return jnp.concatenate([R, t[..., 4:7][..., :, None]], axis=-1)


def tensor_from_cam(c2w: jnp.ndarray) -> jnp.ndarray:
    """c2w matrices (..., 3|4, 4) -> camera 7-vectors (..., 7)."""
    R = c2w[..., :3, :3]
    T = c2w[..., :3, 3]
    return jnp.concatenate([rot_to_quat(R), T], axis=-1)


def to_homogeneous(c2w34: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4) with a [0 0 0 1] bottom row."""
    batch = c2w34.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=c2w34.dtype), batch + (1, 4)
    )
    return jnp.concatenate([c2w34, bottom], axis=-2)
