"""Pure-jnp numerics: SE(3), rays, sampling, compositing, grid interpolation.

TPU-first equivalents of the reference's src/common.py free-function library.
Everything here is shape-static, differentiable where it needs to be, and
safe to call under jit.
"""

from nice_slam_tpu.ops.se3 import (
    quat_to_rot,
    rot_to_quat,
    cam_from_tensor,
    tensor_from_cam,
    to_homogeneous,
)
from nice_slam_tpu.ops.rays import (
    ray_dirs,
    rays_from_uv,
    image_rays,
    sample_pixels,
    ray_aabb_far,
)
from nice_slam_tpu.ops.sampling import (
    stratified_zvals,
    perturb_zvals,
    surface_zvals,
    sample_pdf,
    occ_guided_zvals,
)
from nice_slam_tpu.ops.composite import raw2outputs
from nice_slam_tpu.ops.grid import normalize_coords, trilinear_interp
from nice_slam_tpu.ops.optim import adam_init, adam_update, AdamState
