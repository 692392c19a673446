"""Pinhole / SE(3) / voxel-grid geometry as vectorized JAX functions.

TPU-native counterpart of the reference's numpy helpers (reference
utils.py:133-214): every function here is batched, shape-static and
jit-safe, so the whole backproject -> transform -> voxelize pipeline
compiles to one XLA program instead of a per-point Python loop
(reference memory_2.py:863-903).

Conventions (matching the reference):
  - Depth images are (H, W) float32 metres along the camera +z axis.
  - Point clouds are (N, 3) float32 (the reference uses (3, N); row-major
    (N, 3) keeps the 128-lane axis on the coordinate-vector batch).
  - Integer grid conversion truncates toward zero like Python's ``int()``
    (utils.py:201-205), NOT floor -- this matters for negative coords.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny and precision-critical: force fp32 MXU passes
# (TPU default bf16 matmul precision loses ~1e-3 relative accuracy).
_HI = jax.lax.Precision.HIGHEST
import numpy as np


# ---------------------------------------------------------------------------
# Intrinsics
# ---------------------------------------------------------------------------

def camera_intrinsics(h: int, w: int, fov_deg: float = 90.0) -> np.ndarray:
    """3x3 pinhole intrinsics for a square-fov simulator camera
    (utils.py:181-186)."""

    f = w / (2.0 * np.tan(np.deg2rad(fov_deg / 2.0)))
    return np.array(
        [[f, 0.0, w / 2.0], [0.0, f, h / 2.0], [0.0, 0.0, 1.0]], dtype=np.float64
    )


def patch_intrinsics(h: int, w: int) -> np.ndarray:
    """Intrinsics used to project points onto the ViT patch-token grid
    (utils.py:144-150: focal = w/2, principal point (w/2, h/2))."""

    return np.array(
        [[w / 2.0, 0.0, w / 2.0], [0.0, w / 2.0, h / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float64,
    )


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> 3x3 rotation matrix.

    Matches scipy.spatial.transform.Rotation.from_quat (utils.py:139)
    including normalization.  Batched over leading dims.
    """

    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def pose_vec_to_tf(pose: jnp.ndarray) -> jnp.ndarray:
    """(px, py, pz, qx, qy, qz, qw) -> 4x4 homogeneous transform
    (utils.py:133-141).  Batched over leading dims."""

    rot = quat_to_rot(pose[..., 3:7])
    t = pose[..., :3]
    tf = jnp.zeros(pose.shape[:-1] + (4, 4), dtype=pose.dtype)
    tf = tf.at[..., :3, :3].set(rot)
    tf = tf.at[..., :3, 3].set(t)
    tf = tf.at[..., 3, 3].set(1.0)
    return tf


def transform_points(points: jnp.ndarray, tf: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (N, 3) points (utils.py:189-199)."""

    return jnp.dot(points, tf[:3, :3].T, precision=_HI) + tf[:3, 3]


# ---------------------------------------------------------------------------
# Depth backprojection
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("h", "w"))
def _pixel_rays(inv_intr: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)            # (H, W)
    ones = jnp.ones_like(gx)
    p2d = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    return jnp.dot(p2d.reshape(-1, 3), inv_intr.T, precision=_HI)


def depth_to_pointcloud(
    depth: jnp.ndarray,
    inv_intr: jnp.ndarray,
    min_depth: float,
    max_depth: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backproject a depth image into camera-frame points.

    Returns (points (H*W, 3) float32, valid mask (H*W,) bool) -- the flat
    ordering is row-major over (y, x), identical to utils.py:153-178.
    Masked-out points keep their (possibly garbage) coordinates; callers
    combine the mask with downstream validity tests.
    """

    h, w = depth.shape
    rays = _pixel_rays(inv_intr.astype(jnp.float32), h, w)
    z = depth.reshape(-1, 1).astype(jnp.float32)
    pc = rays * z
    zc = pc[:, 2]
    mask = (zc > min_depth) & (zc < max_depth)
    return pc, mask


# ---------------------------------------------------------------------------
# Grid indexing
# ---------------------------------------------------------------------------

def _trunc_int(x: jnp.ndarray) -> jnp.ndarray:
    """Truncate toward zero like Python int() (utils.py:201-205)."""

    return jnp.trunc(x).astype(jnp.int32)


def world_to_grid(
    points: jnp.ndarray, grid_size: int, cell_size: float
) -> jnp.ndarray:
    """World (x, y, z) -> voxel (row, col, h) ids, truncating like the
    reference (utils.py:201-205):

        row = gs/2 - int(x / cs);  col = gs/2 - int(y / cs);  h = int(z / cs)
    """

    half = grid_size // 2
    row = half - _trunc_int(points[..., 0] / cell_size)
    col = half - _trunc_int(points[..., 1] / cell_size)
    hgt = _trunc_int(points[..., 2] / cell_size)
    return jnp.stack([row, col, hgt], axis=-1)


def grid_in_range(
    rc: jnp.ndarray, grid_size: int, zmin: int, zmax: int
) -> jnp.ndarray:
    """Validity mask mirroring memory_2.py:755-756 (note: height compared
    against [zmin, zmax) BEFORE the -zmin shift)."""

    row, col, hgt = rc[..., 0], rc[..., 1], rc[..., 2]
    return (
        (row >= 0)
        & (row < grid_size)
        & (col >= 0)
        & (col < grid_size)
        & (hgt >= zmin)
        & (hgt < zmax)
    )


def project_points(
    intr: jnp.ndarray, points: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points to integer pixel coords.

    Reference semantics (utils.py:208-214): u = int(fx*x/z + cx - 0.5),
    truncated toward zero.  Returns (px, py, z).
    """

    uvw = jnp.dot(points, intr.T.astype(points.dtype), precision=_HI)
    z = uvw[..., 2]
    u = uvw[..., 0] / z
    v = uvw[..., 1] / z
    return _trunc_int(u - 0.5), _trunc_int(v - 0.5), z


# ---------------------------------------------------------------------------
# Frame pose pipeline (memory_2.py:842-861)
# ---------------------------------------------------------------------------

def base_axes_transform(
    forward=(0, 0, -1), left=(-1, 0, 0), up=(0, 1, 0)
) -> np.ndarray:
    """Habitat camera axes -> robot base axes (args.py:60-62,
    memory_2.py:85-88)."""

    tf = np.eye(4)
    tf[0, :3] = forward
    tf[1, :3] = left
    tf[2, :3] = up
    return tf


def base_to_cam_transform(sensor_height: float) -> np.ndarray:
    """Base frame -> camera frame (memory_2.py:90-92): 180-degree flip about
    x plus the sensor mounted ``sensor_height`` up the base y axis."""

    tf = np.eye(4)
    tf[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=np.float64)
    tf[1, 3] = sensor_height
    return tf


def camera_to_world_transform(
    pose: jnp.ndarray,
    inv_init_base_tf: jnp.ndarray,
    base_transform: jnp.ndarray,
    base2cam_tf: jnp.ndarray,
) -> jnp.ndarray:
    """Full camera->allocentric-world transform for one frame.

    Mirrors memory_2.py:849-861: the agent pose is conjugated into the base
    frame, expressed relative to the initial pose, then composed with the
    base->camera mount.
    """

    habitat_tf = pose_vec_to_tf(pose)
    base_pose = base_transform @ habitat_tf @ jnp.linalg.inv(base_transform)
    tf = inv_init_base_tf @ base_pose
    return tf @ base_transform @ base2cam_tf


def initial_base_inverse(
    pose0: jnp.ndarray, base_transform: jnp.ndarray
) -> jnp.ndarray:
    """inv(base @ T(pose0) @ base^-1) (memory_2.py:844-847)."""

    init = base_transform @ pose_vec_to_tf(pose0) @ jnp.linalg.inv(base_transform)
    return jnp.linalg.inv(init)


# ---------------------------------------------------------------------------
# Grid <-> world helpers used by the agent layer
# ---------------------------------------------------------------------------

def grid_to_world_2d(
    grid_rc: np.ndarray, origin_xzy: np.ndarray, grid_size: int, cell_size: float
) -> np.ndarray:
    """Voxel (row, col[, h]) -> habitat world (x, z, y) at the memory
    origin's height (objnav_benchmark.py:452-465)."""

    row, col = float(grid_rc[0]), float(grid_rc[1])
    ox, oz, oy = origin_xzy
    y = oy + (row - grid_size // 2) * cell_size
    x = ox + (col - grid_size // 2) * cell_size
    return np.array([x, oz, y])


def world_to_grid_3d(
    loc_xzy: np.ndarray,
    origin_xzy: np.ndarray,
    grid_size: int,
    cell_size: float,
    zmin: int,
) -> np.ndarray:
    """Habitat world (x, z, y) -> voxel (row, col, h)
    (objnav_benchmark.py:467-475)."""

    x, z, y = loc_xzy
    ox, oz, oy = origin_xzy
    row = int((y - oy) / cell_size + grid_size // 2)
    col = int((x - ox) / cell_size + grid_size // 2)
    h = int(z / cell_size) - zmin
    return np.array([row, col, h])
