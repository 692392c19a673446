"""Unit tests for bsc_nav_tpu.geometry against numpy oracles.

The oracles re-state the reference formulas (reference utils.py:133-214)
in plain numpy/scipy so the vectorized JAX implementations can be checked
point-for-point, including the truncation-toward-zero integer semantics.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from bsc_nav_tpu import geometry as G


# --- numpy oracles (formula source: reference utils.py, re-stated) -------

def oracle_pose_tf(pose):
    # utils.py:133-141 semantics: translation + scipy quaternion
    tf = np.eye(4)
    tf[:3, 3] = pose[:3]
    tf[:3, :3] = R.from_quat(pose[3:]).as_matrix()
    return tf


def oracle_depth2pc(depth, intr, min_depth, max_depth):
    # utils.py:153-178 semantics: row-major pixel grid, +0.5 centers
    h, w = depth.shape
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x = x.reshape(1, -1) + 0.5
    y = y.reshape(1, -1) + 0.5
    z = depth.reshape(1, -1)
    p2d = np.vstack([x, y, np.ones_like(x)])
    pc = np.linalg.inv(intr) @ p2d
    pc = pc * z
    mask = (pc[2] > min_depth) & (pc[2] < max_depth)
    return pc, mask


def oracle_grid_id(gs, cs, x, y, z):
    # utils.py:201-205 semantics: int() truncation (toward zero), nested
    row = int(gs / 2 - int(x / cs))
    col = int(gs / 2 - int(y / cs))
    h = int(z / cs)
    return [row, col, h]


def oracle_project(cam_mat, p):
    # utils.py:208-214 semantics
    q = cam_mat @ p.reshape(3, 1)
    z = q[2, 0]
    q = q / z
    return int(q[0, 0] - 0.5), int(q[1, 0] - 0.5), z


# --- tests ----------------------------------------------------------------

def test_quat_to_rot_matches_scipy(rng):
    q = rng.normal(size=(32, 4)).astype(np.float64)
    ours = np.asarray(G.quat_to_rot(jnp.asarray(q)))
    for i in range(32):
        expected = R.from_quat(q[i]).as_matrix()
        np.testing.assert_allclose(ours[i], expected, atol=1e-6)


def test_pose_vec_to_tf(rng):
    pose = rng.normal(size=7)
    pose[3:] /= np.linalg.norm(pose[3:])
    ours = np.asarray(G.pose_vec_to_tf(jnp.asarray(pose)))
    np.testing.assert_allclose(ours, oracle_pose_tf(pose), atol=1e-6)


def test_camera_intrinsics():
    intr = G.camera_intrinsics(680, 680, 90.0)
    # focal for 90deg square fov = w/2
    np.testing.assert_allclose(intr[0, 0], 340.0)
    np.testing.assert_allclose(intr[0, 2], 340.0)
    np.testing.assert_allclose(intr[1, 2], 340.0)


def test_depth_to_pointcloud_matches_oracle(rng):
    h, w = 17, 23
    depth = rng.uniform(0.0, 12.0, size=(h, w)).astype(np.float32)
    intr = G.camera_intrinsics(h, w, 90.0)
    pc_oracle, mask_oracle = oracle_depth2pc(depth, intr, 0.1, 10.0)

    pc, mask = G.depth_to_pointcloud(jnp.asarray(depth), jnp.asarray(np.linalg.inv(intr)), 0.1, 10.0)
    np.testing.assert_allclose(np.asarray(pc), pc_oracle.T, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mask), mask_oracle)


def test_transform_points(rng):
    pts = rng.normal(size=(64, 3))
    pose = rng.normal(size=7)
    pose[3:] /= np.linalg.norm(pose[3:])
    tf = oracle_pose_tf(pose)
    expected = (tf @ np.vstack([pts.T, np.ones((1, 64))]))[:3].T
    ours = np.asarray(G.transform_points(jnp.asarray(pts), jnp.asarray(tf)))
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_world_to_grid_truncation(rng):
    gs, cs = 1000, 0.1
    # include negative coordinates: int() truncates toward zero, floor doesn't
    pts = rng.uniform(-40, 40, size=(256, 3))
    ours = np.asarray(G.world_to_grid(jnp.asarray(pts), gs, cs))
    for i in range(256):
        expected = oracle_grid_id(gs, cs, *pts[i])
        np.testing.assert_array_equal(ours[i], expected)


def test_project_points_matches_oracle(rng):
    intr = G.camera_intrinsics(48, 48, 90.0)
    pts = rng.uniform(0.5, 5.0, size=(128, 3))
    pts[:, :2] -= 2.5  # include negative x/y
    px, py, z = G.project_points(jnp.asarray(intr), jnp.asarray(pts))
    px, py, z = np.asarray(px), np.asarray(py), np.asarray(z)
    for i in range(128):
        ex, ey, ez = oracle_project(intr, pts[i])
        assert px[i] == ex and py[i] == ey
        np.testing.assert_allclose(z[i], ez, rtol=1e-5)


def test_grid_in_range():
    rc = jnp.asarray([[0, 0, -100], [999, 999, 99], [1000, 0, 0], [-1, 0, 0],
                      [0, 0, -101], [0, 0, 100]])
    mask = np.asarray(G.grid_in_range(rc, 1000, -100, 100))
    np.testing.assert_array_equal(mask, [True, True, False, False, False, False])


def test_camera_to_world_roundtrip(rng):
    """A point at the camera origin must land at the agent position
    relative to the initial pose (memory_2.py:842-861 frame chain)."""
    base = jnp.asarray(G.base_axes_transform())
    base2cam = jnp.asarray(G.base_to_cam_transform(sensor_height=1.5))

    pose0 = np.array([1.0, 0.5, -2.0, 0, 0, 0, 1.0])
    inv_init = G.initial_base_inverse(jnp.asarray(pose0), base)

    # same pose: camera origin should map to (0, sensor_height, 0) in base
    tf = G.camera_to_world_transform(jnp.asarray(pose0), inv_init, base, base2cam)
    origin_world = np.asarray(tf @ jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(origin_world[:3], [0.0, 0.0, 1.5], atol=1e-6)

    # translated pose: displacement is expressed in the base axes
    pose1 = pose0.copy()
    pose1[0] += 2.0   # habitat +x
    tf1 = G.camera_to_world_transform(jnp.asarray(pose1), inv_init, base, base2cam)
    origin1 = np.asarray(tf1 @ jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    # habitat +x is base -y (left axis [-1,0,0]): moves -2 in base y
    np.testing.assert_allclose(origin1[:3], [0.0, -2.0, 1.5], atol=1e-5)
