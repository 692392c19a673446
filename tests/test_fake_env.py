"""Tests for the grid pathfinder and the synthetic box-world env,
including the critical renderer <-> backprojection consistency check."""

import math

import numpy as np
import pytest

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.env.fake import Box, BoxScene, FakeNavEnv
from bsc_nav_tpu.env.pathfinding import AgentState, Quat, greedy_follow
from bsc_nav_tpu import geometry as G


@pytest.fixture
def env():
    cfg = small_test_config()
    return FakeNavEnv(cfg, seed=1)


def test_quat_yaw_roundtrip():
    for yaw in [-2.5, -0.3, 0.0, 1.0, 3.0]:
        assert abs(Quat.from_yaw(yaw).yaw() - yaw) < 1e-9 or \
            abs((Quat.from_yaw(yaw).yaw() - yaw) % (2 * math.pi)) < 1e-9


def test_pathfinder_islands_and_area(env):
    pf = env.pathfinder
    assert pf.num_islands() >= 1
    p = pf.get_random_navigable_point()
    assert pf.is_navigable(p)
    isl = pf.get_island(p)
    assert isl >= 0
    assert pf.island_area(isl) > 10.0   # most of an 8x8 room


def test_shortest_path_avoids_boxes(env):
    pf = env.pathfinder
    start = np.array([-3.0, 0.0, -3.0])
    goal = np.array([3.0, 0.0, 3.0])
    path = pf.shortest_path(start, goal)
    assert path is not None
    # path cells are navigable and reach the goal
    for wp in path:
        assert pf.is_navigable(wp)
    assert np.linalg.norm(path[-1][[0, 2]] - goal[[0, 2]]) < 0.5


def test_greedy_follow_reaches_goal(env):
    start = np.array([-3.0, 0.0, -3.0])
    goal = np.array([2.0, 0.0, 2.8])
    env.agent.set_state(AgentState(start, Quat.from_yaw(0.0)))
    actions, snapped = env.move2point(goal)
    assert actions[-1] == "stop"
    for a in actions:
        env.step(a)
    final = env.agent.get_state().position
    assert np.linalg.norm(final[[0, 2]] - snapped[[0, 2]]) < 0.6


def test_step_semantics(env):
    env.agent.set_state(AgentState(np.array([0.0, 0.0, 0.0]),
                                   Quat.from_yaw(0.0)))
    env.step("move_forward")
    p = env.agent.get_state().position
    np.testing.assert_allclose(p, [0.0, 0.0, -0.25], atol=1e-9)
    env.step("turn_left")
    assert abs(env.yaw - math.radians(30)) < 1e-9
    obs = env.step("look_down")
    assert env.pitch < 0
    assert obs["rgb"].shape == (64, 64, 4)
    assert obs["depth"].shape == (64, 64)


def test_obstacle_blocks_movement():
    cfg = small_test_config()
    scene = BoxScene(
        bounds_min=(-4, 0, -4), bounds_max=(4, 3, 4),
        boxes=[Box((0, 0.5, -1.0), (1.0, 1.0, 1.0), (255, 0, 0), "box")])
    env = FakeNavEnv(cfg, scene=scene)
    env.agent.set_state(AgentState(np.array([0.0, 0.0, 0.0]),
                                   Quat.from_yaw(0.0)))
    for _ in range(10):
        env.step("move_forward")
    # blocked before entering the box footprint (+ agent radius)
    assert env.position[2] > -0.9


def test_render_backprojection_consistency():
    """Backprojecting the rendered depth with the framework's camera
    conventions must land points on actual scene surfaces."""
    cfg = small_test_config()
    scene = BoxScene.default()
    env = FakeNavEnv(cfg, scene=scene)
    pos = np.array([0.0, 0.0, 0.0])
    yaw = math.radians(40.0)
    env.agent.set_state(AgentState(pos, Quat.from_yaw(yaw)))
    obs = env._observe()
    depth = obs["depth"]
    h, w = depth.shape

    intr = G.camera_intrinsics(h, w, cfg.sensor.hfov_deg)
    pc, mask = G.depth_to_pointcloud(
        depth, np.linalg.inv(intr), 0.05, 40.0)
    pc = np.asarray(pc)

    # camera frame (x right, y down, z fwd) -> world
    cam = pos + np.array([0.0, cfg.sensor.sensor_height, 0.0])
    fwd = np.array([-math.sin(yaw), 0.0, -math.cos(yaw)])
    right = np.array([math.cos(yaw), 0.0, -math.sin(yaw)])
    up = np.array([0.0, 1.0, 0.0])
    world = (cam[None]
             + pc[:, 0:1] * right[None]
             - pc[:, 1:2] * up[None]
             + pc[:, 2:3] * fwd[None])
    world = world[np.asarray(mask)]

    bmin = np.asarray(scene.bounds_min) - 1e-3
    bmax = np.asarray(scene.bounds_max) + 1e-3
    inside = ((world >= bmin[None]) & (world <= bmax[None])).all(axis=1)
    assert inside.mean() > 0.999

    # points colored like the first box must lie on that box's surface
    rgb = obs["rgb"][:, :, :3].reshape(-1, 3)[np.asarray(mask)]
    box = scene.boxes[0]
    on_box = (rgb == np.asarray(box.color, np.uint8)).all(axis=1)
    if on_box.sum() > 0:
        c = np.asarray(box.center)
        s = np.asarray(box.size) / 2 + 1e-2
        d = np.abs(world[on_box] - c[None])
        assert ((d <= s[None] + 1e-3).all(axis=1)).mean() > 0.98


def test_wall_depth_exact():
    """Looking straight at a wall: center-pixel depth == distance."""
    cfg = small_test_config()
    scene = BoxScene(bounds_min=(-4, 0, -4), bounds_max=(4, 3, 4), boxes=[])
    env = FakeNavEnv(cfg, scene=scene)
    env.agent.set_state(AgentState(np.array([0.0, 0.0, 2.0]),
                                   Quat.from_yaw(0.0)))   # looking -z
    obs = env._observe()
    h, w = obs["depth"].shape
    center = obs["depth"][h // 2, w // 2]
    np.testing.assert_allclose(center, 6.0, atol=0.05)


def test_topdown_map_measure():
    from bsc_nav_tpu.env.benchmark import (
        FakeBenchmarkEnv, episodes_for_scene)
    cfg = small_test_config()
    scene = BoxScene.default()
    bench = FakeBenchmarkEnv(cfg, episodes_for_scene(scene), scene=scene)
    bench.reset()
    for a in ["move_forward", "turn_left", "move_forward"]:
        bench.step(a)
    m = bench.get_metrics()
    img = m["top_down_map"]
    assert img.ndim == 3 and img.dtype == np.uint8
    # fog of war revealed something, trail + agent drawn
    assert (img == 245).any()          # seen cells
    assert (img[:, :, 2] == 220).any() # trail blue
