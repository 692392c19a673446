"""Full-system test: fake env frames -> encode+ingest pipeline -> store
whose voxels geometrically match the scene; query localization finds a
visually distinctive object.

This exercises the exact chain the navigation agents rely on:
renderer conventions -> pose math -> voxelization -> grid<->world
mapping (reference objnav_benchmark.py:452-475) -> query top-K.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.env.fake import BoxScene, FakeNavEnv
from bsc_nav_tpu.env.pathfinding import AgentState, Quat
from bsc_nav_tpu.memory.pipeline import make_build_step, make_query_step
from bsc_nav_tpu.memory.store import init_store
from bsc_nav_tpu.models import vit
from bsc_nav_tpu import geometry as G


@pytest.fixture(scope="module")
def built():
    cfg = small_test_config()
    # denser sampling + a 4x4 patch grid for meaningful query locality
    cfg = cfg.replace(
        memory=cfg.memory.__class__(
            grid_size=96, floor_height=-3.2, map_height=3.2, token_dim=32,
            cache_size=4, voxel_capacity=(1 << 13) - 8, depth_sample_rate=4),
        query=cfg.query.__class__(top_k=16, query_width=56, query_height=56))
    scene = BoxScene.default()
    env = FakeNavEnv(cfg, scene=scene, seed=3)
    env.agent.set_state(AgentState(np.array([0.0, 0.0, 0.0]),
                                   Quat.from_yaw(0.0)))
    env.reset(init_state=env.agent.get_state(), build_map=True)

    vit_cfg = vit.ViTConfig(img_size=56, patch_size=14, dim=32, depth=2,
                            heads=2, num_registers=1)
    params = vit.init_params(vit_cfg, jax.random.PRNGKey(0))

    # spin 360 and collect frames (reference builds by turning in place,
    # memory_2.py:1124-1125)
    frames = []
    obs = env.sims.get_sensor_observations(0)
    for _ in range(12):
        pose = env.agent_pose_vec()
        frames.append((obs["rgb"][:, :, :3].copy(), obs["depth"].copy(),
                       pose))
        obs = env.step("turn_left")

    rgb = jnp.asarray(np.stack([f[0] for f in frames]))
    depth = jnp.asarray(np.stack([f[1] for f in frames]))
    poses = jnp.asarray(np.stack([f[2] for f in frames]))

    state = init_store(cfg.memory)
    build = make_build_step(cfg, vit_cfg)
    carry = (state, jax.random.PRNGKey(7))
    carry, stats = build(carry, params, rgb, depth, poses)
    state = carry[0]
    return cfg, scene, env, state, params, vit_cfg


def grid_to_world(cfg, origin, rc):
    """reference objnav_benchmark.py:452-465 mapping (identity init rot)."""
    row, col, h = rc
    x = origin[0] + (col - cfg.memory.grid_size // 2) * cfg.memory.cell_size
    z = origin[2] + (row - cfg.memory.grid_size // 2) * cfg.memory.cell_size
    y = (h + cfg.memory.zmin) * cfg.memory.cell_size
    return np.array([x, y, z])   # habitat (x, height, z)... y=height


def test_voxels_inside_room(built):
    cfg, scene, env, state, params, vit_cfg = built
    n = int(state.num_voxels)
    assert n > 200
    pos = np.asarray(state.slot_pos)[:n]
    origin = np.asarray(env.original_state.position)
    world = np.stack([grid_to_world(cfg, origin, p) for p in pos])
    bmin = np.asarray(scene.bounds_min)
    bmax = np.asarray(scene.bounds_max)
    ok_x = (world[:, 0] >= bmin[0] - 0.2) & (world[:, 0] <= bmax[0] + 0.2)
    ok_z = (world[:, 2] >= bmin[2] - 0.2) & (world[:, 2] <= bmax[2] + 0.2)
    ok_y = (world[:, 1] >= -0.2) & (world[:, 1] <= bmax[1] + 0.2)
    assert (ok_x & ok_z & ok_y).mean() > 0.99


def test_box_region_is_mapped(built):
    """Voxels must exist near each visible box (they're within grid range
    and in view during the 360 spin)."""
    cfg, scene, env, state, params, vit_cfg = built
    n = int(state.num_voxels)
    pos = np.asarray(state.slot_pos)[:n]
    origin = np.asarray(env.original_state.position)
    world = np.stack([grid_to_world(cfg, origin, p) for p in pos])
    for box in scene.boxes:
        c = np.asarray(box.center)
        d = np.linalg.norm(world[:, [0, 2]] - c[None, [0, 2]], axis=1)
        assert (d < 1.0).sum() > 3, f"no voxels near {box.label}"


def test_rgb_color_recovered(built):
    """Fused voxel colors near a box center match the box color."""
    from bsc_nav_tpu.memory.store import fused_rgb
    cfg, scene, env, state, params, vit_cfg = built
    n = int(state.num_voxels)
    pos = np.asarray(state.slot_pos)[:n]
    rgbs = np.asarray(fused_rgb(state))[:n]
    origin = np.asarray(env.original_state.position)
    world = np.stack([grid_to_world(cfg, origin, p) for p in pos])

    box = scene.boxes[0]   # red bed at (2.5, 2.5)
    c, s = np.asarray(box.center), np.asarray(box.size) / 2
    on = ((np.abs(world[:, 0] - c[0]) < s[0] + 0.12)
          & (np.abs(world[:, 2] - c[2]) < s[2] + 0.12)
          & (world[:, 1] < c[1] + s[1] + 0.12))
    assert on.sum() > 0
    mean_color = rgbs[on].mean(axis=0)
    assert mean_color[0] > 120            # strongly red
    assert mean_color[1] < 90 and mean_color[2] < 90


def test_query_localizes_distinct_object(built):
    """A close-up view of the red box as image query: top-K voxels should
    concentrate near the box (random-weight features are still
    appearance-discriminative)."""
    cfg, scene, env, state, params, vit_cfg = built
    box = scene.boxes[0]
    # stand near the box, look down so it fills the view center (the
    # sensor sits at 1.5 m; the box top is at 0.8 m)
    c = np.asarray(box.center)
    look_from = c + np.array([-0.8, -c[1], -0.8])
    yaw = math.atan2(-(c[0] - look_from[0]), -(c[2] - look_from[2]))
    env.agent.set_state(AgentState(look_from, Quat.from_yaw(yaw)))
    env.step("look_down")
    env.step("look_down")
    env.step("look_down")
    obs = env.sims.get_sensor_observations(0)
    qimg = jnp.asarray(obs["rgb"][None, :, :, :3])

    query = make_query_step(cfg, vit_cfg)
    positions, scores = query(state, params, qimg, top_k=16)
    live = np.asarray(scores) > -np.inf
    pos = np.asarray(positions)[live]
    origin = np.asarray(env.original_state.position)
    world = np.stack([grid_to_world(cfg, origin, p) for p in pos])
    d = np.linalg.norm(world[:, [0, 2]] - c[None, [0, 2]], axis=1)
    # majority of the top-k within 2m of the queried object
    assert (d < 2.0).mean() >= 0.5, f"top-k distances: {d}"


def test_flush_device_detector_feed():
    """VoxelTokenMemory.flush routes through
    detect_batch_instances when the detector provides it (the fully
    device-side long-term feed), and produces the same long-term memory
    as the per-frame host-chain path."""
    from bsc_nav_tpu.agents.spatial_memory import (
        Perception, VoxelTokenMemory)
    from bsc_nav_tpu.memory import longterm as LT
    from bsc_nav_tpu.models import yolo_world as Y

    cfg = small_test_config()
    # random-weight boxes decode to the image center, where the fake
    # room's depth is ~4 m -- the grid must cover it (gs 128 x 0.1 m)
    cfg = cfg.replace(memory=cfg.memory.__class__(
        grid_size=128, floor_height=-3.2, map_height=3.2, token_dim=32,
        cache_size=4, voxel_capacity=(1 << 13) - 8, depth_sample_rate=4))
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=1,
                            heads=2, num_registers=0)
    ycfg = Y.YOLO_TEST
    yparams = Y.init_params(ycfg, jax.random.PRNGKey(2),
                            text_dim=ycfg.embed_dim)
    rng = np.random.default_rng(9)
    temb = rng.normal(size=(3, ycfg.embed_dim)).astype(np.float32)

    class _HostOnly:
        """Delegating proxy that HIDES detect_batch_instances so flush
        takes the per-frame host-chain branch (detect_batch + host NMS
        + instances_from_detections)."""

        def __init__(self, det):
            self._det = det

        def __getattr__(self, name):
            if name == "detect_batch_instances":
                raise AttributeError(name)
            return getattr(self._det, name)

    def run(device_feed: bool):
        env = FakeNavEnv(cfg, seed=3)
        env.reset(init_state=AgentState(np.zeros(3), Quat()),
                  build_map=True)
        det = Y.YoloWorldDetector(yparams, ycfg, ["bed", "sofa", "chair"],
                                  temb, confidence=1e-5)
        if not device_feed:
            det = _HostOnly(det)
        assert hasattr(det, "detect_batch_instances") == device_feed
        mem = VoxelTokenMemory(
            cfg, env=env,
            perception=Perception.create(cfg, vit_cfg=vit_cfg,
                                         batch_size=4),
            detector=det)
        obs = env.sims.get_sensor_observations(0)
        mem.excute(obs, ["turn_left"] * 4)
        mem.flush()
        return mem.long_memory_dict

    dev = run(device_feed=True)
    host = run(device_feed=False)
    assert len(dev) > 0, "device feed produced no instances"
    for item in dev:
        assert set(item) == {"label", "loc", "confidence"}
        assert item["label"] in ("bed", "sofa", "chair")
        assert len(item["loc"]) == 3

    # the device feed must reproduce the host chain's long-term memory
    def key(it):
        return (it["label"], tuple(int(v) for v in it["loc"]))

    assert len(dev) == len(host), (len(dev), len(host))
    for d, h in zip(sorted(dev, key=key), sorted(host, key=key)):
        assert d["label"] == h["label"]
        assert tuple(d["loc"]) == tuple(h["loc"]), (d, h)
        np.testing.assert_allclose(d["confidence"], h["confidence"],
                                   rtol=1e-4, atol=1e-5)
