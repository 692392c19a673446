"""Full ObjectNav episodes on the fake box world: memory build (with
detector-fed long-term memory), two-stage retrieval, waypoint
navigation, 360-scan verification with a mock VLM -- the complete
reference control flow (objnav_benchmark.py:1255-1321) offline.
"""

import os

import numpy as np
import pytest
import jax

from bsc_nav_tpu.config import (
    AgentConfig, MemoryConfig, QueryConfig, SensorConfig, small_test_config)
from bsc_nav_tpu.agents import llm as L
from bsc_nav_tpu.agents.matchers import ColorViewScorer
from bsc_nav_tpu.agents.robot import ObjectNavRobot
from bsc_nav_tpu.agents.spatial_memory import Perception, VoxelTokenMemory
from bsc_nav_tpu.env.benchmark import FakeBenchmarkEnv, episodes_for_scene
from bsc_nav_tpu.env.fake import BoxScene, FakeNavEnv
from bsc_nav_tpu.env.pathfinding import AgentState, Quat
from bsc_nav_tpu.models import vit
from bsc_nav_tpu.models.detector import ColorPrototypeDetector


def make_cfg():
    cfg = small_test_config()
    return cfg.replace(
        memory=MemoryConfig(
            grid_size=96, floor_height=-3.2, map_height=3.2, token_dim=32,
            cache_size=4, voxel_capacity=(1 << 13) - 8, depth_sample_rate=4),
        query=QueryConfig(top_k=32, query_width=56, query_height=56,
                          cluster_eps=10.0, cluster_min_samples=3),
        agent=AgentConfig(random_move_num=3, max_path_len=500),
    )


class SceneImagination:
    """Imagination test double: 'renders' the named object by pointing a
    camera at the scene box whose label appears in the prompt (standing
    in for SD3.5 text->image, memory_2.py:258-276)."""

    def __init__(self, cfg, scene: BoxScene):
        self.scene = scene
        self.env = FakeNavEnv(cfg, scene=scene, seed=11)

    def __call__(self, text: str) -> np.ndarray:
        import math
        import re as _re
        box = None
        for b in self.scene.boxes:
            if b.label and _re.search(rf"\b{_re.escape(b.label)}\b", text):
                box = b
                break
        if box is None:
            box = self.scene.boxes[0]
        c = np.asarray(box.center)
        views = []
        for off in [(-0.8, -0.8), (-0.9, 0.0), (0.0, -0.9)]:
            pos = c + np.array([off[0], -c[1], off[1]])
            yaw = math.atan2(-(c[0] - pos[0]), -(c[2] - pos[2]))
            self.env.agent.set_state(AgentState(pos, Quat.from_yaw(yaw)))
            self.env.pitch = -math.radians(45)
            obs = self.env.sims.get_sensor_observations(0)
            views.append(obs["rgb"][:, :, :3])
        return np.stack(views)


PROTOTYPES = {
    "bed": (200, 30, 30),
    "plant": (30, 180, 40),
    "sofa": (40, 60, 220),
    "tv monitor": (230, 220, 40),
    "table": (150, 90, 40),
}


def mock_llm():
    return L.MockLLMClient(responders=[
        (lambda t: "Judge whether" in t,
         lambda t: "Success: yes\nneed forward: no\nlooks right"),
        (lambda t: "Rewrite the following" in t,
         lambda t: t[-500:]),     # echo; contains the goal label
    ])


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    cfg = make_cfg()
    scene = BoxScene.default()
    episodes = episodes_for_scene(scene, start=(0.0, 0.0, 0.0), seed=4)
    # success_distance 1.5: episode goals are object CENTERS (habitat's
    # 1.0 m is measured to view points around the object instead)
    bench = FakeBenchmarkEnv(cfg, episodes, scene=scene, seed=5,
                             success_distance=1.5)

    vit_cfg = vit.ViTConfig(img_size=56, patch_size=14, dim=32, depth=2,
                            heads=2, num_registers=1)
    perception = Perception.create(cfg, vit_cfg=vit_cfg, batch_size=8)
    detector = ColorPrototypeDetector(PROTOTYPES, confidence=0.5)
    imagination = SceneImagination(cfg, scene)

    memory = VoxelTokenMemory(
        cfg, env=bench.nav_env, perception=perception, detector=detector,
        imagination=imagination,
        memory_path=str(tmp_path_factory.mktemp("memory")))

    # build the scene memory by random-walk exploration (the reference
    # pre-build flow, create_memory_for_dataset.py:112)
    bench.nav_env.reset(init_state=AgentState(np.zeros(3), Quat()),
                        build_map=True)
    memory.exploring_create_memory(save=False)
    return cfg, scene, bench, memory


def test_memory_built_with_instances(world):
    cfg, scene, bench, memory = world
    assert int(memory.state.num_voxels) > 300
    labels = {o["label"] for o in memory.long_memory_dict}
    # the color detector should have spotted several of the five objects
    assert len(labels) >= 3, labels
    # dedup keeps the instance list compact
    assert len(memory.long_memory_dict) < 80


def test_objnav_episode_long_memory_path(world):
    """Stage-1 (long-term memory) navigation succeeds for a detected
    object."""
    cfg, scene, bench, memory = world
    robot = ObjectNavRobot(memory, bench, llm_client=mock_llm(),
                           matcher=ColorViewScorer(PROTOTYPES))
    # episode 0 targets the 'bed' box
    obs = bench.reset()
    robot.reset(obs)
    assert bench.current_episode.object_category == "bed"
    robot.move2textprompt("a bed")
    metrics = bench.get_metrics()
    assert robot.nav_log["search_point"] >= 1
    assert metrics["success"] == 1.0, metrics
    assert metrics["spl"] > 0.1
    # long-term memory resolved it before any working-memory query
    assert robot.nav_log["long_memory_query"] >= 1
    # per-query debug artifact beside the memory bundle
    # (objnav_benchmark.py:560)
    assert os.path.exists(os.path.join(memory.memory_save_path,
                                       "best_locs_a bed.npy"))


def test_objnav_episode_working_memory_path(world):
    """Stage-2 (working memory / imagination) navigation with long-term
    memory disabled (use_only_working_memory, args.py:86)."""
    cfg, scene, bench, memory = world
    cfg2 = cfg.replace(agent=cfg.agent.__class__(
        use_only_working_memory=True, random_move_num=3, max_path_len=500))
    memory.cfg = cfg2
    try:
        robot = ObjectNavRobot(memory, bench, llm_client=mock_llm(),
                               matcher=ColorViewScorer(PROTOTYPES))
        obs = bench.reset()   # -> episode 1: 'plant'
        robot.reset(obs)
        target = bench.current_episode.object_category
        robot.move2textprompt(f"a {target}")
        metrics = bench.get_metrics()
        assert robot.nav_log["working_memory_query"] >= 1
        assert robot.nav_log["long_memory_query"] == 0
        assert metrics["distance_to_goal"] < 2.5, metrics
    finally:
        memory.cfg = cfg


def test_imagenav_episode(world):
    """Image-goal navigation (imagenav_benchmark.py flow): query with a
    rendered view of the goal object."""
    cfg, scene, bench, memory = world
    robot = ObjectNavRobot(memory, bench, llm_client=L.MockLLMClient(
        default="Success: yes\nneed forward: no"),
        matcher=ColorViewScorer(PROTOTYPES))
    obs = bench.reset()   # episode 2: 'sofa'
    robot.reset(obs)
    target_label = bench.current_episode.object_category
    goal_img = SceneImagination(cfg, scene)(target_label)[0]
    robot.move2imgprompt(goal_img)
    metrics = bench.get_metrics()
    assert robot.nav_log["working_memory_query"] >= 1
    assert metrics["distance_to_goal"] < 3.0, metrics


def test_save_log_written(world, tmp_path):
    cfg, scene, bench, memory = world
    robot = ObjectNavRobot(memory, bench, llm_client=mock_llm(),
                           matcher=ColorViewScorer(PROTOTYPES))
    obs = bench.reset()
    robot.reset(obs, log_dir=str(tmp_path / "ep"))
    robot.move2textprompt("a bed")
    import json, os
    log = json.load(open(tmp_path / "ep" / "log_data.json"))
    assert {"state_hist", "agent_response_log", "loc_hist",
            "nav_log"} <= set(log)
    assert len(log["state_hist"]) == len(robot.state_hist)


def test_single_floor_filter_path(world, tmp_path):
    """load_single_floor: save, reload with floor detection on, and
    check the floor mask restricts long-memory retrieval and queries
    (memory_2.py:203-256, :693-705)."""
    cfg, scene, bench, memory = world
    # fabricate base heights on one floor
    memory.base_height = [0.05] * 12
    path = str(tmp_path / "floor_mem")
    memory.save(path)

    cfg2 = cfg.replace(agent=cfg.agent.__class__(
        load_single_floor=True, random_move_num=3, max_path_len=500))
    from bsc_nav_tpu.agents.spatial_memory import VoxelTokenMemory
    mem2 = VoxelTokenMemory(cfg2, env=bench.nav_env,
                            perception=memory.perception,
                            imagination=memory.imagination,
                            memory_path=path)
    mem2.load_memory()
    assert mem2.floor_min_height is not None
    assert mem2.floor_min_height <= mem2.floor_max_height
    filtered = mem2.long_memory_filter()
    for o in filtered:
        assert mem2.floor_min_height <= o["loc"][2] <= mem2.floor_max_height
    # floor-masked query still returns candidates on this floor
    best, topk, sims = mem2.voxel_localized("a bed")
    if len(topk):
        assert ((topk[:, 2] >= mem2.floor_min_height)
                & (topk[:, 2] <= mem2.floor_max_height)).all()


def test_touching_goal_local_policy(world):
    """LLM local stepper (objnav_benchmark.py:665-695): executes the
    strategy 4x per round until finish_task."""
    cfg, scene, bench, memory = world
    calls = {"n": 0}

    def responder(t):
        calls["n"] += 1
        return ("**Strategy**: 'move_forward'" if calls["n"] == 1
                else "**Strategy**: 'finish_task'")

    client = L.MockLLMClient(responders=[
        (lambda t: "finishing a navigation task" in t, responder)])
    robot = ObjectNavRobot(memory, bench, llm_client=client,
                           matcher=ColorViewScorer(PROTOTYPES))
    obs = bench.reset()
    robot.reset(obs)
    start = bench.sim.agents[0].get_state().position.copy()
    robot.touching_goal("a bed", [np.asarray(obs["rgb"])[:, :, :3]])
    assert calls["n"] == 2
    moved = np.linalg.norm(
        bench.sim.agents[0].get_state().position - start)
    assert moved > 0.5   # 4 forward steps executed before finish_task
