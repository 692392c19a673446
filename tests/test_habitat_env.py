"""env/habitat_env.py driven end to end over a mocked habitat_sim
(tests/mock_habitat.py) — config construction, sensor specs, the
5-action space, placement semantics, island snapping, and the
episode-benchmark metrics (reference env.py:49-297, :472-667)."""

import math

import numpy as np
import pytest

import mock_habitat


@pytest.fixture
def hs_mock():
    hs = mock_habitat.install()
    yield hs
    mock_habitat.uninstall()


@pytest.fixture
def nav(hs_mock):
    from bsc_nav_tpu.config import Config, SensorConfig
    from bsc_nav_tpu.env.habitat_env import HabitatNavEnv

    cfg = Config(sensor=SensorConfig(width=32, height=24))
    return HabitatNavEnv(cfg, scene_path="scenes/test.glb")


def test_make_cfg_sensors_and_actions(nav):
    """4 sensor specs at the configured resolution/height; 5 actions at
    the reference magnitudes (env.py:166-256)."""
    agent_cfg = nav.sims.config.agents[0]
    specs = {s.uuid: s for s in agent_cfg.sensor_specifications}
    assert set(specs) == {"back_rgb", "rgb", "depth", "semantic"}
    for s in specs.values():
        assert s.resolution == [24, 32]
        assert s.position == [0.0, nav.cfg.sensor.sensor_height, 0.0]
    # back_rgb pitched down by pi/8 (env.py back camera)
    assert specs["back_rgb"].orientation is not None
    assert specs["rgb"].orientation is None

    acts = agent_cfg.action_space
    assert set(acts) == {"move_forward", "turn_left", "turn_right",
                         "look_up", "look_down"}
    assert acts["move_forward"].actuation.amount == 0.25
    assert acts["turn_left"].actuation.amount == 30.0
    assert acts["look_up"].actuation.amount == 15.0
    assert nav.sims.config.sim_cfg.scene_id == "scenes/test.glb"


def test_place_semantics(hs_mock):
    """build_map=True keeps identity rotation (axis-aligned allocentric
    grid, env.py:66-70); build_map=False applies the init rotation; no
    init_state places at a random navigable point."""
    from bsc_nav_tpu.config import Config
    from bsc_nav_tpu.env.habitat_env import HabitatNavEnv
    from bsc_nav_tpu.env.pathfinding import AgentState, Quat

    init = AgentState(np.array([1.0, 0.0, 2.0]),
                      Quat.from_yaw(math.pi / 2))

    nav = HabitatNavEnv(Config(), "s.glb", init_state=init, build_map=True)
    st = nav.agent.get_state()
    np.testing.assert_allclose(st.position, [1.0, 0.0, 2.0])
    assert st.rotation.yaw() == pytest.approx(0.0)      # identity kept

    nav.reset(init_state=init, build_map=False)
    st = nav.agent.get_state()
    assert st.rotation.yaw() == pytest.approx(math.pi / 2)

    nav.reset()                                          # random point
    assert nav.sims.pathfinder.is_navigable(
        nav.agent.get_state().position)
    # original_state tracks every reset
    np.testing.assert_allclose(nav.original_state.position,
                               nav.agent.get_state().position)


def test_island_snap_and_move2point(nav):
    """Off-mesh goals snap to the agent's island (env.py:131-163)."""
    goal = np.array([25.0, 0.0, 3.0], np.float32)       # outside the floor
    snapped = nav.get_navigable_point_near(goal)
    assert nav.sims.pathfinder.is_navigable(snapped)
    np.testing.assert_allclose(snapped, [10.0, 0.0, 3.0])

    path, g = nav.move2point(goal)
    np.testing.assert_allclose(g, snapped)
    assert path[-1] == "stop" and "move_forward" in path

    # already-navigable goals pass through un-snapped
    near = np.array([0.5, 0.0, 0.5], np.float32)
    _, g2 = nav.move2point(near)
    np.testing.assert_allclose(g2, near)


def _episode(start, goal, yaw=0.0):
    class Ep:
        pass
    ep = Ep()
    ep.start_position = np.asarray(start, np.float32)
    ep.start_yaw = yaw
    ep.goal_positions = [np.asarray(goal, np.float32)]
    ep.scene_id = "s.glb"
    ep.object_category = "chair"
    return ep


def test_episode_benchmark_success_metrics(hs_mock):
    """Success/SPL/OracleSPL/distance mirror the habitat Measure
    definitions (env.py:472-667 role, computed natively here)."""
    from bsc_nav_tpu.config import Config
    from bsc_nav_tpu.env.habitat_env import (
        HabitatEpisodeBenchmarkEnv, HabitatNavEnv)

    nav = HabitatNavEnv(Config(), "s.glb")
    # goal 1.0 m straight ahead (-z at yaw 0); success_distance 0.8
    bench = HabitatEpisodeBenchmarkEnv(
        nav, [_episode([0, 0, 0], [0, 0, -1.0])], success_distance=0.8)
    obs = bench.reset()
    assert "rgb" in obs and "depth" in obs
    np.testing.assert_allclose(nav.agent.get_state().position, [0, 0, 0])

    # walk forward 0.25 m x 2 -> 0.5 m from goal: not stopped yet
    bench.step("move_forward")
    bench.step("move_forward")
    assert not bench.episode_over
    m = bench.get_metrics()
    assert m["success"] == 0.0                           # no stop called
    assert m["distance_to_goal"] == pytest.approx(0.5)
    assert m["path_length"] == pytest.approx(0.5)

    bench.step("stop")
    assert bench.episode_over
    m = bench.get_metrics()
    assert m["success"] == 1.0
    # straight-line walk: spl = shortest / max(shortest, walked) = 1.0
    assert m["spl"] == pytest.approx(1.0)
    assert m["oracle_spl"] == pytest.approx(1.0)


def test_episode_benchmark_failure_and_oracle(hs_mock):
    """Stopping out of range fails; oracle metrics credit the closest
    point ever reached."""
    from bsc_nav_tpu.config import Config
    from bsc_nav_tpu.env.habitat_env import (
        HabitatEpisodeBenchmarkEnv, HabitatNavEnv)

    nav = HabitatNavEnv(Config(), "s.glb")
    bench = HabitatEpisodeBenchmarkEnv(
        nav, [_episode([0, 0, 0], [0, 0, -1.0])], success_distance=0.3)
    bench.reset()
    # approach within 0.25 m of the goal...
    for _ in range(3):
        bench.step("move_forward")
    assert bench.get_metrics()["distance_to_goal"] == pytest.approx(0.25)
    # ...then turn around and walk away before stopping
    for _ in range(6):
        bench.step("turn_left")
    for _ in range(4):
        bench.step("move_forward")
    bench.step("stop")
    m = bench.get_metrics()
    assert m["success"] == 0.0 and m["spl"] == 0.0
    # oracle: was within success_distance at its closest approach
    assert m["oracle_spl"] == pytest.approx(1.0, rel=1e-3)
    assert m["path_length"] == pytest.approx(0.75 + 1.0)

    # second reset advances the episode iterator and zeroes the meters
    bench.reset()
    assert bench.get_metrics()["path_length"] == 0.0
    assert not bench.episode_over


def test_sim_facade(hs_mock):
    from bsc_nav_tpu.config import Config
    from bsc_nav_tpu.env.habitat_env import (
        HabitatEpisodeBenchmarkEnv, HabitatNavEnv)

    nav = HabitatNavEnv(Config(), "s.glb")
    bench = HabitatEpisodeBenchmarkEnv(nav, [_episode([0, 0, 0], [1, 0, 0])])
    assert bench.sim.pathfinder is nav.sims.pathfinder
    assert bench.sim.agents[0] is nav.agent
    obs = bench.sim.get_sensor_observations(0)
    assert obs["rgb"].shape[-1] == 4                    # habitat RGBA


def test_scene_change_recomputes_navmesh(hs_mock):
    """OVON-style scene switching: episodes in a new scene reconfigure
    the simulator and recompute the navmesh with the agent's
    radius/height (reference OVONSim env.py:432-469)."""
    from bsc_nav_tpu.config import Config
    from bsc_nav_tpu.env.habitat_env import (
        HabitatEpisodeBenchmarkEnv, HabitatNavEnv)

    nav = HabitatNavEnv(Config(), "scenes/a.glb")
    ep1 = _episode([0, 0, 0], [1, 0, 0])
    ep1.scene_id = "a.glb"
    ep2 = _episode([0, 0, 0], [1, 0, 0])
    ep2.scene_id = "b.glb"
    bench = HabitatEpisodeBenchmarkEnv(nav, [ep1, ep2],
                                       scene_prefix="scenes")

    bench.reset()                 # same scene: no reconfigure
    assert getattr(nav.sims, "reconfigure_calls", 0) == 0

    bench.reset()                 # scene change -> reconfigure + navmesh
    assert nav.sims.reconfigure_calls == 1
    assert nav.sims.recompute_calls == 1
    assert nav.sims.pathfinder.scene_id == "scenes/b.glb"
    # navmesh recomputed with the configured agent radius/height
    assert nav.sims.pathfinder.recomputed_with == (
        Config().sim.agent_radius, Config().sim.agent_height)
    # follower rebuilt on the NEW pathfinder
    assert nav.plnner.pathfinder is nav.sims.pathfinder

    bench.reset()                 # wraps to ep1 -> back to scene a
    assert nav.sims.reconfigure_calls == 2


def test_build_habitat_world_factory(hs_mock, tmp_path):
    """The driver-facing habitat factory end to end over the mock:
    dataset parsing -> nav env -> episode benchmark -> perception +
    memory wiring (reference objnav_benchmark.py:1233-1294 setup role).
    Uses a tiny synthesized ObjectNav json.gz split."""
    import gzip
    import json
    import types

    from bsc_nav_tpu.env.habitat_env import build_habitat_world

    split = {
        "episodes": [
            {"scene_id": "a.glb", "object_category": "sofa",
             "start_position": [0, 0, 0],
             "start_rotation": [0, 0, 0, 1],
             "goals": [{"position": [1.0, 0.0, 0.0],
                        "object_category": "sofa"}]},
            {"scene_id": "a.glb", "object_category": "bed",
             "start_position": [1, 0, 1],
             "start_rotation": [0, 0, 0, 1],
             "goals": [{"position": [2.0, 0.0, 0.0],
                        "object_category": "bed"}]},
        ]
    }
    ep_path = tmp_path / "val.json.gz"
    with gzip.open(ep_path, "wt", encoding="utf-8") as f:
        json.dump(split, f)

    args = types.SimpleNamespace(
        env="habitat", episodes=2, llm="mock", llm_model="gpt-4o",
        memory_root=str(tmp_path), weights_dir=None, batch_size=2,
        seed=0, benchmark_dataset="hm3d", scene_prefix=str(tmp_path),
        episode_prefix=str(ep_path), success_distance=None,
        use_only_working_memory=False, load_single_floor=False,
        detector="auto", csv=None, record_video=False,
        log_root=str(tmp_path))

    cfg, bench, memory, extras = build_habitat_world(args, task="objnav")
    assert len(bench.episodes) == 2
    obs = bench.reset()
    assert "rgb" in obs and "depth" in obs
    assert bench.current_episode.object_category == "sofa"
    # memory wired to the same nav env; one small build step works
    memory.excute(obs, ["turn_left", "move_forward"])
    memory.flush()
    assert extras["llm"] is not None

    # grounding-dino without weights must fail loudly, not silently
    args.detector = "grounding-dino"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="grounding-dino"):
        build_habitat_world(args, task="objnav")
