"""Habitat-sim environment adapter (import-gated).

Host-side wrapper mirroring the reference NavEnv (reference
env.py:49-297): scene loading, the 5-action agent (move 0.25 m, turn 30
deg, look +/-15 deg), RGB/depth(/semantic) sensors at the configured
resolution, the greedy geodesic follower, and island-aware goal
snapping.  Also the benchmark-env adapter exposing the same protocol as
env/benchmark.FakeBenchmarkEnv over habitat.Env.

habitat-sim is NOT a dependency of this package; everything here raises
a clear error if it is missing.  The TPU pipelines never import this
module.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np


def _require_habitat():
    try:
        import habitat_sim  # noqa: F401
        return habitat_sim
    except ImportError as e:
        raise ImportError(
            "habitat-sim is required for the habitat backend "
            "(conda install habitat-sim ...); the fake backend "
            "(--env fake) runs without it") from e


class HabitatNavEnv:
    """reference env.py:49 NavEnv equivalent."""

    def __init__(self, cfg, scene_path: str,
                 scene_dataset_config: str = "",
                 init_state=None, build_map: bool = False):
        habitat_sim = _require_habitat()
        import os
        os.environ.setdefault("MAGNUM_LOG", "quiet")
        os.environ.setdefault("HABITAT_SIM_LOG", "quiet")

        self.cfg = cfg
        self._hs = habitat_sim
        self.sims = habitat_sim.Simulator(
            self._make_cfg(scene_path, scene_dataset_config))
        self.agent = self.sims.initialize_agent(0)
        self._place(init_state, build_map)
        self.original_state = self.agent.get_state()
        self.plnner = habitat_sim.nav.GreedyGeodesicFollower(
            pathfinder=self.sims.pathfinder, agent=self.agent,
            goal_radius=0.3, stop_key="stop")

    # --- config (reference env.py:166-256) -------------------------------
    def _make_cfg(self, scene_path: str, scene_dataset_config: str):
        hs = self._hs
        sim_cfg = hs.SimulatorConfiguration()
        sim_cfg.gpu_device_id = 0
        sim_cfg.scene_id = scene_path
        sim_cfg.enable_physics = False
        if scene_dataset_config:
            sim_cfg.scene_dataset_config_file = scene_dataset_config

        s = self.cfg.sensor
        specs = []
        for uuid, stype, orientation in [
            ("back_rgb", hs.SensorType.COLOR, (-np.pi / 8, 0, 0)),
            ("rgb", hs.SensorType.COLOR, None),
            ("depth", hs.SensorType.DEPTH, None),
            ("semantic", hs.SensorType.SEMANTIC, None),
        ]:
            spec = hs.CameraSensorSpec()
            spec.uuid = uuid
            spec.sensor_type = stype
            spec.resolution = [s.height, s.width]
            spec.position = [0.0, s.sensor_height, 0.0]
            if orientation is not None:
                import magnum as mn
                spec.orientation = mn.Vector3(*orientation)
            spec.sensor_subtype = hs.SensorSubType.PINHOLE
            specs.append(spec)

        a = self.cfg.actions
        agent_cfg = hs.agent.AgentConfiguration()
        agent_cfg.sensor_specifications = specs
        agent_cfg.action_space = {
            "move_forward": hs.agent.ActionSpec(
                "move_forward", hs.agent.ActuationSpec(amount=a.move_forward)),
            "turn_left": hs.agent.ActionSpec(
                "turn_left", hs.agent.ActuationSpec(amount=a.turn_left_deg)),
            "turn_right": hs.agent.ActionSpec(
                "turn_right", hs.agent.ActuationSpec(amount=a.turn_right_deg)),
            "look_up": hs.agent.ActionSpec(
                "look_up", hs.agent.ActuationSpec(amount=a.look_deg)),
            "look_down": hs.agent.ActionSpec(
                "look_down", hs.agent.ActuationSpec(amount=a.look_deg)),
        }
        return hs.Configuration(sim_cfg, [agent_cfg])

    def _place(self, init_state, build_map: bool):
        hs = self._hs
        state = hs.AgentState()
        if init_state is not None:
            state.position = init_state.position
            if not build_map:
                # build-map mode keeps identity rotation so the
                # allocentric grid is axis-aligned (reference env.py:66-70)
                state.rotation = init_state.rotation
        else:
            state.position = self.sims.pathfinder.get_random_navigable_point()
        self.agent.set_state(state)

    def reset(self, cfg=None, init_state=None, build_map: bool = False):
        if cfg is not None:
            self.cfg = cfg
        self._place(init_state, build_map)
        self.original_state = self.agent.get_state()
        self.plnner = self._hs.nav.GreedyGeodesicFollower(
            pathfinder=self.sims.pathfinder, agent=self.agent,
            goal_radius=0.3, stop_key="stop")

    # --- planning (reference env.py:131-163) ------------------------------
    def get_navigable_point_near(self, circle_center, max_tries: int = 500):
        island = self.plnner.pathfinder.get_island(
            self.agent.get_state().position)
        goal = self.plnner.pathfinder.snap_point(
            circle_center, island_index=island)
        return np.array([goal[0], goal[1], goal[2]])

    def move2point(self, goal):
        if not self.plnner.pathfinder.is_navigable(goal):
            goal = self.get_navigable_point_near(goal)
        path = self.plnner.find_path(goal)
        return path, goal


class HabitatBenchmarkEnv:
    """Adapter: habitat.Env -> the BenchmarkEnv protocol the drivers and
    robots consume (reference get_objnav_env/hm3d_data_config,
    env.py:472-554)."""

    def __init__(self, habitat_env):
        self._env = habitat_env
        self.sim = habitat_env.sim

    def reset(self):
        return self._env.reset()

    def step(self, action: str):
        return self._env.step(action)

    def get_metrics(self) -> Dict:
        return self._env.get_metrics()

    @property
    def episode_over(self) -> bool:
        return self._env.episode_over

    @property
    def current_episode(self):
        return self._env.current_episode


def build_habitat_world(args, task: str):
    """Driver-facing factory (benchmarks/setup.py habitat path)."""
    raise NotImplementedError(
        "habitat backend wiring requires habitat-lab configs + scene data "
        "on the host; see HabitatNavEnv/HabitatBenchmarkEnv for the "
        "adapters and benchmarks/setup.py for the fake-world reference "
        "wiring")
