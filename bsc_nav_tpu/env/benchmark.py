"""Benchmark environment protocol + fake implementation.

The drivers evaluate agents against a habitat.Env-like surface
(reference objnav_benchmark.py: benchmark_env.reset/step/get_metrics/
current_episode/sim.agents[0]).  This module defines that surface as a
protocol and provides:

  - FakeBenchmarkEnv: episodes over the synthetic box world with
    success / SPL / distance_to_goal computed from grid geodesics --
    the habitat Measure outputs the drivers record
    (objnav_benchmark.py:1309-1321).
  - (habitat adapter lives in env/habitat_env.py, import-gated.)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Protocol, Sequence

import numpy as np

from bsc_nav_tpu.env.fake import BoxScene, FakeNavEnv
from bsc_nav_tpu.env.pathfinding import AgentState, Quat


@dataclasses.dataclass
class Episode:
    scene_id: str
    object_category: str
    start_position: Sequence[float]
    start_yaw: float
    goal_positions: List[Sequence[float]]       # acceptable goal locations
    instruction: Optional[str] = None           # VLN
    question: Optional[str] = None              # EQA
    goal_image: Optional[np.ndarray] = None     # imagenav
    intrinsic_attributes: Optional[str] = None  # textnav
    extrinsic_attributes: Optional[str] = None
    scene_dataset_config: str = ""


class BenchmarkEnv(Protocol):
    def reset(self): ...
    def step(self, action: str): ...
    def get_metrics(self) -> Dict: ...
    @property
    def current_episode(self) -> Episode: ...


class _SimFacade:
    """habitat Env.sim surface used by the robots (sim.agents[0],
    sim.get_sensor_observations, sim.pathfinder)."""

    def __init__(self, env: FakeNavEnv):
        self._env = env
        self.agents = [env.agent]
        self.pathfinder = env.pathfinder

    def get_sensor_observations(self, agent_id: int = 0):
        return self._env.sims.get_sensor_observations(agent_id)


class FakeBenchmarkEnv:
    """Episode-iterating benchmark env over the fake box world with
    habitat-style metrics."""

    def __init__(self, cfg, episodes: List[Episode],
                 scene: Optional[BoxScene] = None,
                 success_distance: float = 1.0, seed: int = 0):
        self.cfg = cfg
        self.episodes = episodes
        self.success_distance = success_distance
        self._env = FakeNavEnv(cfg, scene=scene, seed=seed)
        self.sim = _SimFacade(self._env)
        self._ep_idx = -1
        self.episode_over = False
        self._path_length = 0.0
        self._shortest = float("inf")
        self._called_stop = False
        self._min_dist = float("inf")
        self._len_at_min = 0.0

    # --- episode control ---------------------------------------------------
    @property
    def current_episode(self) -> Episode:
        return self.episodes[self._ep_idx % len(self.episodes)]

    @property
    def nav_env(self) -> FakeNavEnv:
        return self._env

    def reset(self):
        self._ep_idx += 1
        ep = self.current_episode
        self._env.agent.set_state(AgentState(
            np.asarray(ep.start_position, np.float64),
            Quat.from_yaw(ep.start_yaw)))
        self._env.pitch = 0.0
        self.episode_over = False
        self._called_stop = False
        self._path_length = 0.0
        self._min_dist = float("inf")
        self._len_at_min = 0.0
        self._shortest = min(
            (self._env.pathfinder.geodesic_distance(
                ep.start_position, g) for g in ep.goal_positions),
            default=float("inf"))
        return self._env.sims.get_sensor_observations(0)

    def step(self, action: str):
        prev = self._env.position.copy()
        obs = self._env.step(action)
        moved = float(np.linalg.norm(self._env.position - prev))
        self._path_length += moved
        if moved > 0:
            d = self._distance_to_goal()
            if d < self._min_dist:
                self._min_dist = d
                self._len_at_min = self._path_length
        if action == "stop":
            self.episode_over = True
            self._called_stop = True
        return obs

    # --- metrics (habitat success/spl/distance_to_goal semantics) ----------
    def _distance_to_goal(self) -> float:
        ep = self.current_episode
        return min(
            (self._env.pathfinder.geodesic_distance(
                self._env.position, g) for g in ep.goal_positions),
            default=float("inf"))

    def get_metrics(self) -> Dict:
        d = self._distance_to_goal()
        success = float(self._called_stop and d <= self.success_distance)
        spl = 0.0
        if success and np.isfinite(self._shortest):
            spl = self._shortest / max(self._shortest, self._path_length, 1e-6)
        # OracleSPL: SPL under oracle stopping at the best point visited
        # (reference vlnce_maps.py:26-43 OracleSPL measure)
        o_success = float(min(self._min_dist, d) <= self.success_distance)
        ospl = 0.0
        if o_success and np.isfinite(self._shortest):
            ospl = self._shortest / max(self._shortest, self._len_at_min, 1e-6)
        return {
            "success": success,
            "spl": spl,
            "oracle_spl": ospl,
            "distance_to_goal": d,
            "path_length": self._path_length,
        }


def episodes_for_scene(scene: BoxScene, n_per_object: int = 1,
                       start=(0.0, 0.0, 0.0), seed: int = 0
                       ) -> List[Episode]:
    """One episode per labeled box (test/demo dataset factory)."""
    rng = np.random.default_rng(seed)
    eps = []
    for box in scene.boxes:
        for _ in range(n_per_object):
            eps.append(Episode(
                scene_id="box_world",
                object_category=box.label,
                start_position=np.asarray(start, float),
                start_yaw=float(rng.uniform(-np.pi, np.pi)),
                goal_positions=[np.asarray(box.center, float)],
            ))
    return eps
