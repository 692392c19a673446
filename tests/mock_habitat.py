"""A minimal in-memory `habitat_sim` (and `magnum`) double.

Injected into sys.modules so env/habitat_env.py — which is import-gated
and never executes in CI otherwise — can be driven end to end: config
construction, sensor specs, the 5-action agent, island snapping, the
follower, and the episode benchmark adapter (reference env.py:49-297,
:472-667).  Geometry is a flat 20x20 m floor; geodesics are euclidean.
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np


class _Quat:
    def __init__(self, x=0.0, y=0.0, z=0.0, w=1.0):
        self.x, self.y, self.z, self.w = x, y, z, w

    def yaw(self):
        return 2.0 * math.atan2(self.y, self.w)


class AgentState:
    def __init__(self):
        self.position = np.zeros(3, np.float32)
        self.rotation = _Quat()


class _Agent:
    def __init__(self, cfg):
        self._cfg = cfg
        self._state = AgentState()

    def get_state(self):
        s = AgentState()
        s.position = np.array(self._state.position, np.float32)
        s.rotation = self._state.rotation
        return s

    def set_state(self, state):
        self._state.position = np.array(state.position, np.float32)
        if getattr(state, "rotation", None) is not None:
            r = state.rotation
            self._state.rotation = (r if isinstance(r, _Quat)
                                    else _Quat(r.x, r.y, r.z, r.w))


class _PathFinder:
    """Flat square floor, one island, euclidean geodesics."""

    HALF = 10.0

    def is_navigable(self, p):
        p = np.asarray(p, np.float32)
        return bool(abs(p[0]) <= self.HALF and abs(p[2]) <= self.HALF)

    def get_random_navigable_point(self):
        return np.array([1.25, 0.0, -2.5], np.float32)

    def get_island(self, p):
        return 0 if self.is_navigable(p) else -1

    def island_area(self, island):
        return (2 * self.HALF) ** 2 if island == 0 else 0.0

    def snap_point(self, p, island_index=0):
        p = np.asarray(p, np.float32)
        return np.clip(p, [-self.HALF, 0.0, -self.HALF],
                       [self.HALF, 0.0, self.HALF])

    def find_path(self, path):
        a = np.asarray(path.requested_start, np.float32)
        b = np.asarray(path.requested_end, np.float32)
        if not (self.is_navigable(a) and self.is_navigable(b)):
            return False
        path.geodesic_distance = float(np.linalg.norm(b - a))
        path.points = [a, b]
        return True


class ShortestPath:
    def __init__(self):
        self.requested_start = None
        self.requested_end = None
        self.geodesic_distance = float("inf")
        self.points = []


class _Simulator:
    def __init__(self, config):
        self.config = config
        self.pathfinder = _PathFinder()
        self._agents = []
        self._agent_cfgs = config.agents

    def initialize_agent(self, agent_id):
        while len(self._agents) <= agent_id:
            self._agents.append(_Agent(self._agent_cfgs[len(self._agents)]))
        return self._agents[agent_id]

    @property
    def agents(self):
        return self._agents

    def get_sensor_observations(self, agent_id=0):
        out = {}
        for spec in self._agent_cfgs[agent_id].sensor_specifications:
            h, w = spec.resolution
            if spec.sensor_type == SensorType.COLOR:
                out[spec.uuid] = np.full((h, w, 4), 128, np.uint8)
            elif spec.sensor_type == SensorType.DEPTH:
                out[spec.uuid] = np.full((h, w), 2.0, np.float32)
            else:
                out[spec.uuid] = np.zeros((h, w), np.int32)
        return out

    def reconfigure(self, config):
        """Scene swap: new pathfinder seeded from the scene id so tests
        can observe that the navmesh actually changed."""
        self.config = config
        self._agent_cfgs = config.agents
        self.pathfinder = _PathFinder()
        self.pathfinder.scene_id = config.sim_cfg.scene_id
        self.reconfigure_calls = getattr(self, "reconfigure_calls", 0) + 1
        # agents persist across reconfigure in habitat-sim

    def recompute_navmesh(self, pathfinder, settings):
        pathfinder.recomputed_with = (settings.agent_radius,
                                      settings.agent_height)
        self.recompute_calls = getattr(self, "recompute_calls", 0) + 1
        return True

    def step(self, action):
        agent = self._agents[0]
        spec = self._agent_cfgs[0].action_space[action]
        amount = spec.actuation.amount
        st = agent._state
        yaw = st.rotation.yaw()
        if action == "move_forward":
            d = np.array([-math.sin(yaw), 0.0, -math.cos(yaw)], np.float32)
            new = st.position + amount * d
            if self.pathfinder.is_navigable(new):
                st.position = new
        elif action in ("turn_left", "turn_right"):
            sign = 1.0 if action == "turn_left" else -1.0
            yaw += sign * math.radians(amount)
            st.rotation = _Quat(0.0, math.sin(yaw / 2), 0.0,
                                math.cos(yaw / 2))
        # look_up / look_down: pitch untracked in the mock
        return self.get_sensor_observations(0)


class NavMeshSettings:
    def __init__(self):
        self.agent_radius = 0.0
        self.agent_height = 0.0

    def set_defaults(self):
        self.agent_radius = 0.1
        self.agent_height = 1.5


class GreedyGeodesicFollower:
    def __init__(self, pathfinder, agent, goal_radius=0.3, stop_key="stop"):
        self.pathfinder = pathfinder
        self.agent = agent
        self.goal_radius = goal_radius
        self.stop_key = stop_key

    def find_path(self, goal):
        n = int(np.linalg.norm(np.asarray(goal, np.float32)
                               - self.agent.get_state().position) / 0.25)
        return ["move_forward"] * max(n, 1) + [self.stop_key]


# --- config plumbing -------------------------------------------------------

class SimulatorConfiguration:
    def __init__(self):
        self.gpu_device_id = 0
        self.scene_id = ""
        self.enable_physics = False
        self.scene_dataset_config_file = ""


class SensorType:
    COLOR, DEPTH, SEMANTIC = 1, 2, 3


class SensorSubType:
    PINHOLE = 0


class CameraSensorSpec:
    def __init__(self):
        self.uuid = ""
        self.sensor_type = SensorType.COLOR
        self.resolution = [0, 0]
        self.position = [0.0, 0.0, 0.0]
        self.orientation = None
        self.sensor_subtype = SensorSubType.PINHOLE


class Configuration:
    def __init__(self, sim_cfg, agent_cfgs):
        self.sim_cfg = sim_cfg
        self.agents = agent_cfgs


class ActuationSpec:
    def __init__(self, amount=0.0):
        self.amount = amount


class ActionSpec:
    def __init__(self, name, actuation):
        self.name = name
        self.actuation = actuation


class AgentConfiguration:
    def __init__(self):
        self.sensor_specifications = []
        self.action_space = {}


def install():
    """Register the mock as `habitat_sim` + `magnum` in sys.modules.
    Returns the mock module.  Call uninstall() (or use the fixture in
    conftest) to clean up."""
    hs = types.ModuleType("habitat_sim")
    hs.Simulator = _Simulator
    hs.SimulatorConfiguration = SimulatorConfiguration
    hs.CameraSensorSpec = CameraSensorSpec
    hs.SensorType = SensorType
    hs.SensorSubType = SensorSubType
    hs.Configuration = Configuration
    hs.AgentState = AgentState
    hs.ShortestPath = ShortestPath

    agent_mod = types.ModuleType("habitat_sim.agent")
    agent_mod.AgentConfiguration = AgentConfiguration
    agent_mod.ActionSpec = ActionSpec
    agent_mod.ActuationSpec = ActuationSpec
    hs.agent = agent_mod

    nav_mod = types.ModuleType("habitat_sim.nav")
    nav_mod.GreedyGeodesicFollower = GreedyGeodesicFollower
    nav_mod.NavMeshSettings = NavMeshSettings
    hs.nav = nav_mod

    mn = types.ModuleType("magnum")
    mn.Vector3 = lambda *a: tuple(a)

    sys.modules["habitat_sim"] = hs
    sys.modules["habitat_sim.agent"] = agent_mod
    sys.modules["habitat_sim.nav"] = nav_mod
    sys.modules["magnum"] = mn
    return hs


def uninstall():
    for name in ("habitat_sim", "habitat_sim.agent", "habitat_sim.nav",
                 "magnum"):
        sys.modules.pop(name, None)
