"""Tests for auxiliary subsystems: profiling, visualization, dynamic
tasks."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory.store import init_store
from bsc_nav_tpu.utils.profiling import Stopwatch, Telemetry
from bsc_nav_tpu.utils.visualize import (
    render_pointcloud_png, render_topdown_png)


def test_stopwatch_aggregation():
    sw = Stopwatch()
    for _ in range(5):
        with sw("op"):
            time.sleep(0.002)
    st = sw.stats("op")
    assert st["count"] == 5
    assert st["mean_ms"] >= 2.0
    assert "op" in sw.report()
    assert "op" in sw.as_dict()


def test_telemetry_memory_stats(tmp_path):
    cfg = small_test_config()
    state = init_store(cfg.memory)
    state = state.replace(
        num_voxels=jnp.asarray(5, jnp.int32),
        feat_count=state.feat_count.at[:5].set(3))
    t = Telemetry()
    t.count("queries")
    t.count("queries")
    t.memory_stats(state)
    assert t.gauges["memory/num_voxels"] == 5
    assert t.gauges["memory/total_tokens"] == 15.0
    path = str(tmp_path / "telemetry.json")
    t.dump(path, extra={"run": "test"})
    import json
    blob = json.load(open(path))
    assert blob["counters"]["queries"] == 2
    assert blob["run"] == "test"


def test_visualize_pngs(tmp_path):
    cfg = small_test_config()
    state = init_store(cfg.memory)
    rng = np.random.default_rng(0)
    n = 200
    pos = rng.integers(0, cfg.memory.grid_size, size=(n, 3)).astype(np.int32)
    state = state.replace(
        num_voxels=jnp.asarray(n, jnp.int32),
        slot_pos=state.slot_pos.at[:n].set(jnp.asarray(pos)),
        rgb_sum=state.rgb_sum.at[:n].set(
            jnp.asarray(rng.uniform(0, 255, (n, 3)), jnp.float32)),
        weight=state.weight.at[:n].set(1.0))

    p1 = render_pointcloud_png(state, str(tmp_path / "pc.png"),
                               highlight=pos[:5], centers=pos[5:8])
    p2 = render_topdown_png(state, str(tmp_path / "td.png"),
                            cfg.memory.grid_size)
    assert os.path.getsize(p1) > 1000
    assert os.path.getsize(p2) > 1000


def test_dynamic_env_mutates_objects():
    from bsc_nav_tpu.env.dynamic import (
        DynamicFakeNavEnv, DynamicTaskIterator)
    cfg = small_test_config()
    env = DynamicFakeNavEnv(cfg, mutate_every=10, seed=2)
    before = [b.center for b in env.scene.boxes]
    for _ in range(25):
        env.step("turn_left")
    after = [b.center for b in env.scene.boxes]
    assert env.mutation_count == 2
    assert any(not np.allclose(a, b) for a, b in zip(before, after))

    # task iterator + live success metric
    tasks = DynamicTaskIterator(env)
    task = next(tasks)
    goal = tasks.current_goal_position(task)
    m = tasks.evaluate(task)
    assert m["object_goal"] == task.object_category
    assert np.isfinite(m["distance_to_goal"])
    # teleport the agent next to the goal: success flips on
    snapped = env.pathfinder.snap_point(goal)
    env.position = snapped
    assert tasks.evaluate(task)["success"] == 1.0
