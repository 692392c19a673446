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


def test_token_similarity_map_and_render(tmp_path):
    """matching2D parity path: similarity map peaks where the query
    content appears in the reference image."""
    import jax
    from bsc_nav_tpu.config import small_test_config, QueryConfig
    from bsc_nav_tpu.memory.pipeline import token_similarity_map
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.utils.visualize import render_token_matching

    cfg = small_test_config().replace(
        query=QueryConfig(query_width=56, query_height=56))
    vit_cfg = vit.ViTConfig(img_size=56, patch_size=14, dim=32, depth=2,
                            heads=2, num_registers=1)
    params = vit.init_params(vit_cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    # query: pure red; reference: gray with a red quadrant (top-left)
    query = np.full((56, 56, 3), (200, 30, 30), np.uint8)
    ref = np.full((56, 56, 3), 128, np.uint8)
    ref[:28, :28] = (200, 30, 30)

    sims = np.asarray(token_similarity_map(
        params, jnp.asarray(query), jnp.asarray(ref), vit_cfg, cfg))
    assert sims.shape == (4, 4)
    # red patches should outscore gray patches on average
    red = sims[:2, :2].mean()
    gray = sims[2:, 2:].mean()
    assert red > gray, (red, gray)

    p = render_token_matching(query, ref, sims,
                              str(tmp_path / "match.png"))
    import os
    assert os.path.getsize(p) > 1000


def test_stopwatch_sync_materializes_result():
    """sync=True measures through value materialization (the tunneled
    runtime ignores block_until_ready -- CLAUDE.md platform note)."""
    import jax
    import jax.numpy as jnp

    sw = Stopwatch(sync=True)
    with sw("matmul") as h:
        a = jnp.ones((64, 64))
        h["result"] = jax.jit(lambda x: x @ x)(a)
    st = sw.stats("matmul")
    assert st["count"] == 1 and st["mean_ms"] > 0


def test_smoke_compare_gate(tmp_path):
    """tools/smoke_compare flags >threshold serving regressions and
    tolerates model-set drift between rounds."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from smoke_compare import compare, main

    base = {"models": [{"name": "a", "ms_per_iter": 100.0},
                       {"name": "gone", "ms_per_iter": 5.0}]}
    new = {"models": [{"name": "a", "ms_per_iter": 115.0},
                      {"name": "fresh", "ms_per_iter": 1.0}]}
    rows, regs = compare(base, new, threshold=0.10)
    assert len(regs) == 1 and regs[0][0] == "a"
    _, regs_ok = compare(base, {"models": [
        {"name": "a", "ms_per_iter": 105.0}]}, threshold=0.10)
    assert regs_ok == []

    bp, np_ = tmp_path / "b.json", tmp_path / "n.json"
    bp.write_text(json.dumps(base))
    np_.write_text(json.dumps(new))
    assert main([str(bp), str(np_)]) == 1
    assert main([str(bp), str(np_), "--threshold", "0.2"]) == 0
