"""Segmented store: rotation, host spill, cross-segment query merge."""

import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory import ingest as ing
from bsc_nav_tpu.memory.segments import SegmentedStore
from bsc_nav_tpu.memory import query as Q
from bsc_nav_tpu.memory.store import init_store

from test_ingest import make_frames


def tiny_cfg():
    cfg = small_test_config()
    mem = cfg.memory.__class__(
        grid_size=64, floor_height=-3.2, map_height=3.2, token_dim=32,
        cache_size=4, voxel_capacity=248, depth_sample_rate=8)
    return cfg.replace(memory=mem)


def test_rotation_and_spill_preserve_all_voxels():
    cfg = tiny_cfg()
    seg = SegmentedStore(cfg.memory, max_device_segments=1)
    key = jax.random.PRNGKey(0)

    total_before_dedup = 0
    for b in range(4):
        rgb, depth, poses, tokens = make_frames(cfg, 1, seed=b)
        poses[:, :3] = b * 1.2          # move so new voxels appear
        key, sub = jax.random.split(key)
        state, stats = ing.ingest_frames(
            seg.state, jnp.asarray(rgb), jnp.asarray(depth),
            jnp.asarray(poses), jnp.asarray(tokens), sub, cfg)
        seg.state = state
        seg.rotate_if_full()

    assert seg.num_segments >= 2, "capacity never filled; tune the test"
    assert len(seg.host_segments) >= 1 or len(seg.device_segments) >= 1
    assert seg.total_voxels() > cfg.memory.voxel_capacity  # grew past one


def test_cross_segment_query_merges_and_dedups(rng):
    cfg = tiny_cfg()
    seg = SegmentedStore(cfg.memory, max_device_segments=0)  # spill all

    D = cfg.memory.token_dim

    def put_tokens(state, entries):
        """entries: list of (pos(r,c,h), token)."""
        V1 = state.feat_count.shape[0]
        K = state.feats.shape[0] // V1
        feats = np.zeros((V1 * K, D), np.float32)
        norms = np.zeros((V1 * K,), np.float32)
        counts = np.zeros((V1,), np.int32)
        pos = np.zeros((V1, 3), np.int32)
        for i, (p, t) in enumerate(entries):
            feats[i * K] = t
            norms[i * K] = np.linalg.norm(t)
            counts[i] = 1
            pos[i] = p
        return state.replace(
            feats=jnp.asarray(feats), feat_norm=jnp.asarray(norms),
            feat_count=jnp.asarray(counts), slot_pos=jnp.asarray(pos),
            num_voxels=jnp.asarray(len(entries), jnp.int32),
            initialized=jnp.ones((), jnp.bool_))

    q = rng.normal(size=D).astype(np.float32)
    t_hi = q * 2.0                         # cosine 1.0 with q
    t_mid = q + rng.normal(size=D) * 2.0
    t_lo = rng.normal(size=D).astype(np.float32)

    # segment 1 (frozen): voxel A with a mid token, voxel B with low
    s1 = put_tokens(init_store(cfg.memory), [((5, 5, 5), t_mid),
                                             ((9, 9, 9), t_lo)])
    seg.state = s1
    seg.rotate_threshold = 0               # force rotation
    seg.rotate_if_full()
    # active segment: voxel A revisited with a PERFECT token
    seg.state = put_tokens(seg.state, [((5, 5, 5), t_hi)])

    pos, score = seg.localize(jnp.asarray(q), top_k=8)
    assert len(pos) == 2                   # A deduplicated, B kept
    assert tuple(pos[0]) == (5, 5, 5)
    np.testing.assert_allclose(score[0], 1.0, atol=1e-4)
    assert tuple(pos[1]) == (9, 9, 9)
    assert score[1] < score[0]


def test_int8_freeze_matches_float(rng):
    """freeze_dtype='int8' (the measured TPU default): frozen segments
    hold int8 rows + int8-row norms; query positions match the
    unquantized freeze and scores agree within int8 rounding, both for
    device-resident and host-spilled segments."""
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    results = {}
    for freeze_dtype, max_dev in (
            (None, 1), ("int8", 1), ("int8", 0)):
        seg = SegmentedStore(cfg.memory, max_device_segments=max_dev,
                             freeze_dtype=freeze_dtype)
        k = key
        for b in range(4):
            rgb, depth, poses, tokens = make_frames(cfg, 1, seed=b)
            poses[:, :3] = b * 1.2
            k, sub = jax.random.split(k)
            state, _ = ing.ingest_frames(
                seg.state, jnp.asarray(rgb), jnp.asarray(depth),
                jnp.asarray(poses), jnp.asarray(tokens), sub, cfg)
            seg.state = state
            seg.rotate_if_full()
        assert seg.num_segments >= 2
        if freeze_dtype == "int8":
            frozen = (seg.device_segments if max_dev else
                      [])
            for s in frozen:
                assert s.feats.dtype == jnp.int8
                n = int(s.num_voxels) * (s.feats.shape[0]
                                         // s.feat_count.shape[0])
                got = np.asarray(s.feat_norm[:n])
                want = np.linalg.norm(
                    np.asarray(s.feats[:n], np.float32), axis=-1)
                np.testing.assert_allclose(got, want, rtol=1e-5)
            for h in seg.host_segments:
                assert h["feats"].dtype == np.int8
        # query along a token INGESTED INTO A FROZEN SEGMENT (batch 0):
        # its voxel is an unambiguous cosine~1 top-1 in every variant
        # (random-token runner-up scores are too close together to pin
        # rank order under int8 rounding)
        _, _, _, tokens0 = make_frames(cfg, 1, seed=0)
        q = tokens0.reshape(-1, cfg.memory.token_dim)[0].astype(
            np.float32)
        q /= np.linalg.norm(q)
        pos, score = seg.localize(jnp.asarray(q), top_k=8)
        results[(freeze_dtype, max_dev)] = (pos, score)

    pos_f, score_f = results[(None, 1)]
    assert score_f[0] > 0.99
    for key2 in (("int8", 1), ("int8", 0)):
        pos_q, score_q = results[key2]
        np.testing.assert_array_equal(pos_q[0], pos_f[0])
        np.testing.assert_allclose(score_q[0], score_f[0], atol=2e-2)


def test_agent_with_segmented_memory():
    """VoxelTokenMemory(segmented=True): build across rotations, query
    merges all segments."""
    import math
    from bsc_nav_tpu.agents.spatial_memory import (
        Perception, VoxelTokenMemory)
    from bsc_nav_tpu.env.fake import FakeNavEnv
    from bsc_nav_tpu.env.pathfinding import AgentState, Quat
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.config import QueryConfig

    cfg = tiny_cfg().replace(
        query=QueryConfig(top_k=16, query_width=28, query_height=28))
    env = FakeNavEnv(cfg, seed=7)
    env.reset(init_state=AgentState(np.zeros(3), Quat()), build_map=True)
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=1,
                            heads=2, num_registers=0)
    mem = VoxelTokenMemory(
        cfg, env=env,
        perception=Perception.create(cfg, vit_cfg=vit_cfg, batch_size=4),
        segmented=True, max_device_segments=0)   # spill immediately
    obs = env.sims.get_sensor_observations(0)
    # enough spinning/moving to overflow the 248-voxel capacity repeatedly
    for step in range(3):
        mem.excute(obs, ["turn_left"] * 8 + ["move_forward"] * 4)
    mem.flush()
    assert mem.segments.num_segments >= 2
    assert mem.segments.total_voxels() > cfg.memory.voxel_capacity

    # query merges across segments (image query; any view works)
    best, topk, sims = mem.voxel_localized(obs["rgb"][:, :, :3])
    assert len(topk) > 0
    assert np.isfinite(sims).all()


def test_voxel_localized_batch_matches_single():
    """Agent-level batched localization (one [VK,D]x[D,Q] store pass)
    returns the same positions/scores as per-query voxel_localized —
    both on the dense store and on a segmented one."""
    from bsc_nav_tpu.agents.spatial_memory import (
        Perception, VoxelTokenMemory)
    from bsc_nav_tpu.env.fake import FakeNavEnv
    from bsc_nav_tpu.env.pathfinding import AgentState, Quat
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.config import QueryConfig

    cfg = tiny_cfg().replace(
        query=QueryConfig(top_k=8, query_width=28, query_height=28))
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=1,
                            heads=2, num_registers=0)

    for segmented in (False, True):
        env = FakeNavEnv(cfg, seed=3)
        env.reset(init_state=AgentState(np.zeros(3), Quat()),
                  build_map=True)
        kw = dict(segmented=True, max_device_segments=0) if segmented \
            else {}
        mem = VoxelTokenMemory(
            cfg, env=env,
            perception=Perception.create(cfg, vit_cfg=vit_cfg,
                                         batch_size=4), **kw)
        obs = env.sims.get_sensor_observations(0)
        for _ in range(2 if segmented else 1):
            mem.excute(obs, ["turn_left"] * 8 + ["move_forward"] * 2)

        views = [np.asarray(obs["rgb"][:, :, :3]),
                 np.asarray(env.sims.step("turn_left")[
                     "rgb"][:, :, :3])]
        batch = mem.voxel_localized_batch(views, K=8)
        assert len(batch) == 2
        for view, (bbest, btopk, bsims) in zip(views, batch):
            sbest, stopk, ssims = mem.voxel_localized(view, K=8)
            np.testing.assert_array_equal(btopk, stopk)
            np.testing.assert_allclose(bsims, ssims, rtol=1e-5,
                                       atol=1e-6)


def test_voxel_localized_batch_region_and_dedupe():
    """Per-query region radii in the agent-level batch match single
    region-restricted voxel_localized; repeated prompts are pooled once
    (the adaptive-region sweep pays for ONE imagination/pool run)."""
    from bsc_nav_tpu.agents.spatial_memory import (
        Perception, VoxelTokenMemory)
    from bsc_nav_tpu.env.fake import FakeNavEnv
    from bsc_nav_tpu.env.pathfinding import AgentState, Quat
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.config import QueryConfig

    cfg = tiny_cfg().replace(
        query=QueryConfig(top_k=8, query_width=28, query_height=28))
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=1,
                            heads=2, num_registers=0)
    env = FakeNavEnv(cfg, seed=3)
    env.reset(init_state=AgentState(np.zeros(3), Quat()), build_map=True)
    perception = Perception.create(cfg, vit_cfg=vit_cfg, batch_size=4)
    mem = VoxelTokenMemory(cfg, env=env, perception=perception)
    obs = env.sims.get_sensor_observations(0)
    mem.excute(obs, ["turn_left"] * 8 + ["move_forward"] * 2)

    view = np.asarray(obs["rgb"][:, :, :3])
    curr = np.array([cfg.memory.grid_size // 2,
                     cfg.memory.grid_size // 2, 4], np.int32)
    radii = [5.0, 10.0, np.inf]

    pool_calls = {"n": 0}
    orig_pool = perception.pool_step

    def counting_pool(params, imgs):
        pool_calls["n"] += 1
        return orig_pool(params, imgs)

    perception.pool_step = counting_pool
    batch = mem.voxel_localized_batch([view] * 3, K=8,
                                      region_radii=radii, curr_grid=curr)
    perception.pool_step = orig_pool
    assert pool_calls["n"] == 1, "repeated prompt must pool once"

    for r, (bbest, btopk, bsims) in zip(radii, batch):
        sbest, stopk, ssims = mem.voxel_localized(
            view, K=8, region_radius=r,
            curr_grid=curr if np.isfinite(r) else None)
        np.testing.assert_array_equal(btopk, stopk)
        np.testing.assert_allclose(bsims, ssims, rtol=1e-5, atol=1e-6)
