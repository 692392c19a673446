"""Roundtrip tests for the reference on-disk memory contract
(memory_2.py:1074-1083 write / :187-256 read) and the native snapshot."""

import json
import os

import h5py
import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory.store import init_store
from bsc_nav_tpu.memory import ingest as ing
from bsc_nav_tpu.memory import persistence as P
from bsc_nav_tpu.memory import query as Q

from test_ingest import make_frames


def build_state(cfg, seed=0):
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=seed)
    state = init_store(cfg.memory)
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(seed), cfg)
    return state


def test_reference_format_roundtrip(tmp_path):
    cfg = small_test_config()
    state = build_state(cfg)
    lm = [{"label": "chair", "loc": [3, 4, 5], "confidence": 0.9}]
    path = str(tmp_path / "mem")
    P.save_reference_format(state, path, cfg.memory,
                            original_pos=[1.0, 2.0, 3.0],
                            base_height=[0.1, 0.2], long_memory=lm)

    # contract files exist with the exact reference names
    for f in ["feat.h5df", "grid_rgb_pos.npy", "grid_rgb.npy", "weight.npy",
              "occupied_ids.npy", "max_id.npy", "original_pos.npy",
              "map_height.npy", "base_height.npy", "long_memory.json"]:
        assert os.path.exists(os.path.join(path, f)), f

    # shape/type contract (SURVEY §2.5)
    n = int(np.load(path + "/max_id.npy"))
    assert np.load(path + "/grid_rgb_pos.npy").shape == (n, 3)
    assert np.load(path + "/grid_rgb.npy").dtype == np.uint8
    g = cfg.memory.grid_size
    occ = np.load(path + "/occupied_ids.npy")
    assert occ.shape == (g, g, cfg.memory.num_height_cells)
    assert (np.sort(occ[occ >= 0]) == np.arange(n)).all()

    # h5 group naming + ragged sizes
    counts = np.asarray(build_state(cfg).feat_count)
    with h5py.File(path + "/feat.h5df") as h5:
        names = list(h5.keys())
        assert all(name.startswith("grid_") for name in names)
        some = h5[names[0]]
        assert some["features"].shape[1] == cfg.memory.token_dim
        assert some["features"].shape[0] == some["distances"].shape[0]

    # load back and compare queries end-to-end
    state2, meta = P.load_reference_format(path, cfg.memory)
    assert meta["long_memory"] == lm
    np.testing.assert_allclose(meta["original_pos"], [1.0, 2.0, 3.0])

    q = np.random.default_rng(0).normal(size=cfg.memory.token_dim).astype(np.float32)
    p1, s1 = Q.localize(state, jnp.asarray(q), top_k=16)
    p2, s2 = Q.localize(state2, jnp.asarray(q), top_k=16)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_npz_snapshot_roundtrip(tmp_path):
    cfg = small_test_config()
    state = build_state(cfg, seed=5)
    path = str(tmp_path / "snap.npz")
    P.save_npz(state, path)
    state2 = P.load_npz(path, cfg.memory)

    np.testing.assert_array_equal(
        np.asarray(state.slot_map), np.asarray(state2.slot_map))
    q = np.random.default_rng(1).normal(size=cfg.memory.token_dim).astype(np.float32)
    p1, s1 = Q.localize(state, jnp.asarray(q), top_k=8)
    p2, s2 = Q.localize(state2, jnp.asarray(q), top_k=8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    # ingest continues cleanly after restore
    rgb, depth, poses, tokens = make_frames(cfg, 1, seed=9)
    s3, stats = ing.ingest_frames(
        state2, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(9), cfg)
    assert int(s3.num_voxels) >= int(state2.num_voxels)


def test_int8_store_roundtrip_and_query(tmp_path):
    """int8-quantized token store: query agrees with the f32 store to
    quantization error; export dequantizes into the f32 h5 contract."""
    import jax.numpy as jnp
    cfg = small_test_config()
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=11)

    from bsc_nav_tpu.memory.store import dequantized_feats
    s_f32 = init_store(cfg.memory, store_dtype=jnp.float32)
    s_f32, _ = ing.ingest_frames(
        s_f32, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(3), cfg)
    s_i8 = init_store(cfg.memory, store_dtype=jnp.int8)
    s_i8, _ = ing.ingest_frames(
        s_i8, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(3), cfg)

    n = int(s_f32.num_voxels)
    assert int(s_i8.num_voxels) == n
    # dequantized tokens within per-token absmax/127 rounding error
    f = np.asarray(dequantized_feats(s_f32))[:n]
    d = np.asarray(dequantized_feats(s_i8))[:n]
    err = np.abs(f - d).max()
    assert err <= (np.abs(f).max() / 127.0) * 0.51 + 1e-6

    # query scores track the f32 store closely
    q = np.random.default_rng(2).normal(size=cfg.memory.token_dim
                                        ).astype(np.float32)
    p1, sc1 = Q.localize(s_f32, jnp.asarray(q), top_k=16)
    p2, sc2 = Q.localize(s_i8, jnp.asarray(q), top_k=16)
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                               rtol=0.1, atol=0.02)

    # export produces the standard f32 h5 contract
    path = str(tmp_path / "mem_i8")
    P.save_reference_format(s_i8, path, cfg.memory,
                            original_pos=[0, 0, 0])
    s_back, meta = P.load_reference_format(path, cfg.memory,
                                           store_dtype=jnp.int8)
    p3, sc3 = Q.localize(s_back, jnp.asarray(q), top_k=16)
    np.testing.assert_allclose(np.asarray(sc2), np.asarray(sc3),
                               rtol=0.02, atol=0.01)


def test_npz_roundtrip_bfloat16_store(tmp_path):
    """bfloat16 stores must survive the npz snapshot (numpy serializes
    ml_dtypes bfloat16 as opaque V2 — saved as f32, dtype restored on
    load; review finding)."""
    cfg = small_test_config()
    state = init_store(cfg.memory, store_dtype=jnp.bfloat16)
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=5)
    key = jax.random.PRNGKey(0)
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), key, cfg)

    path = str(tmp_path / "bf16.npz")
    P.save_npz(state, path)
    loaded = P.load_npz(path, cfg.memory, store_dtype=jnp.bfloat16)
    assert loaded.feats.dtype == jnp.bfloat16
    assert int(loaded.num_voxels) == int(state.num_voxels)
    n = int(state.num_voxels)
    K = state.feats.shape[0] // state.feat_count.shape[0]
    np.testing.assert_allclose(
        np.asarray(loaded.feats[:n * K], np.float32),
        np.asarray(state.feats[:n * K], np.float32))

    # ingestion continues after the restore
    loaded2, _ = ing.ingest_frames(
        loaded, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(1), cfg)
    assert int(loaded2.num_voxels) >= n


def test_npz_roundtrip_preserves_surprise_stats(tmp_path):
    """feat_sum/feat_obs (surprise-policy statistics) survive the
    snapshot so the novelty gate keeps working after reload."""
    import dataclasses
    base = small_test_config()
    cfg = base.replace(memory=dataclasses.replace(
        base.memory, replacement="surprise"))
    state = init_store(cfg.memory)
    assert state.feat_sum.shape[0] > 1
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=6)
    key = jax.random.PRNGKey(2)
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), key, cfg)
    assert float(jnp.sum(state.feat_obs)) > 0

    path = str(tmp_path / "sup.npz")
    P.save_npz(state, path)
    loaded = P.load_npz(path, cfg.memory)
    n = int(state.num_voxels)
    np.testing.assert_allclose(np.asarray(loaded.feat_obs[:n + 1]),
                               np.asarray(state.feat_obs[:n + 1]))
    np.testing.assert_allclose(np.asarray(loaded.feat_sum[:n + 1]),
                               np.asarray(state.feat_sum[:n + 1]),
                               rtol=1e-6)


def test_load_memory_rebases_frame_chain(tmp_path):
    """Loading a saved memory must rebase BOTH the device ingest chain
    (state.inv_init_base_tf) and the host detection chain
    (_inv_init_host) to the SAVED build-start pose — otherwise continued
    mapping lands in global/current-pose coordinates while the loaded
    voxels are original-pose-relative (review finding)."""
    from bsc_nav_tpu import geometry as G
    from bsc_nav_tpu.agents.spatial_memory import (Perception,
                                                   VoxelTokenMemory)
    from bsc_nav_tpu.env.fake import FakeNavEnv
    from bsc_nav_tpu.env.pathfinding import AgentState, Quat
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.config import QueryConfig

    cfg = small_test_config().replace(
        query=QueryConfig(top_k=8, query_width=28, query_height=28))
    start = AgentState(np.asarray([1.5, 0.0, -2.0], np.float32), Quat())

    env = FakeNavEnv(cfg, seed=11)
    env.reset(init_state=start, build_map=True)
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=1,
                            heads=2, num_registers=0)
    mem = VoxelTokenMemory(
        cfg, env=env,
        perception=Perception.create(cfg, vit_cfg=vit_cfg, batch_size=4))
    mem.excute(env.sims.get_sensor_observations(0), ["turn_left"] * 4)
    mem.flush()
    path = str(tmp_path / "mem")
    mem.save(path)

    env2 = FakeNavEnv(cfg, seed=11)
    env2.reset(init_state=AgentState(
        np.asarray([-3.0, 0.0, 1.0], np.float32), Quat()),
        build_map=True)
    mem2 = VoxelTokenMemory(
        cfg, env=env2, perception=mem.perception, memory_path=path)
    mem2.load_memory(init_state=start)

    pose0 = np.concatenate([start.position, [0, 0, 0, 1]]).astype(
        np.float32)
    expected = np.asarray(G.initial_base_inverse(
        jnp.asarray(pose0), jnp.asarray(mem2._base_tf, jnp.float32)))
    np.testing.assert_allclose(
        np.asarray(mem2.state.inv_init_base_tf), expected, atol=1e-5)
    np.testing.assert_allclose(mem2._inv_init_host, expected, atol=1e-5)
    assert not np.allclose(expected, np.eye(4))   # non-trivial rebase
