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
