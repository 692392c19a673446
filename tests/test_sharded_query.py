"""Sharded distributed top-k query vs the single-device localize."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory import query as Q
from bsc_nav_tpu.parallel import mesh as M
from bsc_nav_tpu.parallel.sharded_query import sharded_localize

from test_query import build_store


def test_sharded_localize_matches_single_device(rng):
    cfg = small_test_config()
    state, feats, norms, cnt, pos = build_store(cfg, n_vox=200, seed=3)
    q = rng.normal(size=cfg.memory.token_dim).astype(np.float32)

    p_ref, s_ref = Q.localize(state, jnp.asarray(q), top_k=32)

    mesh = M.make_mesh(dp=1, mp=8)
    sstate = M.shard_store(state, mesh)
    p_sh, s_sh = sharded_localize(sstate, jnp.asarray(q), mesh, top_k=32)

    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p_sh), np.asarray(p_ref))


def test_sharded_localize_int8_store(rng):
    """int8 stores must upcast (an int8 cast of the unit query truncates
    every component to 0) — sharded scores match single-device."""
    from bsc_nav_tpu.memory.store import init_store
    from bsc_nav_tpu.memory import ingest as ing
    from test_ingest import make_frames

    cfg = small_test_config()
    rgb, depth, poses, tokens = make_frames(cfg, 4, seed=7)
    state = init_store(cfg.memory, store_dtype=jnp.int8)
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(0), cfg)
    assert state.feats.dtype == jnp.int8
    assert int(state.num_voxels) > 0

    q = rng.normal(size=cfg.memory.token_dim).astype(np.float32)
    p_ref, s_ref = Q.localize(state, jnp.asarray(q), top_k=16)
    assert np.isfinite(np.asarray(s_ref)[0])   # sanity: scores not garbage

    mesh = M.make_mesh(dp=1, mp=8)
    sstate = M.shard_store(state, mesh)
    p_sh, s_sh = sharded_localize(sstate, jnp.asarray(q), mesh, top_k=16)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               rtol=1e-2, atol=1e-3)


def test_sharded_localize_mp2(rng):
    cfg = small_test_config()
    state, *_ = build_store(cfg, n_vox=77, seed=5)
    q = rng.normal(size=cfg.memory.token_dim).astype(np.float32)
    p_ref, s_ref = Q.localize(state, jnp.asarray(q), top_k=16)

    mesh = M.make_mesh(dp=4, mp=2)
    sstate = M.shard_store(state, mesh)
    p_sh, s_sh = sharded_localize(sstate, jnp.asarray(q), mesh, top_k=16)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               rtol=1e-5)
