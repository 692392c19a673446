"""Live-store int8 conversion (store.quantize_store): localize results
must be preserved -- cosine over per-row-absmax int8 rows is exact up
to the rounding error (the row scale cancels; same convention as int8
ingest and frozen segments).  The converter exists so the text-query
phase can fit the T5-XXL conditioning stack next to a built store on a
16 GB chip (round 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from bsc_nav_tpu.memory import ingest as ing
from bsc_nav_tpu.memory.query import localize
from bsc_nav_tpu.memory.store import init_store, quantize_store
from test_segments import tiny_cfg
from test_ingest import make_frames


def _built_state(cfg, store_dtype=jnp.float32):
    state = init_store(cfg.memory, store_dtype=store_dtype)
    key = jax.random.PRNGKey(0)
    for b in range(2):
        rgb, depth, poses, tokens = make_frames(cfg, 2, seed=b)
        key, sub = jax.random.split(key)
        state, _ = ing.ingest_frames(
            state, jnp.asarray(rgb), jnp.asarray(depth),
            jnp.asarray(poses), jnp.asarray(tokens), sub, cfg)
    return state


def test_quantize_store_preserves_localize():
    cfg = tiny_cfg()
    state = _built_state(cfg)
    assert int(state.num_voxels) > 20
    q = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (32,)),
                   np.float32)
    pos_f, sc_f = localize(state, jnp.asarray(q), top_k=16)
    qstate = quantize_store(state)
    assert qstate.feats.dtype == jnp.int8
    assert qstate.feat_scale.shape[0] == qstate.feats.shape[0]
    pos_q, sc_q = localize(qstate, jnp.asarray(q), top_k=16)

    sc_f, sc_q = np.asarray(sc_f), np.asarray(sc_q)
    live = sc_f > -np.inf
    assert (sc_q > -np.inf).sum() == live.sum()
    # int8 rounding: cosine drift is tiny; ranks of well-separated
    # scores must be identical
    np.testing.assert_allclose(sc_q[live], sc_f[live], atol=5e-3)
    stable = np.abs(sc_f[live][:-1] - sc_f[live][1:]) > 1e-2
    keep = np.concatenate([[True], stable]) & np.concatenate(
        [stable, [True]])
    np.testing.assert_array_equal(np.asarray(pos_f)[live][keep],
                                  np.asarray(pos_q)[live][keep])


def test_quantize_store_idempotent_and_ingestable():
    import dataclasses
    cfg = tiny_cfg()
    # headroom so the post-conversion ingest can still add voxels
    cfg = cfg.replace(memory=dataclasses.replace(
        cfg.memory, voxel_capacity=8000))
    state = quantize_store(_built_state(cfg))
    assert quantize_store(state) is state          # no-op on int8
    n0 = int(state.num_voxels)
    rgb, depth, poses, tokens = make_frames(cfg, 1, seed=9)
    poses[:, :3] += 2.0                            # new voxels
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(5), cfg)
    assert int(state.num_voxels) > n0              # ingest keeps working
    assert state.feats.dtype == jnp.int8
