"""Tests for the query-side localization program against numpy oracles
(reference semantics: memory_2.py:563-671)."""

import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory.store import init_store
from bsc_nav_tpu.memory import query as Q


def build_store(cfg, n_vox=50, seed=0):
    rng = np.random.default_rng(seed)
    m = cfg.memory
    state = init_store(m)
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    D = state.feats.shape[1]
    counts = rng.integers(1, K + 1, size=n_vox)
    feats = np.zeros((V1, K, D), np.float32)
    norms = np.zeros((V1, K), np.float32)
    pos = np.zeros((V1, 3), np.int32)
    for v in range(n_vox):
        f = rng.normal(size=(counts[v], D)).astype(np.float32)
        feats[v, :counts[v]] = f
        norms[v, :counts[v]] = np.linalg.norm(f, axis=1)
        pos[v] = rng.integers(0, m.grid_size, size=3)
    cnt = np.zeros(V1, np.int32)
    cnt[:n_vox] = counts
    state = state.replace(
        feats=jnp.asarray(feats.reshape(V1 * K, D)),
        feat_norm=jnp.asarray(norms.reshape(V1 * K)),
        feat_count=jnp.asarray(cnt), slot_pos=jnp.asarray(pos),
        num_voxels=jnp.asarray(n_vox, jnp.int32))
    return state, feats, norms, cnt, pos


def oracle_scores(feats, norms, cnt, q, n_vox):
    qn = q / np.linalg.norm(q)
    out = np.full(n_vox, -np.inf)
    for v in range(n_vox):
        if cnt[v] == 0:
            continue
        sims = feats[v, :cnt[v]] @ qn / norms[v, :cnt[v]]
        out[v] = sims.max()
    return out


def test_localize_topk_matches_oracle(rng):
    cfg = small_test_config()
    state, feats, norms, cnt, pos = build_store(cfg, n_vox=60)
    q = rng.normal(size=cfg.memory.token_dim).astype(np.float32)

    positions, scores = Q.localize(state, jnp.asarray(q), top_k=16)
    expected = oracle_scores(feats, norms, cnt, q, 60)
    order = np.argsort(-expected)[:16]
    np.testing.assert_allclose(np.asarray(scores), expected[order], rtol=1e-4)
    # positions must correspond to the same scores (ties permitting)
    np.testing.assert_allclose(
        np.asarray(positions).astype(float),
        pos[order].astype(float), atol=0)


def test_localize_region_mask(rng):
    cfg = small_test_config()
    state, feats, norms, cnt, pos = build_store(cfg, n_vox=60, seed=1)
    q = rng.normal(size=cfg.memory.token_dim).astype(np.float32)
    center = pos[7].astype(np.int32)
    radius = 12.0

    positions, scores = Q.localize(
        state, jnp.asarray(q), top_k=16, use_region=True,
        curr_grid=jnp.asarray(center), region_radius=radius)

    live = np.asarray(scores) > -np.inf
    assert live.any()
    d = np.linalg.norm(np.asarray(positions)[live] - center, axis=1)
    assert (d <= radius + 1e-6).all()
    # every in-radius voxel with a better score must be included
    expected = oracle_scores(feats, norms, cnt, q, 60)
    in_r = np.linalg.norm(pos[:60] - center, axis=1) <= radius
    kept = set(map(tuple, np.asarray(positions)[live].tolist()))
    n_in = int(in_r.sum())
    top_expected = np.argsort(-np.where(in_r, expected, -np.inf))[:min(16, n_in)]
    for v in top_expected:
        assert tuple(pos[v].tolist()) in kept


def test_localize_floor_mask(rng):
    cfg = small_test_config()
    state, feats, norms, cnt, pos = build_store(cfg, n_vox=60, seed=2)
    q = rng.normal(size=cfg.memory.token_dim).astype(np.float32)
    lo, hi = 10, 40

    positions, scores = Q.localize(
        state, jnp.asarray(q), top_k=16, use_floor=True,
        floor_range=jnp.asarray([lo, hi], jnp.int32))
    live = np.asarray(scores) > -np.inf
    h = np.asarray(positions)[live][:, 2]
    assert ((h >= lo) & (h <= hi)).all()


def test_gaussian_center_pool_matches_reference_weights():
    """Weights must follow memory_2.py:597-608: gaussian over the patch
    grid with sigma^2 = (g/2)^2, normalized, then mean over images."""
    B, g, D = 2, 4, 8
    rng = np.random.default_rng(0)
    tokens = rng.normal(size=(B, g * g, D)).astype(np.float32)

    xs = np.tile(np.arange(g), g)
    ys = np.repeat(np.arange(g), g)
    center = (g - 1) / 2
    d2 = (xs - center) ** 2 + (ys - center) ** 2
    w = np.exp(-d2 / (2 * (g / 2) ** 2))
    w /= w.sum()
    expected = (tokens * w[None, :, None]).sum(1).mean(0)

    ours = np.asarray(Q.gaussian_center_pool(jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_empty_store_returns_neg_inf():
    cfg = small_test_config()
    state = init_store(cfg.memory)
    q = np.ones(cfg.memory.token_dim, np.float32)
    positions, scores = Q.localize(state, jnp.asarray(q), top_k=8)
    assert (np.asarray(scores) == -np.inf).all()


def test_localize_batch_matches_per_query(rng):
    """Batched multi-query localize == per-query localize (one matmul
    store pass instead of Q matvec passes)."""
    cfg = small_test_config()
    state, feats, norms, cnt, pos = build_store(cfg, n_vox=70, seed=8)
    Qn = 5
    qs = rng.normal(size=(Qn, cfg.memory.token_dim)).astype(np.float32)

    bpos, bscores = Q.localize_batch(state, jnp.asarray(qs), top_k=12)
    assert bpos.shape == (Qn, 12, 3) and bscores.shape == (Qn, 12)
    for i in range(Qn):
        p_ref, s_ref = Q.localize(state, jnp.asarray(qs[i]), top_k=12)
        np.testing.assert_allclose(np.asarray(bscores[i]),
                                   np.asarray(s_ref), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(bpos[i]),
                                      np.asarray(p_ref))


def test_localize_batch_int8_store():
    """int8 stores go through the bf16-upcast path in the batch scan."""
    import jax as _jax
    from bsc_nav_tpu.memory.store import init_store
    from bsc_nav_tpu.memory import ingest as ing
    from test_ingest import make_frames

    cfg = small_test_config()
    rgb, depth, poses, tokens = make_frames(cfg, 3, seed=12)
    state = init_store(cfg.memory, store_dtype=jnp.int8)
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), _jax.random.PRNGKey(1), cfg)
    qs = np.random.default_rng(3).normal(
        size=(3, cfg.memory.token_dim)).astype(np.float32)
    bpos, bscores = Q.localize_batch(state, jnp.asarray(qs), top_k=8)
    for i in range(3):
        _, s_ref = Q.localize(state, jnp.asarray(qs[i]), top_k=8)
        np.testing.assert_allclose(np.asarray(bscores[i]),
                                   np.asarray(s_ref), rtol=1e-3,
                                   atol=1e-4)


def test_localize_batch_per_query_region(rng):
    """Batched per-query region masks == per-query single localize with
    the same radius (the adaptive-region sweep runs as one store pass,
    reference objnav_benchmark.py:1080-1100)."""
    cfg = small_test_config()
    state, feats, norms, cnt, pos = build_store(cfg, n_vox=60, seed=5)
    q = rng.normal(size=cfg.memory.token_dim).astype(np.float32)
    curr = np.asarray(pos[:60].mean(axis=0), np.int32)
    radii = np.array([6.0, 12.0, np.inf], np.float32)
    qs = np.tile(q, (3, 1))

    bpos, bscores = Q.localize_batch(
        state, jnp.asarray(qs), top_k=10, use_region=True,
        curr_grid=jnp.asarray(np.tile(curr, (3, 1))),
        region_radii=jnp.asarray(radii))
    for i, r in enumerate(radii):
        if np.isfinite(r):
            p_ref, s_ref = Q.localize(
                state, jnp.asarray(q), top_k=10, use_region=True,
                curr_grid=jnp.asarray(curr), region_radius=float(r))
        else:
            p_ref, s_ref = Q.localize(state, jnp.asarray(q), top_k=10)
        np.testing.assert_allclose(np.asarray(bscores[i]),
                                   np.asarray(s_ref), rtol=1e-5)
    # growing radius -> monotone non-decreasing live-candidate counts
    live = (np.asarray(bscores) > -np.inf).sum(axis=1)
    assert live[0] <= live[1] <= live[2]
