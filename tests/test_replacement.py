"""Tests for the surprise replacement policy and the forgetting pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory import ingest as ing
from bsc_nav_tpu.memory.replacement import forgetting_pass
from bsc_nav_tpu.memory.store import dequantized_feats, init_store

from test_ingest import make_frames


def surprise_cfg():
    cfg = small_test_config()
    mem = cfg.memory.__class__(
        grid_size=64, floor_height=-3.2, map_height=3.2, token_dim=32,
        cache_size=4, voxel_capacity=(1 << 10) - 8, depth_sample_rate=8,
        replacement="surprise", surprise_threshold=0.5)
    return cfg.replace(memory=mem)


def test_surprise_policy_gates_boring_tokens():
    """Re-ingesting the SAME frames: second pass brings no novel tokens,
    so (non-new-voxel) inserts must be heavily suppressed versus the
    dist policy."""
    cfg = surprise_cfg()
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=0)
    depth[:] = 0.5          # constant depth: dense voxel revisits
    poses[:, :3] = 0.0
    poses[:, 3:6] = 0.0
    poses[:, 6] = 1.0

    state = init_store(cfg.memory)
    k = jax.random.PRNGKey(0)
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), k, cfg)
    counts_after_1 = np.asarray(state.feat_count).copy()
    n = int(state.num_voxels)

    state2, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(1), cfg)
    counts_after_2 = np.asarray(state2.feat_count)

    grew = (counts_after_2[:n] > counts_after_1[:n]).mean()
    # identical appearance -> surprise ~0 for voxels with observed
    # neighbors; only isolated voxels (no neighbor stats) may re-insert
    assert grew < 0.35, f"{grew:.2f} of voxels grew on boring re-ingest"

    # dist policy control: same re-ingest grows counts broadly
    cfgd = cfg.replace(memory=cfg.memory.__class__(
        grid_size=64, floor_height=-3.2, map_height=3.2, token_dim=32,
        cache_size=4, voxel_capacity=(1 << 10) - 8, depth_sample_rate=8,
        replacement="dist"))
    sd = init_store(cfgd.memory)
    sd, _ = ing.ingest_frames(
        sd, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), k, cfgd)
    c1 = np.asarray(sd.feat_count).copy()
    sd2, _ = ing.ingest_frames(
        sd, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(1), cfgd)
    c2 = np.asarray(sd2.feat_count)
    nd = int(sd2.num_voxels)
    grew_dist = (c2[:nd] > np.minimum(c1[:nd], 3)).mean()
    assert grew_dist > grew


def test_surprise_policy_accepts_novel_tokens():
    """Novel-appearance tokens at already-mapped voxels must pass the
    gate."""
    cfg = surprise_cfg()
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=0)
    depth[:] = 0.5          # constant depth: dense voxel revisits
    poses[:, :3] = 0.0
    poses[:, 3:6] = 0.0
    poses[:, 6] = 1.0
    state = init_store(cfg.memory)
    state, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(0), cfg)
    c1 = np.asarray(state.feat_count).copy()
    n = int(state.num_voxels)

    # same geometry, completely different appearance tokens
    tokens2 = -tokens + np.random.default_rng(9).normal(
        size=tokens.shape).astype(np.float32)
    state2, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens2), jax.random.PRNGKey(1), cfg)
    c2 = np.asarray(state2.feat_count)
    K = cfg.memory.cache_size
    # acceptance shows as count growth (below capacity) or content
    # replacement (at capacity)
    below = c1[:n] < K
    grew = (c2[:n][below] > c1[:n][below]).mean() if below.any() else 0.0
    changed = (np.abs(np.asarray(dequantized_feats(state2))[:n]
                      - np.asarray(dequantized_feats(state))[:n]
                      ).max(axis=(1, 2)) > 1e-6)
    accepted = max(grew, changed.mean())
    assert accepted > 0.3, f"only {accepted:.2f} accepted novel tokens"


def oracle_forgetting(feats, dists, count, threshold):
    """Python union-find oracle (memory_2.py:386-446 semantics)."""
    f = feats[:count].astype(np.float64)
    d = dists[:count].astype(np.float64)
    if count <= 1:
        return f, d
    norms = np.linalg.norm(f, axis=1, keepdims=True)
    sims = (f / np.maximum(norms, 1e-12)) @ (f / np.maximum(norms, 1e-12)).T
    parent = list(range(count))

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for i in range(count):
        for j in range(count):
            if i != j and sims[i, j] > threshold:
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[max(pi, pj)] = min(pi, pj)
    groups = {}
    for i in range(count):
        groups.setdefault(find(i), []).append(i)
    out_f, out_d = [], []
    for root in sorted(groups):
        idx = groups[root]
        out_f.append(f[idx].mean(axis=0))
        out_d.append(d[idx].mean())
    return np.asarray(out_f), np.asarray(out_d)


def test_forgetting_pass_matches_oracle():
    cfg = surprise_cfg()
    K, D = cfg.memory.cache_size, cfg.memory.token_dim
    rng = np.random.default_rng(0)
    state = init_store(cfg.memory)

    # voxel 0: two near-duplicate pairs; voxel 1: all distinct
    base = rng.normal(size=(2, D)).astype(np.float32)
    v0 = np.stack([base[0], base[0] * 1.001, base[1], base[1] * 0.999])
    v1 = rng.normal(size=(K, D)).astype(np.float32)
    V1 = state.feat_count.shape[0]
    feats = np.zeros((V1, K, D), np.float32)
    feats[0, :4], feats[1, :K] = v0, v1
    counts = np.zeros_like(np.asarray(state.feat_count))
    counts[0], counts[1] = 4, K
    dists = np.zeros((V1, K), np.float32)
    dists[0, :4] = [1., 2., 3., 4.]
    dists[1, :K] = np.arange(K)
    norms = np.linalg.norm(feats, axis=-1)
    state = state.replace(
        feats=jnp.asarray(feats.reshape(V1 * K, D)),
        feat_norm=jnp.asarray(norms.reshape(V1 * K)),
        feat_dist=jnp.asarray(dists.reshape(V1 * K)),
        feat_count=jnp.asarray(counts),
        num_voxels=jnp.asarray(2, jnp.int32))

    out = forgetting_pass(state, threshold=0.95)
    of = np.asarray(out.feats).reshape(V1, K, D)
    od = np.asarray(out.feat_dist).reshape(V1, K)
    oc = np.asarray(out.feat_count)

    ef, ed = oracle_forgetting(feats[0], dists[0], 4, 0.95)
    assert oc[0] == len(ef) == 2
    np.testing.assert_allclose(of[0, :2], ef, rtol=1e-5)
    np.testing.assert_allclose(od[0, :2], ed, rtol=1e-5)

    # distinct tokens survive untouched
    assert oc[1] == K
    np.testing.assert_allclose(of[1, :K], v1, rtol=1e-5)


def test_surprise_exact_matches_reference_oracle():
    """Exact surprise gate: min cosine distance against every cached
    neighbor token (memory_2.py:375-384), verified per incoming point
    against a Python oracle over the pre-batch store."""
    cfg = surprise_cfg()
    cfg = cfg.replace(memory=cfg.memory.__class__(
        grid_size=64, floor_height=-3.2, map_height=3.2, token_dim=32,
        cache_size=4, voxel_capacity=(1 << 10) - 8, depth_sample_rate=8,
        replacement="surprise", surprise_exact=True,
        surprise_threshold=0.5))

    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=0)
    depth[:] = 0.5
    poses[:, :3] = 0.0
    poses[:, 3:6] = 0.0
    poses[:, 6] = 1.0

    state = init_store(cfg.memory)
    k = jax.random.PRNGKey(0)
    state1, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), k, cfg)

    # second pass with NOVEL tokens: compute, for a sample of voxels the
    # oracle can reach, whether the exact gate accepted
    tokens2 = -tokens
    state2, _ = ing.ingest_frames(
        state1, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens2), jax.random.PRNGKey(1), cfg)

    # oracle: negated tokens are maximally distant from the stored ones
    # (cosine distance ~2 > 0.5) -> every revisited voxel must accept
    c1 = np.asarray(state1.feat_count)
    c2 = np.asarray(state2.feat_count)
    n = int(state1.num_voxels)
    K = cfg.memory.cache_size
    grew = ((c2[:n] > c1[:n]) | (c1[:n] == K)).mean()
    f1 = np.asarray(dequantized_feats(state1))[:n]
    f2 = np.asarray(dequantized_feats(state2))[:n]
    changed = (np.abs(f2 - f1).max(axis=(1, 2)) > 1e-6)
    accepted = max((c2[:n] > c1[:n]).mean(), changed.mean())
    assert accepted > 0.3, f"exact gate rejected novel tokens ({accepted})"

    # and the boring case: identical re-ingest must be gated
    state3, _ = ing.ingest_frames(
        state1, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(2), cfg)
    c3 = np.asarray(state3.feat_count)
    grew_boring = (c3[:n] > c1[:n]).mean()
    f3 = np.asarray(dequantized_feats(state3))[:n]
    changed_boring = (np.abs(f3 - f1).max(axis=(1, 2)) > 1e-6).mean()
    assert changed_boring < 0.1, f"boring tokens accepted ({changed_boring})"


def test_forgetting_pass_int8_uses_dequantized_means():
    """int8 stores: codes with DIFFERENT per-token scales must merge in
    dequantized space and get a fresh scale — averaging raw codes would
    corrupt the merged feature (review finding)."""
    cfg = surprise_cfg()
    K, D = cfg.memory.cache_size, cfg.memory.token_dim
    state = init_store(cfg.memory, store_dtype=jnp.int8)
    V1 = state.feat_count.shape[0]

    # two copies of the SAME direction at very different magnitudes ->
    # same codes, very different scales; true mean = the direction
    base = np.random.default_rng(1).normal(size=(D,)).astype(np.float32)
    f1, f2 = base * 0.1, base * 10.0
    feats = np.zeros((V1, K, D), np.float32)
    feats[0, 0], feats[0, 1] = f1, f2
    scales = np.ones((V1, K), np.float32)
    q = np.zeros((V1, K, D), np.int8)
    for j, f in ((0, f1), (1, f2)):
        s = np.abs(f).max() / 127.0
        scales[0, j] = s
        q[0, j] = np.clip(np.round(f / s), -127, 127).astype(np.int8)
    counts = np.zeros_like(np.asarray(state.feat_count))
    counts[0] = 2
    norms = np.linalg.norm(q.astype(np.float32), axis=-1)

    state = state.replace(
        feats=jnp.asarray(q.reshape(V1 * K, D)),
        feat_scale=jnp.asarray(scales.reshape(V1 * K)),
        feat_norm=jnp.asarray(norms.reshape(V1 * K)),
        feat_dist=jnp.zeros((V1 * K,), jnp.float32),
        feat_count=jnp.asarray(counts))

    out = forgetting_pass(state, threshold=0.95)
    assert int(out.feat_count[0]) == 1
    merged = (np.asarray(out.feats)[0].astype(np.float32)
              * float(out.feat_scale[0]))
    want = (f1 + f2) / 2
    # int8 quantization noise ~ absmax/127
    np.testing.assert_allclose(merged, want,
                               atol=np.abs(want).max() / 64)
