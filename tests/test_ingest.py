"""End-to-end verification of the batched ingest program against a
sequential Python oracle implementing the reference's per-point loop
semantics (reference memory_2.py:842-903 + dist-base cache policy
memory_2.py:326-354).

The oracle consumes the SAME sampled pixels and replacement indices as
the JAX program (reproduced via the module's own PRNG calls), so every
scatter decision -- first-touch slot ids, RGB weighted sums, top-down
map overwrites, cache append/replace conflicts -- must match exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu import geometry as G
from bsc_nav_tpu.memory.store import (
    dequantized_feats, init_store, linear_voxel_id)
from bsc_nav_tpu.memory import ingest as ing


def make_frames(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    H, W = cfg.sensor.height, cfg.sensor.width
    rgb = rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8)
    depth = rng.uniform(0.2, 4.0, size=(B, H, W)).astype(np.float32)
    poses = np.zeros((B, 7), np.float32)
    poses[:, :3] = rng.uniform(-1.0, 1.0, size=(B, 3))
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    poses[:, 3:] = q
    nh = nw = cfg.query.query_height // 14  # 28 // 14 = 2
    tokens = rng.normal(size=(B, nh, nw, cfg.memory.token_dim)).astype(np.float32)
    return rgb, depth, poses, tokens


class SequentialOracle:
    """Reference-semantics simulator (memory_2.py obs2voxeltoken loop)."""

    def __init__(self, cfg):
        self.cfg = cfg
        m = cfg.memory
        self.gs, self.hc = m.grid_size, m.num_height_cells
        self.K, self.D = m.cache_size, m.token_dim
        self.V = m.voxel_capacity
        self.slot_map = {}
        self.slot_pos = []
        self.rgb_sum = []
        self.weight = []
        self.feats = []      # list of [K, D]
        self.dist = []
        self.count = []
        self.cv_map = np.zeros((self.gs, self.gs, 3), np.uint8)
        self.max_height = np.full((self.gs, self.gs), -1, np.int64)
        self.inv_init = None
        self.base = G.base_axes_transform()
        self.base2cam = G.base_to_cam_transform(cfg.sensor.sensor_height)

    def ingest(self, rgb, depth, poses, tokens, pix, rand_idx):
        cfg = self.cfg
        m = cfg.memory
        H, W = depth.shape[1:]
        nh, nw = tokens.shape[1:3]
        calib = G.camera_intrinsics(H, W, cfg.sensor.hfov_deg)
        inv_calib = np.linalg.inv(calib)
        patch_intr = G.patch_intrinsics(nh, nw)
        zmin, zmax = m.zmin, m.zmax
        B, P = pix.shape
        i_global = 0
        for b in range(B):
            if self.inv_init is None:
                init = self.base @ np.asarray(
                    G.pose_vec_to_tf(jnp.asarray(poses[0], jnp.float32))
                ) @ np.linalg.inv(self.base)
                self.inv_init = np.linalg.inv(init)
            hab = np.asarray(G.pose_vec_to_tf(jnp.asarray(poses[b], jnp.float32)))
            base_pose = self.base @ hab @ np.linalg.inv(self.base)
            tf = self.inv_init @ base_pose
            cam2w = tf @ self.base @ self.base2cam
            for p in range(P):
                i = i_global
                i_global += 1
                pi = int(pix[b, p])
                py, px = pi // W, pi % W
                z = float(depth[b, py, px])
                if not (cfg.sensor.min_depth < z < cfg.sensor.max_depth):
                    continue
                ray = inv_calib @ np.array([px + 0.5, py + 0.5, 1.0])
                p_local = (ray * z).astype(np.float32)
                p_world = (cam2w[:3, :3].astype(np.float32) @ p_local
                           + cam2w[:3, 3].astype(np.float32))
                row = int(self.gs / 2 - int(p_world[0] / m.cell_size))
                col = int(self.gs / 2 - int(p_world[1] / m.cell_size))
                h = int(p_world[2] / m.cell_size)
                if (row < 0 or row >= self.gs or col < 0 or col >= self.gs
                        or h < zmin or h >= zmax):
                    continue
                h -= zmin
                q = patch_intr @ p_local.astype(np.float64)
                ppx = int(q[0] / q[2] - 0.5)
                ppy = int(q[1] / q[2] - 0.5)
                if ppx < 0 or ppy < 0 or ppx >= nw or ppy >= nh:
                    continue
                tok = tokens[b, ppy, ppx].astype(np.float32)
                rgb_v = rgb[b, py, px].astype(np.float32)
                radial = float(np.sum(p_local.astype(np.float32) ** 2))
                alpha = np.exp(-radial / (2 * m.alpha_sigma_sq))

                key = (row, col, h)
                if key not in self.slot_map:
                    if len(self.slot_pos) >= self.V:
                        continue  # capacity drop
                    self.slot_map[key] = len(self.slot_pos)
                    self.slot_pos.append(key)
                    self.rgb_sum.append(np.zeros(3, np.float64))
                    self.weight.append(0.0)
                    self.feats.append(np.zeros((self.K, self.D), np.float32))
                    self.dist.append(np.zeros(self.K, np.float32))
                    self.count.append(0)
                s = self.slot_map[key]
                self.rgb_sum[s] += alpha * rgb_v
                self.weight[s] += alpha
                if h >= self.max_height[row, col]:
                    self.max_height[row, col] = h
                    self.cv_map[row, col] = rgb_v.astype(np.uint8)
                if self.count[s] < self.K:
                    k = self.count[s]
                    self.count[s] += 1
                else:
                    k = int(rand_idx[i])
                self.feats[s][k] = tok
                self.dist[s][k] = radial


@pytest.fixture(scope="module")
def ingested():
    cfg = small_test_config()
    B = 3
    rgb, depth, poses, tokens = make_frames(cfg, B)
    state = init_store(cfg.memory)
    key = jax.random.PRNGKey(42)

    state2, stats = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), key, cfg)

    # reproduce the module's own sampling to drive the oracle
    H, W = cfg.sensor.height, cfg.sensor.width
    P = ing.points_per_frame(cfg)
    keys = jax.random.split(key, B + 1)
    pix = np.stack([
        np.asarray(ing._select_pixels(keys[1 + b], H, W, P)) for b in range(B)
    ])
    rand_idx = np.asarray(
        jax.random.randint(keys[0], (B * P,), 0, cfg.memory.cache_size,
                           dtype=jnp.int32))

    oracle = SequentialOracle(cfg)
    oracle.ingest(rgb, depth, poses, tokens, pix, rand_idx)
    return cfg, state2, stats, oracle


def test_slot_assignment_matches_oracle(ingested):
    cfg, state, stats, oracle = ingested
    n = int(state.num_voxels)
    assert n == len(oracle.slot_pos)
    assert n > 50  # sanity: the scene actually populated
    np.testing.assert_array_equal(
        np.asarray(state.slot_pos)[:n], np.asarray(oracle.slot_pos))


def test_rgb_fusion_matches_oracle(ingested):
    cfg, state, stats, oracle = ingested
    n = int(state.num_voxels)
    np.testing.assert_allclose(
        np.asarray(state.weight)[:n], np.asarray(oracle.weight), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state.rgb_sum)[:n], np.asarray(oracle.rgb_sum),
        rtol=1e-3, atol=1e-2)


def test_topdown_map_matches_oracle(ingested):
    cfg, state, stats, oracle = ingested
    gs = cfg.memory.grid_size
    mh = np.asarray(state.max_height)[:gs * gs].reshape(gs, gs)
    np.testing.assert_array_equal(mh, oracle.max_height)
    cv = np.asarray(state.cv_map)[:gs * gs].reshape(gs, gs, 3)
    np.testing.assert_array_equal(cv, oracle.cv_map)


def test_token_cache_matches_oracle(ingested):
    cfg, state, stats, oracle = ingested
    n = int(state.num_voxels)
    np.testing.assert_array_equal(
        np.asarray(state.feat_count)[:n], np.asarray(oracle.count))
    K = cfg.memory.cache_size
    feats = np.asarray(dequantized_feats(state))[:n]
    dist = np.asarray(state.feat_dist).reshape(-1, K)[:n]
    for s in range(n):
        k = oracle.count[s]
        np.testing.assert_allclose(feats[s][:k], oracle.feats[s][:k],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(dist[s][:k], oracle.dist[s][:k],
                                   rtol=1e-4)


def test_cache_replacement_after_saturation():
    """Hammer one voxel beyond cache_size across two batches and check the
    append-then-replace policy against the oracle."""
    cfg = small_test_config()
    B = 2
    rgb, depth, poses, tokens = make_frames(cfg, B, seed=1)
    # constant shallow depth => many points collapse into few voxels
    depth[:] = 0.5
    poses[:, :3] = 0.0
    poses[:, 3:6] = 0.0
    poses[:, 6] = 1.0

    state = init_store(cfg.memory)
    key = jax.random.PRNGKey(7)
    state2, _ = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), key, cfg)

    H, W = cfg.sensor.height, cfg.sensor.width
    P = ing.points_per_frame(cfg)
    keys = jax.random.split(key, B + 1)
    pix = np.stack([
        np.asarray(ing._select_pixels(keys[1 + b], H, W, P)) for b in range(B)
    ])
    rand_idx = np.asarray(jax.random.randint(
        keys[0], (B * P,), 0, cfg.memory.cache_size, dtype=jnp.int32))
    oracle = SequentialOracle(cfg)
    oracle.ingest(rgb, depth, poses, tokens, pix, rand_idx)

    n = int(state2.num_voxels)
    assert n == len(oracle.slot_pos)
    assert max(oracle.count) == cfg.memory.cache_size  # saturation reached
    feats = np.asarray(dequantized_feats(state2))[:n]
    for s in range(n):
        np.testing.assert_allclose(
            feats[s][:oracle.count[s]], oracle.feats[s][:oracle.count[s]],
            rtol=1e-5, atol=1e-6)


def test_sequential_batches_accumulate():
    """Two sequential ingest calls == state threading works; the frame
    chain (inv_init_base_tf) is pinned by the first batch."""
    cfg = small_test_config()
    rgb, depth, poses, tokens = make_frames(cfg, 4, seed=3)
    state = init_store(cfg.memory)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    s_a, _ = ing.ingest_frames(
        state, jnp.asarray(rgb[:2]), jnp.asarray(depth[:2]),
        jnp.asarray(poses[:2]), jnp.asarray(tokens[:2]), k1, cfg)
    s_b, _ = ing.ingest_frames(
        s_a, jnp.asarray(rgb[2:]), jnp.asarray(depth[2:]),
        jnp.asarray(poses[2:]), jnp.asarray(tokens[2:]), k2, cfg)

    assert bool(s_b.initialized)
    np.testing.assert_allclose(np.asarray(s_a.inv_init_base_tf),
                               np.asarray(s_b.inv_init_base_tf))
    assert int(s_b.num_voxels) >= int(s_a.num_voxels) > 0


def test_all_invalid_frames_are_noop():
    """Zero-depth frames (the flush padding) must not touch the store."""
    cfg = small_test_config()
    H, W = cfg.sensor.height, cfg.sensor.width
    rgb = np.zeros((2, H, W, 3), np.uint8)
    depth = np.zeros((2, H, W), np.float32)     # all below min_depth
    poses = np.zeros((2, 7), np.float32)
    poses[:, 6] = 1.0
    state = init_store(cfg.memory)
    s2, stats = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(np.zeros((2, 2, 2, cfg.memory.token_dim), np.float32)),
        jax.random.PRNGKey(0), cfg)
    assert int(s2.num_voxels) == 0
    assert int(stats["points_valid"]) == 0
    assert (np.asarray(s2.feat_count) == 0).all()
    # but the frame chain is initialized (first batch defines the origin)
    assert bool(s2.initialized)


def test_capacity_exactly_full_boundary():
    """Filling the store to exactly capacity: no overflow, drops counted
    only past the boundary."""
    cfg = small_test_config()
    mem = cfg.memory.__class__(
        grid_size=64, floor_height=-3.2, map_height=3.2, token_dim=32,
        cache_size=4, voxel_capacity=64, depth_sample_rate=8)
    cfg = cfg.replace(memory=mem)
    rgb, depth, poses, tokens = make_frames(cfg, 3, seed=4)
    state = init_store(cfg.memory)
    s2, stats = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(1), cfg)
    n, dropped = int(s2.num_voxels), int(s2.dropped_voxels)
    assert n <= 64
    if dropped > 0:
        assert n == 64          # capacity saturated before any drop
    # every live slot has valid grid coordinates
    pos = np.asarray(s2.slot_pos)[:n]
    assert (pos >= 0).all()
    assert (pos[:, :2] < 64).all()


def test_nonfinite_depth_is_excluded_and_store_stays_finite():
    """Habitat depth sensors emit inf (no-hit) and can emit NaN: such
    pixels must be excluded by the range mask and no NaN may leak into
    any store array through the where-guarded scatters."""
    cfg = small_test_config()
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=11)
    depth = depth.copy()
    depth[0, ::3, ::3] = np.inf
    depth[0, 1::3, 1::3] = np.nan
    depth[1, :8, :8] = -np.inf
    state = init_store(cfg.memory)
    state, stats = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(0), cfg)
    for name in ("feats", "feat_norm", "rgb_sum", "weight"):
        arr = np.asarray(getattr(state, name), np.float32)
        assert np.isfinite(arr).all(), f"{name} contains non-finite values"
    assert int(state.num_voxels) > 0            # finite pixels still ingested
    # all assigned slot positions are inside the grid
    n = int(state.num_voxels)
    pos = np.asarray(state.slot_pos[:n])
    G = cfg.memory.grid_size
    assert (pos[:, :2] >= 0).all() and (pos[:, :2] < G).all()
