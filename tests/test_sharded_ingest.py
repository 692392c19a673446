"""GSPMD correctness: the build step over a device mesh must produce
EXACTLY the same store as single-device execution (the ingest conflict
resolution is deterministic by construction -- order indices + packed
scatter-max -- so device layout must not change results)."""

import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory.ingest import ingest_frames
from bsc_nav_tpu.memory.store import dequantized_feats, init_store
from bsc_nav_tpu.parallel import mesh as M

from test_ingest import make_frames


def test_dp_sharded_ingest_matches_single_device():
    cfg = small_test_config()
    B = 8
    rgb, depth, poses, tokens = make_frames(cfg, B, seed=2)
    key = jax.random.PRNGKey(3)

    # single device
    s0 = init_store(cfg.memory)
    s_ref, _ = ingest_frames(
        s0, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), key, cfg)

    # dp=8 mesh: frames sharded, store replicated
    mesh = M.make_mesh(dp=8, mp=1)
    fsh = M.frames_sharding(mesh)
    s1 = init_store(cfg.memory)
    s_sh, _ = ingest_frames(
        s1,
        jax.device_put(jnp.asarray(rgb), fsh),
        jax.device_put(jnp.asarray(depth), fsh),
        jax.device_put(jnp.asarray(poses), fsh),
        jax.device_put(jnp.asarray(tokens), fsh),
        key, cfg)

    assert int(s_sh.num_voxels) == int(s_ref.num_voxels)
    n = int(s_ref.num_voxels)
    np.testing.assert_array_equal(np.asarray(s_sh.slot_pos)[:n],
                                  np.asarray(s_ref.slot_pos)[:n])
    np.testing.assert_array_equal(np.asarray(s_sh.feat_count)[:n],
                                  np.asarray(s_ref.feat_count)[:n])
    np.testing.assert_allclose(np.asarray(dequantized_feats(s_sh))[:n],
                               np.asarray(dequantized_feats(s_ref))[:n],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_sh.weight)[:n],
                               np.asarray(s_ref.weight)[:n], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(s_sh.max_height),
                                  np.asarray(s_ref.max_height))


def test_dp_mp_sharded_build_step_matches():
    """Full encode+ingest step over a 2x4 mesh (TP-sharded ViT params)
    equals the unsharded step."""
    from bsc_nav_tpu.memory.pipeline import make_build_step
    from bsc_nav_tpu.models import vit

    cfg = small_test_config()
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=2,
                            heads=2, num_registers=1)
    params = vit.init_params(vit_cfg, jax.random.PRNGKey(0))
    B = 8
    rgb, depth, poses, _ = make_frames(cfg, B, seed=4)
    build = make_build_step(cfg, vit_cfg)

    carry = (init_store(cfg.memory), jax.random.PRNGKey(1))
    carry_ref, _ = build(carry, params, jnp.asarray(rgb),
                         jnp.asarray(depth), jnp.asarray(poses))

    mesh = M.make_mesh(dp=2, mp=4)
    sp = M.shard_vit_params(params, mesh)
    sstore = M.shard_store(init_store(cfg.memory), mesh)
    fsh = M.frames_sharding(mesh)
    carry2 = (sstore, jax.random.PRNGKey(1))
    carry_sh, _ = build(carry2, sp,
                        jax.device_put(jnp.asarray(rgb), fsh),
                        jax.device_put(jnp.asarray(depth), fsh),
                        jax.device_put(jnp.asarray(poses), fsh))

    s_ref, s_sh = carry_ref[0], carry_sh[0]
    assert int(s_sh.num_voxels) == int(s_ref.num_voxels)
    n = int(s_ref.num_voxels)
    np.testing.assert_array_equal(np.asarray(s_sh.slot_pos)[:n],
                                  np.asarray(s_ref.slot_pos)[:n])
    # feats pass through the TP-sharded encoder: bitwise equality is not
    # guaranteed across different matmul partitionings; require tight
    # numerical agreement instead
    np.testing.assert_allclose(np.asarray(dequantized_feats(s_sh))[:n],
                               np.asarray(dequantized_feats(s_ref))[:n],
                               rtol=2e-4, atol=2e-4)
