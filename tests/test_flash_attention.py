"""Flash attention kernel vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.ops.flash_attention import (
    flash_attention, reference_attention)


def mk(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("B,H,S,D", [(1, 2, 128, 64), (2, 2, 256, 64)])
def test_flash_matches_reference(B, H, S, D):
    q, k, v = mk((B, H, S, D), 0), mk((B, H, S, D), 1), mk((B, H, S, D), 2)
    out = flash_attention(q, k, v, interpret=True)
    exp = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-3, atol=2e-3)


def test_flash_unaligned_seqlen():
    """261 tokens = DINOv2 ViT-L/14-reg @224 (256 patches + cls + 4 reg):
    key padding must be masked, not averaged in."""
    B, H, S, D = 1, 2, 261, 64
    q, k, v = mk((B, H, S, D), 3), mk((B, H, S, D), 4), mk((B, H, S, D), 5)
    out = flash_attention(q, k, v, interpret=True)
    exp = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-3, atol=2e-3)


def test_flash_causal():
    B, H, S, D = 1, 2, 77, 64   # CLIP text shape
    q, k, v = mk((B, H, S, D), 6), mk((B, H, S, D), 7), mk((B, H, S, D), 8)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    exp = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-3, atol=2e-3)


def test_fused_qkv_heads_per_block():
    """Wider grid blocks (4/8 heads per program) match the default."""
    from bsc_nav_tpu.ops.flash_attention import (
        attention_from_qkv, short_attention_qkv)
    B, S, h, hd = 2, 37, 8, 64
    qkv = mk((B, S, 3 * h * hd), 30)
    ref = attention_from_qkv(qkv, heads=h)
    for hp in (2, 4, 8):
        out = short_attention_qkv(qkv, heads=h, heads_per_block=hp,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_causal_rejects_rectangular():
    """Kernels mask with q_pos >= k_pos (no Sk-Sq offset): causal calls
    with Sq != Sk must be rejected, not silently diverge from the
    tril(k=Sk-Sq) oracle."""
    from bsc_nav_tpu.ops.flash_attention import attention, short_attention
    q = mk((1, 2, 8, 64), 20)
    k = mk((1, 2, 16, 64), 21)
    v = mk((1, 2, 16, 64), 22)
    with pytest.raises(ValueError, match="Sq == Sk"):
        attention(q, k, v, causal=True)
    with pytest.raises(AssertionError):
        flash_attention(q, k, v, causal=True, interpret=True)
    with pytest.raises(AssertionError):
        short_attention(q, k, v, causal=True, interpret=True)


def test_flash_bf16():
    B, H, S, D = 1, 2, 128, 64
    q = mk((B, H, S, D), 9).astype(jnp.bfloat16)
    k = mk((B, H, S, D), 10).astype(jnp.bfloat16)
    v = mk((B, H, S, D), 11).astype(jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    exp = reference_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(exp, np.float32),
        rtol=3e-2, atol=3e-2)


def test_similarity_kernel_matches_reference():
    """Fused row-cosine kernel (interpret mode) vs the jnp composition
    over the flat [V*K, D] store layout."""
    from bsc_nav_tpu.ops.similarity import (
        max_cosine_per_voxel, reference_max_cosine)
    rng = np.random.default_rng(0)
    V1, K, D = 2048, 4, 128          # V1*K = 8192, kernel-aligned
    feats = rng.normal(size=(V1 * K, D)).astype(np.float32)
    norms = np.linalg.norm(feats, axis=-1)
    counts = rng.integers(0, K + 1, V1).astype(np.int32)
    q = rng.normal(size=D).astype(np.float32)
    fj, nj, cj, qj = map(jnp.asarray, (feats, norms, counts, q))

    ref = reference_max_cosine(fj, nj, cj, qj)
    out = max_cosine_per_voxel(fj, nj, cj, qj, interpret=True)
    r, o = np.asarray(ref), np.asarray(out)
    live = counts > 0
    np.testing.assert_allclose(o[live], r[live], rtol=1e-3, atol=1e-4)
    assert (o[~live] == -np.inf).all()


def test_short_attention_matches_reference():
    from bsc_nav_tpu.ops.flash_attention import short_attention
    B, H, S, D = 2, 4, 261, 64
    q, k, v = mk((B, H, S, D), 20), mk((B, H, S, D), 21), mk((B, H, S, D), 22)
    out = short_attention(q, k, v, interpret=True)
    exp = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-3, atol=2e-3)
    # causal
    out_c = short_attention(q, k, v, causal=True, interpret=True)
    exp_c = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(exp_c),
                               rtol=2e-3, atol=2e-3)


def test_short_attention_qkv_matches_reference():
    """Fused-QKV kernel (interpret mode) == split/transpose reference."""
    from bsc_nav_tpu.ops.flash_attention import (
        reference_attention, short_attention_qkv)
    B, S, h, hd = 2, 37, 4, 32
    D = h * hd
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    out = short_attention_qkv(qkv, heads=h, interpret=True)
    q, k, v = (qkv.reshape(B, S, 3, h, hd)[:, :, i].transpose(0, 2, 1, 3)
               for i in range(3))
    ref = reference_attention(q, k, v).transpose(0, 2, 1, 3).reshape(B, S, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_from_qkv_fallback_path():
    """Off-TPU the wrapper takes the split/transpose path and matches."""
    from bsc_nav_tpu.ops.flash_attention import (
        attention_from_qkv, reference_attention)
    B, S, h, hd = 2, 19, 3, 24            # odd heads: never the kernel
    D = h * hd
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    out = attention_from_qkv(qkv, heads=h)
    q, k, v = (qkv.reshape(B, S, 3, h, hd)[:, :, i].transpose(0, 2, 1, 3)
               for i in range(3))
    ref = reference_attention(q, k, v).transpose(0, 2, 1, 3).reshape(B, S, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_use_fused_qkv_gate():
    from bsc_nav_tpu.ops.flash_attention import use_fused_qkv_attention
    import jax as _jax
    on_tpu = _jax.default_backend() == "tpu"
    assert use_fused_qkv_attention(261, 16, 64) == on_tpu
    assert not use_fused_qkv_attention(261, 16, 64, causal=True)
    assert not use_fused_qkv_attention(2048, 16, 64)
    assert not use_fused_qkv_attention(261, 15, 64)
    assert not use_fused_qkv_attention(261, 16, 80)


def test_mid_attention_matches_reference():
    """q-tiled KV-resident kernel (interpret mode) vs the jnp oracle,
    incl. unaligned Sq/Sk and rectangular shapes."""
    from bsc_nav_tpu.ops.flash_attention import mid_attention
    for B, H, Sq, Sk in [(2, 3, 300, 300), (1, 2, 1101, 1101),
                         (1, 2, 130, 700)]:
        q = mk((B, H, Sq, 64), 40 + Sq)
        k = mk((B, H, Sk, 64), 41 + Sk)
        v = mk((B, H, Sk, 64), 42 + Sk)
        out = mid_attention(q, k, v, interpret=True)
        exp = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=2e-3, atol=2e-3)


def test_joint_qkv_attention_matches_composed_path():
    """joint_qkv_attention (interpret) == per-stream split/transpose +
    RMS qk-norm + reference attention on the concatenated sequence."""
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.ops import flash_attention as FA

    B, Sx, Sc, heads, hd = 2, 40, 9, 2, 64
    D = heads * hd
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    qkv_x = jax.random.normal(ks[0], (B, Sx, 3 * D), jnp.float32)
    qkv_c = jax.random.normal(ks[1], (B, Sc, 3 * D), jnp.float32)
    gqx = jax.random.normal(ks[2], (hd,)) * 0.1 + 1.0
    gkx = jax.random.normal(ks[3], (hd,)) * 0.1 + 1.0
    gqc = jax.random.normal(ks[4], (hd,)) * 0.1 + 1.0
    gkc = jax.random.normal(ks[5], (hd,)) * 0.1 + 1.0

    got = FA.joint_qkv_attention(qkv_x, qkv_c, heads, gqx, gkx, gqc, gkc,
                                 bq=128, interpret=True)

    def rms(t, g):
        var = jnp.mean(jnp.square(t), axis=-1, keepdims=True)
        return t * jax.lax.rsqrt(var + 1e-6) * g

    def split(qkv, S):
        r = qkv.reshape(B, S, 3, heads, hd)
        return (r[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

    qx, kx, vx = split(qkv_x, Sx)
    qc, kc, vc = split(qkv_c, Sc)
    q = jnp.concatenate([rms(qx, gqx), rms(qc, gqc)], axis=2)
    k = jnp.concatenate([rms(kx, gkx), rms(kc, gkc)], axis=2)
    v = jnp.concatenate([vx, vc], axis=2)
    want = FA.reference_attention(q, k, v)
    want = want.transpose(0, 2, 1, 3).reshape(B, Sx + Sc, D)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_self_qkv_kernel_empty_ctx_matches_composed_path():
    """The single-stream specialization (MMDiT-X dual attention): the
    fused joint kernel with Sc=0 == split/transpose + RMS qk-norm +
    reference attention."""
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.ops import flash_attention as FA

    B, S, heads, hd = 2, 40, 2, 64
    D = heads * hd
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    qkv = jax.random.normal(ks[0], (B, S, 3 * D), jnp.float32)
    gq = jax.random.normal(ks[1], (hd,)) * 0.1 + 1.0
    gk = jax.random.normal(ks[2], (hd,)) * 0.1 + 1.0

    got = FA.joint_qkv_attention(qkv, qkv[:, :0], heads, gq, gk, gq, gk,
                                 bq=128, interpret=True)

    def rms(t, g):
        var = jnp.mean(jnp.square(t), axis=-1, keepdims=True)
        return t * jax.lax.rsqrt(var + 1e-6) * g

    r = qkv.reshape(B, S, 3, heads, hd)
    q, k, v = (r[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    want = FA.reference_attention(rms(q, gq), rms(k, gk), v)
    want = want.transpose(0, 2, 1, 3).reshape(B, S, D)
    import numpy as np
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # and the dispatch wrapper (CPU -> composed reference) agrees too
    got2 = FA.self_qkv_dispatch(qkv, heads, gq, gk)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
