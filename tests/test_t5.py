"""T5 encoder parity against transformers' torch implementation
(random weights, tiny config)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from bsc_nav_tpu.models import t5 as T5


def test_t5_parity_vs_transformers():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    cfg = T5.T5_TEST
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.dim, d_kv=cfg.d_kv,
        num_heads=cfg.heads, d_ff=cfg.d_ff, num_layers=cfg.layers,
        relative_attention_num_buckets=cfg.rel_buckets,
        relative_attention_max_distance=cfg.rel_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        layer_norm_epsilon=cfg.eps, is_encoder_decoder=False,
        use_cache=False)
    torch.manual_seed(0)
    tmodel = T5EncoderModel(hf_cfg).eval()

    params = T5.convert_t5(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        t_out = tmodel(input_ids=torch.from_numpy(ids)
                       ).last_hidden_state.numpy()
    j_out = np.asarray(T5.encode(params, jnp.asarray(ids, jnp.int32), cfg))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-3)


def test_t5_quantized_parity():
    """int8 W8A8 serving (quantize_params) tracks the float encoder:
    per-token cosine stays high and the int8 embed gather dequantizes
    exactly up to the per-column scale rounding."""
    import jax
    cfg = T5.T5_TEST
    params = T5.init_params(cfg, jax.random.PRNGKey(0))
    qparams = T5.quantize_params(params)
    # quantized leaves replaced the bare matmul weights
    assert "w_q" in qparams["blocks"][0]["q"]
    assert qparams["blocks"][0]["q"]["w_q"].dtype == jnp.int8
    assert "w_q" in qparams["embed"]

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(2, 16)),
                      jnp.int32)
    ref = np.asarray(T5.encode(params, ids, cfg), np.float32)
    q = np.asarray(T5.encode(qparams, ids, cfg), np.float32)
    cos = np.sum(ref * q, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(q, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_t5_host_quantize_matches_device():
    """quantize_params_host (numpy, pre-upload) produces the same int8
    tree as the jnp quantize_params."""
    import jax
    cfg = T5.T5_TEST
    params = T5.init_params(cfg, jax.random.PRNGKey(2))
    qd = T5.quantize_params(params)
    qh = T5.quantize_params_host(
        jax.tree.map(lambda a: np.asarray(a), params))
    leaves_d = jax.tree.leaves(qd)
    leaves_h = jax.tree.leaves(qh)
    assert len(leaves_d) == len(leaves_h)
    for a, b in zip(leaves_d, leaves_h):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_t5_attention_mask():
    import jax
    cfg = T5.T5_TEST
    params = T5.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.array([[5, 6, 7, 0, 0]], np.int32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0]], bool))
    out_m = T5.encode(params, ids, cfg, mask=mask)
    # changing PADDED token content must not affect unpadded outputs
    ids2 = ids.at[0, 4].set(99)
    out_m2 = T5.encode(params, ids2, cfg, mask=mask)
    np.testing.assert_allclose(np.asarray(out_m[:, :3]),
                               np.asarray(out_m2[:, :3]), atol=1e-5)
