"""SD3.5 text-conditioning parity: the CLIP-L + CLIP-G (+ T5) triple
-encoder stack vs the diffusers/transformers recipe.

The reference runs the real SD3.5-medium pipeline (memory_2.py:542-560);
its `encode_prompt` builds
  pooled  = concat(CLIP-L pooled, CLIP-G pooled)
  context = concat(CLIP-L hidden[-2], CLIP-G hidden[-2]) zero-padded to
            the joint width, then T5 sequence features appended.
These tests prove (1) per-tower parity of `clip.encode_text_sd3` against
transformers' CLIPTextModelWithProjection, (2) the full conditioning
assembly in DiffusionImagination against a torch oracle following the
diffusers steps, and (3) converter key/shape coverage at the REAL
CLIP-L / CLIP-G checkpoint dimensions (meta-device schema audit).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from bsc_nav_tpu.models import clip as C
from bsc_nav_tpu.models import mmdit as M
from bsc_nav_tpu.models import t5 as T5
from bsc_nav_tpu.models import vae as V
from bsc_nav_tpu.models import tokenizer as T


def _hf_text_model(width, layers, heads, proj_dim, vocab, ctx_len,
                   act="gelu", seed=0):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection
    cfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=width, intermediate_size=4 * width,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=ctx_len, projection_dim=proj_dim,
        hidden_act=act, eos_token_id=vocab - 1, bos_token_id=vocab - 2,
        attention_dropout=0.0)
    torch.manual_seed(seed)
    return CLIPTextModelWithProjection(cfg).eval()


def _ids_with_eot(rng, B, L, vocab):
    """Token rows shaped like a CLIP tokenization: sot, words, eot,
    zero padding — eot (the max id) appears exactly once per row."""
    n_words = rng.integers(2, L - 2, size=B)
    ids = np.zeros((B, L), np.int64)
    for b in range(B):
        ids[b, 0] = vocab - 2
        ids[b, 1:1 + n_words[b]] = rng.integers(1, vocab - 2,
                                                size=n_words[b])
        ids[b, 1 + n_words[b]] = vocab - 1
    return ids


@pytest.mark.parametrize("act,quick", [("gelu", False), ("quick_gelu", True)])
def test_encode_text_sd3_matches_transformers(act, quick):
    """Penultimate hidden states (context) + projected EOT pooled vector
    match CLIPTextModelWithProjection(output_hidden_states=True):
    hidden_states[-2] and text_embeds (diffusers _get_clip_prompt_embeds)."""
    vocab, L, width, layers, heads, proj = 99, 12, 16, 3, 2, 10
    model = _hf_text_model(width, layers, heads, proj, vocab, L, act=act)
    cfg = C.CLIPConfig(embed_dim=proj, text_width=width, text_heads=heads,
                       text_layers=layers, context_length=L,
                       vocab_size=vocab, gelu_exact=True, quick_gelu=quick)
    params = C.convert_clip_text_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = _ids_with_eot(rng, 3, L, vocab)
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    penult_t = out.hidden_states[-2].numpy()
    pooled_t = out.text_embeds.numpy()

    penult_j, pooled_j = C.encode_text_sd3(
        params, jnp.asarray(ids, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(penult_j), penult_t,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t,
                               rtol=2e-4, atol=2e-5)


def _tiny_t5():
    from transformers import T5Config as HFT5Config, T5EncoderModel
    cfg = T5.T5Config(vocab_size=64, dim=32, d_kv=8, heads=4, d_ff=64,
                      layers=2)
    hf = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.dim, d_kv=cfg.d_kv,
        num_heads=cfg.heads, d_ff=cfg.d_ff, num_layers=cfg.layers,
        relative_attention_num_buckets=cfg.rel_buckets,
        relative_attention_max_distance=cfg.rel_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        layer_norm_epsilon=cfg.eps, is_encoder_decoder=False,
        use_cache=False)
    torch.manual_seed(3)
    return T5EncoderModel(hf).eval(), cfg


class _WordTok:
    """Minimal T5-tokenizer stand-in: whitespace words -> fixed ids."""
    def __init__(self, vocab):
        self.vocab = vocab

    def encode(self, text):
        return [2 + (hash(w) % (self.vocab - 3)) for w in text.split()]


def test_conditioning_assembly_matches_diffusers_recipe():
    """DiffusionImagination.encode_conditioning == the diffusers
    encode_prompt assembly (concat order, zero padding, sequence layout,
    per-tower pad ids) computed with torch on the same weights."""
    mcfg = M.MMDIT_TEST            # context_dim=32, pooled_dim=16
    lcfg, gcfg = C.SD3_CLIP_L_TEST, C.SD3_CLIP_G_TEST
    model_l = _hf_text_model(lcfg.text_width, lcfg.text_layers,
                             lcfg.text_heads, lcfg.embed_dim,
                             lcfg.vocab_size, lcfg.context_length,
                             act="quick_gelu", seed=1)
    model_g = _hf_text_model(gcfg.text_width, gcfg.text_layers,
                             gcfg.text_heads, gcfg.embed_dim,
                             gcfg.vocab_size, gcfg.context_length,
                             act="gelu", seed=2)
    lcfg = lcfg.__class__(**{**lcfg.__dict__, "gelu_exact": True})
    gcfg = gcfg.__class__(**{**gcfg.__dict__, "gelu_exact": True})
    t5_model, t5_cfg = _tiny_t5()

    vcfg = V.VAE_TEST.__class__(
        latent_channels=mcfg.in_channels, base_channels=16,
        channel_mults=(1, 2), blocks_per_stage=1, groups=4,
        scaling_factor=1.0, shift_factor=0.0)
    from bsc_nav_tpu.models.imagination import DiffusionImagination
    imag = DiffusionImagination(
        mmdit_params=M.init_params(mcfg, jax.random.PRNGKey(1)),
        mmdit_cfg=mcfg,
        vae_params=V.init_params(vcfg, jax.random.PRNGKey(2)),
        vae_cfg=vcfg,
        clip_l_params=C.convert_clip_text_hf(model_l.state_dict(), lcfg),
        clip_l_cfg=lcfg,
        clip_g_params=C.convert_clip_text_hf(model_g.state_dict(), gcfg),
        clip_g_cfg=gcfg,
        tokenizer=T.HashTokenizer(vocab_size=lcfg.vocab_size,
                                  context_length=lcfg.context_length),
        t5_params=T5.convert_t5(t5_model.state_dict(), t5_cfg),
        t5_cfg=t5_cfg,
        t5_tokenizer=_WordTok(t5_cfg.vocab_size),
        t5_seq_len=10,
        num_images=1, num_steps=1)

    ids, _ids_u, t5_ids, _t5u = imag.prep_inputs("a red leather sofa")
    ctx_j, pooled_j = imag.encode_conditioning(
        imag.text_params, imag.t5_params, ids, t5_ids)

    # torch oracle: diffusers StableDiffusion3Pipeline.encode_prompt
    ids_np = np.asarray(ids)
    with torch.no_grad():
        out_l = model_l(torch.from_numpy(ids_np[0].astype(np.int64)),
                        output_hidden_states=True)
        out_g = model_g(torch.from_numpy(ids_np[1].astype(np.int64)),
                        output_hidden_states=True)
        t5_out = t5_model(torch.from_numpy(
            np.asarray(t5_ids).astype(np.int64))).last_hidden_state
    clip_embeds = torch.cat([out_l.hidden_states[-2],
                             out_g.hidden_states[-2]], dim=-1)
    clip_embeds = torch.nn.functional.pad(
        clip_embeds, (0, t5_out.shape[-1] - clip_embeds.shape[-1]))
    ctx_t = torch.cat([clip_embeds, t5_out], dim=-2).numpy()
    pooled_t = torch.cat([out_l.text_embeds, out_g.text_embeds],
                         dim=-1).numpy()

    assert ctx_j.shape == ctx_t.shape == (
        1, lcfg.context_length + 10, mcfg.context_dim)
    assert pooled_j.shape == pooled_t.shape == (1, mcfg.pooled_dim)
    np.testing.assert_allclose(np.asarray(ctx_j), ctx_t,
                               rtol=2e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t,
                               rtol=2e-4, atol=3e-5)

    # the per-tower pad ids differ (L pads with eot, G with 0) — the
    # tokenization must reflect that or real-weight parity silently breaks
    eot = imag.tokenizer.eot
    row_l, row_g = ids_np[0, 0], ids_np[1, 0]
    assert row_l[-1] == eot and row_g[-1] == 0


def test_convert_clip_text_full_size_schema():
    """Key-coverage + shape audit at REAL SD3.5 text-encoder dimensions
    (CLIP-L: 768x12L/12H proj 768; CLIP-G: 1280x32L/20H proj 1280,
    ffn 5120): a meta-device transformers model supplies the exact
    diffusers-subfolder key schema; zero-stride fabricated tensors keep
    it cheap (same method as the MMDiT/YOLO audits)."""
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    for cfg, heads in ((C.SD3_CLIP_L, 12), (C.SD3_CLIP_G, 20)):
        hf_cfg = CLIPTextConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.text_width,
            intermediate_size=4 * cfg.text_width,
            num_hidden_layers=cfg.text_layers, num_attention_heads=heads,
            max_position_embeddings=cfg.context_length,
            projection_dim=cfg.embed_dim)
        with torch.device("meta"):
            model = CLIPTextModelWithProjection(hf_cfg)
        sd = {k: np.broadcast_to(np.float16(0), tuple(v.shape))
              for k, v in model.state_dict().items()}
        params = C.convert_clip_text_hf(sd, cfg, dtype=jnp.bfloat16)

        expected = jax.eval_shape(
            lambda k, c=cfg: C.init_text_params(c, k), jax.random.PRNGKey(0))
        got_shapes = jax.tree.map(lambda a: tuple(a.shape), params)
        want_shapes = jax.tree.map(lambda a: tuple(a.shape), expected)
        assert got_shapes == want_shapes
        n_params = sum(int(np.prod(l.shape))
                       for l in jax.tree.leaves(params))
        # CLIP-L text ~123M, CLIP-G text ~695M
        assert n_params > (6e8 if cfg is C.SD3_CLIP_G else 1.2e8)

    # the real tower pair satisfies the SD3.5-medium conditioning dims
    mcfg = M.SD35_MEDIUM
    assert C.SD3_CLIP_L.embed_dim + C.SD3_CLIP_G.embed_dim == mcfg.pooled_dim
    assert (C.SD3_CLIP_L.text_width + C.SD3_CLIP_G.text_width
            <= mcfg.context_dim)
