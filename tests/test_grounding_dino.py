"""Grounding DINO forward parity vs the transformers reference.

Random-init tiny configs (same discipline as tests/test_t5.py): build
the HF model, convert its state dict with models/grounding_dino
.convert_hf, and assert forward parity — backbone first (Swin windows /
shifts / merging are the subtlest part), then the full detector
(text-masked BERT, fusion encoder, deformable attention, two-stage
query selection, iterative box refinement, contrastive head).

Reference role: gdino.py:44-68 (demo) and memory_2.py:947-991
(alternative long-term-memory detector path).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from bsc_nav_tpu.models import grounding_dino as G


TINY_SWIN = G.SwinConfig(embed_dim=16, depths=(2, 1, 1, 1),
                         num_heads=(2, 2, 4, 4), window_size=4,
                         patch_size=4, out_stages=(1, 2, 3))
TINY_TEXT = G.BertTextConfig(vocab_size=2000, dim=32, layers=2, heads=2,
                             ffn=64, max_pos=64, type_vocab=2)
TINY = G.GroundingDinoConfig(
    d_model=64, encoder_layers=2, decoder_layers=2, heads=4, ffn_dim=128,
    num_levels=4, enc_points=2, dec_points=2, num_queries=12,
    max_text_len=32, swin=TINY_SWIN, text=TINY_TEXT)


def _hf_tiny():
    from transformers import (BertConfig, GroundingDinoConfig,
                              GroundingDinoForObjectDetection, SwinConfig)

    swin = SwinConfig(
        embed_dim=16, depths=[2, 1, 1, 1], num_heads=[2, 2, 4, 4],
        window_size=4, patch_size=4, image_size=64,
        out_features=["stage2", "stage3", "stage4"])
    bert = BertConfig(
        vocab_size=2000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    cfg = GroundingDinoConfig(
        backbone_config=swin.to_dict(), text_config=bert.to_dict(),
        d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_feature_levels=4,
        encoder_n_points=2, decoder_n_points=2, num_queries=12,
        max_text_len=32)
    torch.manual_seed(0)
    return GroundingDinoForObjectDetection(cfg).eval()


def _text_inputs():
    # "[CLS] w w . w . [SEP]" — two class phrases, no padding
    ids = np.array([[101, 7, 8, 1012, 9, 1012, 102]], np.int64)
    return ids


def test_swin_backbone_parity():
    """Backbone alone: exercises plain + shifted windows (stage 0 has
    depth 2 -> one shifted layer at 16x16 > window 4), patch merging,
    padding at sub-window stages (2x2 features padded to 4x4), and the
    per-stage output LayerNorms."""
    model = _hf_tiny()
    params = G.convert_hf(model.state_dict(), TINY)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    hf_backbone = model.model.backbone.conv_encoder
    with torch.no_grad():
        hf_feats = [f for f, _ in hf_backbone(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.ones((2, 64, 64), dtype=torch.long))]

    ours = G.swin_backbone(params["backbone"], jnp.asarray(img),
                           TINY.swin)
    assert len(ours) == len(hf_feats) == 3
    for (f, _), hf in zip(ours, hf_feats):
        np.testing.assert_allclose(
            np.asarray(f), hf.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=3e-5)


def test_text_masks_match_hf():
    from transformers.models.grounding_dino.modeling_grounding_dino \
        import generate_masks_with_special_tokens_and_transfer_map

    ids = _text_inputs()
    attn, pos = G.generate_text_masks(ids)
    hf_attn, hf_pos = generate_masks_with_special_tokens_and_transfer_map(
        torch.from_numpy(ids))
    np.testing.assert_array_equal(attn, hf_attn.numpy())
    np.testing.assert_array_equal(pos, hf_pos.numpy())


def test_grounding_dino_full_forward_parity():
    model = _hf_tiny()
    params = G.convert_hf(model.state_dict(), TINY)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ids = _text_inputs()

    with torch.no_grad():
        hf_out = model(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            input_ids=torch.from_numpy(ids))
    hf_logits = hf_out.logits.numpy()
    hf_boxes = hf_out.pred_boxes.numpy()

    attn3d, pos_ids = G.generate_text_masks(ids)
    out = G.forward(
        params, jnp.asarray(img), jnp.asarray(ids.astype(np.int32)),
        jnp.zeros_like(jnp.asarray(ids.astype(np.int32))),
        jnp.asarray(attn3d), jnp.asarray(pos_ids.astype(np.int32)),
        jnp.ones((1, ids.shape[1]), bool), TINY)
    logits = np.asarray(out["logits"])
    boxes = np.asarray(out["pred_boxes"])

    assert logits.shape == hf_logits.shape
    # padding region is -inf on both sides
    S = ids.shape[1]
    assert np.all(np.isneginf(logits[..., S:]))
    assert np.all(np.isneginf(hf_logits[..., S:]))
    np.testing.assert_allclose(logits[..., :S], hf_logits[..., :S],
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(boxes, hf_boxes, rtol=1e-3, atol=2e-4)


def test_phrase_label_map_and_scores():
    ids = _text_inputs()[0]
    lm = G.phrase_label_map(ids)
    # two phrases: tokens (7, 8) and token (9,)
    assert lm.shape[0] == 2
    np.testing.assert_array_equal(lm[0], [0, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(lm[1], [0, 0, 0, 0, 1, 0, 0])

    logits = np.full((3, 32), -1e30, np.float32)
    logits[0, 1] = logits[0, 2] = 10.0     # query 0 matches phrase 0
    logits[1, 4] = 10.0                    # query 1 matches phrase 1
    s = G.scores_per_phrase(logits, lm)
    assert s[0, 0] > 0.99 and s[0, 1] < 0.01
    assert s[1, 1] > 0.99 and s[1, 0] < 0.01
