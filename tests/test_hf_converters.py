"""Converter parity vs HuggingFace transformers reference models.

The real checkpoints (facebook/dinov2-with-registers-large,
facebook/metaclip-h14-fullcc2.5b) cannot be downloaded in this
environment, but transformers ships the exact reference ARCHITECTURES
and state-dict layouts those checkpoints use.  These tests random-init
tiny transformers models, run our converters on their state dicts, and
assert forward parity — proving the converters are layout- and
semantics-correct end to end (the same discipline as tests/test_t5.py
and tests/test_qwen_vl.py).

Reference roles: DINOv2 patch encoder (reference memory_2.py:43),
MetaCLIP query towers (reference objnav_benchmark.py:309-311).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from bsc_nav_tpu.models import clip as CLIP
from bsc_nav_tpu.models import vit as VIT
from bsc_nav_tpu.models.weights import convert_dinov2_hf


def test_dinov2_hf_converter_forward_parity():
    from transformers import (Dinov2WithRegistersConfig,
                              Dinov2WithRegistersModel)

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=28, patch_size=14,
        num_register_tokens=3)
    torch.manual_seed(0)
    model = Dinov2WithRegistersModel(hf_cfg).eval()

    cfg = VIT.ViTConfig(img_size=28, patch_size=14, dim=64, depth=2,
                        heads=2, num_registers=3, layerscale=True,
                        ffn="mlp", gelu_exact=True)
    params = convert_dinov2_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    out = VIT.forward_features(params, jnp.asarray(img), cfg)
    ours = np.concatenate(
        [np.asarray(out["x_norm_clstoken"])[:, None],
         np.asarray(out["x_norm_regtokens"]),
         np.asarray(out["x_norm_patchtokens"])], axis=1)

    # HF applies the final layernorm identically; compare the full
    # token sequence (cls | registers | patches)
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-5)


def test_dinov2_hf_converter_swiglu_parity():
    """The giant variant (dinov2_vitg14_reg) uses a SwiGLU FFN."""
    from transformers import (Dinov2WithRegistersConfig,
                              Dinov2WithRegistersModel)

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=28, patch_size=14,
        num_register_tokens=4, use_swiglu_ffn=True)
    torch.manual_seed(2)
    model = Dinov2WithRegistersModel(hf_cfg).eval()

    cfg = VIT.ViTConfig(img_size=28, patch_size=14, dim=64, depth=2,
                        heads=2, num_registers=4, layerscale=True,
                        ffn="swiglu", mlp_ratio=2.0, gelu_exact=True)
    params = convert_dinov2_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    out = VIT.forward_features(params, jnp.asarray(img), cfg)
    ours = np.concatenate(
        [np.asarray(out["x_norm_clstoken"])[:, None],
         np.asarray(out["x_norm_regtokens"]),
         np.asarray(out["x_norm_patchtokens"])], axis=1)
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_clip_hf_converter_forward_parity(act):
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPVisionConfig)

    vc = CLIPVisionConfig(
        hidden_size=96, intermediate_size=384, num_hidden_layers=2,
        num_attention_heads=3, image_size=32, patch_size=8,
        hidden_act=act)
    # eos_token_id=2 selects the argmax-pooling branch in transformers
    # (the original CLIP/open_clip convention our encode_text follows)
    tc = CLIPTextConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16,
        vocab_size=512, hidden_act=act, eos_token_id=2)
    torch.manual_seed(4)
    model = CLIPModel(CLIPConfig(vision_config=vc.to_dict(),
                                 text_config=tc.to_dict(),
                                 projection_dim=64)).eval()

    cfg = CLIP.CLIPConfig(
        embed_dim=64, image_size=32, patch_size=8, vision_width=96,
        vision_layers=2, vision_heads=3, context_length=16,
        vocab_size=512, text_width=64, text_heads=4, text_layers=2,
        gelu_exact=True, quick_gelu=(act == "quick_gelu"))
    params = CLIP.convert_clip_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(5)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    # ids in [3, 511]: argmax pooling position is unambiguous and
    # identical under both implementations
    toks = rng.integers(3, 512, size=(2, 16)).astype(np.int32)

    with torch.no_grad():
        hf_img = model.get_image_features(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).numpy()
        hf_txt = model.get_text_features(
            input_ids=torch.from_numpy(toks.astype(np.int64))).numpy()

    ours_img = np.asarray(CLIP.encode_image(
        params, jnp.asarray(img), cfg, normalize=False))
    ours_txt = np.asarray(CLIP.encode_text(
        params, jnp.asarray(toks), cfg, normalize=False))

    np.testing.assert_allclose(ours_img, hf_img, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ours_txt, hf_txt, rtol=2e-4, atol=2e-5)
