"""Qwen2.5-VL local judge: forward + generation parity vs the
transformers reference implementation (tiny random config) — the same
discipline as tests/test_t5.py.  Reference role: the optional local
Qwen2.5-VL success judge (objnav_benchmark.py:165-171)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from bsc_nav_tpu.models import qwen_vl as Q


CFG = Q.QWEN_VL_TEST
GRID = (1, 4, 8)            # t, h, w patches -> 8 merged LLM tokens


def _hf_model():
    from transformers import (Qwen2_5_VLForConditionalGeneration,
                              Qwen2_5_VLConfig)
    v, t = CFG.vision, CFG.text
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            hidden_size=t.hidden, num_hidden_layers=t.layers,
            num_attention_heads=t.heads, num_key_value_heads=t.kv_heads,
            intermediate_size=t.intermediate, vocab_size=t.vocab,
            rope_theta=t.rope_theta, max_position_embeddings=512,
            rope_scaling={"type": "mrope",
                          "mrope_section": list(t.mrope_section)},
            hidden_act="silu", tie_word_embeddings=CFG.tie_word_embeddings),
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden, num_heads=v.heads,
            patch_size=v.patch, spatial_merge_size=v.merge,
            temporal_patch_size=v.temporal_patch,
            out_hidden_size=v.out_hidden, intermediate_size=v.intermediate,
            window_size=v.window, fullatt_block_indexes=list(v.fullatt),
            in_channels=v.in_ch, hidden_act="silu"),
        image_token_id=CFG.image_token_id, video_token_id=121,
        vision_start_token_id=CFG.vision_start_token_id,
        vision_end_token_id=123)
    torch.manual_seed(0)
    m = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


@pytest.fixture(scope="module")
def pair():
    m = _hf_model()
    params = Q.convert_hf(m.state_dict(), CFG)
    return m, params


def _pixels(seed=0):
    v = CFG.vision
    t, h, w = GRID
    rng = np.random.default_rng(seed)
    return rng.normal(size=(
        t * h * w, v.in_ch * v.temporal_patch * v.patch * v.patch)
    ).astype(np.float32)


def test_vision_tower_parity(pair):
    m, params = pair
    px = _pixels()
    with torch.no_grad():
        ref = m.model.visual(torch.from_numpy(px),
                             grid_thw=torch.tensor([list(GRID)])).numpy()
    out = np.asarray(Q.vision_forward(params["vision"], jnp.asarray(px),
                                      [GRID], CFG.vision))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def _mm_inputs(seed=2):
    """input_ids with a vision_start + 8 image pads + text tail."""
    t, h, w = GRID
    n_img = t * (h // CFG.vision.merge) * (w // CFG.vision.merge)
    rng = np.random.default_rng(seed)
    text_a = rng.integers(1, 100, size=3)
    text_b = rng.integers(1, 100, size=5)
    ids = np.concatenate([
        text_a, [CFG.vision_start_token_id],
        np.full(n_img, CFG.image_token_id), [123], text_b]).astype(np.int64)
    return ids[None]


def test_multimodal_forward_parity(pair):
    m, params = pair
    ids = _mm_inputs()
    px = _pixels(1)
    grid = torch.tensor([list(GRID)])
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(px),
                image_grid_thw=grid).logits.numpy()
        pos_ids, _ = m.model.get_rope_index(torch.from_numpy(ids),
                                            image_grid_thw=grid)

    vis = Q.vision_forward(params["vision"], jnp.asarray(px), [GRID],
                           CFG.vision)
    emb = Q.merge_vision_embeds(params, jnp.asarray(ids), vis,
                                CFG.image_token_id)
    out = np.asarray(Q.text_forward(params, emb,
                                    jnp.asarray(pos_ids.numpy()),
                                    CFG.text))
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


def test_greedy_generation_parity(pair):
    m, params = pair
    ids = _mm_inputs(seed=4)
    px = _pixels(2)
    grid = torch.tensor([list(GRID)])
    eos = 127
    with torch.no_grad():
        ref = m.generate(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(px), image_grid_thw=grid,
            max_new_tokens=6, do_sample=False, eos_token_id=eos,
            pad_token_id=0)
        ref_new = ref[0, ids.shape[1]:].numpy()
        pos_ids, deltas = m.model.get_rope_index(torch.from_numpy(ids),
                                                 image_grid_thw=grid)

    S = ids.shape[1]
    max_len = S + 2                         # exercise prompt padding
    vis = Q.vision_forward(params["vision"], jnp.asarray(px), [GRID],
                           CFG.vision)
    emb = Q.merge_vision_embeds(params, jnp.asarray(ids), vis,
                                CFG.image_token_id)
    emb_p = jnp.pad(emb, ((0, 0), (0, max_len - S), (0, 0)))
    pos_p = jnp.pad(jnp.asarray(pos_ids.numpy()),
                    ((0, 0), (0, 0), (0, max_len - S)))
    gen = Q.make_greedy_generator(CFG.text, max_len=max_len, max_new=6,
                                  eos_id=eos)
    start = int(pos_ids.max()) + 1
    tokens, n = gen(params, emb_p, jnp.asarray(S, jnp.int32), pos_p,
                    jnp.asarray(start, jnp.int32))
    tokens = np.asarray(tokens)[:int(n)]
    np.testing.assert_array_equal(tokens, ref_new[:len(tokens)])
    # HF stops at eos too; lengths must agree
    assert len(tokens) == len(ref_new) or (
        len(ref_new) == len(tokens) + 0)


def test_text_only_forward_parity(pair):
    """No image: 3D positions collapse to standard 1D RoPE."""
    m, params = pair
    rng = np.random.default_rng(7)
    ids = rng.integers(1, 100, size=(1, 9)).astype(np.int64)
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(ids)).logits.numpy()
    S = ids.shape[1]
    pos = jnp.broadcast_to(jnp.arange(S), (3, 1, S))
    emb = Q.embed_tokens(params, jnp.asarray(ids))
    out = np.asarray(Q.text_forward(params, emb, pos, CFG.text))
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


def test_mm_position_ids_match_hf(pair):
    """Client-side 3D position ids == HF get_rope_index."""
    from bsc_nav_tpu.agents.local_vlm import mm_position_ids
    m, _ = pair
    ids = _mm_inputs(seed=9)
    grid = torch.tensor([list(GRID)])
    with torch.no_grad():
        ref, _ = m.model.get_rope_index(torch.from_numpy(ids),
                                        image_grid_thw=grid)
    mine = mm_position_ids(ids[0], CFG.image_token_id, [GRID],
                           CFG.vision.merge)
    np.testing.assert_array_equal(mine, ref.numpy())


def test_local_vlm_client_end_to_end():
    """ChatClient protocol over the tiny model: OpenAI-style messages
    with a data-URL image -> deterministic text out, one dispatch."""
    import base64
    import io
    from PIL import Image
    from bsc_nav_tpu.agents.local_vlm import ByteTokenizer, LocalVLMClient
    import dataclasses

    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        text=dataclasses.replace(CFG.text, vocab=300),
        image_token_id=tok.image_pad_id,
        vision_start_token_id=tok.special_ids["<|vision_start|>"])
    params = Q.init_params(cfg, None)
    # image_size must give the model's grid: patch 2, merge 2 -> 8px
    client = LocalVLMClient(params, cfg, tok, image_size=8,
                            max_new_tokens=8, prompt_buckets=(128, 256))

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (16, 16, 3),
                                          dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    url = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()
    messages = [
        {"role": "system", "content": "You judge navigation success."},
        {"role": "user", "content": [
            {"type": "text", "text": "Is the chair visible?"},
            {"type": "image_url", "image_url": {"url": url}},
        ]},
    ]
    out1 = client.chat("local", messages)
    out2 = client.chat("local", messages)
    assert isinstance(out1, str)
    assert out1 == out2                      # greedy => deterministic
    assert len(client.calls) == 2
