"""W8A8 int8 quantized serving (ops/quant.py) -- the TPU-native
equivalent of the reference's NF4-quantized SD3.5 (memory_2.py:542-560).

Semantics bar: quantized linears must track the f32 linears within the
error budget symmetric-int8 math implies, and the quantized MMDiT must
stay close to the bf16 model through a full forward and a short sample.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsc_nav_tpu.models import mmdit as M
from bsc_nav_tpu.models.vit import _linear
from bsc_nav_tpu.ops import quant as Q


def test_weight_quantization_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (96, 160)) * 0.3
    p = {"w": w, "b": jnp.zeros((160,))}
    q = Q.quantize_weight(p)
    assert q["w_q"].dtype == jnp.int8
    recon = q["w_q"].astype(jnp.float32) * q["w_s"]
    # symmetric rounding: |err| <= scale/2 = col_max/254 elementwise
    col_max = jnp.max(jnp.abs(w), axis=0)
    assert float(jnp.max(jnp.abs(recon - w) / col_max)) <= 0.5 / 127 + 1e-6


def test_linear_q8_matches_f32_linear():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (4, 33, 256))
    p = {"w": jax.random.normal(k2, (256, 512)) / 16.0,
         "b": jax.random.normal(k3, (512,)) * 0.1}
    y_ref = _linear(x, p)
    y_q = Q.linear_q8(x, Q.quantize_weight(p))
    # int8 x int8 with per-row/per-col scales: relative L2 error is
    # O(1/127) per operand; budget 2% over the 256-length reduction
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel


def test_linear_dispatch_plain_params_unchanged():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    p = {"w": jax.random.normal(jax.random.PRNGKey(3), (32, 16))}
    np.testing.assert_array_equal(np.asarray(Q.linear(x, p)),
                                  np.asarray(_linear(x, p)))


def _randomized(cfg, key):
    """init_params with the adaLN/final zero-inits replaced by noise so
    blocks actually contribute to the output."""
    params = M.init_params(cfg, key)
    ks = iter(jax.random.split(jax.random.PRNGKey(7), 200))

    def noisy(lin):
        return {"w": jax.random.normal(next(ks), lin["w"].shape) * 0.02,
                "b": jax.random.normal(next(ks), lin["b"].shape) * 0.02}

    for blk in params["blocks"]:
        for name in ("x", "ctx"):
            blk[name]["mod"] = noisy(blk[name]["mod"])
    params["final_mod"] = noisy(params["final_mod"])
    params["final_out"] = noisy(params["final_out"])
    return params


@pytest.mark.parametrize("cfg", [M.MMDIT_TEST, M.MMDIT_TEST_DUAL],
                         ids=["plain", "dual"])
def test_mmdit_quantized_forward_close(cfg):
    params = _randomized(cfg, jax.random.PRNGKey(0))
    qparams = M.quantize_params(params)
    # structure: token matmuls quantized, mods/embeds untouched
    blk0 = qparams["blocks"][0]["x"]
    assert "w_q" in blk0["qkv"] and "w" not in blk0["qkv"]
    assert "w" in blk0["mod"]
    if cfg.dual_attention_layers:
        assert "w_q" in blk0["qkv2"] and "w_q" in blk0["proj2"]
    assert "w" in qparams["final_out"]

    B, S = 2, 5
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.input_size, cfg.input_size,
                             cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, S, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.pooled_dim))
    t = jnp.full((B,), 0.5)
    y = M.forward(params, lat, t, ctx, pooled, cfg)
    yq = M.forward(qparams, lat, t, ctx, pooled, cfg)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.05, rel


def test_mmdit_quantized_sampler_close():
    cfg = M.MMDIT_TEST
    params = _randomized(cfg, jax.random.PRNGKey(0))
    qparams = M.quantize_params(params)
    B, S = 1, 4
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, S, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.pooled_dim))
    key = jax.random.PRNGKey(9)
    lat = M.sample(params, key, ctx, pooled, cfg, num_steps=4,
                   context_uncond=ctx * 0, pooled_uncond=pooled * 0)
    latq = M.sample(qparams, key, ctx, pooled, cfg, num_steps=4,
                    context_uncond=ctx * 0, pooled_uncond=pooled * 0)
    rel = float(jnp.linalg.norm(latq - lat) / jnp.linalg.norm(lat))
    assert rel < 0.10, rel


def test_imagination_quantize_flag():
    """DiffusionImagination(quantize=True) serves int8 token matmuls
    end-to-end (bench.py / the agent's text-query path use this)."""
    from bsc_nav_tpu.models import clip as CL
    from bsc_nav_tpu.models import tokenizer as T
    from bsc_nav_tpu.models import vae as V
    from bsc_nav_tpu.models.imagination import DiffusionImagination
    cfg = M.MMDIT_TEST
    lcfg, gcfg = CL.SD3_CLIP_L_TEST, CL.SD3_CLIP_G_TEST
    vcfg = V.VAE_TEST.__class__(
        latent_channels=cfg.in_channels, base_channels=16,
        channel_mults=(1, 2), blocks_per_stage=1, groups=4,
        scaling_factor=1.0, shift_factor=0.0)
    imag = DiffusionImagination(
        mmdit_params=M.init_params(cfg, jax.random.PRNGKey(1)),
        mmdit_cfg=cfg,
        vae_params=V.init_params(vcfg, jax.random.PRNGKey(2)),
        vae_cfg=vcfg,
        clip_l_params=CL.init_text_params(lcfg, jax.random.PRNGKey(0)),
        clip_l_cfg=lcfg,
        clip_g_params=CL.init_text_params(gcfg, jax.random.PRNGKey(3)),
        clip_g_cfg=gcfg,
        tokenizer=T.HashTokenizer(vocab_size=lcfg.vocab_size,
                                  context_length=lcfg.context_length),
        num_images=1, num_steps=2, quantize=True)
    assert "w_q" in imag.mmdit_params["blocks"][0]["x"]["qkv"]
    out = imag("a red chair")
    assert out.shape == (1, cfg.input_size * 2, cfg.input_size * 2, 3)
    assert out.dtype == np.uint8


def test_conv_q8_matches_f32_conv():
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(k1, (2, 16, 16, 24))
    p = {"w": jax.random.normal(k2, (3, 3, 24, 32)) / 15.0,
         "bn_var": jnp.ones((32,))}
    y_ref = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    q = Q.quantize_conv_weight(p)
    assert q["w_q"].dtype == jnp.int8 and "bn_var" in q
    y_q = Q.conv_q8(x, q, stride=1)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel


def test_yolo_quantized_detector_close():
    """Quantized YOLO-World backbone/neck tracks the f32 model through
    the full forward: raw head outputs stay close and the decoded
    top-confidence ordering is stable at the test scale."""
    from bsc_nav_tpu.models import yolo_world as Y
    cfg = Y.YOLO_TEST
    params = Y.init_params(cfg, jax.random.PRNGKey(0), text_dim=32)
    qparams = Y.quantize_params(params, scope="all")
    # structure: conv+BN leaves quantized, head finals + contrastive bf16
    assert "w_q" in qparams["stem0"] and "w" not in qparams["stem0"]
    assert "w" in qparams["head"][0]["box2"]
    assert "w_q" in qparams["n12"]["attn"]["proj"]
    # default scope keeps the backbone bf16 (measured faster end to end)
    qneck = Y.quantize_params(params)
    assert "w" in qneck["stem0"] and "w_q" not in qneck["stem0"]
    assert "w_q" in qneck["n12"]["attn"]["proj"]
    assert "w_q" in qneck["d16"]
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (2, cfg.img_size, cfg.img_size, 3))
    temb = jax.random.normal(jax.random.PRNGKey(2), (5, cfg.embed_dim))
    temb = temb / jnp.linalg.norm(temb, axis=-1, keepdims=True)
    outs = Y.forward(params, x, temb, cfg)
    outs_q = Y.forward(qparams, x, temb, cfg)
    for (b, c), (bq, cq) in zip(outs, outs_q):
        relb = float(jnp.linalg.norm(bq - b) / jnp.linalg.norm(b))
        assert relb < 0.06, relb
    boxes, conf, cls = Y.decode_topk_device(outs, cfg, k=16)
    boxes_q, conf_q, cls_q = Y.decode_topk_device(outs_q, cfg, k=16)
    # top detections agree in class and confidence within the int8 budget
    assert float(jnp.max(jnp.abs(conf_q - conf))) < 0.05
    assert int(cls[0, 0]) == int(cls_q[0, 0])


def test_quantize_composes_with_fuse_mods():
    cfg = M.MMDIT_TEST
    params = _randomized(cfg, jax.random.PRNGKey(0))
    fused, layout = M.fuse_mods(M.quantize_params(params), cfg)
    B, S = 2, 5
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.input_size, cfg.input_size,
                             cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, S, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.pooled_dim))
    t = jnp.full((B,), 0.5)
    y = M.forward(M.quantize_params(params), lat, t, ctx, pooled, cfg)
    yf = M.forward(fused, lat, t, ctx, pooled, cfg, mod_layout=layout)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y),
                               rtol=0, atol=1e-4)


def test_qwen_quantized_forward_close():
    """int8 W8A8 on the local-judge decoder (qwen_vl.quantize_params):
    full-sequence logits stay close and text structure is right (decode
    matvecs are weight-bandwidth-bound, see the module docstring)."""
    from bsc_nav_tpu.models import qwen_vl as Q8

    cfg = Q8.QWEN_VL_TEST
    params = Q8.init_params(cfg, None)
    qp = Q8.quantize_params(params)
    l0 = qp["layers"][0]
    assert "w_q" in l0["q_w"] and "w_q" in l0["mlp"]["down_w"]
    assert "w_q" in qp["lm_head"]
    assert not isinstance(qp["embed"], dict)        # gather stays full
    assert not isinstance(qp["vision"]["blocks"][0]["qkv_w"], dict)
    qall = Q8.quantize_params(params, scope="all")
    assert "w_q" in qall["vision"]["blocks"][0]["qkv_w"]
    assert "w_q" in qall["vision"]["merger"]["fc2_w"]

    B, S = 1, 12
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 1,
                             cfg.text.vocab)
    emb = Q8.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
    y = Q8.text_forward(params, emb, pos, cfg.text)
    yq = Q8.text_forward(qp, emb, pos, cfg.text)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.05, rel


def test_qwen_quantized_generation_runs():
    """The one-dispatch greedy generator runs end-to-end on quantized
    params through the LocalVLMClient quantize flag (the `--llm local`
    serving path)."""
    from bsc_nav_tpu.agents.local_vlm import ByteTokenizer, LocalVLMClient
    from bsc_nav_tpu.models import qwen_vl as Q8

    cfg = Q8.QWEN_VL_TEST
    client = LocalVLMClient(
        Q8.init_params(cfg, None), cfg, ByteTokenizer(),
        image_size=2 * cfg.vision.patch * cfg.vision.merge,
        max_new_tokens=4, prompt_buckets=(64,), quantize=True)
    assert "w_q" in client.params["layers"][0]["q_w"]
    out = client.chat("local", [{"role": "user", "content": "hi"}])
    assert isinstance(out, str)


def test_vit_quantized_features_close():
    """int8 W8A8 encoder serving (vit.quantize_params): the frozen
    DINOv2 features feed the cosine token store, so the bar is
    per-token cosine similarity to the bf16 model, not raw L2."""
    from bsc_nav_tpu.models import vit as VT

    cfg = VT.ViTConfig(img_size=56, patch_size=14, dim=128, depth=4,
                       heads=4, num_registers=4)
    params = VT.init_params(cfg, jax.random.PRNGKey(0))
    qparams = VT.quantize_params(params)
    blk0 = qparams["blocks"][0]
    assert "w_q" in blk0["qkv"] and "w" not in blk0["fc2"]
    assert "w" in qparams["patch_embed"]          # embeds stay full

    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 56, 56, 3))
    f = VT.forward_features(params, img, cfg)
    fq = VT.forward_features(qparams, img, cfg)
    for key in ("x_norm_patchtokens", "x_norm_clstoken"):
        a = np.asarray(f[key], np.float32).reshape(-1, cfg.dim)
        b = np.asarray(fq[key], np.float32).reshape(-1, cfg.dim)
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        assert float(cos.min()) > 0.995, (key, float(cos.min()))


def test_clip_quantized():
    """int8 W8A8 on the CLIP towers (clip.quantize_params): image/text
    features must stay near-parallel to the bf16 features (scores in
    matchers.CLIPMatcher are cosine softmaxes) and cross-modal ranking
    must be stable."""
    from bsc_nav_tpu.models import clip as CL

    cfg = CL.CLIP_VITB32_TEST
    params = CL.init_params(cfg, jax.random.PRNGKey(0))
    qparams = CL.quantize_params(params)
    # structure: block matmuls quantized in both towers, embeds/proj full
    vb0 = qparams["visual"]["blocks"][0]
    assert "w_q" in vb0["qkv"] and "w" not in vb0["fc2"]
    assert "w" in qparams["visual"]["patch_embed"]
    assert qparams["visual"]["proj"].ndim == 2      # raw matrix untouched
    assert "w_q" in qparams["text"]["blocks"][0]["fc1"]
    # towers="visual" leaves the text tower alone
    qv = CL.quantize_params(params, towers="visual")
    assert "w" in qv["text"]["blocks"][0]["qkv"]

    imgs = jax.random.uniform(jax.random.PRNGKey(1),
                              (6, cfg.image_size, cfg.image_size, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (6, cfg.context_length),
                             1, cfg.vocab_size)
    fi = np.asarray(CL.encode_image(params, imgs, cfg))
    fiq = np.asarray(CL.encode_image(qparams, imgs, cfg))
    ft = np.asarray(CL.encode_text(params, ids, cfg))
    ftq = np.asarray(CL.encode_text(qparams, ids, cfg))
    for a, b in ((fi, fiq), (ft, ftq)):
        cos = np.sum(a * b, -1)        # both are unit-normalized
        assert float(cos.min()) > 0.995, float(cos.min())
    # the cross-modal similarity matrix (what the check_around softmax
    # consumes) drifts less than the int8 budget.  (argmax rank is not a
    # meaningful bar on a random-init CLIP: cross-modal sims are
    # near-degenerate ~0, unlike the self-retrieval vit test below.)
    assert float(np.max(np.abs(fi @ ft.T - fiq @ ftq.T))) < 0.03


def test_clip_matcher_quantize_flag():
    from bsc_nav_tpu.agents.matchers import CLIPMatcher
    from bsc_nav_tpu.models import clip as CL
    from bsc_nav_tpu.models import tokenizer as T

    cfg = CL.CLIP_VITB32_TEST
    params = CL.init_params(cfg, jax.random.PRNGKey(0))
    tok = T.HashTokenizer(vocab_size=cfg.vocab_size,
                          context_length=cfg.context_length)
    m = CLIPMatcher(params, cfg, tok, quantize=True)
    assert "w_q" in m.params["visual"]["blocks"][0]["qkv"]
    views = [np.random.default_rng(i).integers(
        0, 255, (64, 64, 3), dtype=np.uint8) for i in range(3)]
    s = m.score(views, "a red chair")
    assert s.shape == (3,) and abs(float(s.sum()) - 1.0) < 1e-5
    assert m.best("chair", ["table", "chair", "sofa"]) in range(3)


def test_vit_quantized_retrieval_rank_stable():
    """Cosine retrieval against a store of bf16 PATCH tokens (what the
    voxel store holds) keeps the same argmax when queries come from the
    quantized encoder.  (cls tokens of a random-init ViT collapse to
    one direction, so patch tokens are the discriminative test bed.)"""
    from bsc_nav_tpu.models import vit as VT

    cfg = VT.ViTConfig(img_size=56, patch_size=14, dim=128, depth=4,
                       heads=4, num_registers=4)
    params = VT.init_params(cfg, jax.random.PRNGKey(0))
    qparams = VT.quantize_params(params)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (8, 56, 56, 3))
    ref = np.asarray(VT.forward_features(params, imgs, cfg)
                     ["x_norm_patchtokens"], np.float32).reshape(-1, cfg.dim)
    qry = np.asarray(VT.forward_features(qparams, imgs, cfg)
                     ["x_norm_patchtokens"], np.float32).reshape(-1, cfg.dim)
    refn = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    qryn = qry / np.linalg.norm(qry, axis=-1, keepdims=True)
    sims = qryn @ refn.T                      # [128 queries, 128 store]
    n = ref.shape[0]
    assert (np.argmax(sims, axis=-1) == np.arange(n)).all()
    # self-similarity ~1 with clear margin over the best distractor
    off = sims - 2.0 * np.eye(n)
    assert float(np.diag(sims).min()) > 0.999
    assert float(off.max()) < 0.99
