"""Tests for the MMDiT diffusion transformer, VAE decoder, and the
imagination pipeline (tiny configs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bsc_nav_tpu.models import mmdit as M
from bsc_nav_tpu.models import vae as V
from bsc_nav_tpu.models import clip as CL
from bsc_nav_tpu.models import tokenizer as T
from bsc_nav_tpu.models.imagination import DiffusionImagination


CFG = M.MMDIT_TEST


def test_forward_shapes_and_determinism():
    params = M.init_params(CFG, jax.random.PRNGKey(0))
    B, S = 2, 6
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (B, CFG.input_size, CFG.input_size,
                             CFG.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, S, CFG.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.pooled_dim))
    t = jnp.array([0.5, 0.9])
    v1 = M.forward(params, lat, t, ctx, pooled, CFG)
    v2 = M.forward(params, lat, t, ctx, pooled, CFG)
    assert v1.shape == lat.shape
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert np.isfinite(np.asarray(v1)).all()


def test_adaln_zero_init_gives_zero_velocity():
    """adaLN-Zero: with zero-initialized modulation/output layers the
    velocity must be exactly zero at init (DiT training stability
    property; also catches wiring bugs)."""
    params = M.init_params(CFG, jax.random.PRNGKey(0))
    lat = jnp.ones((1, CFG.input_size, CFG.input_size, CFG.in_channels))
    ctx = jnp.ones((1, 4, CFG.context_dim))
    pooled = jnp.ones((1, CFG.pooled_dim))
    v = M.forward(params, lat, jnp.array([0.5]), ctx, pooled, CFG)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


def test_patchify_roundtrip():
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    tok = M.patchify_latent(lat, 2)
    assert tok.shape == (2, 16, 16)
    back = M.unpatchify_latent(tok, 2, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))


def test_context_length_independence():
    """Joint attention must accept any text length (SD3 pads to 77+T5)."""
    params = M.init_params(CFG, jax.random.PRNGKey(0))
    lat = jnp.zeros((1, CFG.input_size, CFG.input_size, CFG.in_channels))
    pooled = jnp.zeros((1, CFG.pooled_dim))
    for S in (3, 16):
        v = M.forward(params, lat, jnp.array([0.1]),
                      jnp.zeros((1, S, CFG.context_dim)), pooled, CFG)
        assert v.shape == lat.shape


def test_sigma_schedule():
    s = np.asarray(M.shifted_sigmas(28, shift=3.0))
    assert s[0] == 1.0                      # starts at pure noise
    assert (np.diff(s) < 0).all()           # strictly decreasing
    assert s[-1] > 0


def _randomize_mods(params, key):
    """init_params zero-inits adaLN weights (adaLN-Zero); fill them with
    noise so a fused-vs-unfused comparison is non-trivial."""
    ks = iter(jax.random.split(key, 4 * len(params["blocks"]) + 2))

    def noisy(lin):
        return {"w": jax.random.normal(next(ks), lin["w"].shape,
                                       lin["w"].dtype) * 0.2,
                "b": jax.random.normal(next(ks), lin["b"].shape,
                                       lin["b"].dtype) * 0.2}

    for blk in params["blocks"]:
        for name in ("x", "ctx"):
            blk[name]["mod"] = noisy(blk[name]["mod"])
    params["final_mod"] = noisy(params["final_mod"])
    return params


@pytest.mark.parametrize("cfg", [M.MMDIT_TEST, M.MMDIT_TEST_DUAL])
def test_fuse_mods_parity(cfg):
    """forward with the single fused modulation matmul (fuse_mods) must
    match the per-block path, including a converted-style 2-chunk
    AdaLayerNormContinuous ctx stream on the last block."""
    params = _randomize_mods(M.init_params(cfg, jax.random.PRNGKey(0)),
                             jax.random.PRNGKey(42))
    d = cfg.dim
    last = params["blocks"][-1]["ctx"]
    last["mod"] = {"w": last["mod"]["w"][:, :2 * d],
                   "b": last["mod"]["b"][:2 * d]}
    B, S = 2, 6
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.input_size, cfg.input_size,
                             cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, S, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.pooled_dim))
    t = jnp.array([0.5, 0.9])
    ref = M.forward(params, lat, t, ctx, pooled, cfg)
    fused, layout = M.fuse_mods(params, cfg)
    assert "mod" not in fused["blocks"][0]["x"]
    assert "final_mod" not in fused
    assert layout[-1] == ((9 if (cfg.depth - 1) in
                           cfg.dual_attention_layers else 6), 2)
    got = M.forward(fused, lat, t, ctx, pooled, cfg, mod_layout=layout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    samp = M.sample(fused, jax.random.PRNGKey(4), ctx[:1], pooled[:1],
                    cfg, num_steps=2, guidance_scale=2.0,
                    context_uncond=ctx[:1], pooled_uncond=pooled[:1],
                    mod_layout=layout)
    sref = M.sample(params, jax.random.PRNGKey(4), ctx[:1], pooled[:1],
                    cfg, num_steps=2, guidance_scale=2.0,
                    context_uncond=ctx[:1], pooled_uncond=pooled[:1])
    np.testing.assert_allclose(np.asarray(samp), np.asarray(sref),
                               rtol=2e-5, atol=2e-5)


def test_sampler_runs():
    params = M.init_params(CFG, jax.random.PRNGKey(0))
    ctx = jnp.zeros((1, 4, CFG.context_dim))
    pooled = jnp.zeros((1, CFG.pooled_dim))
    lat = M.sample(params, jax.random.PRNGKey(1), ctx, pooled, CFG,
                   num_steps=4, guidance_scale=2.0,
                   context_uncond=ctx, pooled_uncond=pooled)
    assert lat.shape == (1, CFG.input_size, CFG.input_size, CFG.in_channels)
    assert np.isfinite(np.asarray(lat)).all()


def test_vae_group_norm_low_variance_large_mean():
    """Regression: the one-pass E[x^2]-mu^2 variance catastrophically
    cancelled in f32 (negative var -> NaN via rsqrt) for near-constant
    large-mean groups -- the flat-region-after-biased-conv regime. The
    centered two-pass form must stay finite and match a float64 oracle."""
    rng = np.random.default_rng(0)
    x = (100.0 + 0.01 * rng.standard_normal((1, 16, 16, 32))).astype(
        np.float32)
    g = 4
    p = {"scale": jnp.full((32,), 1.5, jnp.float32),
         "bias": jnp.full((32,), 0.25, jnp.float32)}
    got = np.asarray(V._group_norm(jnp.asarray(x), p, g))
    assert np.isfinite(got).all()
    x64 = x.astype(np.float64).reshape(1, 16, 16, g, 8)
    mu = x64.mean(axis=(1, 2, 4), keepdims=True)
    var = x64.var(axis=(1, 2, 4), keepdims=True)
    ref = ((x64 - mu) / np.sqrt(var + 1e-6)).reshape(1, 16, 16, 32)
    ref = ref * 1.5 + 0.25
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_vae_decoder_shapes():
    cfg = V.VAE_TEST
    params = V.init_params(cfg, jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4,
                                                    cfg.latent_channels))
    img = V.decode(params, lat, cfg)
    # one upsample stage in VAE_TEST: 4 -> 8
    assert img.shape == (1, 8, 8, 3)
    u8 = V.to_uint8(img)
    assert u8.dtype == jnp.uint8


def test_imagination_pipeline_end_to_end():
    lcfg, gcfg = CL.SD3_CLIP_L_TEST, CL.SD3_CLIP_G_TEST
    imag = DiffusionImagination(
        mmdit_params=M.init_params(CFG, jax.random.PRNGKey(1)),
        mmdit_cfg=CFG,
        vae_params=V.init_params(
            V.VAE_TEST.__class__(latent_channels=CFG.in_channels,
                                 base_channels=16, channel_mults=(1, 2),
                                 blocks_per_stage=2, groups=4,
                                 scaling_factor=1.0, shift_factor=0.0),
            jax.random.PRNGKey(2)),
        vae_cfg=V.VAE_TEST.__class__(
            latent_channels=CFG.in_channels, base_channels=16,
            channel_mults=(1, 2), blocks_per_stage=2, groups=4,
            scaling_factor=1.0, shift_factor=0.0),
        clip_l_params=CL.init_text_params(lcfg, jax.random.PRNGKey(0)),
        clip_l_cfg=lcfg,
        clip_g_params=CL.init_text_params(gcfg, jax.random.PRNGKey(3)),
        clip_g_cfg=gcfg,
        tokenizer=T.HashTokenizer(vocab_size=lcfg.vocab_size,
                                  context_length=lcfg.context_length),
        num_images=2, num_steps=2)
    out = imag("a red chair")
    assert out.shape == (2, CFG.input_size * 2, CFG.input_size * 2, 3)
    assert out.dtype == np.uint8


def test_sd3_converter_mapping():
    """convert_sd3 over a synthetic diffusers-layout state dict: full
    key coverage, correct shapes, runnable forward."""
    rng = np.random.default_rng(0)
    cfg = CFG
    d, p, cin = cfg.dim, cfg.patch_size, cfg.in_channels

    def lin(fi, fo):
        return {"weight": rng.normal(size=(fo, fi)).astype(np.float32),
                "bias": rng.normal(size=fo).astype(np.float32)}

    sd = {}
    def put(prefix, m):
        sd[f"{prefix}.weight"] = m["weight"]
        sd[f"{prefix}.bias"] = m["bias"]

    sd["pos_embed.proj.weight"] = rng.normal(
        size=(d, cin, p, p)).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.normal(size=d).astype(np.float32)
    sd["pos_embed.pos_embed"] = rng.normal(
        size=(1, cfg.num_patches, d)).astype(np.float32)
    put("time_text_embed.timestep_embedder.linear_1", lin(256, d))
    put("time_text_embed.timestep_embedder.linear_2", lin(d, d))
    put("time_text_embed.text_embedder.linear_1", lin(cfg.pooled_dim, d))
    put("time_text_embed.text_embedder.linear_2", lin(d, d))
    put("context_embedder", lin(cfg.context_dim, d))
    put("norm_out.linear", lin(d, 2 * d))
    put("proj_out", lin(d, p * p * cin))
    for i in range(cfg.depth):
        b = f"transformer_blocks.{i}"
        for nm, fi, fo in [("attn.to_q", d, d), ("attn.to_k", d, d),
                           ("attn.to_v", d, d), ("attn.to_out.0", d, d),
                           ("attn.add_q_proj", d, d),
                           ("attn.add_k_proj", d, d),
                           ("attn.add_v_proj", d, d),
                           ("attn.to_add_out", d, d),
                           ("norm1.linear", d, 6 * d),
                           ("norm1_context.linear", d, 6 * d),
                           ("ff.net.0.proj", d, 4 * d),
                           ("ff.net.2", 4 * d, d),
                           ("ff_context.net.0.proj", d, 4 * d),
                           ("ff_context.net.2", 4 * d, d)]:
            put(f"{b}.{nm}", lin(fi, fo))
        hd = cfg.head_dim
        for nm in ["attn.norm_q", "attn.norm_k", "attn.norm_added_q",
                   "attn.norm_added_k"]:
            sd[f"{b}.{nm}.weight"] = rng.normal(size=hd).astype(np.float32)

    params = M.convert_sd3(sd, cfg)
    assert len(params["blocks"]) == cfg.depth
    # packed qkv: row order q|k|v transposed
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["x"]["qkv"]["w"])[:, :cfg.dim],
        sd["transformer_blocks.0.attn.to_q.weight"].T, rtol=1e-6)
    lat = jnp.zeros((1, cfg.input_size, cfg.input_size, cin))
    ctx = jnp.zeros((1, 4, cfg.context_dim))
    pooled = jnp.zeros((1, cfg.pooled_dim))
    v = M.forward(params, lat, jnp.array([0.5]), ctx, pooled, cfg)
    assert v.shape == lat.shape
    assert np.isfinite(np.asarray(v)).all()


def test_imagination_with_t5_conditioning():
    """Optional T5 stream: context = CLIP ctx ++ T5 sequence features
    (SD3.5 conditioning layout, reference loads T5-XXL memory_2.py:49)."""
    from bsc_nav_tpu.models import t5 as T5

    class HashT5Tok:
        def encode(self, text):
            return [min(ord(c), 255) for c in text][:32]

    lcfg, gcfg = CL.SD3_CLIP_L_TEST, CL.SD3_CLIP_G_TEST
    # T5 width must equal the MMDiT joint width (no padding on the T5
    # stream in SD3.5 -- T5-XXL d_model IS the 4096 joint dim)
    t5_cfg = T5.T5Config(vocab_size=256, dim=CFG.context_dim, d_kv=8,
                         heads=4, d_ff=64, layers=2)
    vae_cfg = V.VAE_TEST.__class__(
        latent_channels=CFG.in_channels, base_channels=16,
        channel_mults=(1, 2), blocks_per_stage=2, groups=4,
        scaling_factor=1.0, shift_factor=0.0)
    imag = DiffusionImagination(
        mmdit_params=M.init_params(CFG, jax.random.PRNGKey(1)),
        mmdit_cfg=CFG,
        vae_params=V.init_params(vae_cfg, jax.random.PRNGKey(2)),
        vae_cfg=vae_cfg,
        clip_l_params=CL.init_text_params(lcfg, jax.random.PRNGKey(0)),
        clip_l_cfg=lcfg,
        clip_g_params=CL.init_text_params(gcfg, jax.random.PRNGKey(4)),
        clip_g_cfg=gcfg,
        tokenizer=T.HashTokenizer(vocab_size=lcfg.vocab_size,
                                  context_length=lcfg.context_length),
        num_images=1, num_steps=2, t5_seq_len=12,
        t5_params=T5.init_params(t5_cfg, jax.random.PRNGKey(3)),
        t5_cfg=t5_cfg,
        t5_tokenizer=HashT5Tok())
    out = imag("a red chair near the window")
    assert out.shape == (1, CFG.input_size * 2, CFG.input_size * 2, 3)
    assert out.dtype == np.uint8
    # T5 stream actually changes the conditioning (different prompt ->
    # different context tail -> different image)
    out2 = imag("a blue table in the kitchen")
    assert not np.array_equal(out, out2)


def test_convert_sd3_forward_parity_vs_torch_oracle():
    """convert_sd3 over an INDEPENDENT torch implementation in the
    diffusers SD3Transformer2DModel layout (tests/torch_mmdit_oracle.py):
    forward parity proves the converter handles the real-checkpoint
    behaviors — AdaLayerNormContinuous (scale, shift) order, the
    context_pre_only last block, pos_embed center-crop from
    pos_embed_max_size², RMS qk-norm, tanh-GELU FFNs."""
    torch = pytest.importorskip("torch")
    from torch_mmdit_oracle import SD3TransformerOracle

    torch.manual_seed(0)
    oracle = SD3TransformerOracle(
        dim=64, heads=4, depth=3, in_ch=4, patch=2, context_dim=32,
        pooled_dim=16, pos_embed_max_size=8).eval()

    cfg = M.MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                        dim=64, depth=3, heads=4, context_dim=32,
                        pooled_dim=16)
    params = M.convert_sd3(oracle.state_dict(), cfg)

    rng = np.random.default_rng(0)
    lat = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ctx = rng.standard_normal((2, 5, 32)).astype(np.float32)
    pool = rng.standard_normal((2, 16)).astype(np.float32)
    t = np.asarray([0.25, 0.8], np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t), torch.from_numpy(ctx),
                      torch.from_numpy(pool)).numpy()

    got = M.forward(params, jnp.asarray(lat), jnp.asarray(t),
                    jnp.asarray(ctx), jnp.asarray(pool), cfg)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_convert_vae_decoder_parity_vs_torch_oracle():
    """convert_vae_decoder over an independent torch AutoencoderKL-layout
    decoder (tests/torch_vae_oracle.py): forward parity incl. linear->
    1x1-conv attention mapping, conv_shortcut channel changes, and
    nearest-upsample+conv stages."""
    torch = pytest.importorskip("torch")
    from torch_vae_oracle import VAEDecoderOracle

    torch.manual_seed(0)
    oracle = VAEDecoderOracle(latent_channels=4, base=16, mults=(1, 2),
                              blocks_per_stage=2, groups=4).eval()

    cfg = V.VAE_TEST  # latent 4, base 16, mults (1,2), 2 blocks, g4
    params = V.convert_vae_decoder(oracle.state_dict(), cfg)

    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()

    # VAE_TEST has scaling 1.0 / shift 0.0, so decode == raw decoder
    got = np.asarray(V.decode(params, jnp.asarray(z), cfg))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-5)


def test_convert_sd3_dual_attention_forward_parity():
    """MMDiT-X (SD3.5-medium): blocks listed in dual_attention_layers
    carry a second latent-stream self-attention (diffusers attn2 +
    9-chunk AdaLayerNormZeroX).  Converter + forward must match the
    torch oracle with dual blocks enabled."""
    torch = pytest.importorskip("torch")
    from torch_mmdit_oracle import SD3TransformerOracle

    torch.manual_seed(1)
    oracle = SD3TransformerOracle(
        dim=64, heads=4, depth=3, in_ch=4, patch=2, context_dim=32,
        pooled_dim=16, pos_embed_max_size=8,
        dual_attention_layers=(0, 1)).eval()

    cfg = M.MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                        dim=64, depth=3, heads=4, context_dim=32,
                        pooled_dim=16, dual_attention_layers=(0, 1))
    params = M.convert_sd3(oracle.state_dict(), cfg)
    # dual blocks must pick up qkv2/proj2; plain blocks must not
    assert "qkv2" in params["blocks"][0]["x"]
    assert "qkv2" in params["blocks"][1]["x"]
    assert "qkv2" not in params["blocks"][2]["x"]
    assert params["blocks"][0]["x"]["mod"]["w"].shape[1] == 9 * 64

    rng = np.random.default_rng(2)
    lat = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ctx = rng.standard_normal((2, 5, 32)).astype(np.float32)
    pool = rng.standard_normal((2, 16)).astype(np.float32)
    t = np.asarray([0.25, 0.8], np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t), torch.from_numpy(ctx),
                      torch.from_numpy(pool)).numpy()

    got = M.forward(params, jnp.asarray(lat), jnp.asarray(t),
                    jnp.asarray(ctx), jnp.asarray(pool), cfg)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_convert_sd3_full_size_schema():
    """Key-coverage + shape audit at REAL SD3.5-medium dimensions
    (dim 1536, depth 24, heads 24, ctx 4096, pooled 2048, dual attention
    blocks 0-12, pos_embed_max_size 384): a meta-device oracle supplies
    the exact diffusers key schema; zero-stride fabricated tensors keep
    it cheap.  Proves the name mapping + every converted tensor shape at
    checkpoint scale without a forward pass (VERDICT r2 item 8)."""
    torch = pytest.importorskip("torch")
    from torch_mmdit_oracle import SD3TransformerOracle

    cfg = M.SD35_MEDIUM
    with torch.device("meta"):
        oracle = SD3TransformerOracle(
            dim=cfg.dim, heads=cfg.heads, depth=cfg.depth,
            in_ch=cfg.in_channels, patch=cfg.patch_size,
            context_dim=cfg.context_dim, pooled_dim=cfg.pooled_dim,
            pos_embed_max_size=384,
            dual_attention_layers=cfg.dual_attention_layers)
    sd = {k: np.broadcast_to(np.float16(0), tuple(v.shape))
          for k, v in oracle.state_dict().items()}

    params = M.convert_sd3(sd, cfg, dtype=jnp.bfloat16)

    expected = jax.eval_shape(
        lambda k: M.init_params(cfg, k), jax.random.PRNGKey(0))
    # the converted LAST block models context_pre_only (diffusers):
    # 2-chunk ctx modulation, zero-filled ctx proj/FFN placeholders --
    # init_params keeps the uniform 6-chunk layout (forward detects
    # either from the mod width)
    import copy
    expected = dict(expected, blocks=list(expected["blocks"]))
    last = copy.deepcopy(jax.tree.map(lambda x: x,
                                      expected["blocks"][-1]))
    d = cfg.dim
    last["ctx"]["mod"] = {
        "w": jax.ShapeDtypeStruct((d, 2 * d), jnp.bfloat16),
        "b": jax.ShapeDtypeStruct((2 * d,), jnp.bfloat16)}
    expected["blocks"][-1] = last
    flat_got = jax.tree_util.tree_leaves_with_path(params)
    flat_want = {p: tuple(l.shape) for p, l in
                 jax.tree_util.tree_leaves_with_path(expected)}
    assert len(flat_got) == len(flat_want)
    n_params = 0
    for path, leaf in flat_got:
        assert path in flat_want, f"unexpected param {path}"
        assert tuple(leaf.shape) == flat_want[path], (
            f"shape mismatch at {jax.tree_util.keystr(path)}: "
            f"converted {tuple(leaf.shape)} vs init {flat_want[path]}")
        n_params += int(np.prod(leaf.shape))
    assert n_params > 2e9, (
        f"SD3.5-medium should be >2B params, got {n_params/1e9:.2f}B")
