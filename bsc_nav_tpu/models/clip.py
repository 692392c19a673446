"""CLIP dual towers (image + text) in pure JAX.

Fills the reference's MetaCLIP ViT-H/14 role (reference
objnav_benchmark.py:309-311 via open_clip): query-time text<->label
matching for long-term memory retrieval (:539-557) and the 360-degree
image/text scan in check_around (:703-729).

Architecture follows the open_clip ViT tower layout (pre-LN transformer,
class embedding, ln_pre/ln_post, linear projection; text tower with
causal mask and argmax-EOT pooling).  Attention runs through the Pallas
flash kernel on TPU.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from bsc_nav_tpu.models.vit import layer_norm, _linear, patchify
from bsc_nav_tpu.ops.flash_attention import (
    attention, attention_from_qkv)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 1024
    # image tower
    image_size: int = 224
    patch_size: int = 14
    vision_width: int = 1280
    vision_layers: int = 32
    vision_heads: int = 16
    # text tower
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 1024
    text_heads: int = 16
    text_layers: int = 24
    ln_eps: float = 1e-5
    # tanh-approx GELU (see models/vit.py ViTConfig.gelu_exact: drift is
    # below bf16 noise; erf is VPU-bound on TPU)
    gelu_exact: bool = False
    # original OpenAI-CLIP checkpoints use quick_gelu = x*sigmoid(1.702x);
    # MetaCLIP uses plain GELU.  Overrides gelu_exact when True.
    quick_gelu: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


METACLIP_VITH14 = CLIPConfig()
CLIP_VITB32_TEST = CLIPConfig(
    embed_dim=64, image_size=32, patch_size=8, vision_width=96,
    vision_layers=2, vision_heads=3, context_length=16, vocab_size=512,
    text_width=64, text_heads=4, text_layers=2)

# SD3.5's two CLIP text towers (reference memory_2.py:542-560 loads the
# full StableDiffusion3Pipeline; its conditioning is CLIP-L + CLIP-G
# pooled-concat 768+1280=2048 and penultimate-hidden concat 768+1280
# zero-padded to the 4096 joint width, diffusers encode_prompt).  Only
# the text towers are used; vision fields are irrelevant here.
# CLIP-L (openai/clip-vit-large-patch14) activates with quick_gelu;
# CLIP-G (OpenCLIP bigG) uses plain GELU.
SD3_CLIP_L = CLIPConfig(embed_dim=768, text_width=768, text_heads=12,
                        text_layers=12, quick_gelu=True)
SD3_CLIP_G = CLIPConfig(embed_dim=1280, text_width=1280, text_heads=20,
                        text_layers=32)
# tiny counterparts for tests: widths mirror the L:G ratio and satisfy
# MMDIT_TEST's pooled_dim=16 (6+10) / context_dim=32 (8+16, zero-padded)
SD3_CLIP_L_TEST = CLIPConfig(embed_dim=6, text_width=8, text_heads=2,
                             text_layers=2, context_length=16,
                             vocab_size=512, quick_gelu=True)
SD3_CLIP_G_TEST = CLIPConfig(embed_dim=10, text_width=16, text_heads=2,
                             text_layers=3, context_length=16,
                             vocab_size=512)

CONFIGS = {"metaclip_vith14": METACLIP_VITH14,
           "sd3_clip_l": SD3_CLIP_L,
           "sd3_clip_g": SD3_CLIP_G}


def init_params(cfg: CLIPConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 10)

    def lin(k, fi, fo):
        return {"w": jax.random.normal(k, (fi, fo), dtype) / math.sqrt(fi),
                "b": jnp.zeros((fo,), dtype)}

    def ln(width):
        return {"scale": jnp.ones((width,), dtype),
                "bias": jnp.zeros((width,), dtype)}

    def tower(key, width, layers, mlp=4):
        blocks = []
        for i in range(layers):
            bk = jax.random.split(jax.random.fold_in(key, i), 4)
            blocks.append({
                "ln1": ln(width),
                "qkv": lin(bk[0], width, 3 * width),
                "proj": lin(bk[1], width, width),
                "ln2": ln(width),
                "fc1": lin(bk[2], width, mlp * width),
                "fc2": lin(bk[3], mlp * width, width),
            })
        return blocks

    vw, tw, p = cfg.vision_width, cfg.text_width, cfg.patch_size
    return {
        "visual": {
            "patch_embed": {"w": jax.random.normal(
                ks[0], (p * p * 3, vw), dtype) / math.sqrt(p * p * 3)},
            "class_embedding": jax.random.normal(ks[1], (vw,), dtype) * 0.02,
            "pos_embed": jax.random.normal(
                ks[2], (cfg.grid ** 2 + 1, vw), dtype) * 0.02,
            "ln_pre": ln(vw),
            "blocks": tower(ks[3], vw, cfg.vision_layers),
            "ln_post": ln(vw),
            "proj": jax.random.normal(
                ks[4], (vw, cfg.embed_dim), dtype) / math.sqrt(vw),
        },
        "text": {
            "token_embedding": jax.random.normal(
                ks[5], (cfg.vocab_size, tw), dtype) * 0.02,
            "pos_embed": jax.random.normal(
                ks[6], (cfg.context_length, tw), dtype) * 0.01,
            "blocks": tower(ks[7], tw, cfg.text_layers),
            "ln_final": ln(tw),
            "proj": jax.random.normal(
                ks[8], (tw, cfg.embed_dim), dtype) / math.sqrt(tw),
        },
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype),
    }


def init_text_params(cfg: CLIPConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    """Text-tower-only params (the SD3.5 conditioning towers have no
    vision side in the diffusers checkpoint layout)."""
    return init_params(cfg, key, dtype)["text"]


def encode_text_sd3(text_params: Dict[str, Any], token_ids: jnp.ndarray,
                    cfg: CLIPConfig) -> tuple:
    """SD3-style text encoding: returns (penultimate hidden states
    [B, S, text_width], projected pooled embedding [B, embed_dim]).

    Matches diffusers' `_get_clip_prompt_embeds` (the reference's
    pipeline, memory_2.py:542-560): the MMDiT context consumes
    `hidden_states[-2]` — the output of layer N-1, WITHOUT the final
    layer norm — while the pooled vector runs the full tower (last
    layer + final LN), gathers the first-EOT token (argmax over ids;
    EOT has the highest id) and applies the text projection.
    """
    t = text_params
    x = t["token_embedding"][token_ids] + t["pos_embed"][None]
    x = _tower_forward(x, t["blocks"][:-1], cfg.text_heads, cfg.ln_eps,
                       causal=True, gelu_exact=cfg.gelu_exact,
                       quick_gelu=cfg.quick_gelu)
    penultimate = x
    x = _tower_forward(x, t["blocks"][-1:], cfg.text_heads, cfg.ln_eps,
                       causal=True, gelu_exact=cfg.gelu_exact,
                       quick_gelu=cfg.quick_gelu)
    x = layer_norm(x, t["ln_final"], cfg.ln_eps)
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    pooled = jnp.einsum("bd,de->be", pooled, t["proj"],
                        preferred_element_type=jnp.float32)
    return penultimate, pooled.astype(x.dtype)


def quantize_params(params: Dict[str, Any],
                    towers: str = "both") -> Dict[str, Any]:
    """int8 W8A8 (ops/quant.py) on the per-block token matmuls of the
    CLIP towers: qkv / proj / fc1 / fc2.  Serving-only, same role as
    vit.quantize_params — fills the reference's quantized-serving slot
    (reference memory_2.py:542-560 uses NF4; see ops/quant.py for why
    W8A8 is the TPU-native scheme).  Embeddings, layer norms and the
    final projection matrices stay bf16/f32.

    towers: "both" | "visual" | "text" — the image tower dominates
    FLOPs (ViT-H/14 b12 ≈ 2.0 TFLOP vs ~0.1 for a text batch), but the
    text tower shares the same leaf layout so both are supported.
    """
    from bsc_nav_tpu.ops.quant import quantize_weight

    def q_tower(tower):
        out = {k: v for k, v in tower.items() if k != "blocks"}
        blocks = []
        for blk in tower["blocks"]:
            nb = dict(blk)
            for k in ("qkv", "proj", "fc1", "fc2"):
                nb[k] = quantize_weight(nb[k])
            blocks.append(nb)
        out["blocks"] = blocks
        return out

    out = dict(params)
    if towers in ("both", "visual"):
        out["visual"] = q_tower(params["visual"])
    if towers in ("both", "text"):
        out["text"] = q_tower(params["text"])
    return out


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _tower_forward(x, blocks, heads, eps, causal=False,
                   gelu_exact=False, quick_gelu=False):
    B, S, D = x.shape
    hd = D // heads
    if quick_gelu:
        act = _quick_gelu
    else:
        def act(v):
            return jax.nn.gelu(v, approximate=not gelu_exact)
    for blk in blocks:
        y = layer_norm(x, blk["ln1"], eps)
        att = attention_from_qkv(_linear(y, blk["qkv"]), heads=heads,
                                 causal=causal)
        x = x + _linear(att, blk["proj"])
        y = layer_norm(x, blk["ln2"], eps)
        x = x + _linear(act(_linear(y, blk["fc1"])), blk["fc2"])
    return x


def encode_image(params: Dict[str, Any], images: jnp.ndarray,
                 cfg: CLIPConfig, normalize: bool = True) -> jnp.ndarray:
    """images: [B, H, W, 3] normalized floats -> [B, embed_dim]."""
    v = params["visual"]
    x = _linear(patchify(images, cfg.patch_size), v["patch_embed"])
    B = x.shape[0]
    cls = jnp.broadcast_to(
        v["class_embedding"][None, None, :], (B, 1, cfg.vision_width)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + v["pos_embed"][None].astype(x.dtype)
    x = layer_norm(x, v["ln_pre"], cfg.ln_eps)
    x = _tower_forward(x, v["blocks"], cfg.vision_heads, cfg.ln_eps,
                       gelu_exact=cfg.gelu_exact, quick_gelu=cfg.quick_gelu)
    x = layer_norm(x[:, 0], v["ln_post"], cfg.ln_eps)
    feats = jnp.einsum("bd,de->be", x, v["proj"],
                       preferred_element_type=jnp.float32)
    if normalize:
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    return feats


def encode_text(params: Dict[str, Any], token_ids: jnp.ndarray,
                cfg: CLIPConfig, normalize: bool = True) -> jnp.ndarray:
    """token_ids: [B, context_length] int32 -> [B, embed_dim].
    Pooled at the argmax token id (EOT has the highest id, open_clip
    convention)."""
    t = params["text"]
    x = t["token_embedding"][token_ids] + t["pos_embed"][None]
    x = _tower_forward(x, t["blocks"], cfg.text_heads, cfg.ln_eps,
                       causal=True, gelu_exact=cfg.gelu_exact,
                       quick_gelu=cfg.quick_gelu)
    x = layer_norm(x, t["ln_final"], cfg.ln_eps)
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    feats = jnp.einsum("bd,de->be", pooled, t["proj"],
                       preferred_element_type=jnp.float32)
    if normalize:
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    return feats


# CLIP image preprocessing constants (open_clip defaults); numpy on
# purpose — module-scope jnp constants initialize the backend at import
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images_uint8: jnp.ndarray, cfg: CLIPConfig) -> jnp.ndarray:
    x = images_uint8.astype(jnp.float32) / 255.0
    B = x.shape[0]
    if x.shape[1:3] != (cfg.image_size, cfg.image_size):
        x = jax.image.resize(
            x, (B, cfg.image_size, cfg.image_size, 3), "bilinear")
    return (x - CLIP_MEAN) / CLIP_STD


# --------------------------------------------------------------------------
# open_clip checkpoint conversion
# --------------------------------------------------------------------------

def convert_openclip(state_dict: Mapping[str, Any], cfg: CLIPConfig,
                     dtype=jnp.float32) -> Dict[str, Any]:
    """open_clip state-dict layout -> clip.py params."""

    def _t(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: _t(v) for k, v in state_dict.items()}

    def ln(prefix, width):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def lin(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"].T, dtype),
                "b": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def tower(prefix, layers):
        blocks = []
        for i in range(layers):
            p = f"{prefix}.resblocks.{i}"
            blocks.append({
                "ln1": ln(f"{p}.ln_1", None),
                "qkv": {"w": jnp.asarray(sd[f"{p}.attn.in_proj_weight"].T, dtype),
                        "b": jnp.asarray(sd[f"{p}.attn.in_proj_bias"], dtype)},
                "proj": lin(f"{p}.attn.out_proj"),
                "ln2": ln(f"{p}.ln_2", None),
                "fc1": lin(f"{p}.mlp.c_fc"),
                "fc2": lin(f"{p}.mlp.c_proj"),
            })
        return blocks

    conv = sd["visual.conv1.weight"]  # [W, 3, P, P], no bias
    w = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.vision_width)
    return {
        "visual": {
            "patch_embed": {"w": jnp.asarray(w, dtype)},
            "class_embedding": jnp.asarray(sd["visual.class_embedding"], dtype),
            "pos_embed": jnp.asarray(sd["visual.positional_embedding"], dtype),
            "ln_pre": ln("visual.ln_pre", None),
            "blocks": tower("visual.transformer", cfg.vision_layers),
            "ln_post": ln("visual.ln_post", None),
            "proj": jnp.asarray(sd["visual.proj"], dtype),
        },
        "text": {
            "token_embedding": jnp.asarray(sd["token_embedding.weight"], dtype),
            "pos_embed": jnp.asarray(sd["positional_embedding"], dtype),
            "blocks": tower("transformer", cfg.text_layers),
            "ln_final": ln("ln_final", None),
            "proj": jnp.asarray(sd["text_projection"], dtype),
        },
        "logit_scale": jnp.asarray(sd["logit_scale"], dtype),
    }

# --------------------------------------------------------------------------
# HuggingFace transformers CLIPModel checkpoint conversion
# --------------------------------------------------------------------------

def convert_clip_hf(state_dict: Mapping[str, Any], cfg: CLIPConfig,
                    dtype=jnp.float32) -> Dict[str, Any]:
    """HuggingFace `CLIPModel` state dict -> clip.py params.

    MetaCLIP ships on the Hub in this layout
    (facebook/metaclip-h14-fullcc2.5b); the reference loads the same
    weights through open_clip (objnav_benchmark.py:309).  Differences
    from open_clip handled here: separate q/k/v projections (fused into
    our [D, 3D] qkv), `pre_layrnorm` (sic) / `post_layernorm` names,
    nn.Embedding position tables, and [E, W]-shaped projection matrices.
    NOTE original OpenAI CLIP checkpoints use quick_gelu -- construct the
    CLIPConfig with quick_gelu=True for those; MetaCLIP uses plain GELU
    (gelu_exact=True for bit parity).  Parity vs a random-init
    transformers model is proven in tests/test_hf_converters.py.
    """

    def _t(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: _t(v) for k, v in state_dict.items()}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def lin(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"].T, dtype),
                "b": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def tower(prefix, layers):
        blocks = []
        for i in range(layers):
            p = f"{prefix}.encoder.layers.{i}"
            qkv_w = np.concatenate(
                [sd[f"{p}.self_attn.{n}.weight"].T
                 for n in ("q_proj", "k_proj", "v_proj")], axis=1)
            qkv_b = np.concatenate(
                [sd[f"{p}.self_attn.{n}.bias"]
                 for n in ("q_proj", "k_proj", "v_proj")])
            blocks.append({
                "ln1": ln(f"{p}.layer_norm1"),
                "qkv": {"w": jnp.asarray(qkv_w, dtype),
                        "b": jnp.asarray(qkv_b, dtype)},
                "proj": lin(f"{p}.self_attn.out_proj"),
                "ln2": ln(f"{p}.layer_norm2"),
                "fc1": lin(f"{p}.mlp.fc1"),
                "fc2": lin(f"{p}.mlp.fc2"),
            })
        return blocks

    conv = sd["vision_model.embeddings.patch_embedding.weight"]
    w = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.vision_width)
    return {
        "visual": {
            "patch_embed": {"w": jnp.asarray(w, dtype)},
            "class_embedding": jnp.asarray(
                sd["vision_model.embeddings.class_embedding"], dtype),
            "pos_embed": jnp.asarray(
                sd["vision_model.embeddings.position_embedding.weight"],
                dtype),
            "ln_pre": ln("vision_model.pre_layrnorm"),
            "blocks": tower("vision_model", cfg.vision_layers),
            "ln_post": ln("vision_model.post_layernorm"),
            "proj": jnp.asarray(sd["visual_projection.weight"].T, dtype),
        },
        "text": {
            "token_embedding": jnp.asarray(
                sd["text_model.embeddings.token_embedding.weight"], dtype),
            "pos_embed": jnp.asarray(
                sd["text_model.embeddings.position_embedding.weight"], dtype),
            "blocks": tower("text_model", cfg.text_layers),
            "ln_final": ln("text_model.final_layer_norm"),
            "proj": jnp.asarray(sd["text_projection.weight"].T, dtype),
        },
        "logit_scale": jnp.asarray(sd["logit_scale"], dtype),
    }


def convert_clip_text_hf(state_dict: Mapping[str, Any], cfg: CLIPConfig,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """HuggingFace `CLIPTextModelWithProjection` state dict -> text-tower
    params (the layout SD3.5's text_encoder / text_encoder_2 subfolders
    ship in; reference loads them via StableDiffusion3Pipeline,
    memory_2.py:542-560).  Also accepts a full CLIPModel state dict —
    vision keys are simply ignored."""

    def _t(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: _t(v) for k, v in state_dict.items()
          if k.startswith(("text_model.", "text_projection."))}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def lin(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"].T, dtype),
                "b": jnp.asarray(sd[prefix + ".bias"], dtype)}

    blocks = []
    for i in range(cfg.text_layers):
        p = f"text_model.encoder.layers.{i}"
        qkv_w = np.concatenate(
            [sd[f"{p}.self_attn.{n}.weight"].T
             for n in ("q_proj", "k_proj", "v_proj")], axis=1)
        qkv_b = np.concatenate(
            [sd[f"{p}.self_attn.{n}.bias"]
             for n in ("q_proj", "k_proj", "v_proj")])
        blocks.append({
            "ln1": ln(f"{p}.layer_norm1"),
            "qkv": {"w": jnp.asarray(qkv_w, dtype),
                    "b": jnp.asarray(qkv_b, dtype)},
            "proj": lin(f"{p}.self_attn.out_proj"),
            "ln2": ln(f"{p}.layer_norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        })
    assert f"text_model.encoder.layers.{cfg.text_layers}.layer_norm1.weight" \
        not in sd, "checkpoint has more layers than cfg.text_layers"
    return {
        "token_embedding": jnp.asarray(
            sd["text_model.embeddings.token_embedding.weight"], dtype),
        "pos_embed": jnp.asarray(
            sd["text_model.embeddings.position_embedding.weight"], dtype),
        "blocks": blocks,
        "ln_final": ln("text_model.final_layer_norm"),
        "proj": jnp.asarray(sd["text_projection.weight"].T, dtype),
    }
