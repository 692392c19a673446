"""VAE decoder: diffusion latents -> RGB images.

The SD3-family autoencoder decoder (the reference gets it inside the
diffusers StableDiffusion3Pipeline, memory_2.py:555-559): conv-in,
middle (resnet / single-head attention / resnet), four up-stages of
resnet blocks with nearest-neighbor upsampling, groupnorm + silu +
conv-out.  Channel plan (128, 256, 512, 512) reversed for decoding;
16-channel latents for SD3.

Implemented with lax.conv_general_dilated in NHWC (XLA maps these onto
the MXU); the encoder is not needed by this framework (images are never
encoded back to latents on the query path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 16
    base_channels: int = 128
    channel_mults: tuple = (1, 2, 4, 4)
    blocks_per_stage: int = 3       # decoder uses layers_per_block + 1
    groups: int = 32
    scaling_factor: float = 1.5305  # SD3 latent scaling
    shift_factor: float = 0.0609


SD3_VAE = VAEConfig()
VAE_TEST = VAEConfig(latent_channels=4, base_channels=16,
                     channel_mults=(1, 2), blocks_per_stage=2, groups=4,
                     scaling_factor=1.0, shift_factor=0.0)


def _conv_init(key, kh, kw, cin, cout, dtype):
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype)
    return {"w": w / math.sqrt(kh * kw * cin), "b": jnp.zeros((cout,), dtype)}


def _gn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def init_params(cfg: VAEConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 256))
    chans = [cfg.base_channels * m for m in cfg.channel_mults]
    top = chans[-1]

    def resnet(cin, cout):
        p = {
            "gn1": _gn_init(cin, dtype),
            "conv1": _conv_init(next(ks), 3, 3, cin, cout, dtype),
            "gn2": _gn_init(cout, dtype),
            "conv2": _conv_init(next(ks), 3, 3, cout, cout, dtype),
        }
        if cin != cout:
            p["skip"] = _conv_init(next(ks), 1, 1, cin, cout, dtype)
        return p

    params: Dict[str, Any] = {
        "conv_in": _conv_init(next(ks), 3, 3, cfg.latent_channels, top, dtype),
        "mid_res1": resnet(top, top),
        "mid_attn": {
            "gn": _gn_init(top, dtype),
            "q": _conv_init(next(ks), 1, 1, top, top, dtype),
            "k": _conv_init(next(ks), 1, 1, top, top, dtype),
            "v": _conv_init(next(ks), 1, 1, top, top, dtype),
            "o": _conv_init(next(ks), 1, 1, top, top, dtype),
        },
        "mid_res2": resnet(top, top),
        "stages": [],
        "gn_out": _gn_init(chans[0], dtype),
        "conv_out": _conv_init(next(ks), 3, 3, chans[0], 3, dtype),
    }
    cin = top
    for cout in reversed(chans):
        stage: Dict[str, Any] = {"res": []}
        for _ in range(cfg.blocks_per_stage):
            stage["res"].append(resnet(cin, cout))
            cin = cout
        stage["upconv"] = _conv_init(next(ks), 3, 3, cout, cout, dtype)
        params["stages"].append(stage)
    # last stage has no upsample
    params["stages"][-1].pop("upconv")
    return params


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _group_norm(x, p, groups):
    """Group norm that never reshapes the big activation: viewing
    [B,H,W,C] as [...,g,C//g] puts a 16-wide minor dim on a tensor TPU
    tiles to 128 lanes (8x padded HBM traffic at 512^2 resolution).
    Instead reduce spatially to lane-aligned [B,C] moments, fold
    channels into groups on that TINY array, and apply the folded
    per-channel affine in the native layout.

    Variance uses a CENTERED second reduction pass.  Measured
    alternatives (decode b3@512^2, tools/vae_profile.py): the one-pass
    E[x^2]-mu^2 form is fastest (173 ms) but catastrophically cancels
    in f32 for low-variance large-mean groups (mean 100 / std 0.01 ->
    negative var -> NaN via rsqrt; the flat-region-after-biased-conv
    regime) -- inherent, since squares accumulate at mean^2 magnitude;
    a strided-subsample mean shift fixes the numerics in one pass but
    breaks XLA's cast/reduce fusion (233 ms); this centered two-pass
    is exact and measures 197 ms vs 191 ms for the original padded
    rank-5 view -- a tie within tunnel variance, kept for the cleaner
    numerics and native tiling."""
    B, H, W, C = x.shape
    g = min(groups, C)
    cg = C // g
    xf = x.astype(jnp.float32)
    n = H * W * cg
    s1 = jnp.sum(xf, axis=(1, 2))                       # [B, C]
    mu = s1.reshape(B, g, cg).sum(-1) / n               # [B, g]
    mu_c = jnp.repeat(mu, cg, axis=-1)                  # [B, C]
    d = xf - mu_c[:, None, None, :]
    s2 = jnp.sum(d * d, axis=(1, 2))                    # [B, C]
    var = s2.reshape(B, g, cg).sum(-1) / n              # [B, g] >= 0
    rstd = jax.lax.rsqrt(var + 1e-6)
    scale = (jnp.repeat(rstd, cg, axis=-1)
             * p["scale"].astype(jnp.float32)[None])    # [B, C]
    bias = (p["bias"].astype(jnp.float32)[None]
            - mu_c * scale)
    return (xf * scale[:, None, None, :]
            + bias[:, None, None, :]).astype(x.dtype)


def _resnet(x, p, groups):
    h = _conv(jax.nn.silu(_group_norm(x, p["gn1"], groups)), p["conv1"])
    h = _conv(jax.nn.silu(_group_norm(h, p["gn2"], groups)), p["conv2"])
    if "skip" in p:
        x = _conv(x, p["skip"])
    return x + h


def _mid_attention(x, p, groups):
    B, H, W, C = x.shape
    h = _group_norm(x, p["gn"], groups)
    q = _conv(h, p["q"]).reshape(B, H * W, C)
    k = _conv(h, p["k"]).reshape(B, H * W, C)
    v = _conv(h, p["v"]).reshape(B, H * W, C)
    att = jax.nn.softmax(
        jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(C),
        axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", att.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return x + _conv(out.reshape(B, H, W, C), p["o"])


def _upsample(x):
    B, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x


def decode(params, latents: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """latents [B, h, w, latent_channels] -> RGB float in [-1, 1]
    [B, 8h', 8w', 3] (x2 per up-stage)."""
    x = latents / cfg.scaling_factor + cfg.shift_factor
    x = _conv(x, params["conv_in"])
    x = _resnet(x, params["mid_res1"], cfg.groups)
    x = _mid_attention(x, params["mid_attn"], cfg.groups)
    x = _resnet(x, params["mid_res2"], cfg.groups)
    for stage in params["stages"]:
        for res in stage["res"]:
            x = _resnet(x, res, cfg.groups)
        if "upconv" in stage:
            x = _conv(_upsample(x), stage["upconv"])
    x = jax.nn.silu(_group_norm(x, params["gn_out"], cfg.groups))
    return _conv(x, params["conv_out"])


def to_uint8(images: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip((images + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


# --------------------------------------------------------------------------
# diffusers AutoencoderKL (decoder) checkpoint conversion -- forward-
# parity validated against an independent torch implementation in the
# diffusers layout (tests/torch_vae_oracle.py)
# --------------------------------------------------------------------------

def convert_vae_decoder(state_dict, cfg: VAEConfig, dtype=jnp.float32):
    """diffusers AutoencoderKL state dict -> vae.py decoder params.

    Key layout (decoder half only; the encoder is unused here):
      decoder.conv_in, decoder.mid_block.{resnets.{0,1}, attentions.0},
      decoder.up_blocks.{i}.{resnets.{j}, upsamplers.0.conv},
      decoder.conv_norm_out, decoder.conv_out.
    Mid attention uses LINEAR q/k/v/out projections in diffusers;
    mapped onto our 1x1 convs.  Latent scaling/shift stays in decode()
    (the diffusers pipeline applies it outside the VAE).
    """
    import numpy as np

    def _t(x):
        return (x.detach().cpu().numpy() if hasattr(x, "detach")
                else np.asarray(x))

    sd = {k: _t(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].transpose(
                    2, 3, 1, 0), dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"], dtype)}

    def lin_as_conv1x1(prefix):
        w = sd[f"{prefix}.weight"]                     # [cout, cin]
        return {"w": jnp.asarray(w.T[None, None], dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"], dtype)}

    def gn(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{prefix}.bias"], dtype)}

    def resnet(prefix):
        p = {"gn1": gn(f"{prefix}.norm1"), "conv1": conv(f"{prefix}.conv1"),
             "gn2": gn(f"{prefix}.norm2"), "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["skip"] = conv(f"{prefix}.conv_shortcut")
        return p

    stages = []
    i = 0
    while f"decoder.up_blocks.{i}.resnets.0.conv1.weight" in sd:
        stage = {"res": []}
        j = 0
        while f"decoder.up_blocks.{i}.resnets.{j}.conv1.weight" in sd:
            stage["res"].append(
                resnet(f"decoder.up_blocks.{i}.resnets.{j}"))
            j += 1
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            stage["upconv"] = conv(
                f"decoder.up_blocks.{i}.upsamplers.0.conv")
        stages.append(stage)
        i += 1

    att = "decoder.mid_block.attentions.0"
    return {
        "conv_in": conv("decoder.conv_in"),
        "mid_res1": resnet("decoder.mid_block.resnets.0"),
        "mid_attn": {
            "gn": gn(f"{att}.group_norm"),
            "q": lin_as_conv1x1(f"{att}.to_q"),
            "k": lin_as_conv1x1(f"{att}.to_k"),
            "v": lin_as_conv1x1(f"{att}.to_v"),
            "o": lin_as_conv1x1(f"{att}.to_out.0"),
        },
        "mid_res2": resnet("decoder.mid_block.resnets.1"),
        "stages": stages,
        "gn_out": gn("decoder.conv_norm_out"),
        "conv_out": conv("decoder.conv_out"),
    }
