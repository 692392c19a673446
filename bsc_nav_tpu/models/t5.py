"""T5 encoder (text conditioning for the MMDiT imagination pipeline).

SD3.5 conditions on T5-XXL sequence features alongside the two CLIP
towers (the reference gets all three inside the diffusers pipeline,
memory_2.py:555-559).  This is the T5 v1.1 encoder stack in JAX:

  - relative position bias (bucketed, first layer only, shared),
  - RMSNorm (no bias, no mean subtraction),
  - gated-GELU feed-forward (wi_0 * gelu, wi_1 linear),
  - no scaling inside attention (T5 folds 1/sqrt(d) into init).

Text -> ids lives in `models/sentencepiece.py` (pure-Python unigram
tokenizer; use `tokenize_t5(SentencePieceUnigram.from_file(spiece), ..)`).
Converter maps the HuggingFace t5 encoder state-dict layout; parity is
tested against transformers' torch implementation with random weights.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    dim: int = 4096                 # d_model (t5-xxl)
    d_kv: int = 64
    heads: int = 64
    d_ff: int = 10240
    layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6


T5_XXL = T5Config()
T5_TEST = T5Config(vocab_size=256, dim=64, d_kv=16, heads=4, d_ff=128,
                   layers=2)


def init_params(cfg: T5Config, key, dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.layers))
    inner = cfg.heads * cfg.d_kv

    def lin(fi, fo):
        return jax.random.normal(next(ks), (fi, fo), dtype) / math.sqrt(fi)

    blocks = []
    for _ in range(cfg.layers):
        blocks.append({
            "ln1": jnp.ones((cfg.dim,), dtype),
            "q": lin(cfg.dim, inner),
            "k": lin(cfg.dim, inner),
            "v": lin(cfg.dim, inner),
            "o": lin(inner, cfg.dim),
            "ln2": jnp.ones((cfg.dim,), dtype),
            "wi0": lin(cfg.dim, cfg.d_ff),
            "wi1": lin(cfg.dim, cfg.d_ff),
            "wo": lin(cfg.d_ff, cfg.dim),
        })
    return {
        "embed": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.dim), dtype) * 1.0,
        "rel_bias": jax.random.normal(
            next(ks), (cfg.rel_buckets, cfg.heads), dtype) * 0.1,
        "blocks": blocks,
        "ln_final": jnp.ones((cfg.dim,), dtype),
    }


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _relative_buckets(rel_pos, num_buckets, max_distance):
    """T5 bidirectional relative position bucketing."""
    nb = num_buckets // 2
    bucket = jnp.where(rel_pos > 0, nb, 0)
    n = jnp.abs(rel_pos)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return bucket + jnp.where(is_small, n, large)


def _position_bias(params, cfg: T5Config, S: int) -> jnp.ndarray:
    ctx = jnp.arange(S)[:, None]
    mem = jnp.arange(S)[None, :]
    buckets = _relative_buckets(mem - ctx, cfg.rel_buckets,
                                cfg.rel_max_distance)
    bias = params["rel_bias"][buckets]          # [S, S, H]
    return bias.transpose(2, 0, 1)[None]        # [1, H, S, S]


def encode(params: Dict[str, Any], token_ids: jnp.ndarray,
           cfg: T5Config, mask: jnp.ndarray = None) -> jnp.ndarray:
    """token_ids [B, S] -> sequence features [B, S, dim]."""
    B, S = token_ids.shape
    x = params["embed"][token_ids]
    bias = _position_bias(params, cfg, S)
    if mask is not None:
        bias = bias + jnp.where(mask[:, None, None, :], 0.0, -1e9)

    for blk in params["blocks"]:
        y = _rms_norm(x, blk["ln1"], cfg.eps)
        q = jnp.einsum("bsd,df->bsf", y, blk["q"]).reshape(
            B, S, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = jnp.einsum("bsd,df->bsf", y, blk["k"]).reshape(
            B, S, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = jnp.einsum("bsd,df->bsf", y, blk["v"]).reshape(
            B, S, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        att = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1).astype(x.dtype)
        x = x + jnp.einsum("bsf,fd->bsd", out, blk["o"]).astype(x.dtype)

        y = _rms_norm(x, blk["ln2"], cfg.eps)
        h = (jax.nn.gelu(jnp.einsum("bsd,df->bsf", y, blk["wi0"]),
                         approximate=True)
             * jnp.einsum("bsd,df->bsf", y, blk["wi1"]))
        x = x + jnp.einsum("bsf,fd->bsd", h, blk["wo"]).astype(x.dtype)

    return _rms_norm(x, params["ln_final"], cfg.eps)


def convert_t5(state_dict: Mapping[str, Any], cfg: T5Config,
               dtype=jnp.float32) -> Dict[str, Any]:
    """HuggingFace T5EncoderModel state-dict -> params."""

    def _t(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: _t(v) for k, v in state_dict.items()}
    pre = "encoder." if any(k.startswith("encoder.") for k in sd) else ""

    blocks = []
    for i in range(cfg.layers):
        b = f"{pre}block.{i}.layer"
        blocks.append({
            "ln1": jnp.asarray(sd[f"{b}.0.layer_norm.weight"], dtype),
            "q": jnp.asarray(sd[f"{b}.0.SelfAttention.q.weight"].T, dtype),
            "k": jnp.asarray(sd[f"{b}.0.SelfAttention.k.weight"].T, dtype),
            "v": jnp.asarray(sd[f"{b}.0.SelfAttention.v.weight"].T, dtype),
            "o": jnp.asarray(sd[f"{b}.0.SelfAttention.o.weight"].T, dtype),
            "ln2": jnp.asarray(sd[f"{b}.1.layer_norm.weight"], dtype),
            "wi0": jnp.asarray(
                sd[f"{b}.1.DenseReluDense.wi_0.weight"].T, dtype),
            "wi1": jnp.asarray(
                sd[f"{b}.1.DenseReluDense.wi_1.weight"].T, dtype),
            "wo": jnp.asarray(sd[f"{b}.1.DenseReluDense.wo.weight"].T, dtype),
        })
    return {
        "embed": jnp.asarray(sd[f"{pre}embed_tokens.weight"]
                             if f"{pre}embed_tokens.weight" in sd
                             else sd["shared.weight"], dtype),
        "rel_bias": jnp.asarray(
            sd[f"{pre}block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"], dtype),
        "blocks": blocks,
        "ln_final": jnp.asarray(sd[f"{pre}final_layer_norm.weight"], dtype),
    }
