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


def init_params_q8(cfg: T5Config, key, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Random-weight int8 serving tree, generated DIRECTLY at int8.

    Structurally identical to quantize_params(init_params(...)) but
    never materializes the bf16 tree (T5-XXL bf16 is ~9.4 GB --
    initializing it on a chip that already holds the token store would
    OOM).  For benchmarking/smoke at serving scale; real checkpoints go
    through convert_t5 + quantize_params."""
    ks = iter(jax.random.split(key, 4 + 8 * cfg.layers))
    inner = cfg.heads * cfg.d_kv

    def qlin(fi, fo):
        return {"w_q": jax.random.randint(next(ks), (fi, fo), -127, 128,
                                          jnp.int8),
                "w_s": jnp.full((fo,), 1.0 / (127.0 * math.sqrt(fi)),
                                jnp.float32)}

    blocks = []
    for _ in range(cfg.layers):
        blocks.append({
            "ln1": jnp.ones((cfg.dim,), dtype),
            "q": qlin(cfg.dim, inner), "k": qlin(cfg.dim, inner),
            "v": qlin(cfg.dim, inner), "o": qlin(inner, cfg.dim),
            "ln2": jnp.ones((cfg.dim,), dtype),
            "wi0": qlin(cfg.dim, cfg.d_ff), "wi1": qlin(cfg.dim, cfg.d_ff),
            "wo": qlin(cfg.d_ff, cfg.dim),
        })
    return {
        "embed": {"w_q": jax.random.randint(
                      next(ks), (cfg.vocab_size, cfg.dim), -127, 128,
                      jnp.int8),
                  "w_s": jnp.full((cfg.dim,), 1.0 / 127.0, jnp.float32)},
        "rel_bias": jax.random.normal(
            next(ks), (cfg.rel_buckets, cfg.heads), dtype) * 0.1,
        "blocks": blocks,
        "ln_final": jnp.ones((cfg.dim,), dtype),
    }


def quantize_params_host(params: Dict[str, Any]) -> Dict[str, Any]:
    """Numpy-side quantize_params, BEFORE device upload.

    The tunneled TPU moves bulk data at 0.03-0.04 GB/s (CLAUDE.md), so
    uploading the bf16 T5-XXL tree (9.4 GB) and quantizing on device
    costs minutes more than uploading the ~4.8 GB int8 tree directly.
    Same scheme/layout as quantize_params."""
    def qw(w):
        w = np.asarray(w, np.float32)
        s = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
        return {"w_q": np.round(w / s).astype(np.int8),
                "w_s": s.astype(np.float32)}

    out = {k: v for k, v in params.items() if k not in ("blocks", "embed")}
    out["blocks"] = [
        {k: (qw(v) if k in QUANT_KEYS else v) for k, v in blk.items()}
        for blk in params["blocks"]]
    out["embed"] = qw(params["embed"])
    return out


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Weight-dispatching matmul: a bare [fi, fo] array runs bf16; a
    {"w_q" int8, "w_s" f32[fo]} leaf (quantize_params) runs W8A8 with
    int32 MXU accumulation (ops/quant.py scheme, no bias in T5)."""
    if isinstance(w, dict):
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-12) / 127.0
        xq = jnp.round(xf / xs).astype(jnp.int8)
        y = jnp.einsum("...d,df->...f", xq, w["w_q"],
                       preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * w["w_s"]).astype(x.dtype)
    return jnp.einsum("...d,df->...f", x, w)


#: per-block weights carrying the token-matmul FLOPs/bandwidth
QUANT_KEYS = ("q", "k", "v", "o", "wi0", "wi1", "wo")


def quantize_params(params: Dict[str, Any],
                    quantize_embed: bool = True) -> Dict[str, Any]:
    """int8-quantize the T5 encoder for serving (W8A8, ops/quant.py).

    T5-XXL is the largest tower in SD3.5's conditioning (~4.7B params,
    9.4 GB bf16); int8 halves the HBM footprint to ~4.7 GB so the full
    triple-encoder pipeline fits one v5e chip next to the token store,
    and the S=512 encode rides the MXU's int8 rate.  The reference
    serves the whole SD3.5 pipeline NF4-quantized through bitsandbytes
    for the same reason (memory_2.py:542-560).  The embedding table is
    stored int8 with a per-column scale (gather + dequant; lookup-only,
    no matmul)."""
    from bsc_nav_tpu.ops.quant import quantize_weight
    out = {k: v for k, v in params.items() if k not in ("blocks", "embed")}
    out["blocks"] = [
        {k: (quantize_weight({"w": v}) if k in QUANT_KEYS else v)
         for k, v in blk.items()}
        for blk in params["blocks"]]
    if quantize_embed:
        e = params["embed"].astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(e), axis=0), 1e-12) / 127.0
        out["embed"] = {"w_q": jnp.round(e / s).astype(jnp.int8), "w_s": s}
    else:
        out["embed"] = params["embed"]
    return out


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
    emb = params["embed"]
    if isinstance(emb, dict):
        # int8 table (quantize_params): gather + per-column dequant;
        # quantized serving is bf16-compute by construction
        x = (emb["w_q"][token_ids].astype(jnp.float32)
             * emb["w_s"]).astype(jnp.bfloat16)
    else:
        x = emb[token_ids]
    bias = _position_bias(params, cfg, S)
    if mask is not None:
        bias = bias + jnp.where(mask[:, None, None, :], 0.0, -1e9)

    for blk in params["blocks"]:
        y = _rms_norm(x, blk["ln1"], cfg.eps)
        q = _mm(y, blk["q"]).reshape(
            B, S, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = _mm(y, blk["k"]).reshape(
            B, S, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = _mm(y, blk["v"]).reshape(
            B, S, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        att = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1).astype(x.dtype)
        x = x + _mm(out, blk["o"]).astype(x.dtype)

        y = _rms_norm(x, blk["ln2"], cfg.eps)
        h = (jax.nn.gelu(_mm(y, blk["wi0"]), approximate=True)
             * _mm(y, blk["wi1"]))
        x = x + _mm(h, blk["wo"]).astype(x.dtype)

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
